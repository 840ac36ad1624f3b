package graft.functions

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class L2SquaredSpec extends SparkTestBase {

  private lazy val pairs = {
    val e = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    e.as("a").join(e.as("b"),
        col("a.vec_id") < col("b.vec_id") && col("b.vec_id") < 50)
      .select(col("a.emb").as("x"), col("b.emb").as("y"))
  }

  test("native expression is bit-identical to the composed HOF form") {
    val composed = aggregate(
      zip_with(col("x"), col("y"), (x, y) => (x - y) * (x - y)),
      lit(0.0), _ + _)
    val diff = pairs.select(
        L2Squared.l2_squared(col("x"), col("y")).as("native"),
        composed.as("hof"))
      .filter(col("native") =!= col("hof")) // exact, not approximate
    assert(diff.isEmpty)
  }

  test("interpreted eval agrees with codegen") {
    val row = pairs.limit(1)
      .select(L2Squared.l2_squared(col("x"), col("y")))
      .first().getDouble(0)
    import org.apache.spark.sql.catalyst.expressions.Literal
    val r = pairs.limit(1).select(col("x"), col("y")).first()
    val x = r.getSeq[Double](0).toArray
    val y = r.getSeq[Double](1).toArray
    val interpreted = L2Squared(
      Literal.create(x, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType)),
      Literal.create(y, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType)))
      .eval(null).asInstanceOf[Double]
    assert(row == interpreted)
  }

  test("SQL registration exposes l2_squared") {
    L2Squared.register(spark)
    val got = spark.sql(
      "SELECT l2_squared(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS z," +
        " l2_squared(array(3.0d, 0.0d), array(0.0d, 4.0d)) AS h")
      .first()
    assert(got.getDouble(0) == 0.0 && got.getDouble(1) == 25.0)
  }

  test("length mismatch and null elements yield NULL, like the HOF form") {
    L2Squared.register(spark)
    val rows = spark.sql(
      """SELECT
        |  l2_squared(array(1.0d, 2.0d), array(1.0d)) AS mismatch,
        |  l2_squared(array(1.0d, cast(null as double)),
        |             array(1.0d, 2.0d)) AS withnull,
        |  l2_squared(cast(null as array<double>), array(1.0d)) AS nullinput
        |""".stripMargin)
      .first()
    assert(rows.isNullAt(0) && rows.isNullAt(1) && rows.isNullAt(2))
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val interp = L2Squared(
      Literal.create(Array(1.0, 2.0), ArrayType(DoubleType)),
      Literal.create(Array(1.0), ArrayType(DoubleType))).eval(null)
    assert(interp == null)
  }
}
