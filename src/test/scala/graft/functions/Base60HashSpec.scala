package graft.functions

import graft.{SparkTestBase, Tables}
import graft.ext.Hashing
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class Base60HashSpec extends SparkTestBase {

  test("native expression is bit-identical to the composed " +
    "conv(substr(md5)) form on real corpus text") {
    val docs = Tables.documents(spark, sf0001)
    // whole docs AND every token — covers multi-byte UTF-8, empty-ish
    // strings, punctuation
    val texts = docs.select(col("text").as("s"))
      .unionAll(docs.select(explode(split(col("text"), "\\s+")).as("s")))
    val diff = texts.select(
        Hashing.base60(col("s")).as("native"),
        Hashing.base60Composed(col("s")).as("composed"))
      .filter(col("native") =!= col("composed"))
    assert(diff.isEmpty)
  }

  test("interpreted eval agrees with codegen and is in [0, 2^60)") {
    val samples = Seq("", "a", "hello world", "café", "é́",
      "𝔘𝔫𝔦𝔠𝔬𝔡𝔢", "line1\nline2", "x" * 1000)
    samples.foreach { s =>
      val interpreted = Base60HashExpr(
        org.apache.spark.sql.catalyst.expressions.Literal(
          UTF8String.fromString(s))).eval(null).asInstanceOf[Long]
      assert(interpreted == Base60Hash.hash60(UTF8String.fromString(s)))
      assert(interpreted >= 0L && interpreted < (1L << 60))
    }
    // codegen path: force a projection over a real DataFrame
    import spark.implicits._
    val viaCodegen = samples.toDF("s")
      .select(Hashing.base60(col("s")).as("h")).collect().map(_.getLong(0))
    val viaEval = samples.map(s => Base60Hash.hash60(UTF8String.fromString(s)))
    assert(viaCodegen.toSeq == viaEval)
  }

  test("null in, null out; non-string input rejected at analysis") {
    import spark.implicits._
    val withNull = Seq(Some("a"), None).toDF("s")
      .select(Hashing.base60(col("s")).as("h")).collect()
    assert(withNull(1).isNullAt(0) && !withNull(0).isNullAt(0))
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("n").select(Hashing.base60(col("n"))).collect()
    }
    assert(err.getMessage.contains("base60_hash"))
  }

  test("SQL registration computes the same hash") {
    Base60Hash.register(spark)
    import spark.implicits._
    Seq("probe").toDF("s").createOrReplaceTempView("b60probe")
    val sqlVal = spark.sql("SELECT base60_hash(s) FROM b60probe")
      .collect()(0).getLong(0)
    assert(sqlVal == Base60Hash.hash60(UTF8String.fromString("probe")))
  }
}
