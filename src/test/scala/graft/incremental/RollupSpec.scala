package graft.incremental

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class RollupSpec extends SparkTestBase {

  private val keys = Seq("l_returnflag", "l_linestatus")

  test("maintained rollup over three deltas equals a from-scratch summary") {
    val dir = tmpDir("rollup") + "/summary"
    val li = spark.read.parquet(Tables.path(sf0001, "lineitem"))
    val deltas = Seq(
      li.filter(col("l_orderkey") % 3 === 0),
      li.filter(col("l_orderkey") % 3 === 1),
      li.filter(col("l_orderkey") % 3 === 2))
    deltas.foreach(d =>
      Rollup.maintain(spark, dir, d, keys, "l_quantity"))
    val maintained = Rollup.finish(spark.read.parquet(dir))
    val direct = Rollup.finish(Rollup.summarize(li, keys, "l_quantity"))
    assert(maintained.except(direct).isEmpty &&
      direct.except(maintained).isEmpty,
      "incremental maintenance must equal recompute exactly")
  }

  test("merge handles keys present in only one side") {
    import spark.implicits._
    val a = Rollup.summarize(
      Seq(("x", 1.0), ("x", 2.0)).toDF("k", "v"), Seq("k"), "v")
    val b = Rollup.summarize(
      Seq(("y", 5.0)).toDF("k", "v"), Seq("k"), "v")
    val m = Rollup.finish(Rollup.merge(Seq("k"), a, b))
      .as[(String, Long, Double, Double, Double)].collect().toSet
    assert(m == Set(("x", 2L, 3.0, 1.0, 2.0), ("y", 1L, 5.0, 5.0, 5.0)), m)
  }

  test("crashed publish recovers: staged __old with no live dir") {
    val dir = tmpDir("rollup") + "/crashy"
    val li = spark.read.parquet(Tables.path(sf0001, "lineitem"))
    val slice = li.filter(col("l_orderkey") < 100)
    Rollup.maintain(spark, dir, slice, keys, "l_quantity")
    val f = graft.engine.Compactor.fs(spark, dir)
    require(f.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "__old")))
    // next maintenance must recover the staged state, then merge
    Rollup.maintain(spark, dir, li.limit(0), keys, "l_quantity")
    val got = Rollup.finish(spark.read.parquet(dir))
    val expect = Rollup.finish(
      Rollup.summarize(slice, keys, "l_quantity"))
    assert(got.except(expect).isEmpty && expect.except(got).isEmpty)
  }
}
