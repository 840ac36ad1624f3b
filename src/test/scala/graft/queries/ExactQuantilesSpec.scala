package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The counted-groups quantile plan (EngineQueries.exactQuantiles)
  * must reproduce the built-in `percentile` (= quantile_cont) numbers
  * it replaced — same (n−1)·p rank, same linear interpolation — on
  * adversarial shapes: heavy duplicates (the counted-groups case),
  * all-equal columns, singletons, and random data.
  */
class ExactQuantilesSpec extends SparkTestBase {

  private val ps = Seq(0.25, 0.5, 0.75, 0.95)

  private def builtin(vals: Seq[Double]): Seq[Double] = {
    import spark.implicits._
    val arr = ps.map(p => s"${p}D").mkString(", ")
    vals.toDF("v")
      .agg(expr(s"percentile(v, array($arr))").as("qs"))
      .head().getSeq[Double](0)
  }

  private def counted(vals: Seq[Double]): Seq[Double] = {
    import spark.implicits._
    // output layout is (n, q0..q_{k-1}) for the ungrouped case
    val row = EngineQuantilesAccess.exactQuantiles(vals.toDF("v"), ps)
      .head()
    ps.indices.map(i => row.getDouble(1 + i))
  }

  test("counted-groups quantiles == built-in percentile on random, " +
    "duplicate-heavy, constant, and singleton data") {
    val rnd = new scala.util.Random(7)
    val cases: Seq[Seq[Double]] = Seq(
      Seq(42.0),                                   // singleton
      Seq.fill(50)(3.25),                          // all equal
      (1 to 101).map(_.toDouble),                  // exact integer ranks
      Seq.fill(200)(rnd.nextInt(5).toDouble),      // 5 distinct values
      Seq.fill(257)(rnd.nextDouble() * 1e6),       // random continuous
      (1 to 64).flatMap(i => Seq.fill(i)(i.toDouble))) // skewed counts
    cases.zipWithIndex.foreach { case (vals, i) =>
      val (b, c) = (builtin(vals), counted(vals))
      assert(b == c, s"case $i diverged: builtin=$b counted=$c")
    }
  }

  test("grouped counted quantiles == built-in percentile per group, " +
    "with the group's value count riding along") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0 until 500).map { _ =>
      val grp = s"g${rnd.nextInt(4)}"
      (grp, math.floor(rnd.nextDouble() * 50) / 2)
    }
    val df = rows.toDF("grp", "v")
    val arr = ps.map(p => s"${p}D").mkString(", ")
    val expected = df.groupBy("grp")
      .agg(count(lit(1)).as("n"),
        expr(s"percentile(v, array($arr))").as("qs"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getSeq[Double](2).toList))).toMap
    val got = EngineQuantilesAccess
      .exactQuantiles(df.select(col("grp"), col("v")), ps, Seq("grp"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), ps.indices.map(i => r.getDouble(2 + i)).toList)))
      .toMap
    assert(got == expected, s"grouped quantiles diverged:\n$got\n$expected")
  }
}

/** Test-package bridge to the private[queries] helper. */
private object EngineQuantilesAccess {
  def exactQuantiles(df: org.apache.spark.sql.DataFrame, ps: Seq[Double],
                     groupCols: Seq[String] = Nil)
      : org.apache.spark.sql.DataFrame =
    EngineQueries.exactQuantiles(df, ps, groupCols)
}
