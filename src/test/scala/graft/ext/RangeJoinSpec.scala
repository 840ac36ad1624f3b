package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {

  import spark.implicits._

  private def points = Seq(
    ("u1", 5L, "p1"), ("u1", 25L, "p2"), ("u1", 99L, "p3"),
    ("u2", 25L, "p4"))
    .toDF("k", "t", "pt")

  private def intervals = Seq(
    ("u1", 0L, 10L, "i1"), ("u1", 20L, 40L, "i2"),
    ("u2", 30L, 50L, "i3"),
    ("u2", 60L, 50L, "bad")) // end < start: must be dropped, not reversed
    .toDF("ik", "lo", "hi", "iv")

  private def joined = RangeJoin.pointInInterval(points, intervals,
    Seq("k"), Seq("ik"), "t", "lo", "hi", bucketWidth = 8L)

  test("containment matches across bucket boundaries; boundaries inclusive") {
    val got = joined.select("pt", "iv").as[(String, String)].collect().toSet
    // p1 (t=5) in i1 [0,10]; p2 (t=25) in i2 [20,40] though the
    // interval spans buckets 2..5 and the point sits mid-interval;
    // p3 (t=99) matches nothing; p4 (u2,t=25) misses i3 [30,50] and
    // must NOT match the reversed [60,50] row
    assert(got == Set("p1" -> "i1", "p2" -> "i2"))
    val bounds = RangeJoin.pointInInterval(
      Seq(("a", 20L, "lo-edge"), ("a", 40L, "hi-edge")).toDF("k", "t", "pt"),
      Seq(("a", 20L, 40L, "i")).toDF("ik", "lo", "hi", "iv"),
      Seq("k"), Seq("ik"), "t", "lo", "hi", 8L)
      .select("pt").as[String].collect().toSet
    assert(bounds == Set("lo-edge", "hi-edge"))
  }

  test("overlapping intervals each match; duplicate-free per interval") {
    val ovl = RangeJoin.pointInInterval(
      Seq(("a", 30L, "p")).toDF("k", "t", "pt"),
      Seq(("a", 0L, 100L, "wide"), ("a", 25L, 35L, "narrow"))
        .toDF("ik", "lo", "hi", "iv"),
      Seq("k"), Seq("ik"), "t", "lo", "hi", 8L)
      .select("iv").as[String].collect().toSeq.sorted
    // the wide interval spans 13 buckets but contributes exactly ONE row
    assert(ovl == Seq("narrow", "wide"))
  }

  test("agrees with the brute-force non-equi join") {
    val brute = points.join(intervals,
        col("k") === col("ik") && col("t") >= col("lo") &&
          col("t") <= col("hi") && col("hi") >= col("lo"))
      .select("pt", "iv")
    assert(joined.select("pt", "iv").except(brute).isEmpty &&
      brute.except(joined.select("pt", "iv")).isEmpty)
  }

  test("plan: equi-join on (key, bucket), no nested loop") {
    val df = joined
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
