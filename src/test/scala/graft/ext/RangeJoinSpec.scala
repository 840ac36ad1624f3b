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

  private def leftIv = Seq(
    ("u1", 0L, 30L, "a1"), ("u1", 50L, 60L, "a2"),
    ("u2", 0L, 30L, "a3"),
    ("u1", 90L, 80L, "abad")) // end < start: dropped
    .toDF("lk", "ls", "le", "lv")

  private def rightIv = Seq(
    ("u1", 30L, 45L, "b1"),   // touches a1 at 30 exactly — overlaps
    ("u1", 31L, 49L, "b2"),   // gap between a1 and a2 — no match
    ("u1", 10L, 95L, "b3"),   // spans both a1 and a2
    ("u2", 95L, 99L, "b4"))   // far from a3
    .toDF("rk", "rs", "re", "rv")

  test("interval overlap: touching endpoints count, gaps don't, " +
    "exactly one row per overlapping pair") {
    val got = RangeJoin.intervalOverlap(leftIv, rightIv,
        Seq("lk"), Seq("rk"), "ls", "le", "rs", "re", bucketWidth = 8L)
      .select("lv", "rv").as[(String, String)].collect().toSeq
    // b3 overlaps BOTH a1 and a2 across many shared buckets — each
    // pair exactly once; the reversed left row matches nothing
    assert(got.sorted == Seq("a1" -> "b1", "a1" -> "b3", "a2" -> "b3"),
      s"got $got")
  }

  test("interval overlap agrees with the brute-force non-equi join " +
    "on random intervals, keyed and unkeyed") {
    def mix(s: Long): Long = {
      var z = s + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val l = (0 until 120).map { i =>
      val s = math.floorMod(mix(i), 500L)
      (s"k${i % 3}", s, s + math.floorMod(mix(i * 7 + 1), 60L), s"L$i")
    }.toDF("lk", "ls", "le", "lv")
    val r = (0 until 120).map { i =>
      val s = math.floorMod(mix(i * 13 + 2), 500L)
      (s"k${i % 3}", s, s + math.floorMod(mix(i * 31 + 3), 60L), s"R$i")
    }.toDF("rk", "rs", "re", "rv")
    val keyed = RangeJoin.intervalOverlap(l, r, Seq("lk"), Seq("rk"),
        "ls", "le", "rs", "re", bucketWidth = 16L)
      .select("lv", "rv").as[(String, String)].collect().toSeq
    val bruteKeyed = l.join(r, col("lk") === col("rk") &&
        col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lv", "rv").as[(String, String)].collect().toSeq
    assert(keyed.sorted == bruteKeyed.sorted,
      s"keyed mismatch: ${keyed.length} vs ${bruteKeyed.length}")
    assert(keyed.distinct.length == keyed.length, "keyed emitted dups")
    val unkeyed = RangeJoin.intervalOverlap(l, r, Nil, Nil,
        "ls", "le", "rs", "re", bucketWidth = 16L)
      .select("lv", "rv").as[(String, String)].collect().toSeq
    val bruteUn = l.crossJoin(r)
      .filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lv", "rv").as[(String, String)].collect().toSeq
    assert(unkeyed.sorted == bruteUn.sorted,
      s"unkeyed mismatch: ${unkeyed.length} vs ${bruteUn.length}")
    assert(unkeyed.distinct.length == unkeyed.length, "unkeyed dups")
  }

  test("interval overlap plans an equi-join even with no keys") {
    val df = RangeJoin.intervalOverlap(leftIv, rightIv, Nil, Nil,
      "ls", "le", "rs", "re", bucketWidth = 8L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
