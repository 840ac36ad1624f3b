package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkTestBase {

  import spark.implicits._

  private def trades = Seq(
    // (key, time, label)
    ("aapl", 10L, "t1"), ("aapl", 20L, "t2"), ("aapl", 30L, "t3"),
    ("msft", 15L, "t4"), ("nokey", 5L, "t5"))
    .toDF("sym", "t", "trade")

  private def quotes = Seq(
    ("aapl", 5L, 1.0), ("aapl", 20L, 2.0), ("aapl", 25L, 3.0),
    ("msft", 99L, 9.0))
    .toDF("qsym", "qt", "px")

  test("latest at-or-before match per key; no-match rows keep nulls") {
    val got = Asof.join(trades, quotes, Seq("sym"), Seq("qsym"), "t", "qt")
      .select("trade", "qt", "px").as[(String, Option[Long], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("t1") == ((Some(5L), Some(1.0)))) // strictly-before match
    assert(got("t2") == ((Some(20L), Some(2.0)))) // tie: same time matches
    assert(got("t3") == ((Some(25L), Some(3.0)))) // latest of several
    assert(got("t4") == ((None, None))) // quote only after the trade
    assert(got("t5") == ((None, None))) // key absent on the right
  }

  test("exec node reports numOutputRows / numMatchedRows SQL metrics") {
    val df = Asof.join(trades, quotes, Seq("sym"), Seq("qsym"), "t", "qt")
    df.collect()
    // AQE hides its final plan behind leaf wrapper nodes — unwrap them
    def find(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[AsofJoinExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        find(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        find(s.plan)
      case e: AsofJoinExec => e +: p.children.flatMap(find)
      case _ => p.children.flatMap(find)
    }
    val execs = find(df.queryExecution.executedPlan)
    assert(execs.nonEmpty, "AsofJoinExec missing from the executed plan")
    val m = execs.head.metrics
    // 5 left rows pass through; 3 find a match (t1, t2, t3) — t4's
    // quote is later, t5's key never quotes
    assert(m("numOutputRows").value == 5L,
      s"numOutputRows = ${m("numOutputRows").value}")
    assert(m("numMatchedRows").value == 3L,
      s"numMatchedRows = ${m("numMatchedRows").value}")
  }

  test("null keys and null times never match, on either side") {
    val l = Seq((Some("k"), Some(10L), "a"), (None, Some(10L), "b"),
      (Some("k"), None, "c")).toDF("k", "t", "row")
    val r = Seq((Some("k"), Some(5L), 1.0), (None, Some(1L), 8.0),
      (Some("k"), None, 9.0)).toDF("rk", "rt", "v")
    val got = Asof.join(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select("row", "v").as[(String, Option[Double])].collect().toMap
    assert(got("a") == Some(1.0)) // only the real (k,5) row matches
    assert(got("b").isEmpty) // null left key
    assert(got("c").isEmpty) // null left time
  }

  test("multi-column keys join correctly") {
    val l = Seq(("a", 1, 10L, "l1"), ("a", 2, 10L, "l2"))
      .toDF("k1", "k2", "t", "row")
    val r = Seq(("a", 1, 5L, "r1"), ("a", 2, 7L, "r2"))
      .toDF("rk1", "rk2", "rt", "tag")
    val got = Asof.join(l, r, Seq("k1", "k2"), Seq("rk1", "rk2"), "t", "rt")
      .select("row", "tag").as[(String, String)].collect().toMap
    assert(got == Map("l1" -> "r1", "l2" -> "r2"))
  }

  test("both sides branched from one DataFrame (attribute dedup)") {
    val base = Seq(("k", 10L, "purchase"), ("k", 8L, "view"),
      ("k", 12L, "view")).toDF("u", "ts", "kind")
    val p = base.filter($"kind" === "purchase")
      .select($"u", $"ts".as("pt"))
    val v = base.filter($"kind" === "view")
      .select($"u".as("vu"), $"ts".as("vt"))
    val got = Asof.join(p, v, Seq("u"), Seq("vu"), "pt", "vt")
      .select("pt", "vt").as[(Long, Option[Long])].collect().toSeq
    assert(got == Seq((10L, Some(8L)))) // the later view (12) excluded
  }

  test("agrees with a windowed reformulation on real event data") {
    val ev = graft.Tables.eventsTs(spark, sf0001)
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .filter(col("event_type").isin("purchase", "view"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts_us").as("purchase_us"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts_us").as("view_us"))
    val viaOp = Asof.join(p, v, Seq("user_id"), Seq("v_user"),
        "purchase_us", "view_us")
      .select(col("purchase_id"), col("view_us").as("last_view_us"))
    // brute-force truth: per purchase, max view time at-or-before
    val viaJoin = p.join(v,
        col("user_id") === col("v_user") &&
          col("view_us") <= col("purchase_us"), "left")
      .groupBy(col("purchase_id"))
      .agg(max(col("view_us")).as("last_view_us"))
    assert(viaOp.count() == p.count())
    assert(viaOp.except(viaJoin).isEmpty && viaJoin.except(viaOp).isEmpty)
  }

  test("plan: custom exec node, shuffles only on the join keys") {
    val df = Asof.join(trades, quotes, Seq("sym"), Seq("qsym"), "t", "qt")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("column pruning passes through the custom node to both scans") {
    // full-width events on both sides, two columns selected: without
    // AsofJoinPruning the custom node is a pruning barrier and both
    // ReadSchemas carry every column (props, value, ...)
    val l = graft.Tables.eventsTs(spark, sf0001)
      .withColumnRenamed("event_id", "l_id")
    val r = graft.Tables.eventsTs(spark, sf0001)
      .withColumnRenamed("user_id", "r_user")
      .withColumnRenamed("ts_ns", "r_ts")
      .withColumnRenamed("event_id", "r_id")
    val j = Asof.join(l, r, Seq("user_id"), Seq("r_user"), "ts_ns", "r_ts")
      .select("l_id", "r_ts")
    j.collect()
    // AQE's plan string can repeat the scans (initial + final plan)
    val schemas = j.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("ReadSchema")).map(_.trim.replaceAll("^[:+\\- ]+", ""))
      .toSeq.distinct
    assert(schemas.size == 2, schemas)
    assert(!schemas.exists(_.contains("props")),
      s"unreferenced wide column survived pruning:\n${schemas.mkString("\n")}")
    schemas.foreach(s => assert(!s.contains("value"), s))
  }

  test("key/time column validation fails loudly") {
    val e1 = intercept[IllegalArgumentException] {
      Asof.join(trades, quotes, Seq("nope"), Seq("qsym"), "t", "qt")
    }
    assert(e1.getMessage.contains("no column 'nope'"))
    val e2 = intercept[IllegalArgumentException] {
      // key type mismatch: string vs long
      Asof.join(trades, quotes, Seq("sym"), Seq("qt"), "t", "qt")
    }
    assert(e2.getMessage.contains("type mismatch"))
    // duplicate names must be rejected, not silently bound to the first
    val amb = Seq((1L, 2L, "k")).toDF("a", "b", "sym")
      .select(col("sym"), col("a").as("t"), col("b").as("t"))
    val e3 = intercept[IllegalArgumentException] {
      Asof.join(amb, quotes, Seq("sym"), Seq("qsym"), "t", "qt")
    }
    assert(e3.getMessage.contains("ambiguous"))
  }
}
