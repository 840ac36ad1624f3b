package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join without a nested loop [EXT].
  *
  * A naive `p.join(i, key && start <= t && t <= end)` has no equi
  * component beyond the key, so any key with many points × many
  * intervals degenerates into a per-key cartesian — and with no key at
  * all Spark plans BroadcastNestedLoopJoin, the textbook scale-killer.
  * Bucketing restores a real equi-join: intervals are exploded onto
  * the fixed-width bucket grid they cover, points map to their single
  * bucket, and the join runs on (key, bucket) with the exact
  * containment test as a join filter. Each point's bucket appears at
  * most once per interval, so no post-join dedup is needed.
  *
  * Scale: one shuffle per side on (key, bucket) — 8-byte extra column,
  * AQE-splittable skew since it is a plain equi-join. `bucketWidth`
  * trades replication for selectivity: an interval lands in
  * `len/width + 1` buckets, so width ≈ the TYPICAL interval length
  * keeps replication ~2× while a bucket pairs only nearby points and
  * intervals. Degenerate inputs are the caller's contract: an interval
  * with `end < start` is dropped (Spark's `sequence` would run it
  * BACKWARDS into wrong buckets, not empty), and an outlier interval
  * covering millions of buckets should be split or clamped upstream —
  * nothing here caps silently.
  *
  * Output: every point column, then every interval column; rename
  * collisions away before joining. Null keys/bounds never match (the
  * bucket expression and equi-keys are null-rejecting).
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointKeys: Seq[String], intervalKeys: Seq[String],
                      pointCol: String, startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    require(pointKeys.length == intervalKeys.length,
      s"key lists differ in arity: $pointKeys vs $intervalKeys")
    val pb = points.withColumn("_rj_bucket",
      expr(s"`$pointCol` div ${bucketWidth}L"))
    val ib = intervals
      // end < start would make sequence() count DOWN (wrong buckets,
      // not an empty set) — an empty interval contains nothing, drop it
      .filter(col(endCol) >= col(startCol))
      .withColumn("_rj_bucket",
        explode(sequence(expr(s"`$startCol` div ${bucketWidth}L"),
          expr(s"`$endCol` div ${bucketWidth}L"))))
    val keyCond = pointKeys.zip(intervalKeys)
      .map { case (a, b) => pb(a) === ib(b) }
      .reduce(_ && _)
    pb.join(ib,
        keyCond && pb("_rj_bucket") === ib("_rj_bucket") &&
          pb(pointCol) >= ib(startCol) && pb(pointCol) <= ib(endCol))
      .drop("_rj_bucket")
  }

  /** Interval-overlap join without a nested loop [EXT] — the
    * interval×interval sibling of [[pointInInterval]] (timeline
    * intersection: sessions × outages, spans × spans). Endpoints are
    * inclusive: touching intervals (lEnd == rStart) DO overlap.
    *
    * Both sides explode onto the same fixed-width bucket grid and the
    * join runs on (keys, bucket) — a real equi-join even with NO keys
    * (the bucket is the equi component), where the naive predicate
    * join is a BroadcastNestedLoopJoin. An overlapping pair shares
    * every bucket its intersection covers, so a post-join `distinct`
    * would be the easy-but-wrong dedup (an extra corpus-sized
    * shuffle); instead each pair is emitted EXACTLY ONCE by the
    * responsibility rule — only the bucket containing the overlap's
    * start (`greatest(lStart, rStart) div width`) emits. That bucket
    * is covered by both intervals by construction, so nothing is
    * lost.
    *
    * Scale: one shuffle per side on (keys, bucket), AQE-splittable;
    * `bucketWidth` trades replication for selectivity exactly as in
    * [[pointInInterval]]; empty intervals (end < start) are dropped
    * for the same sequence()-counts-backwards reason. Column-name
    * collisions between the two sides must be renamed away by the
    * caller.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      leftKeys: Seq[String], rightKeys: Seq[String],
                      lStart: String, lEnd: String,
                      rStart: String, rEnd: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    require(leftKeys.length == rightKeys.length,
      s"key lists differ in arity: $leftKeys vs $rightKeys")
    def buckets(df: DataFrame, s: String, e: String): DataFrame =
      df.filter(col(e) >= col(s))
        .withColumn("_rj_bucket",
          explode(sequence(expr(s"`$s` div ${bucketWidth}L"),
            expr(s"`$e` div ${bucketWidth}L"))))
    val lb = buckets(left, lStart, lEnd)
    val rb = buckets(right, rStart, rEnd)
    val keyCond = leftKeys.zip(rightKeys)
      .map { case (a, b) => lb(a) === rb(b) }
      .foldLeft(lit(true))(_ && _)
    lb.join(rb,
        keyCond && lb("_rj_bucket") === rb("_rj_bucket") &&
          lb(lStart) <= rb(rEnd) && rb(rStart) <= lb(lEnd) &&
          // exactly-once responsibility: names are distinct across
          // sides (caller contract), so the expr is unambiguous
          expr(s"greatest(`$lStart`, `$rStart`) div ${bucketWidth}L") ===
            lb("_rj_bucket"))
      .drop("_rj_bucket")
  }
}
