package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-based integrity probes beyond HLL/quantiles: Bloom-filter
  * membership — "did every key we exported land in the restore?"
  * answered in constant memory instead of an anti-join of two 100 TB
  * key sets.
  *
  * Scale shape: the filter builds in one distributed aggregation
  * (per-partition filters OR-merged — commutative, so the result is
  * deterministic under any partitioning); membership testing broadcasts
  * the filter once per executor and stays a narrow map. A false
  * negative is impossible by construction, so "exported key missing
  * from the filter" is a hard integrity failure, while false positives
  * are bounded by fpp.
  */
object Sketches {

  /** Build a Bloom filter over `keys.keyCol` and probe every
    * `candidates.candCol`: returns `candidates` with a `might_contain`
    * verdict column appended (all other candidate columns pass
    * through — no join-back needed).
    *
    * Integral, string, boolean, date, timestamp and binary keys are
    * supported: both sides are normalized to their canonical string
    * form and xxhash64'd, so the filter and the probes always hash the
    * same representation even when the two columns have different
    * integer widths (int keys vs bigint probes). Fractional types
    * (float/double/decimal) are REJECTED rather than silently
    * mis-normalized — double 5.0 renders "5.0" while a bigint probe
    * renders "5", a guaranteed false negative that would violate the
    * no-false-negative integrity contract; pre-normalize such keys to
    * a single type on both sides before calling. The 64-bit pre-hash
    * adds ~n²/2⁶⁴ collision probability — noise next to fpp. Null keys
    * probe as non-members.
    */
  def bloomMembership(spark: SparkSession, keys: DataFrame, keyCol: String,
                      candidates: DataFrame, candCol: String,
                      expectedItems: Long,
                      fpp: Double = 0.01): DataFrame = {
    def rejectFractional(df: DataFrame, c: String): Unit = {
      import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType}
      df.schema(c).dataType match {
        case FloatType | DoubleType | _: DecimalType =>
          throw new IllegalArgumentException(
            s"bloomMembership: column '$c' is fractional — its string " +
              "form ('5.0'/'5.00') can never match an integral probe's " +
              "('5'), guaranteeing false negatives. Cast both sides to " +
              "one type first.")
        case _ => ()
      }
    }
    rejectFractional(keys, keyCol)
    rejectFractional(candidates, candCol)
    // xxhash64 maps null to the seed value, which would make null keys
    // "members" — null-gate both sides instead. xxhash64 is also
    // TYPE-sensitive (int 5, bigint 5, '5' hash differently), hence
    // the canonical string cast on both sides.
    val bf = keys.filter(col(keyCol).isNotNull)
      .select(xxhash64(col(keyCol).cast("string")).as("k64"))
      .stat.bloomFilter("k64", expectedItems, fpp)
    val bc = spark.sparkContext.broadcast(bf)
    val might = udf((k64: java.lang.Long) =>
      k64 != null && bc.value.mightContain(k64.longValue))
    candidates.withColumn("might_contain",
      might(when(col(candCol).isNotNull,
        xxhash64(col(candCol).cast("string")))))
  }

  /** Heavy hitters via Count-Min-Sketch candidate pruning + exact
    * re-verification: items occurring more than `minShare` of the
    * total stream.
    *
    * Returns EXACTLY the rows of the brute-force
    * `group-by → filter(count > minShare·total)` — not an
    * approximation — because (a) CMS only ever OVER-estimates, so
    * every true heavy hitter survives the candidate filter (no false
    * negatives by construction), and (b) candidates are re-counted
    * exactly before the final threshold, which removes the false
    * positives. That makes the operator oracle-checkable against the
    * exact SQL.
    *
    * Scale shape (the point vs the exact form): the exact group-by
    * shuffles one row per DISTINCT item — at 100 TB of web tokens
    * that is billions of rows of exchange for a handful of answers.
    * Here pass 1 builds the sketch (fixed ~`2/eps · ln(1/(1-conf))`
    * counters, merged commutatively across partitions) and pass 2
    * probes each scanned item against the broadcast sketch BEFORE the
    * group-by, so only occurrences of near-heavy tokens ever reach an
    * exchange — the exact re-count falls out of the same aggregation.
    * The probe is a broadcast-handle UDF (no public
    * built-in probes a CountMinSketch), same pattern as the bloom
    * probe above — narrow, no shuffle.
    *
    * `eps` trades sketch memory for candidate precision: estimates
    * exceed truth by at most eps·total with prob ≥ confidence, so the
    * candidate set is ~{items with share > minShare − eps}. Choose
    * eps ≪ minShare.
    */
  def heavyHittersCms(spark: SparkSession, items: DataFrame,
                      itemCol: String, minShare: Double,
                      eps: Double = 1e-4, confidence: Double = 0.99,
                      seed: Int = 42): DataFrame = {
    require(minShare > 0 && minShare < 1, s"minShare=$minShare out of (0,1)")
    val stream = items.filter(col(itemCol).isNotNull)
      .select(col(itemCol).cast("string").as("token"))
    val cms = stream.stat.countMinSketch("token", eps, confidence, seed)
    val total = cms.totalCount // exact: CMS tracks the true add count
    val bc = spark.sparkContext.broadcast(cms)
    // floor(minShare·total) is a safe candidate bar: a true hitter has
    // n > minShare·total ⇒ n ≥ floor+1 > floor, and est ≥ n.
    val bar = (minShare * total).toLong
    val est = udf((t: String) => bc.value.estimateCount(t))
    // est is deterministic per token, so filtering the stream IS the
    // candidate selection: every occurrence of a surviving token
    // passes, so the group-by after the filter re-counts candidates
    // exactly — no separate distinct + semi-join pass (which would
    // cost a third full scan) needed.
    stream.filter(est(col("token")) > lit(bar))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") > lit(total) * lit(minShare))
      .select(col("token"), col("n_occurrences"),
        (col("n_occurrences").cast("double") / lit(total)).as("share"))
  }

  // ---------------------------------------------------------------
  // KMV (k-minimum-values) distinct-value sketch — the cardinality
  // op HLL cannot answer: the NDV of an INTERSECTION (user overlap
  // between two event streams, key overlap between two backup
  // sessions). Beyer et al., "On synopses for distinct-value
  // estimation under multiset operations", SIGMOD'07.
  //
  // The sketch is the k smallest DISTINCT hash values — fully
  // deterministic under any partitioning (a set minimum is
  // order-free), mergeable (union = merge-and-trim), and k longs of
  // state regardless of input size. At 100 TB both sketches build in
  // one pass with k-bounded map-side partials; nothing about the
  // user/key population is ever shuffled or collected.
  // ---------------------------------------------------------------

  /** Insert into a sorted-ascending distinct k-bounded buffer.
    * Reject decisions (duplicate, or k smaller values already present
    * — after warm-up almost every row) are made in ONE allocation-free
    * walk of the ≤k-element list; only a genuine insert pays the
    * rebuild.
    */
  private[graft] def kmvInsert(buf: List[Long], x: Long,
                               k: Int): List[Long] = {
    // pass 1, allocation-free: count elements < x, detect duplicates
    var rest = buf
    var n = 0
    var reject = false
    while (!reject && rest.nonEmpty && rest.head < x) {
      n += 1
      if (n == k) reject = true // k smaller values exist: x can't enter
      else rest = rest.tail
    }
    if (reject || (rest.nonEmpty && rest.head == x)) buf
    else {
      // pass 2: rebuild prefix, splice x, keep at most k elements
      val pre = List.newBuilder[Long]
      var p = buf
      var i = 0
      while (i < n) { pre += p.head; p = p.tail; i += 1 }
      pre += x
      pre.result() ::: rest.take(k - n - 1)
    }
  }

  /** The KMV input projection — the ONE place that encodes the
    * sign-flip contract ([[kmvPair]] orders signed longs, so hashes
    * must be xxhash64 ^ Long.MinValue for signed order to equal
    * unsigned hash order): (flipped hash of `keyCol`, in-A?, in-B?).
    */
  def kmvInput(df: DataFrame, keyCol: String, isA: Column,
               isB: Column): Dataset[(Long, Boolean, Boolean)] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        xxhash64(col(keyCol)).bitwiseXOR(lit(Long.MinValue)).as("h"),
        isA.as("ia"), isB.as("ib"))
      .as[(Long, Boolean, Boolean)]
  }

  /** One-pass paired KMV: input rows are (hash, inA, inB); the two
    * sketches build side by side so overlap queries scan the stream
    * once. Hashes must be sign-flipped xxhash64 (`x ^ Long.MinValue`)
    * so signed ordering equals unsigned hash ordering.
    */
  def kmvPair(k: Int): org.apache.spark.sql.expressions.Aggregator[
      (Long, Boolean, Boolean), (List[Long], List[Long]),
      (Seq[Long], Seq[Long])] =
    new org.apache.spark.sql.expressions.Aggregator[
        (Long, Boolean, Boolean), (List[Long], List[Long]),
        (Seq[Long], Seq[Long])] {
      def zero: (List[Long], List[Long]) = (Nil, Nil)
      def reduce(b: (List[Long], List[Long]), e: (Long, Boolean, Boolean))
          : (List[Long], List[Long]) =
        (if (e._2) kmvInsert(b._1, e._1, k) else b._1,
          if (e._3) kmvInsert(b._2, e._1, k) else b._2)
      def merge(a: (List[Long], List[Long]), b: (List[Long], List[Long]))
          : (List[Long], List[Long]) =
        (b._1.foldLeft(a._1)(kmvInsert(_, _, k)),
          b._2.foldLeft(a._2)(kmvInsert(_, _, k)))
      def finish(r: (List[Long], List[Long])): (Seq[Long], Seq[Long]) = r
      def bufferEncoder
          : org.apache.spark.sql.Encoder[(List[Long], List[Long])] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
      def outputEncoder
          : org.apache.spark.sql.Encoder[(Seq[Long], Seq[Long])] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }

  /** Fraction of the 2⁶⁴ hash space at or below sign-flipped hash x. */
  private def hashFraction(x: Long): Double =
    x.toDouble / 1.8446744073709552e19 + 0.5

  /** NDV estimate from a k-sketch: exact when the sketch never filled
    * (it then holds EVERY distinct hash); (k−1)/F(x_k) otherwise.
    */
  def kmvNdv(sketch: Seq[Long], k: Int): Double =
    if (sketch.lengthCompare(k) < 0) sketch.length.toDouble
    else (k - 1).toDouble / hashFraction(sketch.last)

  /** Intersection-NDV estimate from two k-sketches: the k smallest of
    * the union form a valid union sketch; the fraction of them present
    * in BOTH input sketches estimates the Jaccard index, scaled by the
    * union NDV. Exact when neither sketch filled.
    */
  def kmvOverlap(a: Seq[Long], b: Seq[Long], k: Int): Double = {
    val union = (a ++ b).distinct.sorted.take(k)
    val sa = a.toSet
    val sb = b.toSet
    val rho = union.count(x => sa(x) && sb(x))
    if (union.isEmpty) 0.0
    else rho.toDouble / union.length * kmvNdv(union, k)
  }
}
