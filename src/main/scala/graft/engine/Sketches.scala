package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
