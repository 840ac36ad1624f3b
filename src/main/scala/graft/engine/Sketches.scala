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
}
