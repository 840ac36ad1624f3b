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
    * Keys of ANY type are supported: both sides are normalized to
    * their canonical string form and xxhash64'd, so the filter and the
    * probes always hash the same representation even when the two
    * columns have different numeric widths (int keys vs bigint
    * probes). The 64-bit pre-hash adds ~n²/2⁶⁴ collision probability —
    * noise next to fpp. Null keys probe as non-members.
    */
  def bloomMembership(spark: SparkSession, keys: DataFrame, keyCol: String,
                      candidates: DataFrame, candCol: String,
                      expectedItems: Long,
                      fpp: Double = 0.01): DataFrame = {
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
