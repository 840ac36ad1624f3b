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
    * `candidates.candCol`; returns per-candidate membership verdicts.
    */
  def bloomMembership(spark: SparkSession, keys: DataFrame, keyCol: String,
                      candidates: DataFrame, candCol: String,
                      expectedItems: Long,
                      fpp: Double = 0.01): DataFrame = {
    val bf = keys.stat.bloomFilter(keyCol, expectedItems, fpp)
    val bc = spark.sparkContext.broadcast(bf)
    import spark.implicits._
    val cands = candidates.select(col(candCol).cast("long"))
      .as[Long]
    cands.mapPartitions { it =>
      val f = bc.value // deserialized once per partition
      it.map(k => (k, f.mightContain(k)))
    }.toDF(candCol, "might_contain")
  }
}
