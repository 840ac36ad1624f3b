package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed training-data cleaning pipeline [EXT] — the flagship
  * "what this engine is for" operator: quality-gate the corpus, strip
  * near-duplicates, fingerprint the survivors. Each stage is one of
  * the already-proven operators; the only materialization barrier is
  * the shingle table jaccardPairs caches internally — everything else
  * remains one Catalyst plan, so column pruning and filter pushdown
  * cross stage boundaries.
  *
  * Scale shape: quality gating is a narrow map; near-dup detection is
  * the capped shingle join (see [[Dedup.jaccardPairs]]), whose shingle
  * table is materialized once per input (freed via [[release]]); the
  * survivor anti-join shuffles only doc ids. Nothing in the pipeline
  * holds more than (doc_id, hash) pairs in a shuffle.
  */
object Pipeline {

  /** The quality-gated input [[cleanCorpus]] feeds to jaccardPairs —
    * shared with [[release]] so the plan-keyed unpersist matches the
    * exact cached entry.
    */
  private def qualityDocs(docs: DataFrame): DataFrame =
    docs.join(
      TextAnalysis.qualityScores(docs).filter(col("keep")).select("doc_id"),
      "doc_id")

  /** Free the shingle table [[cleanCorpus]] materialized (its input is
    * the quality-gated corpus, so `Dedup.release(docs)` alone would
    * miss it — the cache is keyed by canonical plan).
    */
  def release(docs: DataFrame): Unit =
    Dedup.release(qualityDocs(docs))

  /** Deterministic survivor rule for near-dup pairs (a < b): the
    * lower id of every pair survives, any doc appearing as the higher
    * side is dropped — reproducible regardless of partitioning, unlike
    * "keep an arbitrary member of each cluster".
    */
  def cleanCorpus(docs: DataFrame, jaccardThreshold: Double = 0.5,
                  maxDf: Int = 50): DataFrame = {
    val qdocs = qualityDocs(docs)
    // the drop-id set is materialized (eager, id-sized — ids of
    // near-dup losers): its lineage embeds the WHOLE shingle/pair
    // pipeline, and riding that into the final anti-join stage's
    // task binary re-serialized a ~1 MiB plan into every task of
    // the survivor scan (the r12 bench-tail warning). The anti-join
    // only ever needed the ids.
    val dropIds = Dedup.jaccardPairs(qdocs, n = 3, jaccardThreshold, maxDf)
      .select(col("doc_b").as("doc_id")).distinct()
      .localCheckpoint(true)
    qdocs.join(dropIds, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"),
        size(TextAnalysis.tokens(col("text"))).as("n_tokens"),
        md5(col("text")).as("digest"))
  }
}
