package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed training-data cleaning pipeline [EXT] — the flagship
  * "what this engine is for" operator: quality-gate the corpus, strip
  * near-duplicates, fingerprint the survivors. Each stage is one of
  * the already-proven operators; the composition stays a single
  * Catalyst plan (no materialization barriers), so column pruning and
  * filter pushdown cross stage boundaries.
  *
  * Scale shape: quality gating is a narrow map; near-dup detection is
  * the capped shingle join (see [[Dedup.jaccardPairs]]); the survivor
  * anti-join shuffles only doc ids. Nothing in the pipeline holds
  * more than (doc_id, hash) pairs in a shuffle.
  */
object Pipeline {

  /** Deterministic survivor rule for near-dup pairs (a < b): the
    * lower id of every pair survives, any doc appearing as the higher
    * side is dropped — reproducible regardless of partitioning, unlike
    * "keep an arbitrary member of each cluster".
    */
  def cleanCorpus(docs: DataFrame, jaccardThreshold: Double = 0.5,
                  maxDf: Int = 50): DataFrame = {
    val quality = TextAnalysis.qualityScores(docs)
      .filter(col("keep"))
      .select("doc_id")
    val qdocs = docs.join(quality, "doc_id")
    val dropIds = Dedup.jaccardPairs(qdocs, n = 3, jaccardThreshold, maxDf)
      .select(col("doc_b").as("doc_id")).distinct()
    qdocs.join(dropIds, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"),
        size(TextAnalysis.tokens(col("text"))).as("n_tokens"),
        md5(col("text")).as("digest"))
  }
}
