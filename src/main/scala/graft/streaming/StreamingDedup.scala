package graft.streaming

import graft.ext.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Incremental dedup maintenance as a Structured Streaming job — the
  * streaming twin of [[graft.ext.Dedup.updatePairs]], shaped like
  * [[StreamingBackup]]: a checkpointed parquet file source over the
  * corpus directory, drained with `Trigger.AvailableNow`.
  *
  * Why this shape at 100 TB:
  *  - the file-source checkpoint IS the delta tracker: each drain sees
  *    only files not yet processed, so "which documents are new" needs
  *    no catalog, no watermark column, no diffing — exactly the
  *    property that makes [[StreamingBackup]]'s exports O(delta);
  *  - every micro-batch flows through [[Dedup.updatePairs]]: its
  *    signatures (computed for the batch only) append to the persisted
  *    store, and the candidate join runs batch-vs-(store ∪ batch) —
  *    the old corpus is never re-shingled, old-vs-old pairs never
  *    recompute;
  *  - `maxFilesPerTrigger` bounds per-batch memory exactly like the
  *    backup drain's backpressure.
  *
  * Delivery semantics: foreachBatch is at-least-once — a batch that
  * crashes after some writes re-runs on restart. Both sinks tolerate
  * that by construction: duplicate signature rows are bit-identical
  * and fold at read ([[Dedup.readSignatures]]); duplicate pair rows
  * are dropped by [[readPairs]]' distinct. That is the same
  * fold-at-read idempotence the catalog's append logs use, chosen
  * over transactional sinks because both stores are APPEND-ONLY sets
  * of pure facts.
  */
object StreamingDedup {

  /** One maintenance drain: process every corpus file not yet in the
    * checkpoint through signature upkeep + delta pair emission. The
    * first drain over an empty store is the bootstrap. Returns the
    * number of distinct candidate pairs accumulated so far.
    */
  def maintainStream(spark: SparkSession, docsPath: String,
                     sigStore: String, pairsOut: String,
                     checkpointDir: String, n: Int = 3): Long = {
    val peek = spark.read.parquet(docsPath)
    val src = spark.readStream
      .schema(peek.schema)
      .option("maxFilesPerTrigger", "8")
      .parquet(docsPath)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val pairs = Dedup.updatePairs(batch, sigStore, n)
        if (!pairs.isEmpty)
          pairs.write.mode("append").parquet(pairsOut)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    readPairs(spark, pairsOut).count()
  }

  /** The accumulated candidate-pair set. Distinct on read: a replayed
    * micro-batch may append the same pair rows twice (at-least-once),
    * and a pair discovered in one drain can resurface in a later one
    * (both members' signatures are in the store) — both collapse here.
    */
  def readPairs(spark: SparkSession, pairsOut: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(pairsOut)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) spark.emptyDataFrame
      .selectExpr("CAST(0 AS BIGINT) AS doc_a", "CAST(0 AS BIGINT) AS doc_b")
      .limit(0)
    else spark.read.parquet(pairsOut).distinct()
  }
}
