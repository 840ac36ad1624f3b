package graft.streaming

import graft.ext.Pca
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Incremental PCA training-state maintenance as a Structured
  * Streaming job — the linear-algebra twin of [[StreamingRetrieval]]:
  * a checkpointed parquet file source over the embedding directory,
  * drained with `Trigger.AvailableNow`, each micro-batch reduced ONCE
  * to its sufficient statistics (per-dimension decimal sums + the
  * 1e-6-quantized LONG second-moment triangle) and appended to the
  * store by [[graft.ext.Pca.updateStats]].
  *
  * Why this shape at 100 TB: the file-source checkpoint is the delta
  * tracker (new embedding files only — vectors already reduced are
  * never re-read); `maxFilesPerTrigger` bounds per-batch memory; the
  * store is an append-only set of EXACTLY-SUMMABLE facts that folds
  * at read, so at-least-once replays of a failed batch are harmless.
  * Because decimal, long and count sums are exact and order-free, a
  * model derived from the store ([[graft.ext.Pca.modelFromStore]])
  * after any number of drains is BIT-IDENTICAL to the batch
  * [[graft.ext.Pca.pcaModel]] over the same corpus (spec-pinned) —
  * the component refreshes in O(d²) whenever asked, without ever
  * re-touching old data.
  */
object StreamingPca {

  /** One maintenance drain: reduce every embedding file not yet in
    * the checkpoint to its statistics. The first drain over an empty
    * store is the bootstrap. Returns the number of moment-triangle
    * partials appended so far (a store-health probe, d(d+1)/2 per
    * non-empty drained batch).
    */
  def maintainStream(spark: SparkSession, embPath: String,
                     store: String, checkpointDir: String): Long = {
    val peek = spark.read.parquet(embPath)
    val src = spark.readStream
      .schema(peek.schema)
      .option("maxFilesPerTrigger", "8")
      .parquet(embPath)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the epoch id is stable across retries of the same batch —
        // it keys the store partials so replays fold at read
        Pca.updateStats(batch, store, batchId)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$store/moments").count()
  }
}
