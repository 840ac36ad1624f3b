package graft.streaming

import graft.catalog.{BackupCatalog, TableRecord}
import graft.engine.Exporter
import graft.engine.Exporter.{Empty, Exported, ExportSpec, Outcome}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** The flagship export path (S1, Exporter.exportTable) as a Structured
  * Streaming job — the reference's incremental-backup loop
  * (docs/Proposed_HBase_Backup_using_HBASE-1684.txt:40-58: "export
  * everything since the last recorded end_time, repeatedly") collapsed
  * into a checkpointed file-source → filter → file-sink stream.
  *
  * Why this shape at 100 TB:
  *  - the parquet file SOURCE lists only files not yet in the source
  *    checkpoint — each drain reads the delta, never the history, so
  *    "incremental" needs no catalog-driven predicate at all (the
  *    checkpoint IS the watermark, at file granularity);
  *  - the file SINK's commit log (`_spark_metadata`) publishes files
  *    atomically per micro-batch: a crash mid-drain re-runs the batch
  *    and readers (batch reads of the dest honor the commit log) never
  *    see the torn attempt — exactly-once without a rename dance;
  *  - `Trigger.AvailableNow` bounds each invocation: drain what is
  *    visible now, checkpoint, stop — the scheduled-batch operational
  *    model of the reference (cron'd `hbacker export`), with
  *    `maxFilesPerTrigger` as the per-micro-batch backpressure the
  *    reference got from its queue watermarks (helpers.rb:43-67).
  *
  * The time-range filter (scanWindow) still applies — it bounds the
  * hot tail exactly like the batch path (cli.rb:28-31's now−60 s
  * guard). The per-key version CAP is intentionally NOT offered here:
  * it is a global ranking per key, which a stateless stream cannot
  * express (and the reference's default is versions=100000 = "all",
  * cli.rb:71-74); use the batch exporter for capped exports.
  */
object StreamingBackup {

  /** One incremental drain: read new source files → window filter →
    * append to the session dest → record a catalog row with the
    * table's total committed row count. Re-invoking with the same
    * `checkpointDir` after new files arrive exports only the delta;
    * re-invoking with nothing new is a no-op drain (and records the
    * unchanged count). The dest/checkpoint pair defines the stream's
    * identity — one per (session, table).
    */
  def exportTableStream(spark: SparkSession, cat: BackupCatalog,
                        spec: ExportSpec, sessionName: String,
                        destRoot: String, checkpointDir: String,
                        zonemapCols: Seq[String] = Nil): Outcome = {
    require(spec.keyCols.isEmpty,
      "version capping is a batch-only operator (global per-key ranking); " +
        "use Exporter.exportTable for capped exports")
    // schema pin from a batch peek: file sources need an explicit
    // schema (no inference mid-stream), and the descriptor rows the
    // catalog wants (S4) come from the same peek
    val peek = spark.read.parquet(spec.srcPath)
    val descs = Exporter.descriptorRows(peek, sessionName, spec.table)
    if (peek.limit(1).isEmpty) {
      // S5 empty-source short-circuit, as worker.rb:89,95-99
      cat.exportedTableInfo(
        TableRecord("export", spec.table, sessionName, spec.startMs,
          spec.endMs, spec.versions, empty = true, error = false, "", 0L),
        descs)
      return Empty(spec.table)
    }
    val src = spark.readStream
      .schema(peek.schema)
      .option("maxFilesPerTrigger", "8")
      .parquet(spec.srcPath)
    val windowed = spec.tsCol match {
      case Some(ts) => Exporter.scanWindow(src, ts, spec.startMs, spec.endMs)
      case None => src
    }
    val dest = Exporter.destPath(destRoot, sessionName, spec.table)
    val q = windowed.writeStream
      .format("parquet")
      .option("path", dest)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // committed state only: a batch read of a file-sink dir honors
    // _spark_metadata, so torn files from a crashed batch never count
    val rows = spark.read.schema(peek.schema).parquet(dest).count()
    cat.exportedTableInfo(
      TableRecord("export", spec.table, sessionName, spec.startMs,
        spec.endMs, spec.versions, empty = false, error = false, "", rows),
      descs)
    // zone-map upkeep rides the drain: an O(delta) sidecar refresh
    // (only this drain's new files' footers are read; ZoneMap's
    // committed-file filter already excludes torn micro-batches), so
    // the restore-side index is always current without a separate
    // maintenance pass
    if (zonemapCols.nonEmpty)
      graft.engine.ZoneMap.update(spark, dest, zonemapCols)
    Exported(spec.table, rows, dest)
  }
}
