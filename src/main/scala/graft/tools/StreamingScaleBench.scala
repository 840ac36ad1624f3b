package graft.tools

import graft.catalog.BackupCatalog
import graft.engine.Exporter.ExportSpec
import graft.streaming.{StreamingBackup, StreamingOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Dev tool (not part of the library surface): wall-clock the streaming
  * plane over an arbitrary events shard — the scaling evidence the
  * batch ladder (graft.Bench) can't produce, because streaming state
  * cost only shows up across micro-batch boundaries.
  *
  * Two drains, both Trigger.AvailableNow over the shard's files:
  *   1. StreamingBackup.exportTableStream — the incremental-backup
  *      twin (file-source → window filter → parquet sink + catalog
  *      row). State is just the file-source log: O(files), not O(rows).
  *   2. StreamingOps.funnel — the heaviest stateful twin
  *      (mapGroupsWithState keyed by user; state is 3 longs per user,
  *      so memory is O(users) regardless of event count).
  *
  * Run at x1 and x10 of the same corpus: a ≤ ~linear wall-clock ratio
  * with flat per-user state pins the O(1)-per-key claim at scale.
  *
  * Usage: StreamingScaleBench <sfDir> [label]
  * Prints one JSON line.
  */
object StreamingScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val label = if (args.length > 1) args(1) else sfDir
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // a legacy TIMESTAMP(NANOS) shard is only readable with this flag,
    // and drain 1's schema peek is the FIRST read — set it before any
    // parquet touch (readEvents sets it too, but that's drain 2)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def tmp(p: String): String =
      java.nio.file.Files.createTempDirectory(p).toString

    // the driver corpus ships events.parquet as a single FILE; the
    // streaming file source lists a directory, so stage a copy (the
    // upscaled shards are already Spark-written directories)
    val eventsPath = {
      val p = graft.Tables.path(sfDir, "events")
      if (new java.io.File(p).isDirectory) p
      else {
        val d = tmp("ssb-events")
        java.nio.file.Files.copy(java.nio.file.Paths.get(p),
          java.nio.file.Paths.get(d, "events.parquet"))
        d
      }
    }

    // drain 1: streaming incremental backup of the whole shard
    val t0 = System.nanoTime()
    val cat = new BackupCatalog(spark, tmp("ssb-cat"))
    val out = StreamingBackup.exportTableStream(spark, cat,
      ExportSpec("events", eventsPath, tsCol = Some("ts")),
      "ssb_session", tmp("ssb-dest"), tmp("ssb-ckpt"))
    val backupSec = (System.nanoTime() - t0) / 1e9
    val backupRows = out match {
      case graft.engine.Exporter.Exported(_, rows, _) => rows
      case other => sys.error(s"backup drain did not export: $other")
    }

    // drain 2: stateful funnel over the same shard (memory sink is one
    // row per user — bounded; the event volume is what scales)
    val t1 = System.nanoTime()
    val funnel = StreamingOps.funnel(spark,
      StreamingOps.readEvents(spark, eventsPath))
    val q = funnel.writeStream
      .outputMode("update")
      .format("memory")
      .queryName("ssb_funnel")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val funnelSec = (System.nanoTime() - t1) / 1e9
    val funnelUsers = spark.table("ssb_funnel")
      .select("user_id").distinct().count()

    def f(d: Double) = BigDecimal(d)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP)
    println(s"""{"label":"$label","backup_sec":${f(backupSec)},"backup_rows":$backupRows,"funnel_sec":${f(funnelSec)},"funnel_users":$funnelUsers}""")
    spark.stop()
  }
}
