package graft.orchestrate

import graft.{SparkTestBase, Tables}
import graft.catalog.BackupCatalog
import graft.engine.Exporter
import graft.engine.Exporter.ExportSpec
import graft.incremental.Incremental
import org.apache.spark.sql.functions._

class BackupRunnerSpec extends SparkTestBase {

  private def specs(tables: String*): Seq[ExportSpec] =
    tables.map(t => ExportSpec(t, Tables.path(sf0001, t)))

  test("exportAll fans out, awaits completion, finalizes the session") {
    val cat = new BackupCatalog(spark, tmpDir("cat"))
    val runner = new BackupRunner(spark, cat, maxConcurrent = 3)
    val summary = runner.exportAll(
      specs("region", "nation", "supplier", "customer"),
      "cluster_a", "s1", tmpDir("bk"), nowMs = 1704067200000L)
    assert(summary.outcomes.length == 4)
    assert(summary.failed.isEmpty)
    val sess = cat.sessions.collect().head
    // unlike the reference (export.rb:96), ended_at is set only after
    // all table jobs completed — and is never the 0 sentinel here
    assert(sess.ended_at != 0L && !sess.error)
    assert(cat.tables.count() == 4)
  }

  test("re-run skips already-recorded tables (idempotency, worker.rb:85-87)") {
    val cat = new BackupCatalog(spark, tmpDir("cat"))
    val runner = new BackupRunner(spark, cat, maxConcurrent = 2)
    val root = tmpDir("bk")
    runner.exportAll(specs("region", "nation"), "c", "s1", root, 1L)
    val again = runner.exportAll(specs("region", "nation", "supplier"),
      "c", "s1", root, 2L)
    val skipped = again.outcomes.collect { case s: Exporter.Skipped => s.table }
    assert(skipped.toSet == Set("region", "nation"))
    val exported = again.outcomes.collect { case e: Exporter.Exported => e.table }
    assert(exported == Seq("supplier"))
  }

  test("per-table failure is recorded but doesn't abort the session") {
    val cat = new BackupCatalog(spark, tmpDir("cat"))
    val runner = new BackupRunner(spark, cat, maxConcurrent = 2)
    val bad = ExportSpec("ghost", "/nonexistent/ghost")
    val summary = runner.exportAll(specs("region") :+ bad, "c", "s1",
      tmpDir("bk"), 1L)
    assert(summary.failed.map(_.table) == Seq("ghost"))
    val sess = cat.sessions.collect().head
    assert(sess.error && sess.error_info.contains("ghost"))
    // the good table still completed
    assert(cat.tables.filter(t => t.table_name == "region" && !t.error)
      .count() == 1)
  }

  test("incremental plan picks up at each table's watermark") {
    val cat = new BackupCatalog(spark, tmpDir("cat"))
    val runner = new BackupRunner(spark, cat, maxConcurrent = 2)
    val root = tmpDir("bk")
    val t1998 = 883612800000L
    val now1 = t1998 + Incremental.HotTailGuardMs

    // full backup up to 1998
    val fullSpec = ExportSpec("lineitem", Tables.path(sf0001, "lineitem"),
      tsCol = Some("l_shipdate"), startMs = 0L, endMs = t1998)
    runner.exportAll(Seq(fullSpec), "c", "s_full", root, now1,
      specifiedEnd = t1998)

    // catalog-driven incremental: next window starts exactly at the
    // recorded end_time, ends at now-60s
    val now2 = 1004918400000L + Incremental.HotTailGuardMs // 2001-11-05 + guard
    val (lo, hi) = Incremental.nextWindow(cat, "lineitem", now2)
    assert(lo == t1998)
    assert(hi == 1004918400000L)

    val incrSpecs = Incremental.planIncremental(cat, Seq(fullSpec), now2)
    assert(incrSpecs.head.startMs == t1998 && incrSpecs.head.endMs == hi)
    runner.exportAll(incrSpecs, "c", "s_incr", root, now2)

    // full + incremental = the whole windowed table, no overlap, no gap
    val a = spark.read.parquet(s"$root/s_full/lineitem")
    val b = spark.read.parquet(s"$root/s_incr/lineitem")
    val whole = Tables.lineitem(spark, sf0001)
      .filter(col("l_shipdate") < timestamp_millis(lit(hi)))
    assert(a.count() + b.count() == whole.count())
    assert(a.intersect(b).isEmpty)
  }
}
