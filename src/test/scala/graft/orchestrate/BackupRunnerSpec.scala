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

  /** Runner whose export attempts fail with `failures` injected
    * throwables before succeeding for real — the worker.rb:28-48
    * release-vs-bury routing under test. Sleeps are captured, not
    * slept.
    */
  private class FlakyRunner(cat: BackupCatalog,
                            failures: scala.collection.mutable.Queue[Throwable])
      extends BackupRunner(spark, cat, maxConcurrent = 1, maxAttempts = 3,
        retryBaseDelayMs = 100, sleep = _ => ()) {
    var attempts = 0
    override protected def exportAttempt(spec: ExportSpec, sessionName: String,
                                         destRoot: String)
        : (Exporter.Outcome, Seq[graft.catalog.ColumnDescriptor]) = {
      attempts += 1
      if (failures.nonEmpty) throw failures.dequeue()
      super.exportAttempt(spec, sessionName, destRoot)
    }
  }

  test("transient failures are retried then succeed, with no error rows") {
    val cat = new BackupCatalog(spark, tmpDir("cat"))
    val flaky = scala.collection.mutable.Queue[Throwable](
      new java.io.IOException("fs hiccup 1"),
      new java.io.IOException("fs hiccup 2"))
    val runner = new FlakyRunner(cat, flaky)
    val summary = runner.exportAll(specs("region"), "c", "s1", tmpDir("bk"), 1L)
    assert(runner.attempts == 3, s"expected 2 retries, got ${runner.attempts}")
    assert(summary.failed.isEmpty)
    assert(summary.outcomes.collect { case e: Exporter.Exported => e.table }
      == Seq("region"))
    // retried-then-succeeded leaves exactly ONE catalog row, no error rows
    assert(cat.tables.filter(t => t.table_name == "region").count() == 1)
    assert(cat.tables.filter(_.error).count() == 0)
    val sess = cat.sessions.collect().head
    assert(!sess.error)
  }

  test("transient failures bury after maxAttempts with one error row") {
    val cat = new BackupCatalog(spark, tmpDir("cat"))
    val flaky = scala.collection.mutable.Queue[Throwable](
      new java.io.IOException("down 1"),
      new java.io.IOException("down 2"),
      new java.io.IOException("down 3"))
    val runner = new FlakyRunner(cat, flaky)
    val summary = runner.exportAll(specs("region"), "c", "s1", tmpDir("bk"), 1L)
    assert(runner.attempts == 3, "must stop at maxAttempts")
    assert(summary.failed.map(_.table) == Seq("region"))
    // buried: exactly one error row, session marked errored
    assert(cat.tables.filter(t => t.table_name == "region" && t.error)
      .count() == 1)
    assert(cat.sessions.collect().head.error)
  }

  test("hard failures bury immediately — no retry") {
    val cat = new BackupCatalog(spark, tmpDir("cat"))
    val flaky = scala.collection.mutable.Queue[Throwable](
      new IllegalArgumentException("schema mismatch — retrying cannot fix"))
    val runner = new FlakyRunner(cat, flaky)
    val summary = runner.exportAll(specs("region"), "c", "s1", tmpDir("bk"), 1L)
    assert(runner.attempts == 1, "hard failure must not be retried")
    assert(summary.failed.map(_.table) == Seq("region"))
    assert(cat.tables.filter(_.error).count() == 1)
  }

  test("record-side transient failure retries the RECORD only, not the data write") {
    val cat = new BackupCatalog(spark, tmpDir("cat"))
    val recordFailures = scala.collection.mutable.Queue[Throwable](
      new java.io.IOException("catalog fs blip"))
    val runner = new BackupRunner(spark, cat, maxConcurrent = 1,
      maxAttempts = 3, retryBaseDelayMs = 1, sleep = _ => ()) {
      var dataAttempts = 0
      var recordAttempts = 0
      override protected def exportAttempt(spec: ExportSpec,
                                           sessionName: String,
                                           destRoot: String)
          : (Exporter.Outcome, Seq[graft.catalog.ColumnDescriptor]) = {
        dataAttempts += 1
        super.exportAttempt(spec, sessionName, destRoot)
      }
      override protected def recordExport(spec: ExportSpec,
                                          sessionName: String,
                                          outcome: Exporter.Outcome,
                                          descs: Seq[graft.catalog.ColumnDescriptor])
          : Unit = {
        recordAttempts += 1
        if (recordFailures.nonEmpty) throw recordFailures.dequeue()
        super.recordExport(spec, sessionName, outcome, descs)
      }
    }
    val summary = runner.exportAll(specs("region"), "c", "s1", tmpDir("bk"), 1L)
    assert(summary.failed.isEmpty)
    assert(runner.dataAttempts == 1,
      "a record-side hiccup must never replay the data write")
    assert(runner.recordAttempts == 2)
    // exactly one success row in the catalog
    assert(cat.tables.filter(t => t.table_name == "region").count() == 1)
    assert(cat.tables.filter(_.error).count() == 0)
  }

  test("retry backoff doubles per reiteration (db.rb.old:46-47)") {
    val slept = scala.collection.mutable.Buffer.empty[Long]
    val e = intercept[java.io.IOException] {
      Retry.withRetry(4, 100L, slept += _) {
        throw new java.io.IOException("always down")
      }
    }
    assert(e.getMessage == "always down")
    assert(slept.toSeq == Seq(100L, 200L, 400L))
  }

  test("cause-chain transience: a wrapped IO failure is transient") {
    assert(Retry.isTransient(new RuntimeException("wrapper",
      new java.net.SocketTimeoutException("read timed out"))))
    assert(!Retry.isTransient(new IllegalStateException("bad plan")))
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
