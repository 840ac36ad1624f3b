package graft.orchestrate

import graft.catalog.{BackupCatalog, BackupSession}
import graft.engine.{Exporter, Importer}
import graft.engine.Exporter.{ExportSpec, Outcome}

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import org.apache.spark.sql.SparkSession

/** The orchestration plane: per-table fan-out with bounded concurrency.
  *
  * Replaces the reference's beanstalkd queue + worker-process pool
  * (/root/reference/lib/hbacker/export.rb:101-131, lib/worker.rb:68-148,
  * lib/stalker.rb) with concurrent Spark job submission from the
  * driver: each table's export/import is an independent Spark job;
  * Spark's scheduler provides the intra-table parallelism (input
  * splits) and the fixed thread pool provides the reference's
  * inter-table gate (`--mapred-max-jobs`, cli.rb:111-114). Queue-depth
  * backpressure (helpers.rb:43-67) has nothing left to guard when the
  * app's scheduler owns admission.
  *
  * Deliberate fix vs the reference: `end_info` is written only after
  * every table job COMPLETES, not after the last job is enqueued
  * (export.rb:96 marks enqueue-completion — SURVEY.md §3.1 step 8).
  *
  * Failure routing mirrors worker.rb:28-48 via [[Retry]]: transient
  * (IO-ish) failures re-attempt up to `maxAttempts` with doubling
  * delay and leave NO per-attempt error rows; hard failures (and
  * exhausted retries) record one error row and move on — the
  * record-and-bury path.
  */
class BackupRunner(spark: SparkSession, cat: BackupCatalog,
                   maxConcurrent: Int = 6,
                   maxAttempts: Int = 3,
                   retryBaseDelayMs: Long = 500,
                   sleep: Long => Unit = Thread.sleep) {

  /** One export DATA attempt (throws on failure; no catalog writes) —
    * overridable spec seam. The catalog record runs under its own
    * retry, so a transient record-side failure never replays the data
    * write.
    */
  protected def exportAttempt(spec: ExportSpec, sessionName: String,
                              destRoot: String)
      : (Outcome, Seq[graft.catalog.ColumnDescriptor]) =
    Exporter.exportTableData(spark, spec, sessionName, destRoot)

  /** One import DATA attempt (throws on failure; no catalog writes) —
    * overridable spec seam.
    */
  protected def importAttempt(exportCat: BackupCatalog, table: String,
                              sessionName: String, destRoot: String,
                              targetPath: String,
                              format: String = "parquet")
      : Importer.Imported =
    Importer.importTableData(spark, exportCat, table, sessionName,
      destRoot, targetPath, format)

  /** One export RECORD attempt (throws on failure) — overridable spec
    * seam, retried independently of the data half.
    */
  protected def recordExport(spec: ExportSpec, sessionName: String,
                             outcome: Outcome,
                             descs: Seq[graft.catalog.ColumnDescriptor])
      : Unit =
    Exporter.recordExportOutcome(cat, spec, sessionName, outcome, descs)

  import BackupRunner.SessionSummary

  private val fairMode =
    spark.sparkContext.getConf.get("spark.scheduler.mode", "FIFO")
      .equalsIgnoreCase("FAIR")

  /** Run one job per item on a fixed pool of `maxConcurrent` threads
    * (the pool size IS the concurrency gate). Each job is
    * exception-fenced by `fallback` so one failure can never abort the
    * session-level await; under a FAIR scheduler each item gets its
    * own pool so concurrent table jobs share executors instead of
    * FIFO-queueing (tagging is inert — and skipped — under FIFO).
    */
  private def runBounded[A, B](items: Seq[A])(job: A => B)
                              (fallback: (A, Throwable) => B): Seq[B] = {
    val pool = Executors.newFixedThreadPool(math.max(1, maxConcurrent))
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutorService(pool)
    val futures = items.map { item =>
      Future {
        if (fairMode)
          spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", s"graft-job-$item".take(64))
        try job(item)
        catch { case e: Throwable => fallback(item, e) }
        finally if (fairMode)
          spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
      }
    }
    try Await.result(Future.sequence(futures), Duration.Inf)
    finally pool.shutdown()
  }

  /** Export the given tables under one session. Mirrors
    * `Export#specified_tables` (export.rb:68-97) + worker semantics
    * (worker.rb:85-99): already-recorded tables are skipped
    * (idempotent re-run), empty tables short-circuit, per-table errors
    * are recorded and don't abort the session.
    */
  def exportAll(specs: Seq[ExportSpec], clusterName: String,
                sessionName: String, destRoot: String, nowMs: Long,
                specifiedStart: Long = 0L,
                specifiedEnd: Long = Long.MaxValue): SessionSummary = {
    cat.startInfo(BackupSession("export", clusterName, sessionName,
      destRoot, specifiedStart, specifiedEnd, nowMs, 0L,
      error = false, ""))

    val outcomes = runBounded(specs) { spec =>
      // worker.rb:85-87 — skip if this (session, table) is already
      // recorded: idempotent re-run of a crashed session.
      if (cat.exists("export", spec.table, sessionName))
        Exporter.Skipped(spec.table): Outcome
      else {
        // two retry scopes: the data half is Overwrite-idempotent (safe
        // to replay); the record half appends — replaying it after a
        // SUCCESSFUL append would duplicate catalog rows, so it only
        // ever retries its own (nothing-committed) failures.
        val (outcome, descs) =
          Retry.withRetry(maxAttempts, retryBaseDelayMs, sleep) {
            exportAttempt(spec, sessionName, destRoot)
          }
        Retry.withRetry(maxAttempts, retryBaseDelayMs, sleep) {
          recordExport(spec, sessionName, outcome, descs)
        }
        outcome
      }
    } { (spec, e) =>
      // bury: one error row for the final verdict (worker.rb:41-47)
      Exporter.recordExportFailure(cat, spec, sessionName, e)
      Exporter.Failed(spec.table, e)
    }

    val failures = outcomes.collect { case f: Exporter.Failed => f }
    cat.endInfo("export", sessionName, endedAt = nowMs + 1,
      error = failures.nonEmpty,
      errorInfo = failures.map(f => s"${f.table}: ${f.e.getMessage}")
        .mkString("; ").take(500))
    SessionSummary(sessionName, outcomes)
  }

  /** Restore fan-out — `Import#specified_tables` (import.rb:46-90):
    * resolve requested tables against the export catalog (hard failure
    * listing anything missing, import.rb:56-63), then import each
    * concurrently into `targetRoot/<table>`, recording into the
    * import-side catalog, finalizing only after completion.
    *
    * `sessionName` selects WHICH export to restore (paths, catalog
    * lookups); the import RUN records under its own
    * `importSessionName` (default: same) — the reference's
    * `--import-session-name` (cli.rb:257-264), so two restores of one
    * backup are distinguishable sessions in the import catalog.
    */
  def importAll(exportCat: BackupCatalog, requested: Seq[String],
                clusterName: String, sessionName: String, destRoot: String,
                targetRoot: String, nowMs: Long,
                importSessionName: Option[String] = None,
                format: String = "parquet")
      : Seq[Importer.Outcome] = {
    val importSession = importSessionName.getOrElse(sessionName)
    val tables = Importer.resolveRequested(exportCat, sessionName,
      destRoot, requested)
    cat.startInfo(BackupSession("import", clusterName, importSession,
      destRoot, 0L, 0L, nowMs, 0L, error = false, ""))

    val outcomes = runBounded(tables) { t =>
      // same two-scope retry split as the export path
      val imported = Retry.withRetry(maxAttempts, retryBaseDelayMs, sleep) {
        importAttempt(exportCat, t, sessionName, destRoot, s"$targetRoot/$t",
          format)
      }
      Retry.withRetry(maxAttempts, retryBaseDelayMs, sleep) {
        Importer.recordImportOutcome(cat, t, importSession, imported)
      }
      imported: Importer.Outcome
    } { (t, e) =>
      Importer.recordImportFailure(cat, t, importSession, e)
      Importer.Failed(t, e)
    }

    val failures = outcomes.collect { case f: Importer.Failed => f }
    cat.endInfo("import", importSession, endedAt = nowMs + 1,
      error = failures.nonEmpty,
      errorInfo = failures.map(f => s"${f.table}: ${f.e.getMessage}")
        .mkString("; ").take(500))
    outcomes
  }
}

object BackupRunner {
  final case class SessionSummary(sessionName: String,
                                  outcomes: Seq[Exporter.Outcome]) {
    def failed: Seq[Exporter.Outcome] = outcomes.collect {
      case f: Exporter.Failed => f
    }
  }
}
