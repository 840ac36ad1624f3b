package graft.engine

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small-file compaction for export destinations.
  *
  * A long-running incremental backup pipeline (the reference re-exports
  * each table's new window per session — export.rb:145-169) accretes
  * one file set per session; at 100 TB / thousands of sessions the
  * destination degenerates into millions of KB-sized files, and every
  * restore or analytic scan pays file-listing + per-file open cost that
  * dwarfs the actual IO. Compaction rewrites a destination directory
  * into ~targetBytes-sized files, preserving rows, schema, Hive
  * partition layout, and sidecar files.
  *
  * Scale design:
  *  - sizing is metadata-only (FileSystem.listStatus byte sums + parquet
  *    footer row counts) — zero Spark jobs before the decision, so a
  *    fleet-wide "compact if beneficial" sweep over thousands of tables
  *    is cheap;
  *  - the rewrite is a narrow `coalesce` (no shuffle) reading the very
  *    row groups it replaces;
  *  - partitioned layouts compact each leaf partition independently —
  *    the unit of rewrite (and of failure) is one partition, never the
  *    table;
  *  - the swap is the catalog's checked-rename protocol (dir → __old,
  *    tmp → dir, drop __old): a crash can leave a stale __old copy but
  *    never a half-written destination, and `recover` restores a
  *    destination whose swap died between the renames;
  *  - a footer-count integrity gate (rows after == rows before) aborts
  *    the swap rather than publishing a lossy rewrite.
  *
  * Parquet-only by design: the footer row count is what makes the
  * integrity gate and the sizing decision free; text formats would need
  * a full scan to know either.
  */
object Compactor {

  final case class Report(dir: String, filesBefore: Int, filesAfter: Int,
                          bytes: Long, rows: Long, compacted: Boolean)

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataFiles(f: FileSystem, dir: Path) =
    f.listStatus(dir).filter { s =>
      val n = s.getPath.getName
      s.isFile && !n.startsWith("_") && !n.startsWith(".")
    }

  private def partitionDirs(f: FileSystem, dir: Path): Seq[Path] =
    f.listStatus(dir).filter(s => s.isDirectory &&
      s.getPath.getName.contains("=")).map(_.getPath).toSeq

  /** Crash recovery: a swap that died after staging leaves
    * `<dir>__old` with no `<dir>` — the old copy is the truth.
    */
  def recover(spark: SparkSession, dir: String): Unit = {
    val f = fs(spark, dir)
    val (p, pOld) = (new Path(dir), new Path(dir + "__old"))
    if (!f.exists(p) && f.exists(pOld))
      require(f.rename(pOld, p), s"compaction recovery failed for $dir")
  }

  /** Compact one directory (recursing into Hive partition dirs) to
    * ~targetBytes files. No-ops (and says so in the report) when the
    * directory already has few enough files.
    */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 512L << 20): Report = {
    recover(spark, dir)
    val f = fs(spark, dir)
    val root = new Path(dir)
    val parts = partitionDirs(f, root)
    if (parts.nonEmpty) {
      // leaf-partition recursion: each partition is its own rewrite
      // unit; the layout (and partition pruning on restore) survives
      val reports = parts.map(p => compact(spark, p.toString, targetBytes))
      return Report(dir, reports.map(_.filesBefore).sum,
        reports.map(_.filesAfter).sum, reports.map(_.bytes).sum,
        reports.map(_.rows).sum, reports.exists(_.compacted))
    }

    val files = dataFiles(f, root)
    val bytes = files.map(_.getLen).sum
    val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    if (files.length <= nOut)
      return Report(dir, files.length, files.length, bytes,
        TableOps.parquetRowCount(spark, dir), compacted = false)

    val rowsBefore = TableOps.parquetRowCount(spark, dir)
    val tmp = dir + "__compact_tmp"
    f.delete(new Path(tmp), true)
    spark.read.parquet(dir).coalesce(nOut)
      .write.mode("overwrite").parquet(tmp)

    val rowsAfter = TableOps.parquetRowCount(spark, tmp)
    if (rowsAfter != rowsBefore) {
      f.delete(new Path(tmp), true)
      throw new IllegalStateException(
        s"compaction of $dir dropped rows ($rowsBefore -> $rowsAfter); aborted")
    }
    // sidecars (_export_info.log etc.) move into the rewrite before the
    // swap so the published dir keeps its provenance; the rewrite's own
    // _SUCCESS already exists in tmp
    f.listStatus(root).filter { s =>
      val n = s.getPath.getName
      s.isFile && n.startsWith("_") && n != "_SUCCESS"
    }.foreach { s =>
      require(f.rename(s.getPath, new Path(tmp, s.getPath.getName)),
        s"cannot carry sidecar ${s.getPath} into the compacted dir")
    }
    val (p, pTmp, pOld) = (root, new Path(tmp), new Path(dir + "__old"))
    if (f.exists(pOld)) require(f.delete(pOld, true), s"cannot clear $pOld")
    require(f.rename(p, pOld), s"cannot stage $p to $pOld")
    if (!f.rename(pTmp, p)) {
      f.rename(pOld, p) // roll back: never leave the dest missing
      throw new IllegalStateException(s"cannot swap $pTmp into $p")
    }
    f.delete(pOld, true)
    val after = dataFiles(f, root)
    Report(dir, files.length, after.length, after.map(_.getLen).sum,
      rowsAfter, compacted = true)
  }
}
