package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Zone-map manifest: per-file min/max column statistics lifted out of
  * parquet footers into a queryable index — the restore-side
  * data-skipping complement to [[Layout]]'s z-order write.
  *
  * Why it exists when parquet already HAS footer stats: a scan still
  * pays one footer READ per file to discover them. At 100 TB /
  * millions of backup files on object storage that is millions of
  * round trips before the first data byte — per query. The manifest
  * pays them once at export/compaction time and turns every later
  * "which files can contain l_shipdate ≥ X?" into one scan of a
  * KB-sized parquet sidecar (the same zone-map idea Snowflake
  * micro-partitions and the Delta/Iceberg file-stats manifests use).
  *
  * Build cost is metadata-only (footers, no row reads, zero Spark
  * jobs — same budget class as Compactor's sizing pass and
  * TableOps.parquetRowCount). The loop is driver-side here; at
  * millions of files the identical footer read distributes trivially
  * (parallelize the path list, read footers in executors) — the
  * manifest schema and pruning contract don't change, so that upgrade
  * is local to [[build]].
  *
  * Numeric (and numeric-logical: date/timestamp) columns only —
  * binary/string min/max truncation semantics differ across writers;
  * rather than prune wrongly, non-numeric columns are omitted.
  */
object ZoneMap {

  final case class Entry(file: String, rows: Long, column: String,
                         min_v: Double, max_v: Double, n_nulls: Long)

  /** Read footer stats for `cols` across every parquet file under
    * `dir` (recursive, so partitioned layouts index too).
    */
  def entries(spark: SparkSession, dir: String,
              cols: Seq[String]): Seq[Entry] = {
    val conf = spark.sessionState.newHadoopConf()
    val want = cols.toSet
    val path = new Path(dir)
    val fs = path.getFileSystem(conf)
    val committed = committedFilter(spark, dir, fs)
    val out = Seq.newBuilder[Entry]
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      val f = it.next()
      if (isDataFile(f.getPath, path) && committed(f.getPath.toString)) {
        val rd = ParquetFileReader.open(
          HadoopInputFile.fromPath(f.getPath, conf))
        try {
          val blocks = rd.getFooter.getBlocks
          val rows = rd.getRecordCount
          // fold row-group stats up to one [min,max] per (file, col)
          val acc = scala.collection.mutable.Map
            .empty[String, (Double, Double, Long)]
          blocks.forEach { b =>
            b.getColumns.forEach { c =>
              val name = c.getPath.toDotString
              if (want(name)) {
                val st = c.getStatistics
                if (st != null && st.hasNonNullValue) {
                  (numeric(st.genericGetMin), numeric(st.genericGetMax))
                  match {
                    case (Some(lo), Some(hi)) =>
                      val prev = acc.getOrElse(name,
                        (Double.PositiveInfinity, Double.NegativeInfinity,
                          0L))
                      acc(name) = (math.min(prev._1, lo),
                        math.max(prev._2, hi),
                        prev._3 + st.getNumNulls)
                    case _ => ()
                  }
                }
              }
            }
          }
          acc.foreach { case (c, (lo, hi, nn)) =>
            out += Entry(f.getPath.toString, rows, c, lo, hi, nn)
          }
        } finally rd.close()
      }
    }
    out.result()
  }

  /** A data file: .parquet, and no hidden/underscore path segment
    * BELOW the scan root (excludes _zonemap itself, _spark_metadata,
    * .staging dirs — but a dotted ancestor of the root, e.g. a
    * `/home/u/.local/...` destination, must not hide everything).
    */
  private def isDataFile(p: Path, root: Path): Boolean = {
    var cur = p.getParent
    var hidden = p.getName.startsWith("_") || p.getName.startsWith(".")
    while (cur != null && cur != root && !hidden) {
      val n = cur.getName
      if (n.startsWith("_") || n.startsWith(".")) hidden = true
      cur = cur.getParent
    }
    p.getName.endsWith(".parquet") && !hidden
  }

  /** Committed-file filter: a streaming file sink's `_spark_metadata`
    * commit log is the source of truth for that directory — a raw
    * listing would also pick up orphan files from a crashed
    * micro-batch that a batch read (which honors the log) never sees.
    * When the log exists, restrict to the files the committed view
    * reads; otherwise accept everything.
    */
  private def committedFilter(spark: SparkSession, dir: String,
                              fs: org.apache.hadoop.fs.FileSystem)
      : String => Boolean = {
    val meta = new Path(dir, "_spark_metadata")
    if (!fs.exists(meta)) (_: String) => true
    else {
      val committed = spark.read.parquet(dir).inputFiles
        .map(u => new Path(java.net.URI.create(u)).toUri.getPath).toSet
      (f: String) => committed(new Path(f).toUri.getPath)
    }
  }

  private def numeric(v: Any): Option[Double] = v match {
    case n: java.lang.Number => Some(n.doubleValue)
    case _ => None // binary/string stats: omitted, never mis-pruned
  }

  /** The manifest as a Dataset (for joining/inspection). */
  def build(spark: SparkSession, dir: String,
            cols: Seq[String]): Dataset[Entry] = {
    import spark.implicits._
    spark.createDataset(entries(spark, dir, cols))
  }

  /** Persist the manifest as a parquet sidecar next to the data
    * (underscore-prefixed: data readers and the manifest build itself
    * ignore it). A rewrite (compaction, re-layout) changes the file
    * set — rebuild the manifest afterwards.
    */
  def write(spark: SparkSession, dir: String, cols: Seq[String]): String = {
    val target = dir + "/_zonemap"
    build(spark, dir, cols).coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(target)
    target
  }

  /** Files whose [min,max] zone for `column` intersects [lo, hi] —
    * plus files with no entry for the column (unknown ⇒ must read:
    * pruning may only ever drop provably-disjoint files).
    */
  def pruneFiles(index: DataFrame, allFiles: Seq[String], column: String,
                 lo: Double, hi: Double): Seq[String] = {
    val known = index.filter(col("column") === column)
      .select(col("file"), col("min_v"), col("max_v"))
      .collect()
    val knownFiles = known.map(_.getString(0)).toSet
    val keep = known.collect {
      case r if r.getDouble(1) <= hi && lo <= r.getDouble(2) =>
        r.getString(0)
    }.toSet
    allFiles.filter(f => keep(f) || !knownFiles(f))
  }

  /** Read only the files that can satisfy `column ∈ [lo, hi]` — the
    * caller applies the row-level filter on top (zones admit false
    * positives, never false negatives).
    */
  def prunedRead(spark: SparkSession, dir: String, index: DataFrame,
                 column: String, lo: Double, hi: Double): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    val allFiles = listParquet(spark, dir)
    val files = pruneFiles(index, allFiles, column, lo, hi)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(files: _*)
  }

  private def listParquet(spark: SparkSession, dir: String): Seq[String] = {
    val conf = spark.sessionState.newHadoopConf()
    val path = new Path(dir)
    val fs = path.getFileSystem(conf)
    val committed = committedFilter(spark, dir, fs)
    val out = Seq.newBuilder[String]
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      val f = it.next()
      if (isDataFile(f.getPath, path) && committed(f.getPath.toString))
        out += f.getPath.toString
    }
    out.result()
  }
}
