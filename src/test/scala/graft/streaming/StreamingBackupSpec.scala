package graft.streaming

import graft.{SparkTestBase, Tables}
import graft.catalog.BackupCatalog
import graft.engine.Exporter
import graft.engine.Exporter.{Empty, Exported, ExportSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The streaming export must agree row-for-row with the batch export
  * semantics (which are oracle-checked via e01), drain incrementally
  * on restart, and commit exactly-once.
  */
class StreamingBackupSpec extends SparkTestBase {

  private val winLo = 820454400000L // 1996-01-01 UTC
  private val winHi = 883612800000L // 1998-01-01 UTC

  /** Stage a DataFrame as ONE new parquet file in `dir` — a new file
    * arriving for the file source to discover on the next drain.
    */
  private def stage(df: DataFrame, dir: String, name: String): Unit = {
    val tmp = tmpDir("sb-stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(dir, name))
  }

  test("streaming export agrees with batch, restarts incrementally, " +
    "and re-drains as a no-op") {
    val srcDir = tmpDir("sb-src")
    val destRoot = tmpDir("sb-dest")
    val ckpt = tmpDir("sb-ckpt")
    val cat = new BackupCatalog(spark, tmpDir("sb-cat"))
    val li = spark.read.parquet(Tables.path(sf0001, "lineitem"))
    val even = li.filter(col("l_orderkey") % 2 === 0)
    val odd = li.filter(col("l_orderkey") % 2 =!= 0)
    val spec = ExportSpec("lineitem", srcDir, tsCol = Some("l_shipdate"),
      startMs = winLo, endMs = winHi)
    def windowCount(df: DataFrame): Long =
      Exporter.scanWindow(df, "l_shipdate", winLo, winHi).count()

    // drain 1: only the even half is visible
    stage(even, srcDir, "a.parquet")
    val out1 = StreamingBackup.exportTableStream(spark, cat, spec,
      "s_stream", destRoot, ckpt)
    assert(out1 == Exported("lineitem", windowCount(even),
      Exporter.destPath(destRoot, "s_stream", "lineitem")))

    // drain 2 (restart from checkpoint): a new file arrived — only the
    // delta is read, and the committed total is the full window with
    // no duplicates
    stage(odd, srcDir, "b.parquet")
    val out2 = StreamingBackup.exportTableStream(spark, cat, spec,
      "s_stream", destRoot, ckpt).asInstanceOf[Exported]
    assert(out2.rows == windowCount(li))
    val written = spark.read.schema(li.schema).parquet(out2.dest)
    val expected = Exporter.scanWindow(li, "l_shipdate", winLo, winHi)
    assert(written.except(expected).isEmpty &&
      expected.except(written).isEmpty,
      "committed rows must equal the batch window exactly (no dupes)")

    // drain 3: nothing new — idempotent no-op, count unchanged
    val out3 = StreamingBackup.exportTableStream(spark, cat, spec,
      "s_stream", destRoot, ckpt).asInstanceOf[Exported]
    assert(out3.rows == out2.rows)

    // catalog: one verdict row per drain, descriptors recorded
    val recs = cat.listTableInfo("export", "s_stream", "lineitem").collect()
    assert(recs.length == 3 &&
      recs.forall(r => !r.getAs[Boolean]("error")))
    assert(cat.columnDescriptorRows("s_stream", "lineitem").nonEmpty)
  }

  test("zone-map upkeep rides the drain: sidecar stays equal to a " +
    "full rebuild across incremental drains") {
    val srcDir = tmpDir("sb-zm-src")
    val destRoot = tmpDir("sb-zm-dest")
    val ckpt = tmpDir("sb-zm-ckpt")
    val cat = new BackupCatalog(spark, tmpDir("sb-zm-cat"))
    val li = spark.read.parquet(Tables.path(sf0001, "lineitem"))
    val spec = ExportSpec("lineitem", srcDir, tsCol = Some("l_shipdate"),
      startMs = winLo, endMs = winHi)
    val cols = Seq("l_orderkey")
    stage(li.filter(col("l_orderkey") % 2 === 0), srcDir, "a.parquet")
    val out1 = StreamingBackup.exportTableStream(spark, cat, spec,
      "s_zm", destRoot, ckpt, zonemapCols = cols).asInstanceOf[Exported]
    val sidecar = out1.dest + "/_zonemap"
    def sidecarRows() = spark.read.parquet(sidecar)
      .as[graft.engine.ZoneMap.Entry](
        org.apache.spark.sql.Encoders.product[graft.engine.ZoneMap.Entry])
      .collect().toSet
    assert(sidecarRows() ==
      graft.engine.ZoneMap.entries(spark, out1.dest, cols).toSet)
    assert(sidecarRows().nonEmpty)
    // second drain adds files; the sidecar refresh is O(delta) and
    // must still equal a from-scratch build
    stage(li.filter(col("l_orderkey") % 2 =!= 0), srcDir, "b.parquet")
    StreamingBackup.exportTableStream(spark, cat, spec,
      "s_zm", destRoot, ckpt, zonemapCols = cols)
    spark.catalog.refreshByPath(sidecar)
    assert(sidecarRows() ==
      graft.engine.ZoneMap.entries(spark, out1.dest, cols).toSet,
      "incremental sidecar diverged from a full rebuild after drain 2")
  }

  test("empty source short-circuits without starting a stream") {
    val srcDir = tmpDir("sb-empty-src")
    val li = spark.read.parquet(Tables.path(sf0001, "lineitem"))
    stage(li.limit(0), srcDir, "empty.parquet")
    val cat = new BackupCatalog(spark, tmpDir("sb-empty-cat"))
    val out = StreamingBackup.exportTableStream(spark, cat,
      ExportSpec("lineitem", srcDir), "s_e", tmpDir("sb-empty-dest"),
      tmpDir("sb-empty-ckpt"))
    assert(out == Empty("lineitem"))
    val recs = cat.listTableInfo("export", "s_e", "lineitem").collect()
    assert(recs.length == 1 && recs.head.getAs[Boolean]("empty"))
  }
}
