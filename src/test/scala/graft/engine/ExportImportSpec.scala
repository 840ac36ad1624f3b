package graft.engine

import graft.{SparkTestBase, Tables}
import graft.catalog.BackupCatalog
import graft.engine.Exporter.ExportSpec
import org.apache.spark.sql.functions._

class ExportImportSpec extends SparkTestBase {

  private val T1998 = 883612800000L
  private val T2000 = 946684800000L

  test("export writes <root>/<session>/<table>/ with the window applied") {
    val cat = new BackupCatalog(spark, tmpDir("cat"))
    val root = tmpDir("bk")
    val spec = ExportSpec("lineitem", Tables.path(sf0001, "lineitem"),
      tsCol = Some("l_shipdate"), startMs = T1998, endMs = T2000)
    val out = Exporter.exportTable(spark, cat, spec, "20240101_000000", root)

    val exported = out.asInstanceOf[Exporter.Exported]
    assert(exported.dest == s"$root/20240101_000000/lineitem")
    val written = spark.read.parquet(exported.dest)
    val expected = Tables.lineitem(spark, sf0001)
      .filter(col("l_shipdate") >= timestamp_millis(lit(T1998)) &&
        col("l_shipdate") < timestamp_millis(lit(T2000)))
    assert(written.count() == expected.count())
    assert(exported.rows == expected.count())
    // catalog rows recorded: table record + one descriptor per column
    assert(cat.exists("export", "lineitem", "20240101_000000"))
    assert(cat.columnDescriptorRows("20240101_000000", "lineitem")
      .map(_.name).toSet == written.columns.toSet)
  }

  test("empty-table short-circuit records empty=true, writes nothing") {
    val cat = new BackupCatalog(spark, tmpDir("cat"))
    val root = tmpDir("bk")
    val emptySrc = tmpDir("empty-src") + "/t"
    Tables.lineitem(spark, sf0001).filter(col("l_quantity") < 0)
      .write.parquet(emptySrc)
    val out = Exporter.exportTable(spark, cat,
      ExportSpec("empty_t", emptySrc), "s1", root)
    assert(out == Exporter.Empty("empty_t"))
    assert(!new java.io.File(s"$root/s1/empty_t").exists())
    val rec = cat.tables.collect().head
    assert(rec.empty && !rec.error && rec.row_count == 0L)
  }

  test("version cap keeps latest N per key with deterministic tiebreak") {
    val ev = Tables.eventsTs(spark, sf0001)
    val capped = Exporter.versionCap(ev, Seq("user_id"), "ts",
      tieBreakCols = Seq("event_id"), versions = 3)
    val counts = capped.groupBy("user_id").count().collect()
    assert(counts.forall(_.getAs[Long]("count") <= 3))
    // the kept rows are the max-ts ones
    val userMax = ev.groupBy("user_id").agg(max("ts_ns").as("m"))
    val joined = capped.join(userMax, "user_id")
      .filter(col("ts_ns") === col("m"))
    assert(joined.count() == userMax.count())
  }

  test("partitioned export writes Hive dirs and prunes partition scans") {
    val cat = new graft.catalog.BackupCatalog(spark, tmpDir("cat"))
    val root = tmpDir("bk")
    // derive a ship-year partition column on the way out
    val src = tmpDir("src") + "/li"
    Tables.lineitem(spark, sf0001)
      .withColumn("ship_year", org.apache.spark.sql.functions.year(
        col("l_shipdate"))).write.parquet(src)
    val out = Exporter.exportTable(spark, cat,
      Exporter.ExportSpec("lineitem", src, partitionBy = Seq("ship_year")),
      "s1", root).asInstanceOf[Exporter.Exported]
    val dirs = new java.io.File(out.dest).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.exists(_.startsWith("ship_year=1995")))
    // partition filter prunes to one directory's worth of rows
    val pruned = spark.read.parquet(out.dest)
      .filter(col("ship_year") === 1996)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(ship_year"),
      plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse(""))
    val expected = Tables.lineitem(spark, sf0001)
      .filter(org.apache.spark.sql.functions.year(col("l_shipdate")) === 1996)
    assert(pruned.count() == expected.count())
  }

  test("failed export records an error row and returns Failed") {
    val cat = new BackupCatalog(spark, tmpDir("cat"))
    val out = Exporter.exportTable(spark, cat,
      ExportSpec("nope", "/nonexistent/path"), "s1", tmpDir("bk"))
    assert(out.isInstanceOf[Exporter.Failed])
    val rec = cat.tables.collect().head
    assert(rec.error && rec.table_name == "nope" && rec.row_count == -1L)
  }

  test("import round-trip: export → create → import reproduces rows") {
    val expCat = new BackupCatalog(spark, tmpDir("cat-exp"))
    val impCat = new BackupCatalog(spark, tmpDir("cat-imp"))
    val root = tmpDir("bk")
    val target = tmpDir("restore") + "/orders"
    Exporter.exportTable(spark, expCat,
      ExportSpec("orders", Tables.path(sf0001, "orders")), "s1", root)

    val out = Importer.importTable(spark, expCat, impCat, "orders",
      "s1", root, target)
    val imported = out.asInstanceOf[Importer.Imported]
    val orig = Tables.orders(spark, sf0001)
    assert(imported.rows == orig.count())
    assert(spark.read.parquet(target).count() == orig.count())
    // append semantics: importing again doubles (Hadoop Import appends)
    Importer.importTable(spark, expCat, impCat, "orders", "s1", root, target)
    assert(spark.read.parquet(target).count() == 2 * orig.count())
    assert(impCat.tables.count() == 2)
  }

  test("schema is validated against catalog descriptors on import") {
    val expCat = new BackupCatalog(spark, tmpDir("cat-exp"))
    val impCat = new BackupCatalog(spark, tmpDir("cat-imp"))
    val root = tmpDir("bk")
    Exporter.exportTable(spark, expCat,
      ExportSpec("nation", Tables.path(sf0001, "nation")), "s1", root)
    // corrupt the exported files with a different schema
    Tables.region(spark, sf0001).write.mode("overwrite")
      .parquet(s"$root/s1/nation")
    val out = Importer.importTable(spark, expCat, impCat, "nation",
      "s1", root, tmpDir("restore") + "/nation")
    assert(out.isInstanceOf[Importer.Failed])
    assert(impCat.tables.collect().head.error)
  }

  test("resolveRequested raises listing missing tables (J2)") {
    val expCat = new BackupCatalog(spark, tmpDir("cat-exp"))
    val root = tmpDir("bk")
    expCat.startInfo(graft.catalog.BackupSession("export", "c", "s1",
      root, 0L, 0L, 0L, 0L, error = false, ""))
    Exporter.exportTable(spark, expCat,
      ExportSpec("region", Tables.path(sf0001, "region")), "s1", root)
    val err = intercept[IllegalArgumentException] {
      Importer.resolveRequested(expCat, "s1", root,
        Seq("region", "ghost_table"))
    }
    assert(err.getMessage.contains("ghost_table"))
    assert(Importer.resolveRequested(expCat, "s1", root, Seq("region")) ==
      Seq("region"))
  }

  test("createTable materializes the descriptor schema (S6)") {
    val expCat = new BackupCatalog(spark, tmpDir("cat-exp"))
    val root = tmpDir("bk")
    Exporter.exportTable(spark, expCat,
      ExportSpec("supplier", Tables.path(sf0001, "supplier")), "s1", root)
    val descs = expCat.columnDescriptorRows("s1", "supplier")
    val schema = Importer.schemaFromDescriptors(descs)
    val path = tmpDir("created") + "/supplier"
    Importer.createTable(spark, schema, path)
    val created = spark.read.parquet(path)
    assert(created.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Tables.supplier(spark, sf0001).schema.fields
        .map(f => (f.name, f.dataType)).toSeq)
    assert(created.count() == 0)
  }
}
