package graft.engine

import graft.{SparkTestBase, Tables}
import graft.catalog.BackupCatalog
import graft.engine.Exporter.ExportSpec
import org.apache.spark.sql.functions._

/** Interchange formats (json/csv) round-trip through export → import
  * with types restored from the catalog descriptors — text containers
  * carry no schema, so the catalog is what makes restore lossless.
  */
class FormatRoundTripSpec extends SparkTestBase {

  private def roundTrip(format: String): Unit = {
    val cat = new BackupCatalog(spark, tmpDir(s"cat-$format"))
    val impCat = new BackupCatalog(spark, tmpDir(s"icat-$format"))
    val root = tmpDir(s"bk-$format")
    val target = tmpDir(s"restore-$format") + "/lineitem"
    val session = "20240101_000000"
    val spec = ExportSpec("lineitem", Tables.path(sf0001, "lineitem"),
      format = format)
    val out = Exporter.exportTable(spark, cat, spec, session, root)
    val exported = out.asInstanceOf[Exporter.Exported]
    val original = Tables.lineitem(spark, sf0001)
    assert(exported.rows == original.count())

    val imp = Importer.importTable(spark, cat, impCat, "lineitem",
      session, root, target, format = format)
    assert(imp.isInstanceOf[Importer.Imported])
    val restored = spark.read.parquet(target)
    assert(restored.schema == original.schema,
      s"$format restore changed the schema: ${restored.schema}")
    assert(restored.count() == original.count())
    assert(restored.except(original).isEmpty &&
      original.except(restored).isEmpty,
      s"$format round-trip altered data")
  }

  test("json export/import round-trips losslessly via catalog schema") {
    roundTrip("json")
  }

  test("csv export/import round-trips losslessly via catalog schema") {
    roundTrip("csv")
  }

  test("orc export/import round-trips losslessly (self-describing columnar)") {
    roundTrip("orc")
  }

  test("json restore fails loudly when a column with export-time values " +
    "is missing; an all-null column restores fine") {
    import spark.implicits._
    val cat = new BackupCatalog(spark, tmpDir("cat-jloss"))
    val impCat = new BackupCatalog(spark, tmpDir("icat-jloss"))
    // two roots: vandalizing files in place under a path the session
    // already read would only test Spark's stale FileStatusCache, not
    // the operator
    val root = tmpDir("bk-jloss")
    val root2 = tmpDir("bk-jloss2")
    val srcDir = tmpDir("src-jloss") + "/t"
    val session = "20240101_000000"
    // `gone` has real values; `ghost` is all-null (json omits it
    // entirely — legitimate); `note`'s VALUE is the string "gone" on
    // every row — after the vandalism each line still contains the
    // quoted column name, but only in value position
    // (`"note":"gone"`). A substring probe would read that as "the
    // column is in the file, the sample just missed it" and demote
    // data loss to the benign path; the key-position probe
    // (`"gone"\s*:`) must not be fooled.
    Seq((1L, "x", 10L), (2L, "y", 20L), (3L, "z", 30L))
      .toDF("id", "gone", "n")
      .withColumn("ghost", lit(null).cast("string"))
      .withColumn("note", lit("gone"))
      .write.parquet(srcDir)
    Exporter.exportTable(spark, cat,
      Exporter.ExportSpec("t", srcDir, format = "json"), session, root)
    Exporter.exportTable(spark, cat,
      Exporter.ExportSpec("t", srcDir, format = "json"), session, root2)
    // export stats recorded what a restore needs to know
    val descs = cat.columnDescriptorRows(session, "t")
    assert(descs.find(_.name == "gone").get.n_nulls == 0L)
    assert(descs.find(_.name == "ghost").get.n_nulls == 3L)
    // the all-null column is naturally absent from every json line and
    // must NOT fail the restore
    val okTarget = tmpDir("restore-jloss-ok") + "/t"
    val ok = Importer.importTable(spark, cat, impCat, "t", session, root,
      okTarget, format = "json")
    assert(ok.isInstanceOf[Importer.Imported], s"benign restore failed: $ok")
    assert(spark.read.parquet(okTarget).filter(col("ghost").isNotNull)
      .isEmpty)
    // now vandalize the second export: strip the `gone` field from
    // every line (a lost column, not a null-omitted one)
    val dest = new java.io.File(Exporter.destPath(root2, session, "t"))
    dest.listFiles().filter(_.getName.endsWith(".json")).foreach { f =>
      val lines = scala.io.Source.fromFile(f).getLines().toList
        .map(_.replaceAll(""""gone":"[^"]*",?""", ""))
      val w = new java.io.PrintWriter(f)
      lines.foreach(w.println); w.close()
    }
    // the local FS keeps .crc sidecars; the edit above invalidated them
    dest.listFiles().filter(_.getName.endsWith(".crc")).foreach(_.delete())
    // the export's own integrity read cached these files' statuses;
    // the in-place shrink invalidates them (out-of-band mutation, so
    // the refresh is on the mutator — this test — not the operator)
    spark.catalog.refreshByPath(Exporter.destPath(root2, session, "t"))
    val badTarget = tmpDir("restore-jloss-bad") + "/t"
    val bad = Importer.importTable(spark, cat, impCat, "t", session, root2,
      badTarget, format = "json")
    bad match {
      case Importer.Failed(_, e) =>
        assert(e.getMessage.contains("data loss"),
          s"expected the data-loss verdict, got: ${e.getMessage}")
      case other => fail(s"restore of a vandalized export succeeded: $other")
    }
  }

  test("csv keeps null and empty string distinct (the lossy defaults trap)") {
    import spark.implicits._
    val cat = new BackupCatalog(spark, tmpDir("cat-nulls"))
    val impCat = new BackupCatalog(spark, tmpDir("icat-nulls"))
    val root = tmpDir("bk-nulls")
    val target = tmpDir("restore-nulls") + "/t"
    val srcDir = tmpDir("src-nulls") + "/t"
    val original = Seq(
      (1L, "plain"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("id", "s")
    original.write.parquet(srcDir)
    val session = "20240101_000000"
    Exporter.exportTable(spark, cat,
      ExportSpec("t", srcDir, format = "csv"), session, root)
    Importer.importTable(spark, cat, impCat, "t", session, root, target,
      format = "csv")
    val restored = spark.read.parquet(target)
    assert(restored.count() == 3)
    assert(restored.except(original).isEmpty &&
      original.except(restored).isEmpty,
      restored.collect().mkString("; "))
  }
}
