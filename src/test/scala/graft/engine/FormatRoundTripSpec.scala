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
