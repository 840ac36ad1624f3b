package graft.engine

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class ZoneMapSpec extends SparkTestBase {

  private def writeSorted(dir: String): Unit =
    spark.read.parquet(Tables.path(sf0001, "lineitem"))
      .select("l_orderkey", "l_partkey", "l_extendedprice", "l_shipdate")
      .repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(dir)

  test("manifest stats match the actual per-file min/max and row count") {
    val dir = tmpDir("zm") + "/t"
    writeSorted(dir)
    val idx = ZoneMap.build(spark, dir, Seq("l_orderkey", "l_extendedprice"))
      .collect()
    assert(idx.map(_.file).distinct.length == 8)
    // verify every entry against a real scan of its file
    idx.filter(_.column == "l_orderkey").foreach { e =>
      val r = spark.read.parquet(e.file)
        .agg(min(col("l_orderkey").cast("double")),
          max(col("l_orderkey").cast("double")), count(lit(1))).head()
      assert(e.min_v == r.getDouble(0) && e.max_v == r.getDouble(1) &&
        e.rows == r.getLong(2), s"stat mismatch for ${e.file}: $e vs $r")
    }
  }

  test("pruned read is exact and reads strictly fewer files") {
    val dir = tmpDir("zm") + "/t2"
    writeSorted(dir)
    val cols = Seq("l_orderkey")
    val idx = ZoneMap.build(spark, dir, cols).toDF()
    val li = spark.read.parquet(dir)
    val mid = li.agg(percentile_approx(col("l_orderkey").cast("double"),
      lit(0.5), lit(1000))).head().getDouble(0)
    val (lo, hi) = (mid, mid + 50)
    val pruned = ZoneMap.prunedRead(spark, dir, idx, "l_orderkey", lo, hi)
      .filter(col("l_orderkey").cast("double").between(lo, hi))
    val full = li.filter(col("l_orderkey").cast("double").between(lo, hi))
    assert(pruned.except(full).isEmpty && full.except(pruned).isEmpty,
      "pruning changed the answer")
    // range-sorted layout: a narrow key range must hit few of 8 files
    val nKept = ZoneMap.pruneFiles(idx,
      idx.select("file").distinct().collect().map(_.getString(0)).toSeq,
      "l_orderkey", lo, hi).length
    assert(nKept <= 2, s"expected <=2 overlapping files, got $nKept")
  }

  test("unknown files are never pruned; disjoint range prunes everything") {
    val dir = tmpDir("zm") + "/t3"
    writeSorted(dir)
    val idx = ZoneMap.build(spark, dir, Seq("l_orderkey")).toDF()
    val unknown = Seq("mystery.parquet")
    val kept = ZoneMap.pruneFiles(idx, unknown, "l_orderkey", 0, 1)
    assert(kept == unknown, "files without stats must be read, not dropped")
    val none = ZoneMap.prunedRead(spark, dir, idx, "l_orderkey",
      -100.0, -1.0)
    assert(none.isEmpty, "disjoint range must read zero files")
  }

  test("a streaming-sink destination indexes only committed files " +
    "(orphans from a crashed batch are invisible)") {
    val srcDir = tmpDir("zm-stream-src")
    val dest = tmpDir("zm-stream") + "/dest"
    val li = spark.read.parquet(Tables.path(sf0001, "lineitem"))
      .select("l_orderkey", "l_partkey")
    li.coalesce(1).write.mode("overwrite").parquet(srcDir)
    val q = spark.readStream.schema(li.schema).parquet(srcDir)
      .writeStream.format("parquet")
      .option("path", dest)
      .option("checkpointLocation", tmpDir("zm-stream-ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val committedEntries = ZoneMap.build(spark, dest, Seq("l_orderkey"))
      .collect()
    // plant an orphan (a crashed micro-batch's torn file) by copying a
    // committed file under an uncommitted name: a batch read honors
    // _spark_metadata and ignores it — so must the index
    val f = new java.io.File(dest).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(f.toPath,
      java.nio.file.Paths.get(dest, "part-orphan-torn.parquet"))
    val after = ZoneMap.build(spark, dest, Seq("l_orderkey")).collect()
    assert(after.map(_.file).toSet == committedEntries.map(_.file).toSet,
      "orphan file leaked into the manifest")
  }

  test("distributed (executor-side) build is row-identical to the " +
    "driver-side twin") {
    val dir = tmpDir("zm") + "/t-parity"
    writeSorted(dir)
    val cols = Seq("l_orderkey", "l_extendedprice")
    val dist = ZoneMap.entries(spark, dir, cols)
      .sortBy(e => (e.file, e.column))
    val local = ZoneMap.entriesLocal(spark, dir, cols)
      .sortBy(e => (e.file, e.column))
    assert(dist == local, "executor-built manifest diverged from the " +
      "driver-built one")
    assert(dist.nonEmpty)
  }

  test("a dotted ancestor OF the scan root does not hide its files") {
    // the exact case the isDataFile doc claims to handle: a
    // destination like ~/.local/share/... — the dot is above the
    // root, so nothing under it is hidden
    val dir = tmpDir("zm-dotted") + "/.local/dest"
    writeSorted(dir)
    val idx = ZoneMap.build(spark, dir, Seq("l_orderkey"))
    assert(idx.count() == 8,
      "files under a dotted ancestor of the root vanished from the manifest")
    val df = ZoneMap.prunedRead(spark, dir, idx.toDF(), "l_orderkey",
      Double.NegativeInfinity, Double.PositiveInfinity)
    assert(df.count() == spark.read.parquet(dir).count(),
      "prunedRead lost rows under a dotted ancestor root")
  }

  test("pruned read of a hive-partitioned layout keeps partition columns") {
    val dir = tmpDir("zm-hive") + "/t"
    spark.read.parquet(Tables.path(sf0001, "lineitem"))
      .select(col("l_orderkey"), col("l_extendedprice"),
        col("l_linenumber"))
      .write.partitionBy("l_linenumber").mode("overwrite").parquet(dir)
    val idx = ZoneMap.build(spark, dir, Seq("l_orderkey")).toDF()
    val full = spark.read.parquet(dir)
    val mid = full.agg(percentile_approx(col("l_orderkey").cast("double"),
      lit(0.5), lit(1000))).head().getDouble(0)
    val pruned = ZoneMap.prunedRead(spark, dir, idx, "l_orderkey",
      mid, mid + 50)
      .filter(col("l_orderkey").cast("double").between(mid, mid + 50))
    assert(pruned.filter(col("l_linenumber").isNull).isEmpty,
      "partition column came back null — partition discovery was lost")
    val expect = full
      .filter(col("l_orderkey").cast("double").between(mid, mid + 50))
    assert(pruned.except(expect).isEmpty && expect.except(pruned).isEmpty,
      "hive-partitioned pruned read changed the answer")
  }

  test("n_nulls counts all-null row groups; an all-null file is " +
    "prunable and exact") {
    val dir = tmpDir("zm-nulls") + "/t"
    import spark.implicits._
    // file A: mixed nulls; file B: entirely null column
    Seq[(Int, java.lang.Double)]((1, 1.0), (2, null), (3, 3.0), (4, null))
      .toDF("id", "v").coalesce(1).write.mode("overwrite").parquet(dir)
    Seq[(Int, java.lang.Double)]((5, null), (6, null))
      .toDF("id", "v").coalesce(1).write.mode("append").parquet(dir)
    val idx = ZoneMap.build(spark, dir, Seq("v")).collect()
    assert(idx.length == 2, s"expected one entry per file, got ${idx.toSeq}")
    val byMin = idx.sortBy(_.min_v)
    assert(byMin(0).n_nulls == 2 && byMin(0).min_v == 1.0 &&
      byMin(0).max_v == 3.0, s"mixed-null file stats wrong: ${byMin(0)}")
    assert(byMin(1).n_nulls == 2 &&
      byMin(1).min_v == Double.PositiveInfinity &&
      byMin(1).max_v == Double.NegativeInfinity,
      s"all-null file entry wrong: ${byMin(1)}")
    // the all-null file can never satisfy a range predicate → pruned,
    // and the answer is still exact
    val kept = ZoneMap.pruneFiles(spark.createDataset(idx.toSeq).toDF(),
      idx.map(_.file).distinct.toSeq, "v", 0.0, 10.0)
    assert(kept.length == 1, s"expected the all-null file pruned: $kept")
    val pr = ZoneMap.prunedRead(spark, dir,
      spark.createDataset(idx.toSeq).toDF(), "v", 0.0, 10.0)
      .filter(col("v").between(0.0, 10.0))
    assert(pr.count() == 2, "pruned read of null-bearing layout wrong")
  }

  test("incremental update reads only the delta and equals a full rebuild") {
    val dir = tmpDir("zm-upd") + "/t"
    writeSorted(dir)
    val cols = Seq("l_orderkey")
    ZoneMap.write(spark, dir, cols)
    // accrete a new session's files
    spark.read.parquet(Tables.path(sf0001, "lineitem"))
      .select("l_orderkey", "l_partkey", "l_extendedprice", "l_shipdate")
      .limit(500).coalesce(2).write.mode("append").parquet(dir)
    // ... and lose one original file (compaction/retention)
    val victim = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).minBy(_.getName)
    assert(victim.delete())
    new java.io.File(dir, "." + victim.getName + ".crc").delete()
    spark.catalog.refreshByPath(dir)
    ZoneMap.update(spark, dir, cols)
    val updated = spark.read.parquet(dir + "/_zonemap")
      .as[ZoneMap.Entry](org.apache.spark.sql.Encoders.product[ZoneMap.Entry])
      .collect().toSet
    val rebuilt = ZoneMap.entries(spark, dir, cols).toSet
    assert(updated == rebuilt,
      s"incremental update diverged from full rebuild: " +
        s"extra=${updated -- rebuilt} missing=${rebuilt -- updated}")
    assert(!updated.exists(_.file.endsWith(victim.getName)),
      "deleted file's rows survived the update")
    // pruning contract still holds on the updated manifest
    val pr = ZoneMap.prunedRead(spark, dir,
      spark.read.parquet(dir + "/_zonemap"), "l_orderkey",
      Double.NegativeInfinity, Double.PositiveInfinity)
    assert(pr.count() == spark.read.parquet(dir).count())
  }

  test("nothing-indexable files get a sentinel row; update is a no-op " +
    "when current and stays parity under sentinel growth") {
    import spark.implicits._
    val dir = tmpDir("zm-sentinel") + "/t"
    Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
      .coalesce(1).write.parquet(dir)
    // a file whose only indexed column is string-typed: no numeric
    // stats → zero real entries → must still join the manifest via
    // the sentinel, or update() re-reads its footer forever
    Seq(("a", "x")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    val cols = Seq("v")
    ZoneMap.write(spark, dir, cols)
    val side = spark.read.parquet(dir + "/_zonemap")
    val sentinels = side
      .filter(col("column") === ZoneMap.SentinelColumn).collect()
    assert(sentinels.length == 1,
      s"expected exactly one sentinel row: ${side.collect().toSeq}")
    // an up-to-date manifest must not be rewritten: the sidecar's
    // part files keep their names (a rewrite would mint new ones)
    def sidecarParts() = new java.io.File(dir + "/_zonemap").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).sorted.toSeq
    val partsBefore = sidecarParts()
    ZoneMap.update(spark, dir, cols)
    assert(sidecarParts() == partsBefore,
      "no-change update rewrote the sidecar (sentinel file treated " +
        "as fresh — O(delta) degraded)")
    // grow by another nothing-indexable file: update == rebuild,
    // sentinels included
    Seq(("b", "y")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    ZoneMap.update(spark, dir, cols)
    val updated = spark.read.parquet(dir + "/_zonemap")
      .as[ZoneMap.Entry](org.apache.spark.sql.Encoders.product[ZoneMap.Entry])
      .collect().toSet
    assert(updated == ZoneMap.entries(spark, dir, cols).toSet,
      "update diverged from rebuild once sentinels were involved")
    // pruning semantics: sentinel files have no stats for v — they
    // must stay in the must-read set no matter the range
    val all = updated.map(_.file).toSeq.sorted
    val kept = ZoneMap.pruneFiles(
      spark.read.parquet(dir + "/_zonemap"), all, "v", 100.0, 200.0)
    assert(kept.toSet == updated
      .filter(_.column == ZoneMap.SentinelColumn).map(_.file),
      "sentinel files must remain unknown ⇒ must-read for real columns")
  }

  test("sidecar write round-trips and is invisible to data readers") {
    val dir = tmpDir("zm") + "/t4"
    writeSorted(dir)
    val rowsBefore = spark.read.parquet(dir).count()
    val target = ZoneMap.write(spark, dir, Seq("l_orderkey"))
    val reread = spark.read.parquet(target)
    assert(reread.count() == 8, "one entry per file per column")
    assert(spark.read.parquet(dir).count() == rowsBefore,
      "sidecar leaked into the data read")
    // rebuilding the manifest must not index its own sidecar
    assert(ZoneMap.build(spark, dir, Seq("l_orderkey")).count() == 8)
  }
}
