package graft.engine

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** The bucketed-layout contract: joins on the bucket key plan no
  * exchange (the write-time shuffle is amortized over every later
  * join), and results equal the unbucketed join.
  */
class BucketedExportSpec extends SparkTestBase {

  test("session names with metastore-hostile characters still export") {
    val dir = tmpDir("bucketed-dash")
    val cat = new graft.catalog.BackupCatalog(spark, tmpDir("bk-cat-dash"))
    val r = Tables.region(spark, sf0001)
    val out = Exporter.exportBucketed(spark, cat, r, "bk_region",
      "run-2026.08.12", s"$dir/region", Seq("r_regionkey"), 2)
    assert(out.isInstanceOf[Exporter.Exported], out)
    assert(spark.table(
      Exporter.bucketedTableName("bk_region", "run-2026.08.12"))
      .count() == 5)
  }

  test("join on the bucket key is exchange-free and result-identical") {
    val dir = tmpDir("bucketed")
    val cat = new graft.catalog.BackupCatalog(spark, tmpDir("bk-cat"))
    val li = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_totalprice")
    val out1 = Exporter.exportBucketed(spark, cat, li, "bk_lineitem",
      "s1", s"$dir/lineitem", Seq("l_orderkey"), 4)
    Exporter.exportBucketed(spark, cat, o, "bk_orders",
      "s1", s"$dir/orders", Seq("o_orderkey"), 4)
    // bucketed exports land in the catalog like any other export
    assert(out1.isInstanceOf[Exporter.Exported])
    assert(cat.exists("export", "bk_lineitem", "s1"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join path: broadcast would trivially avoid the
      // exchange we are asserting the bucketing avoids
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table(Exporter.bucketedTableName("bk_lineitem", "s1"))
        .join(spark.table(Exporter.bucketedTableName("bk_orders", "s1")),
          col("l_orderkey") === col("o_orderkey"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"bucketed join should be exchange-free:\n${p.take(600)}")
      // same rows as the plain (unbucketed) join
      val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      assert(joined.count() == plain.count())
      assert(joined.except(plain).isEmpty && plain.except(joined).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bk_lineitem_s1")
      spark.sql("DROP TABLE IF EXISTS bk_orders_s1")
    }
  }

  test("two sessions' bucketed exports of one table coexist in the metastore") {
    // a bare-table identifier would let session 2's Overwrite replace
    // session 1's entry and orphan its bucket metadata
    val dir = tmpDir("bucketed-two")
    val cat = new graft.catalog.BackupCatalog(spark, tmpDir("bk-cat3"))
    val li = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
    Exporter.exportBucketed(spark, cat, li, "bk_two",
      "s1", s"$dir/s1", Seq("l_orderkey"), 4)
    Exporter.exportBucketed(spark, cat, li, "bk_two",
      "s2", s"$dir/s2", Seq("l_orderkey"), 4)
    try {
      val n1 = spark.table(Exporter.bucketedTableName("bk_two", "s1")).count()
      val n2 = spark.table(Exporter.bucketedTableName("bk_two", "s2")).count()
      assert(n1 == n2 && n1 == li.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_two_s1")
      spark.sql("DROP TABLE IF EXISTS bk_two_s2")
    }
  }

  test("aggregation on the bucket key needs no shuffle") {
    val dir = tmpDir("bucketed-agg")
    val cat = new graft.catalog.BackupCatalog(spark, tmpDir("bk-cat2"))
    val li = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_quantity")
    Exporter.exportBucketed(spark, cat, li, "bk_li_agg",
      "s1", s"$dir/lineitem", Seq("l_orderkey"), 4)
    try {
      val agg = spark.table(Exporter.bucketedTableName("bk_li_agg", "s1"))
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"))
      agg.collect()
      val p = agg.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"bucketed aggregation should be shuffle-free:\n${p.take(600)}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_li_agg_s1")
    }
  }
}
