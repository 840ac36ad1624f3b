package graft.engine

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkTestBase {

  /** Fraction of output files whose [min,max] range on `c` overlaps
    * the given point — what parquet row-group pruning would have to
    * read for an equality predicate.
    */
  private def overlapFraction(dir: String, c: String, v: Double): Double = {
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    val hit = files.count { f =>
      val r = spark.read.parquet(f)
        .agg(min(col(c).cast("double")), max(col(c).cast("double"))).head()
      r.getDouble(0) <= v && v <= r.getDouble(1)
    }
    hit.toDouble / files.length
  }

  private def write(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").parquet(dir)

  test("z-order prunes on BOTH dimensions; linear sort only on the first") {
    val li = spark.read.parquet(Tables.path(sf0001, "lineitem"))
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val n = 16
    val zDir = tmpDir("layout-z")
    val linDir = tmpDir("layout-lin")
    write(Layout.zorderBy(li, Seq("l_orderkey", "l_partkey"), n), zDir)
    write(li.repartitionByRange(n, col("l_orderkey"), col("l_partkey"))
      .sortWithinPartitions("l_orderkey", "l_partkey"), linDir)

    val okMid = li.agg(percentile_approx(col("l_orderkey").cast("double"),
      lit(0.5), lit(1000))).head().getDouble(0)
    val pkMid = li.agg(percentile_approx(col("l_partkey").cast("double"),
      lit(0.5), lit(1000))).head().getDouble(0)

    val zOk = overlapFraction(zDir, "l_orderkey", okMid)
    val zPk = overlapFraction(zDir, "l_partkey", pkMid)
    val linOk = overlapFraction(linDir, "l_orderkey", okMid)
    val linPk = overlapFraction(linDir, "l_partkey", pkMid)

    // linear layout: first key prunes hard, second key reads ~everything
    assert(linOk <= 0.25, s"linear primary-key pruning broken: $linOk")
    assert(linPk >= 0.8, s"expected no secondary pruning, got $linPk")
    // z-order: BOTH dimensions prune to a strict subset. Absolute
    // bounds leave one file of slack (10/16): repartitionByRange
    // samples boundaries with an rddId-derived seed, so SUITE ORDER
    // shifts file cuts by ±1 — the load-bearing contract is the
    // relative comparison against the linear layout below.
    assert(zOk <= 0.625, s"z-order dim1 overlap $zOk")
    assert(zPk <= 0.625, s"z-order dim2 overlap $zPk")
    assert(zPk < linPk / 1.5,
      s"z-order must beat linear on the second dim: $zPk vs $linPk")
  }

  test("degenerate inputs: empty frame and all-null column z-order " +
    "without crashing; existing zorder column survives") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Double)].toDF("k", "v")
    assert(Layout.zValue(empty, Seq("k", "v")).count() == 0)
    assert(Layout.zorderBy(empty, Seq("k", "v"), 4).count() == 0)
    val allNull = Seq((1L, null), (2L, null))
      .map { case (k, v) => (k, v.asInstanceOf[java.lang.Double]) }
      .toDF("k", "v")
    val z = Layout.zValue(allNull, Seq("v"))
    assert(z.count() == 2 &&
      z.select("zorder").distinct().head().getLong(0) == 0L,
      "all-null column must collapse to bucket 0, not NPE")
    // a user column literally named `zorder` is data, not a helper
    val named = Seq((1L, 2.0, "keep"), (3L, 4.0, "me"))
      .toDF("k", "v", "zorder")
    val out = Layout.zorderBy(named, Seq("k", "v"), 2)
    assert(out.columns.contains("zorder") &&
      out.select("zorder").as[String].collect().toSet == Set("keep", "me"),
      "zorderBy clobbered a user column named 'zorder'")
    // zValue's default output name collides loudly instead of silently
    intercept[IllegalArgumentException] {
      Layout.zValue(named, Seq("k", "v"))
    }
  }

  test("compact --zorder on an empty directory is a no-op report") {
    val dir = tmpDir("layout-empty") + "/t"
    val f = new java.io.File(dir); f.mkdirs()
    val rep = Compactor.compact(spark, dir, zorderCols = Seq("k"))
    assert(!rep.compacted && rep.filesBefore == 0 && rep.rows == 0L,
      s"expected a no-op on an empty dir, got $rep")
  }

  test("z-value interleaving is balanced and deterministic") {
    val li = spark.read.parquet(Tables.path(sf0001, "lineitem"))
      .select("l_orderkey", "l_partkey")
    val z1 = Layout.zValue(li, Seq("l_orderkey", "l_partkey"), bits = 4)
    val z2 = Layout.zValue(li.repartition(7),
      Seq("l_orderkey", "l_partkey"), bits = 4)
    // deterministic under repartitioning (quantile sketch is merged
    // commutatively; GK is deterministic for a fixed dataset)
    assert(z1.agg(sum("zorder")).head().getLong(0) ==
      z2.agg(sum("zorder")).head().getLong(0))
    // 4+4 bits → z in [0, 256); quantile buckets keep occupancy even:
    // no z octant may hold more than 3x its fair share
    val byOctant = z1.groupBy((col("zorder") / 32).cast("int").as("o"))
      .count().collect().map(_.getLong(1))
    val total = byOctant.sum.toDouble
    assert(byOctant.forall(_ < total / 8 * 3),
      s"skewed octants: ${byOctant.mkString(",")}")
  }
}
