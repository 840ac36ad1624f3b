package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (not part of the library surface): upscale the documents/
  * embeddings corpus K-fold for scaling validation — `BENCH_sf1.json`
  * is produced by running `graft.Bench` against the output.
  *
  * The upscale is K DISJOINT SHARDS, each isomorphic to the original:
  *  - documents: replica r rotates the letter alphabet by r
  *    (`translate`), so every token — hence every shingle — differs
  *    across replicas while lengths, whitespace structure, and
  *    within-replica duplicate relations are preserved exactly.
  *  - embeddings: replica r cyclically shifts the 64 dims by r, which
  *    preserves norms and all within-replica cosines.
  *
  * Because shards share no shingles and (near-)no cross-shard
  * high-cosine pairs, pair counts, bucket populations, and cluster
  * sizes scale LINEARLY in K by construction — so a super-linear
  * runtime in a sweep over the output is the engine's plan's fault,
  * not a property of the data. (The alternative — replicating docs
  * verbatim under new ids — would make every doc a member of a
  * K-sized duplicate clique and quadratically inflate the true pair
  * set, invalidating the comparison.)
  *
  * The relational side scales the same way so the WHOLE query suite
  * can be swept, not just the dedup/ANN family:
  *  - orders/lineitem/customer/supplier/part: replica r shifts every
  *    key (primary and foreign) by r·10⁹, so FK joins stay 1:N with
  *    the original fan-out and replicas never cross-join; entity
  *    names get a `~r` suffix (names are group-by columns — reused
  *    names would merge replica groups and break output linearity).
  *    Small-domain attributes (status, priority, brand, type, dates)
  *    are kept verbatim: their group COUNT stays fixed and per-group
  *    size grows K× — the realistic shape of a business growing K×.
  *  - events: event_id/user_id shift by r·10⁹ (users are disjoint, so
  *    per-user windows/sessions/funnels scale linearly); timestamps
  *    are kept, so per-hour volume grows K×. `ts` passes through with
  *    its SOURCE type (timestamp[us] today; BIGINT nanos for a legacy
  *    TIMESTAMP(NANOS) source read via nanosAsLong), so the sweep
  *    exercises the same `Tables.eventsTs` branch as the gate corpus.
  *  - region/nation: fixed dimension tables, copied verbatim.
  *
  * Usage: UpscaleCorpus <srcSfDir> <dstDir> <K>
  */
object UpscaleCorpus {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, dstDir, kStr) = args
    val k = kStr.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val Shard = 1000000000L
    val az = "abcdefghijklmnopqrstuvwxyz"
    def rot(s: String, r: Int): String = {
      val n = r % s.length
      s.drop(n) + s.take(n)
    }

    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    (0 until k).map { r =>
      docs.select(
        (col("doc_id") + lit(r * Shard)).as("doc_id"),
        (if (r == 0) col("text")
         else translate(col("text"), az + az.toUpperCase,
           rot(az, r) + rot(az.toUpperCase, r))).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dstDir/documents.parquet")

    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    (0 until k).map { r =>
      val sh = r % 64
      emb.select(
        (col("vec_id") + lit(r * Shard)).as("vec_id"),
        (if (sh == 0) col("embedding")
         else concat(slice(col("embedding"), sh + 1, 64 - sh),
           slice(col("embedding"), 1, sh))).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dstDir/embeddings.parquet")

    // --- relational side -------------------------------------------------
    import org.apache.spark.sql.{Column, DataFrame}
    // key shift for replica r; r=0 must be the identity (bit-exact
    // originals in shard 0, same as the documents path)
    def shifted(c: String, r: Int): Column =
      if (r == 0) col(c) else (col(c) + lit(r.toLong * Shard)).as(c)
    def tagged(c: String, r: Int): Column =
      if (r == 0) col(c) else concat(col(c), lit(s"~$r")).as(c)
    def replicate(name: String, f: (DataFrame, Int) => DataFrame): Unit = {
      val src = spark.read.parquet(s"$srcDir/$name.parquet")
      (0 until k).map(r => f(src, r)).reduce(_ unionByName _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dstDir/$name.parquet")
    }

    replicate("customer", (df, r) => df.select(
      shifted("c_custkey", r), tagged("c_name", r), col("c_nationkey"),
      col("c_acctbal"), col("c_mktsegment")))
    replicate("supplier", (df, r) => df.select(
      shifted("s_suppkey", r), tagged("s_name", r), col("s_nationkey"),
      col("s_acctbal")))
    replicate("part", (df, r) => df.select(
      shifted("p_partkey", r), tagged("p_name", r), col("p_brand"),
      col("p_type"), col("p_size"), col("p_retailprice")))
    replicate("orders", (df, r) => df.select(
      shifted("o_orderkey", r), shifted("o_custkey", r),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority")))
    replicate("lineitem", (df, r) => df.select(
      shifted("l_orderkey", r), shifted("l_partkey", r),
      shifted("l_suppkey", r), col("l_linenumber"), col("l_quantity"),
      col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_returnflag"), col("l_linestatus"), col("l_shipdate")))

    // events: `ts` passes through AS-TYPED so the upscaled shard takes
    // the same Tables.eventsTs branch as the source corpus — a
    // timestamp[us] source stays timestamp[us], a legacy TIMESTAMP(NANOS)
    // source (readable only via nanosAsLong) comes out as BIGINT nanos,
    // which the LongType branch handles
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    replicate("events", (df, r) => df.select(
      shifted("event_id", r), col("ts"), shifted("user_id", r),
      col("event_type"), col("value"), col("props")))

    for (dim <- Seq("region", "nation"))
      spark.read.parquet(s"$srcDir/$dim.parquet")
        .write.mode("overwrite").parquet(s"$dstDir/$dim.parquet")

    println(s"upscaled $srcDir x$k -> $dstDir")
    spark.stop()
  }
}
