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

    println(s"upscaled $srcDir x$k -> $dstDir")
    spark.stop()
  }
}
