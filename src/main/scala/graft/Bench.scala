package graft

import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed JVM/codegen warmup on the smallest sf (every query once):
    // Catalyst planning and janino codegen classes are shared across
    // scale factors, so the timed numbers then reflect steady-state
    // query cost — what a long-running cluster app pays — not
    // first-execution JIT compilation. Falls back to the bench dir
    // itself if no warm dir exists; a silent no-op warmup would skew
    // rep 1, so failures are reported (stderr keeps stdout JSON-clean).
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      "/root/testdata/sf0.001")
    val warm = if (new java.io.File(warmDir).isDirectory) warmDir else sfDir
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, warm).count()
      catch { case e: Throwable =>
        System.err.println(s"warmup $name failed: ${e.getMessage}") }
    }
    // deterministic execution order so per-query timings are
    // comparable across rounds. Each query is timed twice and the min
    // reported: this host shows multi-10s CPU-scheduling stalls under
    // JVM load that would otherwise be attributed to whichever query
    // they land on. The cache is cleared before every rep so operators
    // that materialize intermediates (dedup shingle/signature tables)
    // pay their full build cost in each measured run — the min is a
    // stall-free measurement, not a warm-cache one.
    val reps = 2
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val runs = (1 to reps).map { _ =>
          spark.sharedState.cacheManager.clearCache()
          val t0 = System.nanoTime()
          val ok = try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
          ((System.nanoTime() - t0) / 1e9, ok)
        }
        (name, runs.map(_._1).min, runs.forall(_._2))
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // a failed query must not masquerade as a fast one — surface it
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
