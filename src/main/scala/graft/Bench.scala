package graft

import org.apache.spark.sql.SparkSession

object Bench {

  /** The DOCUMENTED-QUADRATIC truth twins — the only queries a bench
    * run may exclude (the scaling ladder drops them because their
    * all-pairs / full-scan cost is the POINT of their existence as
    * oracle baselines; the scale paths they ground are d07/s02–s04
    * and the index-fed mining forms). This constant IS the
    * annotation: a query joins the exclusion list by being added
    * HERE, with the justification in the scaladoc of its operator —
    * `main` refuses any SPARK_GRAFT_BENCH_SKIP name outside it, and
    * BenchAuditSpec pins the ladder script's list to exactly this
    * set, so a future slow query cannot silently ride along.
    */
  val QuadraticTruthTwins: Set[String] = Set(
    "d05_embedding_dups",  // exact all-pairs cosine (d07's baseline)
    "s01_cosine_topk",     // brute-force ANN truth (s02-s04's baseline)
    "s06_ann_recall",      // embeds s01's exact side by definition
    "s12_hard_negatives")  // s01's plan + class anti-predicate

  /** Force FULL evaluation of every output column via the `noop` sink
    * — `count()` is NOT a benchmark executor: Catalyst prunes any
    * computation the row count doesn't need (a per-row feature map
    * collapses to a zero-column scan; a left-outer join against a
    * per-key aggregate is eliminated outright), so a counted "run" of
    * a map-shaped query times the parquet footer read, not the query.
    * The noop sink consumes every row of every column with zero write
    * cost, which is what the verify path (a real parquet write) pays
    * minus the I/O.
    */
  private def runFully(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Per-query state reset. Clearing the SQL cache alone is NOT
    * enough (r13 finding): operators that materialize intermediates
    * via eager `localCheckpoint` (store maintenance, the greedy MMR
    * rounds, cluster iteration) leave their RDD blocks in the
    * BlockManager — the SQL CacheManager never sees them, and the
    * async ContextCleaner only reclaims them at GC's leisure. Under a
    * 500+-execution bench JVM they accumulate in the unified-memory
    * STORAGE pool and squeeze EXECUTION memory for every later query
    * — measured as a broad 8–16% slowdown of unrelated heavy queries
    * (d08's reps grew monotonically within one run). Dropping all
    * persistent RDDs between queries restores the clean-slate
    * contract the cache clear was already claiming; nothing is
    * referenced across queries (each invocation rebuilds its plan
    * from scratch).
    */
  private def resetState(spark: SparkSession): Unit = {
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

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
    // first-execution JIT compilation. The default warm dir is the
    // sibling sf0.001 of the bench dir (portable — no hardcoded host
    // path); if absent we warn and warm on the bench dir itself (wall
    // time doubles, numbers stay valid). Failures are reported (stderr
    // keeps stdout JSON-clean).
    val warmDir = sys.env.get("SPARK_GRAFT_WARM_DIR").getOrElse {
      val sibling = new java.io.File(sfDir).getAbsoluteFile
        .getParentFile.toPath.resolve("sf0.001").toString
      if (new java.io.File(sibling).isDirectory) sibling
      else {
        System.err.println(
          s"warmup: no $sibling; warming on the bench dir itself")
        sfDir
      }
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      try runFully(fn(spark, warmDir))
      catch { case e: Throwable =>
        System.err.println(s"warmup $name failed: ${e.getMessage}") }
      resetState(spark) // warmup residue must not tax the timed reps
    }
    // Timing methodology (stall-proofing — this host shows random
    // multi-10-second CPU-scheduling stalls under JVM load that would
    // otherwise be attributed to whichever query they land on):
    //  - >=3 reps; every per-rep time is emitted so a stalled rep is
    //    VISIBLE in the output instead of silently polluting a mean;
    //  - the min is the headline (a stall can only add time), the
    //    median rides along as the skeptic's cross-check — min ≈ median
    //    means the min is reproducible, min << median means stalls hit;
    //  - query order rotates by a third of the list each rep, so a
    //    stall window covers DIFFERENT queries in different reps and
    //    the per-query min survives it;
    //  - the cache is cleared before every run so operators that
    //    materialize intermediates (dedup shingle/signature tables) pay
    //    their full build cost in each measured run.
    // default 5 (r13, was 3): the r12 driver run showed single-rep
    // scheduler stalls up to 75 s that occasionally covered a query in
    // ALL THREE reps, inflating even the min; five rotated reps make
    // that coincidence quadratically rarer at ~60% more bench wall
    // time (~20 min total at sf0.1 on 32 cpus)
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    // dev-loop subset (comma-separated names); the driver never sets
    // it, so the recorded bench always covers every query
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // exclusion twin of BENCH_ONLY (also driver-unset): the scaling
    // ladder uses it to drop the two documented all-pairs truth twins
    // (d05/s01) whose quadratic cost is the point of their existence —
    // at x30 they alone would dwarf the rest of the suite
    val skip = sys.env.get("SPARK_GRAFT_BENCH_SKIP")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    // the exclusion gate: only the documented quadratic truth twins
    // may be skipped — a recorded bench that silently dropped a slow
    // NON-twin query would overstate the engine (dev subsetting goes
    // through SPARK_GRAFT_BENCH_ONLY, which the driver never sets)
    val unsanctioned = skip -- QuadraticTruthTwins
    require(unsanctioned.isEmpty,
      s"SPARK_GRAFT_BENCH_SKIP names non-quadratic queries: " +
        s"${unsanctioned.toSeq.sorted.mkString(", ")} — only the " +
        "documented truth twins (Bench.QuadraticTruthTwins) are " +
        "excludable; use SPARK_GRAFT_BENCH_ONLY for dev subsetting")
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (k, _) => only.forall(_.contains(k)) && !skip(k) }
    val n = ordered.size
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    val failed = scala.collection.mutable.Set.empty[String]
    for (rep <- 0 until reps) {
      val rotated = {
        val shift = rep * n / reps
        ordered.drop(shift) ++ ordered.take(shift)
      }
      rotated.foreach { case (name, fn) =>
        resetState(spark)
        val t0 = System.nanoTime()
        val ok = try { runFully(fn(spark, sfDir)); true }
        catch { case _: Throwable => false }
        // a failed rep's (usually tiny) duration must not enter the
        // min/median — a fast crash would masquerade as a fast query
        if (ok) times(name) = times(name) :+ (System.nanoTime() - t0) / 1e9
        else failed += name
      }
    }
    // -1 marks a query with NO successful rep (it is also in `failed`);
    // the totals skip it rather than summing the sentinel
    def minOr(v: Vector[Double]): Double = if (v.isEmpty) -1 else v.min
    def median(v: Vector[Double]): Double = {
      if (v.isEmpty) return -1
      val s = v.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    def fmt(d: Double): String = BigDecimal(d)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val names = ordered.map(_._1)
    def obj(f: String => String): String =
      names.map(k => "\"" + k + "\":" + f(k)).mkString("{", ",", "}")
    val qs = obj(k => fmt(minOr(times(k))))
    val medians = obj(k => fmt(median(times(k))))
    val repTimes = obj(k => times(k).map(fmt).mkString("[", ",", "]"))
    // a failed query must not masquerade as a fast one — surface it
    val failedJson = failed.toSeq.sorted.map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    val succeeded = names.filter(k => times(k).nonEmpty)
    val total = succeeded.map(k => times(k).min).sum
    val totalMedian = succeeded.map(k => median(times(k))).sum
    val detail = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"medians":$medians,"total_median":${fmt(totalMedian)},"reps":$repTimes,"n_reps":$reps,"failed":$failedJson,"sf":"$sfDir"}"""
    // the per-leg default (r15, VERDICT r14 item 1): the r14 driver ran
    // a 32-core leg and an 8-core leg in one session, both with
    // SPARK_GRAFT_BENCH_DETAIL unset, and the second leg OVERWROTE the
    // first's detail file — the only per-query record of the headline
    // run. Folding the core count into the default name makes two legs
    // of one session land in two files without any caller cooperation
    // (explicit SPARK_GRAFT_BENCH_DETAIL still wins, as in the ladder).
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL",
      s"BENCH_DETAIL_c$cpus.json")
    // advertise the path ONLY if the write succeeded — a stdout pointer
    // to a stale file from a previous run would silently serve wrong
    // per-rep numbers (ladder runs MUST set SPARK_GRAFT_BENCH_DETAIL
    // per leg, or each leg overwrites the default path)
    val detailJson =
      try {
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(detailPath), detail)
        "\"" + detailPath + "\""
      } catch { case e: Throwable =>
        System.err.println(s"bench detail write failed: ${e.getMessage}")
        "null"
      }
    // stop Spark BEFORE printing: the summary line must be the very
    // last bytes on stdout — shutdown logging (or a misrouted
    // appender) trailing it is exactly what pushes the JSON out of a
    // tail-buffered capture
    spark.stop()
    println(summaryLine(names, k => minOr(times(k)), total, reps,
      failedJson, detailJson, sfDir))
    System.out.flush()
  }

  /** The one-line stdout summary, sized for a tail-buffered capture.
    *
    * The capture keeps only the LAST 2000 chars of output and sbt's
    * trailing "[success] Total time ..." line eats ~75 of those, so a
    * printed line must stay ≤ ~1880 chars or its head is cut and the
    * JSON becomes unparseable. A full-name per-query seconds map is
    * ~3.5 KB; even the short-id 2-decimal map stopped fitting when the
    * suite grew past ~160 queries (r14 finding: the map silently
    * dropped to the map-less tier and the driver's per-query
    * comparison came back empty). The irreducible cost of 197 map
    * entries (quotes, short ids, colons, commas) is ~1.5 KB, so a
    * seconds map with useful precision CANNOT fit — per-query data
    * therefore rides as INTEGER maps with the unit in the key name:
    *
    *  - tier 1: `"queries"` short-id seconds at 2 decimals (kept for
    *    small dev subsets via SPARK_GRAFT_BENCH_ONLY);
    *  - tier 2: `"queries_cs"` short-id integer CENTIseconds;
    *  - tier 3: `"queries_ds"` short-id integer DECIseconds — at 197
    *    queries with the realistic sub-10 s mix this is ~1.8 KB and is
    *    the tier that fits;
    *  - tier 4 (guaranteed fit): `"families"` (per-family subtotal
    *    seconds, full coverage) + `"top"` (the 20 slowest queries,
    *    short-id seconds) — bounded at ~0.5 KB no matter how slow the
    *    run;
    *  - tier 5: no map (the detail file always has full-name,
    *    3-decimal seconds, medians and per-rep times).
    *
    * The `queries` key is all-or-nothing: a PARTIAL seconds map (say
    * top-20) could read as 177 dropped queries to a consumer that
    * diffs the key set, which is worse than no map — hence the
    * distinct `top` key in tier 4. Short ids are the unique prefix
    * before the first underscore (q01_pricing_summary → q01), same
    * scheme as every prior round.
    */
  private[graft] def summaryLine(
      names: Seq[String], minOf: String => Double, total: Double,
      reps: Int, failedJson: String, detailJson: String,
      sfDir: String): String = {
    def fmt(d: Double): String = BigDecimal(d)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def shortId(k: String): String = k.takeWhile(_ != '_')
    def mapOf(f: Double => String): String =
      names.map(k => "\"" + shortId(k) + "\":" + f(minOf(k)))
        .mkString("{", ",", "}")
    def secs2(d: Double): String = BigDecimal(d)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
    // a failed query's -1 sentinel stays -1 in every unit so it can
    // never be mistaken for a measured time
    def scaledInt(mult: Int)(d: Double): String =
      if (d < 0) "-1" else Math.round(d * mult).toString
    def line(key: String, m: String): String =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","$key":$m,"n_reps":$reps,"failed":$failedJson,"detail":$detailJson,"sf":"$sfDir"}"""
    def bare: String =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_reps":$reps,"failed":$failedJson,"detail":$detailJson,"sf":"$sfDir"}"""
    // tier 4: per-family subtotals (full coverage of the suite) plus
    // the 20 slowest queries in seconds — bounded size regardless of
    // how slow the run was (the integer tiers grow a digit per 10x)
    def famTop: String = {
      val fam = names.groupBy(_.takeWhile(_.isLetter)).toSeq.sortBy(_._1)
        .map { case (f, ks) =>
          "\"" + f + "\":" + secs2(ks.map(k => math.max(minOf(k), 0)).sum) }
        .mkString("{", ",", "}")
      val top = names.sortBy(k => -minOf(k)).take(20)
        .map(k => "\"" + shortId(k) + "\":" + secs2(minOf(k)))
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","families":$fam,"top":$top,"n_reps":$reps,"failed":$failedJson,"detail":$detailJson,"sf":"$sfDir"}"""
    }
    // getOrElse, NOT .get: a systemic failure can inflate failedJson
    // past the limit in every tier, and the one thing a bench must
    // never do is crash without printing its summary line
    Seq(line("queries", mapOf(secs2)),
        line("queries_cs", mapOf(scaledInt(100))),
        line("queries_ds", mapOf(scaledInt(10))),
        famTop,
        bare)
      .find(_.length <= 1900).getOrElse(bare)
  }
}
