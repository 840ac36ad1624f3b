package graft.queries

import graft.Tables
import graft.engine.Sketches
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bulk-dataflow-plane operators surfaced as deterministic queries.
  *
  * The reference's export/import are side-effecting shell-outs
  * (/root/reference/lib/hbacker/export.rb:145-169, import.rb:128-154);
  * here each is decomposed into its *scan semantics* (what rows move) —
  * which the DuckDB oracle can check — while the write/record side
  * effects live in graft.engine and are exercised by ScalaTest.
  */
object EngineQueries {

  import graft.catalog.CatalogFixture.{T1998, T2000}

  val defs: Map[String, QueryFn] = Map(
    /** e01 — S1: the time-range-filtered export scan. HBase TimeRange
      * semantics: [start, end) half-open (export.rb:150-151 args feed
      * Scan.setTimeRange). Predicate lands in the parquet scan
      * (PushedFilters), so only matching row groups are read.
      */
    "e01_export_scan" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= timestamp_millis(lit(T1998)) &&
          col("l_shipdate") < timestamp_millis(lit(T2000)))
        .select(col("l_orderkey"), col("l_linenumber"),
          ms(col("l_shipdate")).as("ship_ms"), col("l_quantity"))
    },

    /** e02 — the `versions` cap of S1 (export.rb:150, cli.rb:71-74):
      * keep the latest N cells per key. Ranking window partitioned by
      * the row key, ordered by (ts desc, event_id desc) for a total
      * order. At scale: single shuffle on user_id; no global sort.
      */
    "e02_version_cap" -> { (s, d) =>
      val versions = 5
      val ev = Tables.eventsTs(s, d)
        .withColumn("ts_us", expr("ts_ns div 1000"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").desc, col("event_id").desc)
      ev.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= versions)
        .select(col("user_id"), col("event_id"), col("ts_us"))
    },

    /** e03 — S5 `table_has_rows?` (hbase.rb:64-68): limit-1 existence
      * probes. LocalLimit(1) short-circuits the scan; the empty probe
      * uses a parquet-stat-prunable predicate so it reads ~no rows.
      */
    "e03_has_rows" -> { (s, d) =>
      import s.implicits._
      val li = Tables.lineitem(s, d)
      val probes = Seq(
        ("lineitem", !li.limit(1).isEmpty),
        ("lineitem_negative_qty",
          !li.filter(col("l_quantity") < 0).limit(1).isEmpty),
        ("orders", !Tables.orders(s, d).limit(1).isEmpty))
      probes.toDF("probe", "has_rows")
    },

    /** e04 — S4 `table_descriptor` (hbase.rb:46-48): the discovered
      * schema as rows. Parquet footer read only — no data scan.
      */
    "e04_descriptor" -> { (s, d) =>
      import s.implicits._
      Seq("lineitem", "orders").flatMap { t =>
        Tables.load(s, d, t).schema.fields.map(f => (t, f.name))
      }.toDF("table_name", "column_name")
    },

    /** e05 — A1 + the reference's wished-for integrity metrics
      * (README.textile:189-191): per-table row counts recorded at
      * export time. ONE lazy plan (union of per-table one-row
      * aggregates), so a fleet-wide integrity sweep is a single job
      * whose table scans run in parallel across the cluster — the
      * previous form ran one serial count action per table, 10 job
      * waves for 10 numbers.
      */
    "e05_integrity_counts" -> { (s, d) =>
      val parts = Seq("lineitem", "orders", "customer", "supplier",
        "part", "nation", "region", "documents", "embeddings")
        .map(t => Tables.load(s, d, t)
          .agg(count(lit(1)).as("n_rows"))
          .select(lit(t).as("table_name"), col("n_rows"))) :+
        Tables.eventsTs(s, d).agg(count(lit(1)).as("n_rows"))
          .select(lit("events").as("table_name"), col("n_rows"))
      parts.reduce(_ unionByName _)
    },

    /** e06 — exact NDV integrity probe (the hash-check the reference
      * wants; HLL variant in e07 is engine-only since sketch internals
      * differ across engines).
      */
    "e06_integrity_ndv" -> { (s, d) =>
      Tables.lineitem(s, d).agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("ndv_orderkey"),
        countDistinct(col("l_partkey")).as("ndv_partkey"),
        countDistinct(col("l_suppkey")).as("ndv_suppkey"))
    },

    /** e07 — HLL sketch NDV: the scale form of e06 (constant memory,
      * one pass, mergeable across partitions/tables — what a 100 TB
      * integrity pass actually runs). Oracle-checked since r6: the
      * portable HLL ([[Sketches.hllEstimates]]) replaces
      * approx_count_distinct, whose HLL++ bias tables are
      * engine-private — register indices, rhos and the scaled-integer
      * harmonic sum are exact arithmetic DuckDB replays verbatim
      * (m=4096 → rsd 1.6%, matching the old 0.02 setting); the spec
      * pins the error bound and partition invariance.
      */
    "e07_integrity_hll" -> { (s, d) =>
      val ests = Sketches.hllEstimates(Tables.lineitem(s, d),
        Seq("ok" -> "l_orderkey", "pk" -> "l_partkey", "sk" -> "l_suppkey"))
      ests.groupBy()
        .agg(max(when(col("c") === "ok", col("nrows"))).as("n_rows"),
          max(when(col("c") === "ok", col("est"))).as("hll_orderkey"),
          max(when(col("c") === "pk", col("est"))).as("hll_partkey"),
          max(when(col("c") === "sk", col("est"))).as("hll_suppkey"))
    },

    /** e08 — distribution integrity via quantile sketch
      * (approx_percentile, single pass, mergeable): the "did the
      * restored table keep its value distribution" check at 100 TB.
      *
      * The sketch VALUE is engine-private, but its CONTRACT is not:
      * Greenwald-Khanna with accuracy a guarantees the returned value
      * is a data element whose rank is within ±n/a of the target, so
      * it must lie between the exact interpolated quantiles at
      * p ± 2/a (the doubled margin absorbs the rank-convention
      * off-by-one between "rank within ±n/a" and the (n−1)·p
      * interpolation grid). The query therefore emits the exact
      * bound quantiles (oracle-recomputable via quantile_cont) plus
      * in-bound BOOLEANS evaluated in Spark against unrounded bounds;
      * DuckDB asserts the booleans are TRUE. A sketch outside its
      * documented error bound flips a boolean and hash-fails the
      * oracle — a bounded pass, not a rows-only check. Exact min/max
      * ride along as anchors.
      */
    "e08_integrity_quantiles" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      val eps = 2.0 / 1000.0 // 2/accuracy
      val bounds = exactQuantiles(
        li.select(col("l_extendedprice").as("v")),
        Seq(0.5 - eps, 0.5 + eps, 0.99 - eps, 0.99 + eps))
      val sketch = li.agg(
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
          .as("p50s"),
        percentile_approx(col("l_extendedprice"), lit(0.99), lit(1000))
          .as("p99s"))
      // one-row × one-row scalar join (broadcast; PlanSpec-whitelisted)
      sketch.crossJoin(bounds).select(
        col("min_price"), col("max_price"),
        round(col("q0"), 2).as("p50_lo"), round(col("q1"), 2).as("p50_hi"),
        col("p50s").between(col("q0"), col("q1")).as("p50_in_bound"),
        round(col("q2"), 2).as("p99_lo"), round(col("q3"), 2).as("p99_hi"),
        col("p99s").between(col("q2"), col("q3")).as("p99_in_bound"))
    },

    /** e10 — Bloom-filter membership integrity: every order key that
      * appears in lineitem must test positive (false negatives are
      * impossible); shifted absent keys measure the realized
      * false-positive rate. Deterministic: partial filters OR-merge
      * commutatively. Oracle-checked since r6 — the portable-family
      * rebuild (integer-only sizing, base60 + universal-hash bit
      * positions) lets DuckDB recompute every bit and every verdict,
      * so even the false positives match exactly.
      */
    "e10_bloom_membership" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      val present = Tables.orders(s, d)
        .join(li.select(col("l_orderkey")).distinct(),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey").as("k"), lit(true).as("present"))
      // negated keys can never collide with real (positive) order keys
      // at any scale factor — an additive shift would overlap real ids
      // once orderkey exceeds the shift
      val absent = Tables.orders(s, d)
        .select((-col("o_orderkey") - lit(1L)).as("k"),
          lit(false).as("present"))
      // size the filter from metadata, not a data scan: l_orderkey's NDV
      // is bounded by the orders row count, which parquet footers carry
      // for free (driver-side read, zero Spark jobs — the catalog's
      // export-time e05 stats would supply the same number in a backup
      // workflow). A hardcoded capacity saturates at larger sf and the
      // realized fpp quietly degrades toward 1.
      val nKeys = graft.engine.TableOps.parquetRowCount(
        s, graft.Tables.path(d, "orders"))
      Sketches.bloomMembership(s, li, "l_orderkey",
          present.unionAll(absent), "k",
          expectedItems = math.max(2 * nKeys, 1000L))
        .groupBy(col("present"))
        .agg(count(lit(1)).as("n_tested"),
          sum(when(col("might_contain"), 1L).otherwise(0L)).as("n_positive"))
    },

    /** e11 — equi-width histogram of a payload column: the
      * distribution fingerprint for the export-time integrity family
      * (e05 counts, e06 NDV, e08/e09 quantiles) — two backups whose
      * histograms differ corrupted something even when row counts
      * match. Bucket = floor(v / width) (IEEE-identical both engines,
      * no arithmetic on the summed side); one hash aggregate.
      */
    "e11_histogram" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(floor(col("l_extendedprice") / 5000.0).cast("long")
          .as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("l_extendedprice")).as("lo"),
          max(col("l_extendedprice")).as("hi"))
    },

    /** e12 — incremental rollup merge identity: the maintained
      * summary's algebra (incremental.Rollup) proven through the
      * oracle — summarize two disjoint halves, merge the partial
      * states, and the result must hash-match DuckDB's direct
      * full-scan aggregate. This is what makes "absorb each session's
      * delta, never rescan history" CORRECT, not just fast.
      */
    "e12_rollup_merge" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      val keys = Seq("l_returnflag", "l_linestatus")
      val cut = lit("1997-01-01").cast("timestamp")
      val a = graft.incremental.Rollup.summarize(
        li.filter(col("l_shipdate") < cut), keys, "l_quantity")
      val b = graft.incremental.Rollup.summarize(
        li.filter(col("l_shipdate") >= cut), keys, "l_quantity")
      graft.incremental.Rollup.finish(
        graft.incremental.Rollup.merge(keys, a, b))
    },

    /** e09 — exact interpolated quantiles, the oracle-checkable twin of
      * e08: Spark `percentile` and DuckDB `quantile_cont` share the
      * (n-1)·p linear-interpolation definition, compared at 2 decimals.
      * The exact form buffers per-group values — fine for an integrity
      * probe on one table, while e08's sketch is the 100 TB path.
      */
    "e09_quantiles_exact" -> { (s, d) =>
      val qs = exactQuantiles(
        Tables.lineitem(s, d).select(col("l_extendedprice").as("v")),
        Seq(0.25, 0.5, 0.75, 0.95))
      qs.select(
        round(col("q0"), 2).as("q25"), round(col("q1"), 2).as("q50"),
        round(col("q2"), 2).as("q75"), round(col("q3"), 2).as("q95"))
    })

  /** Exact interpolated quantiles (`quantile_cont` / Spark
    * `percentile` semantics: rank r = (n−1)·p, linear interpolation
    * between the r-th order statistics), optionally PER GROUP, WITHOUT
    * buffering raw values: built-in `percentile` is a
    * TypedImperativeAggregate that updates a per-row value→count
    * hashmap outside codegen and merges every partition's map in one
    * reducer. This plan gets the same numbers from codegen operators:
    * (1) `groupBy(groups :+ v).count()` — map-side combined, the ONLY
    * full-data shuffle moves NDV rows, not raw rows; (2) a
    * running-sum window over the distinct-value table (per group;
    * NDV-sized — bounded by the value domain, not the corpus; same
    * final-merge shape as the built-in but over counted groups);
    * (3) one conditional-min aggregate per group picks the bracketing
    * order statistics x[k] = min v with cum ≥ k+1 for every requested
    * rank, and the final select interpolates. Measured 2.8 s → 0.6 s
    * vs the array-form `percentile` at sf0.1 (noop-sink bench).
    *
    * The running sum in step (2) takes two shapes:
    *  - WITH group columns, a per-group Window over the counted table
    *    — partition count bounded by the group domain, each partition
    *    NDV-of-one-group sized;
    *  - WITHOUT groups, the same Window would be an UNPARTITIONED
    *    global sort into one task ("Moving all data to a single
    *    partition") — a scale-killer on near-continuous columns whose
    *    NDV grows with the data. Instead: the x23 idiom — distributed
    *    range-sort of the counted table, per-partition subtotals
    *    collected (one row per partition, KB scale), broadcast back as
    *    prefix offsets, and the cumulative count emitted by a narrow
    *    per-partition pass. Same numbers, every stage distributed; the
    *    sort's shuffle files are reused by the final job.
    *
    * EAGERNESS CAVEAT (ungrouped form only, as at x23): collecting the
    * per-partition subtotals launches the sort at CONSTRUCTION time;
    * plan-only consumers pay it at their own SF.
    *
    * Input: a frame with the value in column `v` plus the group
    * columns. Output: `groupCols ++ (n, q0..q_{k-1})` — `n` is the
    * group's value count, `qi` the i-th requested quantile.
    */
  private[queries] def exactQuantiles(
      values: org.apache.spark.sql.DataFrame,
      ps: Seq[Double],
      groupCols: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    val g = groupCols.map(col)
    val counted = values.groupBy((g :+ col("v")): _*)
      .agg(count(lit(1)).as("c"))
    val cum = if (groupCols.nonEmpty) {
      val wRun = Window.partitionBy(g: _*).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(g: _*).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      counted
        .select((g :+ col("v") :+ sum(col("c")).over(wRun).as("cum") :+
          sum(col("c")).over(wAll).as("n")): _*)
    } else {
      val spark = values.sparkSession
      val sorted = counted.orderBy(col("v"))
      val rdd = sorted.rdd // shared lineage: the sort shuffle runs once
      val partSums = rdd.mapPartitionsWithIndex { (i, it) =>
        var s = 0L; it.foreach(r => s += r.getLong(1)); Iterator((i, s))
      }.collect().sortBy(_._1).map(_._2)
      val offsets = partSums.scanLeft(0L)(_ + _)
      val total = offsets.last
      val cumRdd = rdd.mapPartitionsWithIndex { (i, it) =>
        var run = offsets(i)
        it.map { r =>
          run += r.getLong(1)
          org.apache.spark.sql.Row(r.get(0), run)
        }
      }
      spark.createDataFrame(cumRdd, org.apache.spark.sql.types.StructType(
          Seq(org.apache.spark.sql.types.StructField("v",
              sorted.schema("v").dataType),
            org.apache.spark.sql.types.StructField("cum",
              org.apache.spark.sql.types.LongType, nullable = false))))
        .withColumn("n", lit(total))
    }
    // rank of percentile p (constant within a group: n is per-group)
    def r(p: Double) = (col("n") - 1) * p
    val picks = ps.zipWithIndex.flatMap { case (p, i) => Seq(
      min(when(col("cum") >= floor(r(p)) + 1, col("v"))).as(s"lo$i"),
      min(when(col("cum") >= ceil(r(p)) + 1, col("v"))).as(s"hi$i"))
    }
    val outs = ps.zipWithIndex.map { case (p, i) =>
      // lo + (hi−lo)·frac, the exact arithmetic percentile uses
      (col(s"lo$i") + (col(s"hi$i") - col(s"lo$i")) *
        ((col("n") - 1) * p - floor((col("n") - 1) * p))).as(s"q$i")
    }
    cum.groupBy(g: _*)
      .agg(first(col("n")).as("n"), picks: _*)
      .select((g :+ col("n") :+ outs.head) ++ outs.tail: _*)
  }

  val oracles: Map[String, String] = Map(
    /** The Bloom filter replayed relationally: `bits` is the exact
      * set of positions the build sets (DISTINCT — OR-ing a bit twice
      * is one bit), a probe is a member iff none of its k positions
      * misses, and the sizing arithmetic is the engine's integer
      * formula verbatim — so n_positive matches even on the false
      * positives.
      */
    "e10_bloom_membership" -> {
      import graft.ext.Hashing
      val P = Hashing.P
      val hf = (0 until Sketches.BloomHashes)
        .map(i => s"(${Hashing.As(i)}, ${Hashing.Bs(i)})").mkString(", ")
      val b60k = Hashing.base60Sql("CAST(k AS VARCHAR)")
      s"""WITH prm AS (
         |  SELECT CAST(LEAST(GREATEST(2 * (SELECT COUNT(*) FROM orders),
         |    1000) * ${Sketches.BloomBitsPerKey}, ${P - 1}) AS BIGINT) AS m),
         |hf(a, b) AS (VALUES $hf),
         |mk AS (
         |  SELECT DISTINCT
         |    ${Hashing.base60Sql("CAST(l_orderkey AS VARCHAR)")} AS h
         |  FROM lineitem),
         |bits AS (
         |  SELECT DISTINCT ((a * (h % $P) + b) % $P) % m AS pos
         |  FROM mk, hf, prm),
         |cand AS (
         |  SELECT o_orderkey AS k, TRUE AS present FROM orders
         |  WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
         |  UNION ALL
         |  SELECT -o_orderkey - 1, FALSE FROM orders),
         |probes AS (
         |  SELECT k, present, ((a * ($b60k % $P) + b) % $P) % m AS pos
         |  FROM cand, hf, prm),
         |miss AS (
         |  SELECT DISTINCT p.k FROM probes p
         |  LEFT JOIN bits bt ON p.pos = bt.pos WHERE bt.pos IS NULL)
         |SELECT present, CAST(COUNT(*) AS BIGINT) AS n_tested,
         |  CAST(SUM(CASE WHEN k IN (SELECT k FROM miss) THEN 0 ELSE 1 END)
         |    AS BIGINT) AS n_positive
         |FROM cand GROUP BY present""".stripMargin
    },

    /** The HLL replayed relationally: same hashes → same registers →
      * same scaled-integer harmonic sum; `ln` vs Java's `Math.log`
      * may differ in the last ulp, which the round-to-long absorbs
      * (a mismatch would need an estimate within ~1e-10 of a .5
      * boundary). NB DuckDB `log` is base-10 — `ln` here.
      */
    "e07_integrity_hll" -> {
      import graft.engine.Sketches._
      val mask = (1L << (60 - HllP)) - 1
      def tag(t: String, c: String) =
        s"SELECT '$t' AS c, ${graft.ext.Hashing.base60Sql(
          s"CAST($c AS VARCHAR)")} AS h FROM lineitem WHERE $c IS NOT NULL"
      s"""WITH hs AS (
         |  ${tag("ok", "l_orderkey")}
         |  UNION ALL ${tag("pk", "l_partkey")}
         |  UNION ALL ${tag("sk", "l_suppkey")}),
         |rr AS (SELECT c, h >> ${60 - HllP} AS idx, h & $mask AS rest
         |       FROM hs),
         |reg AS (SELECT c, idx,
         |    MAX(CASE WHEN rest = 0 THEN $HllL
         |        ELSE $HllL - length(bin(rest)) END) AS r,
         |    COUNT(*) AS cnt
         |  FROM rr GROUP BY c, idx),
         |ag AS (SELECT c, COUNT(*) AS nreg,
         |    CAST(SUM(cnt) AS BIGINT) AS nrows,
         |    CAST(SUM(CAST(1 AS BIGINT) << ($HllL - r)) AS BIGINT) AS s1
         |  FROM reg GROUP BY c),
         |es AS (SELECT c, nrows,
         |    CAST(round(CASE
         |      WHEN ($HllM - nreg) > 0
         |        AND ($HllAlphaMM * ($HllTwoL /
         |          CAST(s1 + ($HllM - nreg) * ${1L << HllL} AS DOUBLE)))
         |          <= ${2.5 * HllM}
         |      THEN ${HllM.toDouble} *
         |        ln(${HllM.toDouble} / CAST($HllM - nreg AS DOUBLE))
         |      ELSE $HllAlphaMM * ($HllTwoL /
         |        CAST(s1 + ($HllM - nreg) * ${1L << HllL} AS DOUBLE))
         |    END) AS BIGINT) AS est
         |  FROM ag)
         |SELECT
         |  MAX(CASE WHEN c = 'ok' THEN nrows END) AS n_rows,
         |  MAX(CASE WHEN c = 'ok' THEN est END) AS hll_orderkey,
         |  MAX(CASE WHEN c = 'pk' THEN est END) AS hll_partkey,
         |  MAX(CASE WHEN c = 'sk' THEN est END) AS hll_suppkey
         |FROM es""".stripMargin
    },

    "e01_export_scan" ->
      s"""SELECT l_orderkey, l_linenumber, epoch_ms(l_shipdate) AS ship_ms, l_quantity
         |FROM lineitem
         |WHERE l_shipdate >= epoch_ms($T1998) AND l_shipdate < epoch_ms($T2000)""".stripMargin,

    "e02_version_cap" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us
        |FROM events
        |QUALIFY row_number() OVER (
        |  PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) <= 5""".stripMargin,

    "e03_has_rows" ->
      """SELECT 'lineitem' AS probe, EXISTS(SELECT 1 FROM lineitem) AS has_rows
        |UNION ALL
        |SELECT 'lineitem_negative_qty', EXISTS(SELECT 1 FROM lineitem WHERE l_quantity < 0)
        |UNION ALL
        |SELECT 'orders', EXISTS(SELECT 1 FROM orders)""".stripMargin,

    "e04_descriptor" ->
      """SELECT 'lineitem' AS table_name, column_name FROM (DESCRIBE SELECT * FROM lineitem)
        |UNION ALL
        |SELECT 'orders', column_name FROM (DESCRIBE SELECT * FROM orders)""".stripMargin,

    "e05_integrity_counts" ->
      """SELECT 'lineitem' AS table_name, COUNT(*) AS n_rows FROM lineitem
        |UNION ALL SELECT 'orders', COUNT(*) FROM orders
        |UNION ALL SELECT 'customer', COUNT(*) FROM customer
        |UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
        |UNION ALL SELECT 'part', COUNT(*) FROM part
        |UNION ALL SELECT 'nation', COUNT(*) FROM nation
        |UNION ALL SELECT 'region', COUNT(*) FROM region
        |UNION ALL SELECT 'documents', COUNT(*) FROM documents
        |UNION ALL SELECT 'embeddings', COUNT(*) FROM embeddings
        |UNION ALL SELECT 'events', COUNT(*) FROM events""".stripMargin,

    "e06_integrity_ndv" ->
      """SELECT COUNT(*) AS n_rows,
        |  COUNT(DISTINCT l_orderkey) AS ndv_orderkey,
        |  COUNT(DISTINCT l_partkey) AS ndv_partkey,
        |  COUNT(DISTINCT l_suppkey) AS ndv_suppkey
        |FROM lineitem""".stripMargin,

    /** e08's bounded oracle: DuckDB recomputes the exact bound
      * quantiles and asserts the in-bound booleans are TRUE — if the
      * Spark-side sketch ever lands outside its documented rank-error
      * bound, the Spark boolean is false and the hash compare fails.
      */
    "e08_integrity_quantiles" ->
      """SELECT min(l_extendedprice) AS min_price,
        |  max(l_extendedprice) AS max_price,
        |  round(quantile_cont(l_extendedprice, 0.498), 2) AS p50_lo,
        |  round(quantile_cont(l_extendedprice, 0.502), 2) AS p50_hi,
        |  TRUE AS p50_in_bound,
        |  round(quantile_cont(l_extendedprice, 0.988), 2) AS p99_lo,
        |  round(quantile_cont(l_extendedprice, 0.992), 2) AS p99_hi,
        |  TRUE AS p99_in_bound
        |FROM lineitem""".stripMargin,

    "e09_quantiles_exact" ->
      """SELECT round(quantile_cont(l_extendedprice, 0.25), 2) AS q25,
        |  round(quantile_cont(l_extendedprice, 0.5), 2) AS q50,
        |  round(quantile_cont(l_extendedprice, 0.75), 2) AS q75,
        |  round(quantile_cont(l_extendedprice, 0.95), 2) AS q95
        |FROM lineitem""".stripMargin,

    "e12_rollup_merge" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS sum_v,
        |  MIN(l_quantity) AS min_v, MAX(l_quantity) AS max_v
        |FROM lineitem
        |GROUP BY 1, 2""".stripMargin,

    "e11_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bucket,
        |  COUNT(*) AS n,
        |  MIN(l_extendedprice) AS lo,
        |  MAX(l_extendedprice) AS hi
        |FROM lineitem
        |GROUP BY 1""".stripMargin)
}
