package graft.queries

import graft.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators (SURVEY.md §2.9) in their batch form; the
  * Structured Streaming twins live in graft.streaming (spec-tested —
  * a stream result can't be oracle-hashed).
  *
  * events.parquet carries TIMESTAMP(NANOS); both engines compare at
  * microsecond resolution (DuckDB truncates ns→µs on read, Spark via
  * `ts_ns div 1000`).
  */
object EventQueries {

  private val HourUs = 3600000000L
  private val SessionGapUs = 1800000000L // 30 min

  /** ev19's ranking cut — shared by the query and its oracle. */
  private val PathTopK = 20

  val defs: Map[String, QueryFn] = Map(
    /** ev01 — tumbling 1h window aggregate: Spark's `window()` on the
      * µs-truncated timestamp; one shuffle on (window, event_type),
      * partial aggregation map-side. Streaming twin:
      * graft.streaming.StreamingOps.tumblingCounts.
      */
    "ev01_tumbling" -> { (s, d) =>
      Tables.eventsTs(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(unix_millis(col("w.start")).as("bucket_ms"),
          col("event_type"), col("n"), col("sum_value"))
    },

    /** ev14 — staged funnel conversion (view → click → purchase):
      * per user, the first view, the first click at-or-after it, the
      * first purchase at-or-after that click; output is the per-stage
      * user counts plus the exact total view→purchase latency. ONE
      * shuffle (groupBy user) — each user's events are collected,
      * sorted by (ts, stage) so a same-microsecond later stage still
      * qualifies (ties resolve stage-ascending, matching the oracle's
      * `>=`), and folded by an `aggregate` lambda with O(1) state.
      * The lambda runs INTERPRETED — Spark 4 does not codegen
      * higher-order-function lambdas (DESIGN.md's HOF cost model) —
      * but stays cheap because every term is a bound struct-field
      * reference (no re-evaluated subexpressions) and the fold's
      * state is four longs. No self-joins: the composed-SQL form needs three (one
      * per stage), each a shuffle at 100 TB. Per-user memory is that
      * user's funnel-event list — the same bound as any
      * sessionization — and sums stay in exact integer micros (no
      * float drift in the oracle hash).
      */
    "ev14_funnel" -> { (s, d) =>
      val e = Tables.eventsTs(s, d)
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id"), expr("ts_ns div 1000").as("us"),
          when(col("event_type") === "view", 0)
            .when(col("event_type") === "click", 1)
            .otherwise(2).as("stage"))
      val nullT = lit(null).cast("bigint")
      val folded = e.groupBy(col("user_id"))
        .agg(array_sort(collect_list(struct(col("us"), col("stage"))))
          .as("ev"))
        .select(aggregate(
          col("ev"),
          struct(nullT.as("s1"), nullT.as("s2"), nullT.as("s3")),
          (acc, x) => struct(
            when(acc("s1").isNull && x("stage") === 0, x("us"))
              .otherwise(acc("s1")).as("s1"),
            when(acc("s2").isNull && acc("s1").isNotNull &&
              x("stage") === 1, x("us")).otherwise(acc("s2")).as("s2"),
            when(acc("s3").isNull && acc("s2").isNotNull &&
              x("stage") === 2, x("us")).otherwise(acc("s3")).as("s3")))
          .as("f"))
      folded.agg(
        count(col("f.s1")).as("n_view"),
        count(col("f.s2")).as("n_click"),
        count(col("f.s3")).as("n_purchase"),
        coalesce(sum(when(col("f.s3").isNotNull,
          col("f.s3") - col("f.s1"))), lit(0L)).cast("long")
          .as("total_convert_us"))
    },

    /** ev16 — inter-arrival (dwell-time) distribution per event type:
      * exact p50/p90 of the gap between a user's consecutive events of
      * each type. One shuffle for the per-(user, type) lag window;
      * same-timestamp ties leave the gap MULTISET unchanged, so the
      * aggregate is deterministic. Exact `percentile` is the checkable
      * form (quantile_cont parity proven by e09); at 100 TB swap in
      * `approx_percentile` exactly as e08 does for e09.
      */
    "ev16_interarrival" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("us"))
      Tables.eventsTs(s, d)
        .select(col("user_id"), col("event_type"),
          expr("ts_ns div 1000").as("us"))
        .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
        .filter(col("gap").isNotNull)
        .transform(gaps =>
          // grouped counted-quantiles plan (see EngineQueries
          // .exactQuantiles): no per-group value buffering, and the
          // group's value count IS n_gaps
          EngineQueries.exactQuantiles(
            gaps.select(col("event_type"), col("gap").cast("double").as("v")),
            Seq(0.5, 0.9), groupCols = Seq("event_type")))
        .select(col("event_type"), col("n").as("n_gaps"),
          round(col("q0"), 1).as("p50_us"),
          round(col("q1"), 1).as("p90_us"))
    },

    /** ev18 — ev16's 100 TB serving path, made real: per-type
      * inter-arrival quantiles from a SINGLE-PASS mergeable sketch
      * (approx_percentile, accuracy 1000) instead of exact per-group
      * counted quantiles. Same e08 bounded-oracle scheme: the query
      * emits the exact interpolated quantiles at p ± 2/accuracy (the
      * GK rank guarantee, doubled margin for the rank-convention
      * off-by-one) plus in-bound BOOLEANS evaluated in Spark against
      * the unrounded bounds; DuckDB recomputes the bounds and asserts
      * the booleans TRUE. A sketch outside its documented error flips
      * a boolean and hash-fails — a bounded pass, not rows-only. At
      * scale the bound columns (the expensive exact side) drop and
      * the sketch stands alone; here they ARE the oracle check.
      */
    "ev18_interarrival_sketch" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("us"))
      val gaps = Tables.eventsTs(s, d)
        .select(col("user_id"), col("event_type"),
          expr("ts_ns div 1000").as("us"))
        .withColumn("gap",
          (col("us") - lag(col("us"), 1).over(w)).cast("double"))
        .filter(col("gap").isNotNull)
        .select(col("event_type"), col("gap"))
      val eps = 2.0 / 1000.0
      val bounds = EngineQueries.exactQuantiles(
        gaps.select(col("event_type"), col("gap").as("v")),
        Seq(0.5 - eps, 0.5 + eps, 0.9 - eps, 0.9 + eps),
        groupCols = Seq("event_type"))
      val sketch = gaps.groupBy(col("event_type")).agg(
        count(lit(1)).as("n_gaps"),
        percentile_approx(col("gap"), lit(0.5), lit(1000)).as("p50s"),
        percentile_approx(col("gap"), lit(0.9), lit(1000)).as("p90s"))
      sketch.join(bounds, "event_type").select(
        col("event_type"), col("n_gaps"),
        round(col("q0"), 1).as("p50_lo"), round(col("q1"), 1).as("p50_hi"),
        col("p50s").between(col("q0"), col("q1")).as("p50_in_bound"),
        round(col("q2"), 1).as("p90_lo"), round(col("q3"), 1).as("p90_hi"),
        col("p90s").between(col("q2"), col("q3")).as("p90_in_bound"))
    },

    /** ev15 — weekly cohort retention: users bucketed by the week of
      * their first event; for each (cohort week, week offset), how
      * many of that cohort were active. The activity set is
      * per-(user, week) DISTINCT — one shuffle — then a user-keyed
      * join against the per-user cohort aggregate (AQE sizes it) and
      * one final count-distinct. All integer arithmetic (`div`, never
      * `/` — Spark's `/` on longs is double division and would drift
      * the bucket boundaries from the oracle's).
      */
    "ev15_retention" -> { (s, d) =>
      val weekUs = 604800000000L
      val e = Tables.eventsTs(s, d)
        .select(col("user_id"), expr("ts_ns div 1000").as("us"))
      val cohorts = e.groupBy(col("user_id"))
        .agg(expr(s"min(us) div $weekUs").as("cw"))
      val activity = e
        .select(col("user_id"), expr(s"us div $weekUs").as("w"))
        .distinct()
      activity.join(cohorts, "user_id")
        .groupBy(expr(s"(cw * $weekUs) div 1000").as("cohort_week_ms"),
          (col("w") - col("cw")).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
    },

    /** ev12 — audience overlap, exact: users with ≥1 'click' AND ≥1
      * 'view'. One shuffle on user_id with map-side partials (the
      * flag-max formulation — no self-join, no INTERSECT rescan), then
      * a scalar count. The exact twin of ev13's KMV sketch.
      */
    "ev12_user_overlap" -> { (s, d) =>
      Tables.eventsTs(s, d)
        .groupBy(col("user_id"))
        .agg(
          max(when(col("event_type") === "click", 1).otherwise(0)).as("c"),
          max(when(col("event_type") === "view", 1).otherwise(0)).as("v"))
        .filter(col("c") === 1 && col("v") === 1)
        .agg(count(lit(1)).cast("long").as("n_overlap"))
    },

    /** ev13 — audience overlap via paired KMV sketches. ONE narrow
      * pass over events with k-bounded map-side partials — unlike
      * ev12, nothing keyed by user is ever shuffled, which is the
      * 100 TB form when the user population itself is huge. The
      * sketch is deterministic under any partitioning (set minima),
      * so the output is stable across runs/topologies.
      *
      * Oracle-checked since r6: the hash family is the portable
      * base60 (md5 top bits — the d03 trade), so DuckDB recomputes
      * the exact k-minima with `ORDER BY h LIMIT k` and replays the
      * estimator arithmetic division-for-division; exactness below
      * sketch capacity and estimator error stay pinned in
      * SketchesSpec.
      */
    "ev13_user_overlap_kmv" -> { (s, d) =>
      val k = 256
      val in = graft.engine.Sketches.kmvInput(
        Tables.eventsTs(s, d)
          .filter(col("event_type").isin("click", "view")),
        "user_id",
        col("event_type") === "click",
        col("event_type") === "view")
      // estimators as COLUMN expressions over the sketch arrays — the
      // whole query stays one lazy Catalyst plan (typed Aggregator →
      // array math), auditable and with no driver-side job at
      // construction time. Mirrors Sketches.kmvNdv/kmvOverlap exactly
      // (parity asserted in SketchesSpec).
      def fr(x: Column): Column =
        x.cast("double") / lit(graft.engine.Sketches.HashSpace)
      def ndv(a: Column): Column =
        when(size(a) < k, size(a).cast("double"))
          .otherwise(lit((k - 1).toDouble) / fr(element_at(a, -1)))
      val sk = in.select(graft.engine.Sketches.kmvPair(k).toColumn)
        .toDF("ca", "va")
      val un = slice(array_sort(array_union(col("ca"), col("va"))), 1, k)
      val rho = size(filter(un, x =>
        array_contains(col("ca"), x) && array_contains(col("va"), x)))
      val overlap = when(size(un) === 0, lit(0.0))
        .otherwise(rho.cast("double") / size(un) * ndv(un))
      sk.select(
        round(ndv(col("ca"))).cast("long").as("ndv_click_est"),
        round(ndv(col("va"))).cast("long").as("ndv_view_est"),
        round(overlap).cast("long").as("n_overlap_est"))
    },

    /** ev06 — gap-fill / resample: hourly counts per event type with
      * every hour of the observed range present, zeros filled. Both
      * join inputs are already bucket-grained (hours × types) — tiny at
      * any data scale; the only data-sized work is the ev01-shaped
      * aggregation. The aggregate side carries the broadcast hint:
      * Spark can't build the outer-preserved side of an outer join, so
      * a hint on the spine would be silently dropped (right_outer +
      * build-left is the supported combination that keeps every spine
      * row).
      */
    "ev06_gapfill" -> { (s, d) =>
      val hourUs = 3600000000L
      val ev = Tables.eventsTs(s, d)
        .withColumn("b", expr(s"(ts_ns div 1000) div $hourUs"))
      val counted = ev.groupBy(col("b"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val spine = ev.agg(min(col("b")).as("lo"), max(col("b")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("b"))
        .crossJoin(ev.select(col("event_type")).distinct())
      broadcast(counted)
        .join(spine, Seq("b", "event_type"), "right_outer")
        .select((col("b") * 3600000L).as("bucket_ms"), col("event_type"),
          coalesce(col("n"), lit(0L)).as("n"))
    },

    /** ev11 — volume anomaly detection: hours whose event count sits
      * more than 3σ above that type's hourly mean. Mean and variance
      * come from EXACT integer moments (Σn, Σn² of bucket counts —
      * never a floating stddev, whose summation order is
      * partition-dependent), so the z-threshold is bit-identical
      * cross-engine. Two aggregations: bucket counts (shuffle on
      * (bucket, type)), then the per-type one-row moment table joined
      * back by broadcast.
      */
    "ev11_anomaly" -> { (s, d) =>
      val hourUs = 3600000000L
      val counts = Tables.eventsTs(s, d)
        .withColumn("b", expr(s"(ts_ns div 1000) div $hourUs"))
        .groupBy(col("b"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val stats = counts.groupBy(col("event_type").as("et"))
        .agg(count(lit(1)).as("nb"),
          sum(col("n")).as("s1"),
          // square in decimal: long n*n wraps negative past ~3.0e9
          // events/bucket (DuckDB's HUGEINT doesn't) — still exact,
          // still order-insensitive
          sum(col("n").cast("decimal(38,0)") * col("n")).as("s2"))
      val mean = col("s1").cast("double") / col("nb")
      val varr = (col("s2").cast("double") -
        col("s1").cast("double") * col("s1") / col("nb")) / col("nb")
      counts.join(broadcast(stats), col("event_type") === col("et"))
        .filter(col("n") > mean + lit(3.0) * sqrt(varr))
        .select((col("b") * 3600000L).as("bucket_ms"), col("event_type"),
          col("n"), round(mean, 4).as("mean_n"))
    },

    /** ev10 — LOCF resample (last observation carried forward): the
      * gap-fill twin for VALUES instead of counts — each (hour, type)
      * carries the latest observed reading, empty hours inherit the
      * previous one (null before the first observation). Two window
      * passes over the same (event_type, bucket) partitioning: a
      * per-bucket argmax (row_number desc) then the ignoreNulls
      * last-value frame along the broadcast-joined spine. Values pass
      * through un-summed — no decimal dance needed.
      */
    "ev10_locf" -> { (s, d) =>
      val hourUs = 3600000000L
      val ev = Tables.eventsTs(s, d)
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .withColumn("b", expr(s"(ts_ns div 1000) div $hourUs"))
      val byBucket = Window.partitionBy(col("event_type"), col("b"))
        .orderBy(col("ts_us").desc, col("event_id").desc)
      val lastObs = ev.withColumn("rn", row_number().over(byBucket))
        .filter(col("rn") === 1)
        .select(col("b"), col("event_type"), col("value").as("obs"))
      val spine = ev.agg(min(col("b")).as("lo"), max(col("b")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("b"))
        .crossJoin(ev.select(col("event_type")).distinct())
      val byType = Window.partitionBy(col("event_type")).orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, 0)
      broadcast(lastObs)
        .join(spine, Seq("b", "event_type"), "right_outer")
        .withColumn("locf", last(col("obs"), ignoreNulls = true).over(byType))
        .select((col("b") * 3600000L).as("bucket_ms"), col("event_type"),
          col("locf"))
    },

    /** ev02 — sessionization: 30-min-gap sessions per user via
      * lag + cumulative flag sum — the mapGroupsWithState-free form
      * (streaming twin uses flatMapGroupsWithState). Single shuffle
      * on user_id; both windows share the same partitioning.
      */
    "ev02_sessionize" -> { (s, d) =>
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val ev = Tables.eventsTs(s, d)
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_us").isNull ||
            col("ts_us") - col("prev_us") > SessionGapUs, 1).otherwise(0))
        .withColumn("sess_id", sum(col("new_sess"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      ev.groupBy(col("user_id"))
        .agg(max(col("sess_id")).as("n_sessions"),
          count(lit(1)).as("n_events"))
    },

    /** ev19 — user-journey path mining: the most common event-type
      * sequences per 30-min session (ev02's sessionization), the
      * funnel-DISCOVERY twin of ev14's fixed-stage funnel — run it
      * first to learn WHICH paths deserve a funnel. Per session the
      * path folds IN-ROW (array_sort over (ts, event_id, type)
      * structs — event_id makes the order total, so ties cannot
      * reorder the string), then one count per distinct path and a
      * deterministic top-k via TakeOrdered (count desc, path asc) —
      * no global window. Scale: the windows partition per user, the
      * path agg shuffles one row per session, the ranking is the
      * distributed top-k.
      */
    "ev19_path_mining" -> { (s, d) =>
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val ev = Tables.eventsTs(s, d)
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_us").isNull ||
            col("ts_us") - col("prev_us") > SessionGapUs, 1).otherwise(0))
        .withColumn("sess_id", sum(col("new_sess"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      ev.groupBy(col("user_id"), col("sess_id"))
        .agg(array_join(transform(array_sort(collect_list(struct(
          col("ts_us"), col("event_id"), col("event_type")))),
          x => x("event_type")), ">").as("path"))
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path"))
        .limit(PathTopK)
    },

    /** ev20 — first-order Markov transitions between event types
      * WITHIN a session (ev02's sessionization): the transition
      * matrix behind ev19's raw paths — n and p = round6(n / out-
      * degree of the source type). Session boundaries break chains
      * (no cross-session transitions), the lag order is totalized by
      * event_id, and the probability join is a plain hash equi-join
      * on the 5-type domain. One user-partitioned window pass + two
      * tiny aggregations.
      */
    "ev20_markov_transitions" -> { (s, d) =>
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val ev = Tables.eventsTs(s, d)
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_us").isNull ||
            col("ts_us") - col("prev_us") > SessionGapUs, 1).otherwise(0))
        .withColumn("sess_id", sum(col("new_sess"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      val bySess = Window.partitionBy(col("user_id"), col("sess_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val pairs = ev
        .withColumn("prev_type", lag(col("event_type"), 1).over(bySess))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val totals = pairs.groupBy(col("prev_type"))
        .agg(sum(col("n")).as("tot"))
      pairs.join(totals, "prev_type")
        .select(col("prev_type"), col("event_type"), col("n"),
          round(col("n").cast("double") / col("tot").cast("double"), 6)
            .as("p"))
    },

    /** ev03 — the hot-tail guard (cli.rb:28-31) made deterministic:
      * "now" := max(ts), watermark = now − 60 s; scalar broadcast, no
      * second scan shuffle.
      */
    "ev03_hot_tail" -> { (s, d) =>
      val ev = Tables.eventsTs(s, d)
        .withColumn("ts_us", expr("ts_ns div 1000"))
      val maxTs = ev.agg(max(col("ts_us")).as("max_us"))
      ev.join(broadcast(maxTs),
          col("ts_us") <= col("max_us") - 60000000L)
        .agg(count(lit(1)).as("n_safe"),
          min(col("ts_us")).as("min_us"),
          max(col("ts_us")).as("max_safe_us"))
    },

    /** ev05 — as-of join composed from built-ins (preference tier (a):
      * no custom operator needed): each purchase event joined to the
      * user's most recent prior-or-simultaneous view event. Union the
      * two streams, carry the last view timestamp forward with a
      * running max over (user, time) — one shuffle on user_id, no
      * range-join blowup, the scalable as-of pattern.
      */
    "ev05_asof_join" -> { (s, d) =>
      val ev = Tables.eventsTs(s, d)
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .filter(col("event_type").isin("purchase", "view"))
        .select(col("user_id"), col("event_id"), col("ts_us"),
          col("event_type"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("last_view_us",
          max(when(col("event_type") === "view", col("ts_us"))).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts_us").as("purchase_us"), col("last_view_us"))
    },

    /** ev07 — the same enrichment as ev05 through the CUSTOM as-of
      * operator (tier (c): [[graft.plans.AsofJoinPlan]] planned by
      * [[graft.plans.AsofJoinStrategy]]): purchases as-of-joined to
      * the latest view at-or-before each purchase. Semantics are the
      * pure time form (a same-microsecond view counts regardless of
      * event id), hence its own oracle rather than ev05's. Both sides
      * branch from ONE events scan — also exercising the operator's
      * attribute-dedup path in production.
      */
    "ev07_asof_custom" -> { (s, d) =>
      val ev = Tables.eventsTs(s, d)
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .filter(col("event_type").isin("purchase", "view"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts_us").as("purchase_us"))
      val v = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"),
          col("ts_us").as("last_view_us"))
      graft.plans.Asof.join(p, v, Seq("user_id"), Seq("v_user"),
          "purchase_us", "last_view_us")
        .select(col("user_id"), col("purchase_id"), col("purchase_us"),
          col("last_view_us"))
    },

    /** ev08 — range (point-in-interval) join via bucketing
      * ([[graft.ext.RangeJoin]]): every purchase joined to the
      * 30-min-gap session interval (ev02's sessionization) containing
      * it. Sessions are derived from ALL events, so each purchase falls
      * in exactly one of its user's sessions — rows = #purchases. The
      * bucket width equals the session gap: a session spans few buckets
      * and the join stays a (user, bucket) equi-join, never a per-user
      * cartesian.
      */
    "ev08_range_join" -> { (s, d) =>
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val ev = Tables.eventsTs(s, d)
        .withColumn("ts_us", expr("ts_ns div 1000"))
      val sess = ev
        .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_us").isNull ||
            col("ts_us") - col("prev_us") > SessionGapUs, 1).otherwise(0))
        .withColumn("sess_id", sum(col("new_sess"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id").as("s_user"), col("sess_id"))
        .agg(min(col("ts_us")).as("start_us"),
          max(col("ts_us")).as("end_us"),
          count(lit(1)).as("n_sess_events"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts_us"))
      graft.ext.RangeJoin.pointInInterval(p, sess,
          Seq("user_id"), Seq("s_user"), "ts_us", "start_us", "end_us",
          bucketWidth = SessionGapUs)
        .select(col("user_id"), col("purchase_id"), col("sess_id"),
          col("start_us"), col("end_us"), col("n_sess_events"))
    },

    /** ev17 — interval-overlap join (the interval×interval sibling of
      * ev08): user sessions × severe-error incident windows (±15 min
      * around each error with value > 300), UNKEYED — any user's
      * session against any incident, the shape a naive join plans as
      * a BroadcastNestedLoopJoin; the bucket grid keeps it an
      * equi-join with the exactly-once responsibility rule (see
      * [[graft.ext.RangeJoin.intervalOverlap]]).
      */
    "ev17_interval_overlap" -> { (s, d) =>
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val ev = Tables.eventsTs(s, d)
        .withColumn("ts_us", expr("ts_ns div 1000"))
      val sess = ev
        .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_us").isNull ||
            col("ts_us") - col("prev_us") > SessionGapUs, 1).otherwise(0))
        .withColumn("sess_id", sum(col("new_sess"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id").as("s_user"), col("sess_id"))
        .agg(min(col("ts_us")).as("start_us"),
          max(col("ts_us")).as("end_us"))
      val inc = ev
        .filter(col("event_type") === "error" && col("value") > 300.0)
        .select(col("event_id").as("incident_id"),
          (col("ts_us") - 900000000L).as("i_start"),
          (col("ts_us") + 900000000L).as("i_end"))
      graft.ext.RangeJoin.intervalOverlap(sess, inc, Nil, Nil,
          "start_us", "end_us", "i_start", "i_end",
          bucketWidth = SessionGapUs)
        .select(col("s_user").as("user_id"), col("sess_id"),
          col("incident_id"),
          greatest(col("start_us"), col("i_start"))
            .as("overlap_start_us"),
          least(col("end_us"), col("i_end")).as("overlap_end_us"),
          (least(col("end_us"), col("i_end")) -
            greatest(col("start_us"), col("i_start"))).as("overlap_us"))
    },

    /** ev04 — F9-adjacent: JSON prop extraction from the event payload
      * (`props` is a JSON string) + per-type value stats.
      */
    /** ev09 — skew-salted fact⋈dim join, oracle-checked end-to-end:
      * the events fact side is salted (user_id is the canonical hot
      * key — 150 users over 10k+ events), the per-user dim derived by
      * aggregation is exploded across the salt space, and the join
      * result must equal the plain equi-join exactly. This
      * oracle-checks engine.SkewJoin's claim (salt never leaks, every
      * salt value covered) on the data plane, not just in a spec.
      * At 100 TB the same shape handles a hot-key join AQE's
      * partition-splitting can't fix (one key's hash bucket is
      * indivisible for a plain join).
      */
    "ev09_salted_join" -> { (s, d) =>
      val ev = Tables.eventsTs(s, d).select("user_id", "event_type")
      val dim = Tables.eventsTs(s, d)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_user_events"),
          min(col("event_id")).as("first_event_id"))
      graft.engine.SkewJoin.saltedEquiJoin(ev, dim, Seq("user_id"), salts = 8)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_user_events")).as("sum_user_n"),
          min(col("first_event_id")).as("min_first_id"))
    },

    "ev04_json_props" -> { (s, d) =>
      Tables.eventsTs(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          dsum(col("k"), 0).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
    })

  val oracles: Map[String, String] = Map(
    "ev18_interarrival_sketch" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |g AS (
        |  SELECT event_type,
        |    CAST(us - lag(us) OVER (PARTITION BY user_id, event_type
        |                            ORDER BY us) AS DOUBLE) AS gap
        |  FROM e)
        |SELECT event_type, CAST(COUNT(gap) AS BIGINT) AS n_gaps,
        |  round(quantile_cont(gap, 0.498), 1) AS p50_lo,
        |  round(quantile_cont(gap, 0.502), 1) AS p50_hi,
        |  TRUE AS p50_in_bound,
        |  round(quantile_cont(gap, 0.898), 1) AS p90_lo,
        |  round(quantile_cont(gap, 0.902), 1) AS p90_hi,
        |  TRUE AS p90_in_bound
        |FROM g WHERE gap IS NOT NULL
        |GROUP BY 1""".stripMargin,

    "ev16_interarrival" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |g AS (
        |  SELECT event_type,
        |    us - lag(us) OVER (PARTITION BY user_id, event_type
        |                       ORDER BY us) AS gap
        |  FROM e)
        |SELECT event_type, CAST(COUNT(gap) AS BIGINT) AS n_gaps,
        |  round(quantile_cont(gap, 0.5), 1) AS p50_us,
        |  round(quantile_cont(gap, 0.9), 1) AS p90_us
        |FROM g WHERE gap IS NOT NULL
        |GROUP BY 1""".stripMargin,

    "ev15_retention" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us FROM events),
        |f AS (
        |  SELECT user_id, MIN(us) // 604800000000 AS cw
        |  FROM e GROUP BY 1),
        |a AS (
        |  SELECT DISTINCT user_id, us // 604800000000 AS w FROM e)
        |SELECT CAST((cw * 604800000000) // 1000 AS BIGINT)
        |    AS cohort_week_ms,
        |  CAST(w - cw AS BIGINT) AS week_offset,
        |  CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
        |FROM a JOIN f USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    "ev14_funnel" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_type FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')),
        |s1 AS (
        |  SELECT user_id, MIN(us) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, MIN(us) AS t2 FROM e JOIN s1 USING (user_id)
        |  WHERE event_type = 'click' AND us >= t1 GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, MIN(us) AS t3 FROM e JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase' AND us >= t2 GROUP BY 1)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_view,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n_click,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS n_purchase,
        |  CAST(COALESCE((SELECT SUM(t3 - t1)
        |    FROM s3 JOIN s1 USING (user_id)), 0) AS BIGINT)
        |    AS total_convert_us""".stripMargin,

    "ev12_user_overlap" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_overlap FROM (
        |  SELECT user_id FROM events GROUP BY user_id
        |  HAVING MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) = 1
        |     AND MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) = 1)""".stripMargin,

    /** The KMV sketch replayed relationally: the k smallest DISTINCT
      * portable hashes per side are literally `ORDER BY h LIMIT k`,
      * the union sketch is the k smallest of the merged minima, and
      * the estimator repeats the engine's arithmetic
      * division-for-division ((k−1)/F(x_k), ρ/|u|·NDV(u)) on exact
      * integer inputs — so the rounded longs agree bit-for-bit.
      */
    "ev13_user_overlap_kmv" -> {
      val b60 = graft.ext.Hashing.base60Sql("CAST(user_id AS VARCHAR)")
      val sp = graft.engine.Sketches.HashSpace
      def ndv(n: String, x: String) =
        s"CASE WHEN $n < 256 THEN CAST($n AS DOUBLE) " +
          s"ELSE 255.0 / (CAST($x AS DOUBLE) / $sp) END"
      s"""WITH ca AS (
         |  SELECT DISTINCT $b60 AS h FROM events
         |  WHERE event_type = 'click' ORDER BY h LIMIT 256),
         |va AS (
         |  SELECT DISTINCT $b60 AS h FROM events
         |  WHERE event_type = 'view' ORDER BY h LIMIT 256),
         |un AS (
         |  SELECT DISTINCT h FROM (SELECT h FROM ca UNION ALL SELECT h FROM va)
         |  ORDER BY h LIMIT 256),
         |m AS (SELECT
         |  (SELECT COUNT(*) FROM ca) AS nca, (SELECT MAX(h) FROM ca) AS xca,
         |  (SELECT COUNT(*) FROM va) AS nva, (SELECT MAX(h) FROM va) AS xva,
         |  (SELECT COUNT(*) FROM un) AS nun, (SELECT MAX(h) FROM un) AS xun,
         |  (SELECT COUNT(*) FROM un u
         |     WHERE EXISTS (SELECT 1 FROM ca WHERE ca.h = u.h)
         |       AND EXISTS (SELECT 1 FROM va WHERE va.h = u.h)) AS rho)
         |SELECT
         |  CAST(round(${ndv("nca", "xca")}) AS BIGINT) AS ndv_click_est,
         |  CAST(round(${ndv("nva", "xva")}) AS BIGINT) AS ndv_view_est,
         |  CAST(round(CASE WHEN nun = 0 THEN 0.0
         |    ELSE (CAST(rho AS DOUBLE) / nun) * (${ndv("nun", "xun")}) END)
         |    AS BIGINT) AS n_overlap_est
         |FROM m""".stripMargin
    },

    "ev09_salted_join" ->
      """WITH dim AS (
        |  SELECT user_id, COUNT(*) AS n_user_events,
        |    MIN(event_id) AS first_event_id
        |  FROM events GROUP BY user_id)
        |SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(n_user_events) AS BIGINT) AS sum_user_n,
        |  MIN(first_event_id) AS min_first_id
        |FROM events JOIN dim USING (user_id)
        |GROUP BY event_type""".stripMargin,

    "ev01_tumbling" ->
      s"""SELECT (epoch_us(ts) // $HourUs) * 3600000 AS bucket_ms,
         |  event_type, COUNT(*) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM events
         |GROUP BY 1, 2""".stripMargin,

    "ev11_anomaly" ->
      """WITH c AS (
        |  SELECT epoch_us(ts) // 3600000000 AS b, event_type,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type AS et, COUNT(*) AS nb,
        |    SUM(n) AS s1, SUM(n * n) AS s2
        |  FROM c GROUP BY 1)
        |SELECT b * 3600000 AS bucket_ms, event_type, n,
        |  round(CAST(s1 AS DOUBLE) / nb, 4) AS mean_n
        |FROM c JOIN s ON event_type = et
        |WHERE n > CAST(s1 AS DOUBLE) / nb +
        |  3.0 * sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / nb)
        |             / nb)""".stripMargin,

    "ev10_locf" ->
      """WITH ev AS (
        |  SELECT epoch_us(ts) // 3600000000 AS b, event_type,
        |    epoch_us(ts) AS ts_us, event_id, value
        |  FROM events),
        |last_obs AS (
        |  SELECT b, event_type, value AS obs FROM ev
        |  QUALIFY row_number() OVER (PARTITION BY event_type, b
        |    ORDER BY ts_us DESC, event_id DESC) = 1),
        |bounds AS (SELECT MIN(b) AS lo, MAX(b) AS hi FROM ev),
        |spine AS (
        |  SELECT unnest(range(lo, hi + 1)) AS b, event_type
        |  FROM bounds, (SELECT DISTINCT event_type FROM ev))
        |SELECT b * 3600000 AS bucket_ms, event_type,
        |  last_value(obs IGNORE NULLS) OVER (PARTITION BY event_type
        |    ORDER BY b ROWS UNBOUNDED PRECEDING) AS locf
        |FROM last_obs RIGHT JOIN spine USING (b, event_type)""".stripMargin,

    "ev06_gapfill" ->
      """WITH ev AS (
        |  SELECT epoch_us(ts) // 3600000000 AS b, event_type FROM events),
        |counted AS (
        |  SELECT b, event_type, COUNT(*) AS n FROM ev GROUP BY 1, 2),
        |bounds AS (SELECT MIN(b) AS lo, MAX(b) AS hi FROM ev),
        |spine AS (SELECT unnest(range(lo, hi + 1)) AS b FROM bounds),
        |types AS (SELECT DISTINCT event_type FROM ev)
        |SELECT b * 3600000 AS bucket_ms, event_type,
        |  CAST(COALESCE(n, 0) AS BIGINT) AS n
        |FROM spine CROSS JOIN types
        |LEFT JOIN counted USING (b, event_type)""".stripMargin,

    "ev02_sessionize" ->
      s"""WITH flagged AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
         |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > $SessionGapUs
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
         |), sess AS (
         |  SELECT user_id,
         |    SUM(new_sess) OVER (PARTITION BY user_id
         |      ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS sess_id
         |  FROM flagged)
         |SELECT user_id, CAST(MAX(sess_id) AS BIGINT) AS n_sessions,
         |  COUNT(*) AS n_events
         |FROM sess GROUP BY user_id""".stripMargin,

    "ev03_hot_tail" ->
      """SELECT COUNT(*) AS n_safe, MIN(epoch_us(ts)) AS min_us,
        |  MAX(epoch_us(ts)) AS max_safe_us
        |FROM events
        |WHERE epoch_us(ts) <= (SELECT MAX(epoch_us(ts)) FROM events) - 60000000""".stripMargin,

    // ev02's session CTEs, then the within-session lag pairs and the
    // out-degree-normalized probability
    "ev20_markov_transitions" ->
      s"""WITH flagged AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
         |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
         |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > $SessionGapUs
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
         |), sess AS (
         |  SELECT user_id, event_type, ts_us, event_id,
         |    SUM(new_sess) OVER (PARTITION BY user_id
         |      ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS sess_id
         |  FROM flagged),
         |pairs AS (
         |  SELECT prev_type, event_type, COUNT(*) AS n FROM (
         |    SELECT user_id, sess_id, event_type,
         |      lag(event_type) OVER (PARTITION BY user_id, sess_id
         |        ORDER BY ts_us, event_id) AS prev_type
         |    FROM sess)
         |  WHERE prev_type IS NOT NULL
         |  GROUP BY prev_type, event_type),
         |tot AS (
         |  SELECT prev_type, SUM(n) AS tot FROM pairs GROUP BY prev_type)
         |SELECT p.prev_type, p.event_type, p.n,
         |  round(CAST(p.n AS DOUBLE) / CAST(t.tot AS DOUBLE), 6) AS p
         |FROM pairs p JOIN tot t ON t.prev_type = p.prev_type""".stripMargin,

    // ev02's session CTEs, then the ordered per-session path string
    // (event_id totalizes the order) and the tie-broken top-k
    "ev19_path_mining" ->
      s"""WITH flagged AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
         |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
         |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > $SessionGapUs
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
         |), sess AS (
         |  SELECT user_id, event_type, ts_us, event_id,
         |    SUM(new_sess) OVER (PARTITION BY user_id
         |      ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS sess_id
         |  FROM flagged),
         |paths AS (
         |  SELECT user_id, sess_id,
         |    string_agg(event_type, '>' ORDER BY ts_us, event_id) AS path
         |  FROM sess GROUP BY user_id, sess_id)
         |SELECT path, COUNT(*) AS n_sessions
         |FROM paths GROUP BY path
         |QUALIFY row_number() OVER (ORDER BY COUNT(*) DESC, path)
         |  <= $PathTopK""".stripMargin,

    "ev05_asof_join" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
        |  FROM events WHERE event_type IN ('purchase', 'view'))
        |SELECT user_id, event_id AS purchase_id, ts_us AS purchase_us,
        |  last_view_us
        |FROM (
        |  SELECT *, MAX(CASE WHEN event_type = 'view' THEN ts_us END)
        |    OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |          ROWS UNBOUNDED PRECEDING) AS last_view_us
        |  FROM ev)
        |WHERE event_type = 'purchase'""".stripMargin,

    // sessionize exactly as ev02/ev08, then the plain non-equi overlap
    // join DuckDB can afford at oracle scale (the Spark side's bucket
    // grid + responsibility rule must produce exactly this pair set)
    "ev17_interval_overlap" ->
      s"""WITH flagged AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
         |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > $SessionGapUs
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
         |), tagged AS (
         |  SELECT user_id, ts_us,
         |    SUM(new_sess) OVER (PARTITION BY user_id
         |      ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS sess_id
         |  FROM flagged
         |), sess AS (
         |  SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
         |    MIN(ts_us) AS start_us, MAX(ts_us) AS end_us
         |  FROM tagged GROUP BY user_id, sess_id
         |), inc AS (
         |  SELECT event_id AS incident_id,
         |    epoch_us(ts) - 900000000 AS i_start,
         |    epoch_us(ts) + 900000000 AS i_end
         |  FROM events WHERE event_type = 'error' AND value > 300.0)
         |SELECT s.user_id, s.sess_id, i.incident_id,
         |  GREATEST(s.start_us, i.i_start) AS overlap_start_us,
         |  LEAST(s.end_us, i.i_end) AS overlap_end_us,
         |  LEAST(s.end_us, i.i_end) - GREATEST(s.start_us, i.i_start)
         |    AS overlap_us
         |FROM sess s JOIN inc i
         |  ON s.start_us <= i.i_end AND i.i_start <= s.end_us""".stripMargin,

    // sessionize exactly as ev02, aggregate to intervals, then the
    // non-equi containment join DuckDB can afford at oracle scale
    "ev08_range_join" ->
      s"""WITH flagged AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
         |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > $SessionGapUs
         |         THEN 1 ELSE 0 END AS new_sess,
         |    event_type
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
         |), tagged AS (
         |  SELECT user_id, event_id, ts_us, event_type,
         |    SUM(new_sess) OVER (PARTITION BY user_id
         |      ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS sess_id
         |  FROM flagged
         |), sess AS (
         |  SELECT user_id AS s_user, CAST(sess_id AS BIGINT) AS sess_id,
         |    MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
         |    COUNT(*) AS n_sess_events
         |  FROM tagged GROUP BY 1, 2)
         |SELECT t.user_id, t.event_id AS purchase_id, s.sess_id,
         |  s.start_us, s.end_us, s.n_sess_events
         |FROM tagged t JOIN sess s
         |  ON s.s_user = t.user_id
         |  AND t.ts_us BETWEEN s.start_us AND s.end_us
         |WHERE t.event_type = 'purchase'""".stripMargin,

    // pure as-of truth: per purchase, the max view time at-or-before it
    // (the O(n²) formulation is fine at oracle scale; the operator is
    // the O(n log n) path)
    "ev07_asof_custom" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
        |  FROM events WHERE event_type IN ('purchase', 'view')),
        |p AS (
        |  SELECT user_id, event_id AS purchase_id, ts_us AS purchase_us
        |  FROM ev WHERE event_type = 'purchase'),
        |v AS (
        |  SELECT user_id, ts_us AS view_us FROM ev
        |  WHERE event_type = 'view')
        |SELECT p.user_id, p.purchase_id, p.purchase_us,
        |  MAX(v.view_us) AS last_view_us
        |FROM p LEFT JOIN v
        |  ON v.user_id = p.user_id AND v.view_us <= p.purchase_us
        |GROUP BY 1, 2, 3""".stripMargin,

    "ev04_json_props" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(CAST(json_extract_string(props, '$.k') AS INT) AS DECIMAL(18,0))) AS DOUBLE) AS sum_k,
        |  MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        |FROM events
        |GROUP BY event_type""".stripMargin)
}
