package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Headline analytic queries over the payload tables — the "would this
  * hold at 100 TB" showcases. All joins broadcast the small side, all
  * aggregates are partial+final hash aggregates, every scan projects
  * and filters at the parquet reader (verified via explain in
  * PlanSpec).
  */
object AnalyticsQueries {

  /** q01 — TPC-H Q1-shaped pricing summary. Reference parity target:
    * the "integrity metrics" the reference wants per backup
    * (/root/reference/README.textile:189-191) generalized to a full
    * scan-aggregate. One shuffle (2 grouping keys), map-side partials.
    */
  val defs: Map[String, QueryFn] = Map(
    "q01_pricing_summary" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },

    /** q03 — shipping-priority style 3-way join + top-10. customer is
      * broadcast (small dim); orders⋈lineitem shuffles on orderkey.
      * Deterministic top-k: rounded decimal revenue + orderkey tiebreak.
      */
    "q03_revenue_topn" -> { (s, d) =>
      val c = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("revenue"), ms(col("o_orderdate")).as("order_ms"))
    },

    /** q05 — star join through region→nation→customer→orders→lineitem
      * with the supplier co-location predicate. nation/region are
      * fixed-cardinality (25/5 rows at every SF) so they carry explicit
      * broadcast hints; customer and supplier scale linearly with SF, so
      * the hint is deliberately omitted — AQE broadcasts them at small
      * SF and falls back to shuffle joins when they outgrow the
      * broadcast threshold at cluster scale. The single guaranteed
      * shuffle is the final group-by on n_name.
      */
    "q05_region_revenue" -> { (s, d) =>
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val n = Tables.nation(s, d)
      val cdim = Tables.customer(s, d).select("c_custkey", "c_nationkey")
      val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val l = Tables.lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(cdim, col("o_custkey") === col("c_custkey"))
        .join(sup,
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("revenue"))
    },

    /** q04 — EXISTS as a left-semi join (never a subquery re-scan):
      * orders having at least one returned line, counted per priority.
      */
    "q04_semi_exists" -> { (s, d) =>
      val returned = Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey")
      Tables.orders(s, d)
        .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
    },

    /** q22 — NOT EXISTS as a left-anti join: customers with no orders,
      * per market segment.
      */
    "q22_anti_not_exists" -> { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          dsum(col("c_acctbal")).as("sum_acctbal"))
    },

    /** q06 — pure filter-aggregate (no join, no group): the
      * pushdown-only scan shape; the whole query is one codegen stage
      * over pruned row groups.
      */
    "q06_forecast_revenue" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount"), 4)
          .as("revenue"), count(lit(1)).as("n_lines"))
    },

    /** q12 — conditional aggregation (CASE inside SUM): per return
      * flag, how many high- vs low-priority orders shipped.
      */
    "q12_priority_shipping" -> { (s, d) =>
      val highPrio = col("o_orderpriority") === "1-URGENT" ||
        col("o_orderpriority") === "2-HIGH"
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(sum(when(highPrio, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!highPrio, 1L).otherwise(0L)).as("low_line_count"))
    },

    /** q13 — left-outer + two-level aggregation: distribution of
      * customers by order count (the null-preserving join shape).
      */
    "q13_outer_distribution" -> { (s, d) =>
      val perCust = Tables.customer(s, d).select("c_custkey")
        .join(Tables.orders(s, d).select("o_custkey", "o_orderkey"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    },

    /** q07 — volume shipping between two nation pairs: the double-dim
      * join shape (nation joined twice under different roles). The
      * fixed-size nation sides broadcast by hint; supplier/customer
      * scale with the data, so their join strategy is left to AQE
      * (broadcast at small SF, shuffle join beyond the 8 GB broadcast
      * limit). The one big shuffle is lineitem⋈orders on orderkey,
      * then a 3-key group-by.
      */
    "q07_volume_shipping" -> { (s, d) =>
      val n1 = Tables.nation(s, d)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d)
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
      val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
      val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate").between(
          lit("1995-01-01").cast("timestamp"),
          lit("1996-12-31").cast("timestamp")))
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
          "l_shipdate")
      val pairs = (col("supp_nation") === "NATION_1" &&
        col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1")
      l.join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter(pairs)
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("revenue"))
    },

    /** q10 — returned-item customer ranking: 3-way join + top-20 on
      * aggregated revenue (TakeOrdered, never a global sort). customer
      * scales with SF — no broadcast hint, AQE decides; only the
      * fixed-size nation dim is hinted.
      */
    "q10_returned_items" -> { (s, d) =>
      val c = Tables.customer(s, d)
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
      val n = Tables.nation(s, d).select("n_nationkey", "n_name")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate").between(
          lit("1995-10-01").cast("timestamp"),
          lit("1996-01-01").cast("timestamp")))
        .select("o_orderkey", "o_custkey")
      val l = Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    /** q18 — large-order customers: the group-filter (HAVING) shape
      * feeding a join back to the dimension side. customer scales with
      * SF — join strategy left to AQE.
      */
    "q18_large_orders" -> { (s, d) =>
      val bigOrders = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(dsum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 150.0)
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      val c = Tables.customer(s, d).select("c_custkey", "c_name")
      bigOrders.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          ms(col("o_orderdate")).as("order_ms"), col("o_totalprice"),
          col("total_qty"))
    },

    /** q02 — correlated-min lookup (TPC-H Q2 shape, adapted: no
      * partsupp table, so the "min supply cost per part" becomes "min
      * retail price per type"): an aggregate subquery de-correlated
      * into a tiny group-by joined back to the base table, ties kept.
      * The per-type min table is bounded by the p_type domain (6 fixed
      * values at every SF) — broadcast hint is safe, unlike the
      * SF-scaling dims.
      */
    "q02_cheapest_part" -> { (s, d) =>
      val p = Tables.part(s, d)
        .select("p_partkey", "p_name", "p_type", "p_retailprice")
      val mins = p.groupBy(col("p_type").as("mt"))
        .agg(min(col("p_retailprice")).as("min_price"))
      // equality on raw parquet doubles is exact — no arithmetic on
      // either side of the comparison
      p.join(broadcast(mins),
          col("p_type") === col("mt") &&
            col("p_retailprice") === col("min_price"))
        .select(col("p_type"), col("p_partkey"), col("p_name"),
          col("p_retailprice"))
    },

    /** q08 — market-share: the conditional-share aggregation over a
      * two-role nation join (customer's region gates the rows, the
      * supplier's nation feeds the numerator). Fixed-cardinality
      * nation/region broadcast by hint; part/customer/supplier scale
      * with SF — AQE decides. Share = decimal-exact numerator /
      * decimal-exact denominator, one double division (portable).
      */
    "q08_market_share" -> { (s, d) =>
      val r = Tables.region(s, d).filter(col("r_name") === "EUROPE")
      val n1 = Tables.nation(s, d)
        .select(col("n_nationkey").as("c_nk"), col("n_regionkey"))
      val n2 = Tables.nation(s, d)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val p = Tables.part(s, d)
        .filter(col("p_type") === "ECONOMY").select("p_partkey")
      val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
      val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
          "l_discount")
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((dsum(when(col("supp_nation") === "NATION_7", vol)
            .otherwise(lit(0.0)), 4) / dsum(vol, 4)).as("mkt_share"))
    },

    /** q11 — group-filter against a global scalar (TPC-H Q11 shape):
      * per-brand revenue kept only where it exceeds a fraction of
      * total revenue. The scalar total is a one-row aggregate joined
      * in by (always-safe) broadcast; both sides are decimal-exact
      * sums so the threshold comparison is bit-identical cross-engine.
      */
    "q11_brand_share" -> { (s, d) =>
      val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      val lp = Tables.lineitem(s, d)
        .select("l_partkey", "l_extendedprice", "l_discount")
        .join(Tables.part(s, d).select("p_partkey", "p_brand"),
          col("l_partkey") === col("p_partkey"))
      val perBrand = lp.groupBy(col("p_brand"))
        .agg(dsum(vol, 4).as("brand_rev"))
      val total = lp.agg(dsum(vol, 4).as("total_rev"))
      perBrand.join(broadcast(total))
        .filter(col("brand_rev") > lit(0.042) * col("total_rev"))
        .select(col("p_brand"), col("brand_rev"))
    },

    /** q14 — promo-revenue ratio per ship year: conditional numerator
      * over unconditional denominator in one aggregation pass (no
      * second scan for the total). part scales with SF — AQE decides
      * the join side.
      */
    "q14_promo_revenue" -> { (s, d) =>
      val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      Tables.lineitem(s, d)
        .select("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
        .join(Tables.part(s, d).select("p_partkey", "p_type"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(year(col("l_shipdate")).as("l_year"))
        .agg(((lit(100.0) * dsum(when(col("p_type") === "PROMO", vol)
          .otherwise(lit(0.0)), 4)) / dsum(vol, 4)).as("promo_pct"))
    },

    /** q15 — argmax against an aggregate-of-aggregates (TPC-H Q15's
      * view + max shape): supplier revenue for one quarter, keeping
      * the supplier(s) whose revenue equals the global max. The max is
      * a one-row aggregate — broadcast unconditionally. Equality on
      * doubles is safe: both sides are the same decimal-exact sums.
      */
    "q15_top_supplier" -> { (s, d) =>
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("total_revenue"))
      val maxRev = rev.agg(max(col("total_revenue")).as("max_rev"))
      rev.join(broadcast(maxRev), col("total_revenue") === col("max_rev"))
        .join(Tables.supplier(s, d).select("s_suppkey", "s_name"),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
    },

    /** q17 — correlated average de-correlated (TPC-H Q17 shape):
      * lines whose quantity is under 20% of their part's average
      * quantity. The correlated scalar subquery becomes a per-part
      * aggregate joined back on partkey (AQE decides the side — the
      * agg output scales with the filtered part count). davg is
      * decimal-exact, so the 0.2*avg threshold is bit-identical
      * cross-engine.
      */
    "q17_small_quantity" -> { (s, d) =>
      val p = Tables.part(s, d)
        .filter(col("p_brand") === "Brand#3" && col("p_type") === "ECONOMY")
        .select("p_partkey")
      val lp = Tables.lineitem(s, d)
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(p, col("l_partkey") === col("p_partkey"))
      val avgq = lp.groupBy(col("l_partkey").as("ap"))
        .agg(davg(col("l_quantity")).as("avg_qty"))
      lp.join(avgq, col("l_partkey") === col("ap"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
          count(lit(1)).as("n_lines"))
    },

    /** q19 — disjunction of conjunctions across both join sides
      * (TPC-H Q19 shape): the predicate can't be pushed whole, but
      * Catalyst's constraint extraction pushes the per-table residuals
      * (brand/size to the part scan, quantity to the lineitem scan).
      * PlanSpec pins that.
      */
    "q19_disjunctive" -> { (s, d) =>
      val clause = (col("p_brand") === "Brand#12" &&
        col("p_size").between(1, 5) && col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" &&
          col("p_size").between(1, 10) && col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#24" &&
          col("p_size").between(1, 15) && col("l_quantity").between(20, 30))
      Tables.lineitem(s, d)
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
        .join(Tables.part(s, d).select("p_partkey", "p_brand", "p_size"),
          col("l_partkey") === col("p_partkey"))
        .filter(clause)
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("revenue"), count(lit(1)).as("n_lines"))
    },

    /** q21 — the double-correlated EXISTS / NOT EXISTS shape (TPC-H
      * Q21 adapted — no commit/receipt dates, so "late" is shipdate
      * more than 90 days after the order date): suppliers who were the
      * sole late shipper of a multi-supplier order. Both subqueries
      * become self-joins on orderkey — a left-semi (another supplier
      * exists) then a left-anti (no other *late* supplier) — hash
      * joins on orderkey with the supplier inequality as a residual
      * condition, never a nested loop. nation is fixed-size
      * (broadcast hint); supplier scales (AQE).
      */
    "q21_sole_late_supplier" -> { (s, d) =>
      val nat = Tables.nation(s, d).filter(col("n_name") === "NATION_3")
        .select("n_nationkey")
      val sup = Tables.supplier(s, d).select("s_suppkey", "s_name", "s_nationkey")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name")
      val l = Tables.lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_shipdate")
      val late = l
        .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
      late.join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(l.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2")),
          col("l_orderkey") === col("ok2") && col("l_suppkey") =!= col("sk2"),
          "left_semi")
        .join(late.select(col("l_orderkey").as("ok3"),
            col("l_suppkey").as("sk3")),
          col("l_orderkey") === col("ok3") && col("l_suppkey") =!= col("sk3"),
          "left_anti")
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(10)
    },

    /** q09 — product-type profit (TPC-H Q9 shape, adapted: no partsupp
      * table, so supply cost is modeled as 60% of the part's retail
      * price): a 5-way join with a computed measure aggregated by
      * supplier nation × order year. nation is fixed-size (broadcast
      * hint); part/supplier scale with SF (AQE decides); the two
      * SF-scaling shuffles are lineitem⋈orders on orderkey and the
      * final 2-key group-by. The profit expression is evaluated in
      * double (IEEE-identical cross-engine) and decimal-cast before
      * the order-insensitive sum.
      */
    "q09_product_profit" -> { (s, d) =>
      val p = Tables.part(s, d)
        .filter(col("p_name").contains("red"))
        .select("p_partkey", "p_retailprice")
      val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
      val n = Tables.nation(s, d).select("n_nationkey", "n_name")
      val o = Tables.orders(s, d).select("o_orderkey", "o_orderdate")
      val profit = col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
        lit(0.6) * col("p_retailprice") * col("l_quantity")
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
          "l_extendedprice", "l_discount")
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(dsum(profit, 4).as("sum_profit"))
    },

    /** q16 — supplier-relation count (TPC-H Q16 shape, adapted: the
      * part↔supplier relation is derived from lineitem since there is
      * no partsupp): DISTINCT-aggregation over a join, minus an
      * excluded-supplier list applied as a left-anti join (never a
      * NOT IN subquery re-scan). count_distinct is the two-shuffle
      * partial-distinct shape — dedup on (group keys, l_suppkey)
      * map-side first, so the second shuffle moves only distinct
      * pairs. The exclusion list is tiny (LIKE over supplier) and
      * stays on the build side at any SF.
      */
    "q16_supplier_relation" -> { (s, d) =>
      val excluded = Tables.supplier(s, d)
        .filter(col("s_name").like("%7"))
        .select("s_suppkey")
      val p = Tables.part(s, d)
        .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 5, 10, 15, 20, 25))
        .select("p_partkey", "p_brand", "p_size")
      Tables.lineitem(s, d).select("l_partkey", "l_suppkey")
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(excluded, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    },

    /** q20 — excess-stock suppliers (TPC-H Q20 shape, adapted: with no
      * partsupp.availqty, "excess" means the supplier shipped more
      * than half of a part's total 1996 volume): two aggregations of
      * the SAME filtered scan at different granularities — per
      * (part, supplier) and per part — joined on partkey to apply the
      * half-of-total threshold, then the qualifying supplier set
      * applied to the dimension side as a left-semi join. The window
      * scan is computed once per aggregate but shares the pushed
      * semi-join + date filters; both aggregates shuffle on (subsets
      * of) partkey. Threshold compare is double-vs-double of
      * decimal-exact sums — bit-identical cross-engine.
      */
    "q20_excess_stock" -> { (s, d) =>
      val redParts = Tables.part(s, d)
        .filter(col("p_name").like("red%"))
        .select("p_partkey")
      val w = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(redParts, col("l_partkey") === col("p_partkey"), "left_semi")
      val pairQty = w.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(dsum(col("l_quantity")).as("pair_qty"))
      val partQty = w.groupBy(col("l_partkey").as("pk"))
        .agg(dsum(col("l_quantity")).as("part_qty"))
      val dominant = pairQty
        .join(partQty, col("l_partkey") === col("pk"))
        .filter(col("pair_qty") > lit(0.5) * col("part_qty"))
        .select(col("l_suppkey"))
        .distinct()
      val nat = Tables.nation(s, d)
        .filter(col("n_name") === "NATION_2")
        .select("n_nationkey")
      Tables.supplier(s, d)
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
    },

    /** a05 — ROLLUP grouping sets with grouping_id: the subtotal /
      * grand-total report shape. One shuffle; Spark expands the
      * grouping sets map-side (Expand), so partial aggregation still
      * applies.
      */
    "a05_rollup" -> { (s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          dsum(col("l_quantity")).as("sum_qty"),
          grouping_id().as("gid"))
    },

    /** a06 — pivot (columns from values): per line status, order counts
      * by return flag. Missing combinations surface as 0 (coalesced —
      * pivot leaves them null, the oracle's conditional count yields 0).
      */
    "a06_pivot" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .count()
        .select(col("l_linestatus"),
          coalesce(col("A"), lit(0L)).as("A"),
          coalesce(col("N"), lit(0L)).as("N"),
          coalesce(col("R"), lit(0L)).as("R"))
    })

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  private val q03Sql =
    """SELECT o_orderkey,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  epoch_ms(o_orderdate) AS order_ms
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15'
      |  AND l_shipdate > TIMESTAMP '1995-03-15'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin

  private val q05Sql =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name""".stripMargin

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q03_revenue_topn" -> q03Sql,
    "q05_region_revenue" -> q05Sql,

    "q04_semi_exists" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority""".stripMargin,

    "q22_anti_not_exists" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment""".stripMargin,

    "q06_forecast_revenue" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q12_priority_shipping" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |GROUP BY l_returnflag""".stripMargin,

    "q13_outer_distribution" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,

    "q07_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') OR
        |       (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate BETWEEN TIMESTAMP '1995-10-01' AND TIMESTAMP '1996-01-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 150.0)
        |SELECT c_custkey, c_name, o_orderkey, epoch_ms(o_orderdate) AS order_ms,
        |  o_totalprice, total_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin,

    "q02_cheapest_part" ->
      """SELECT p_type, p_partkey, p_name, p_retailprice
        |FROM part p
        |WHERE p_retailprice = (SELECT min(p_retailprice) FROM part p2
        |                       WHERE p2.p_type = p.p_type)""".stripMargin,

    "q08_market_share" ->
      """SELECT year(o_orderdate) AS o_year,
        |  CAST(SUM(CAST(CASE WHEN n2.n_name = 'NATION_7'
        |      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
        |    AS DECIMAL(18,4))) AS DOUBLE) /
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1""".stripMargin,

    "q11_brand_share" ->
      """WITH lp AS (
        |  SELECT p_brand,
        |    CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) AS v
        |  FROM lineitem JOIN part ON l_partkey = p_partkey)
        |SELECT p_brand, CAST(SUM(v) AS DOUBLE) AS brand_rev
        |FROM lp
        |GROUP BY p_brand
        |HAVING CAST(SUM(v) AS DOUBLE) >
        |  0.042 * (SELECT CAST(SUM(v) AS DOUBLE) FROM lp)""".stripMargin,

    "q14_promo_revenue" ->
      """SELECT year(l_shipdate) AS l_year,
        |  100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
        |      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
        |    AS DECIMAL(18,4))) AS DOUBLE) /
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS promo_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |      AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)""".stripMargin,

    "q17_small_quantity" ->
      """WITH lp AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#3' AND p_type = 'ECONOMY'),
        |avgq AS (
        |  SELECT l_partkey AS ap,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      / COUNT(*) AS avg_qty
        |  FROM lp GROUP BY l_partkey)
        |SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / 7.0 AS avg_yearly,
        |  COUNT(*) AS n_lines
        |FROM lp JOIN avgq ON l_partkey = ap
        |WHERE l_quantity < 0.2 * avg_qty""".stripMargin,

    "q19_disjunctive" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q21_sole_late_supplier" ->
      """WITH late AS (
        |  SELECT l_orderkey, l_suppkey
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |SELECT s_name, COUNT(*) AS numwait
        |FROM late l1
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_3'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 10""".stripMargin,

    "q09_product_profit" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |    - 0.6 * p_retailprice * l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2""".stripMargin,

    "q16_supplier_relation" ->
      """SELECT p_brand, p_size,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 5, 10, 15, 20, 25)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
        |GROUP BY 1, 2""".stripMargin,

    "q20_excess_stock" ->
      """WITH w AS (
        |  SELECT l_partkey, l_suppkey, l_quantity
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01'
        |    AND l_partkey IN
        |      (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')),
        |pair AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS pair_qty
        |  FROM w GROUP BY 1, 2),
        |ptot AS (
        |  SELECT l_partkey AS pk,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS part_qty
        |  FROM w GROUP BY 1)
        |SELECT s_suppkey, s_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_2'
        |  AND EXISTS (SELECT 1 FROM pair JOIN ptot ON l_partkey = pk
        |              WHERE pair_qty > 0.5 * part_qty
        |                AND l_suppkey = s_suppkey)""".stripMargin,

    "a05_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,

    "a06_pivot" ->
      """SELECT l_linestatus,
        |  COUNT(CASE WHEN l_returnflag = 'A' THEN 1 END) AS "A",
        |  COUNT(CASE WHEN l_returnflag = 'N' THEN 1 END) AS "N",
        |  COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS "R"
        |FROM lineitem
        |GROUP BY l_linestatus""".stripMargin)
}
