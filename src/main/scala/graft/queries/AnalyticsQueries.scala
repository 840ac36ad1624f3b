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
