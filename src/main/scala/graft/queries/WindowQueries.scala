package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window / sort / limit / set-operation surface (SURVEY.md §2.5-2.7).
  *
  * The reference needs windows in exactly two places — the version cap
  * and latest-session-per-table (SURVEY.md §2.5) — both ranking
  * windows; these queries pin those plus the running-frame variant.
  * Scale notes: every window here partitions by a key (supplier,
  * brand), so the sort is per-partition after one hash shuffle — no
  * global sort. The only global sort is the explicit top-k, which
  * Spark executes as TakeOrderedAndProject (heap of k per partition +
  * driver merge), not a full sort.
  */
object WindowQueries {

  val defs: Map[String, QueryFn] = Map(
    /** w01 — running revenue per supplier: rows-frame cumulative sum
      * in exact decimal, surfaced as double.
      */
    "w01_running_sum" -> { (s, d) =>
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).over(w)
            .cast("double").as("running_revenue"))
    },

    /** w02 — rank/dense_rank/row_number per brand by retail price:
      * the three ranking flavors in one deterministic plan.
      */
    "w02_rank_parts" -> { (s, d) =>
      val order = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
      Tables.part(s, d)
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
          row_number().over(order).as("rn"),
          rank().over(order).as("rnk"),
          dense_rank().over(order).as("drnk"))
        .filter(col("rn") <= 3)
    },

    /** w03 — latest-session-per-table as a window (the A2 alternative
      * form, SURVEY.md §2.5): max end_time over a partition.
      */
    "w03_latest_per_table" -> { (s, _) =>
      val f = graft.catalog.CatalogFixture.tablesDf(s)
        .filter(col("mode") === "export" && !col("error"))
      f.select(col("table_name"), col("session_name"), col("end_time"),
          max(col("end_time"))
            .over(Window.partitionBy(col("table_name"))).as("latest_end"))
        .filter(col("end_time") === col("latest_end"))
        .select("table_name", "session_name", "end_time")
    },

    /** t01 — global top-k: TakeOrderedAndProject, not a full sort. */
    "t01_topk_orders" -> { (s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice"),
          ms(col("o_orderdate")).as("order_ms"))
    },

    /** t02 — argmin (min-per-group recovering the full row): the
      * cheapest-supplier-per-nation shape, via the rank-1 window rather
      * than a self-join back (one shuffle on the group key; ties broken
      * on s_suppkey for a total order).
      */
    "t02_argmin_supplier" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("s_nationkey"))
        .orderBy(col("s_acctbal"), col("s_suppkey"))
      Tables.supplier(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("s_nationkey"), col("s_suppkey"), col("s_name"),
          col("s_acctbal"))
    },

    /** t03 — grouped top-k via the typed TopKAggregator (§2.10
      * Aggregator tier): same answer as the rank-window form, but the
      * k-bounded heap reduces each partition's contribution to ≤ k
      * rows BEFORE the exchange — the shuffle carries
      * O(partitions × k) rows per group instead of every row, and the
      * per-group cost is O(n log k), not a full sort. Oracle is the
      * window twin in DuckDB.
      */
    "t03_topk_agg" -> { (s, d) =>
      import s.implicits._
      val agg = graft.functions.TopKAggregator.topK(3)
      Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_totalprice"),
          col("o_orderkey"))
        .as[(String, Double, Long)]
        .groupByKey(_._1)
        .mapValues(t => (t._2, t._3, ""))
        .agg(agg.toColumn)
        .flatMap { case (prio, items) =>
          items.map(e => (prio, e._1, e._2)) }
        .toDF("o_orderpriority", "o_totalprice", "o_orderkey")
    },

    /** u01 — set ops: requested ∩ exported is the reference's only set
      * operation (import.rb:58, U1); INTERSECT/EXCEPT over nation keys
      * generalize it on payload data.
      */
    "u01_setops" -> { (s, d) =>
      val c = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val sup = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
      c.intersect(sup).withColumn("which", lit("both"))
        .unionAll(c.except(sup).withColumn("which", lit("customer_only")))
    })

  val oracles: Map[String, String] = Map(
    "w01_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_revenue
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1996-01-01'""".stripMargin,

    "w02_rank_parts" ->
      """SELECT p_brand, p_partkey, p_retailprice,
        |  row_number() OVER w AS rn,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk
        |FROM part
        |WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)
        |QUALIFY rn <= 3""".stripMargin,

    "w03_latest_per_table" -> graft.catalog.CatalogFixture.withCatalog(
      """SELECT table_name, session_name, end_time FROM (
        |  SELECT table_name, session_name, end_time,
        |    MAX(end_time) OVER (PARTITION BY table_name) AS latest_end
        |  FROM tables_cat WHERE mode = 'export' AND NOT error)
        |WHERE end_time = latest_end""".stripMargin),

    "t01_topk_orders" ->
      """SELECT o_orderkey, o_totalprice, epoch_ms(o_orderdate) AS order_ms
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "t02_argmin_supplier" ->
      """SELECT s_nationkey, s_suppkey, s_name, s_acctbal
        |FROM supplier
        |QUALIFY row_number() OVER (
        |  PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey) = 1""".stripMargin,

    "t03_topk_agg" ->
      """SELECT o_orderpriority, o_totalprice, o_orderkey
        |FROM orders
        |QUALIFY row_number() OVER (
        |  PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice DESC, o_orderkey) <= 3""".stripMargin,

    "u01_setops" ->
      """SELECT nationkey, 'both' AS which FROM
        |  (SELECT c_nationkey AS nationkey FROM customer
        |   INTERSECT SELECT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT nationkey, 'customer_only' FROM
        |  (SELECT c_nationkey AS nationkey FROM customer
        |   EXCEPT SELECT s_nationkey FROM supplier)""".stripMargin)
}
