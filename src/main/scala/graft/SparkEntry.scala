package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 is surfaced here as a named,
  * deterministic query paired (where SQL-expressible) with a DuckDB
  * oracle. Query modules:
  *   - AnalyticsQueries  — headline scan/join/agg (q*)
  *   - EngineQueries     — export/import scan semantics (e*)
  */
object SparkEntry {

  private val modules: Seq[(Map[String, QueryFn], Map[String, String])] = Seq(
    (AnalyticsQueries.defs, AnalyticsQueries.oracles),
    (EngineQueries.defs, EngineQueries.oracles),
    (CatalogQueries.defs, CatalogQueries.oracles),
    (WindowQueries.defs, WindowQueries.oracles),
    (EventQueries.defs, EventQueries.oracles),
    (TextQueries.defs, TextQueries.oracles),
    (DedupQueries.defs, DedupQueries.oracles),
    (SimilarityQueries.defs, SimilarityQueries.oracles),
    (WarcQueries.defs, WarcQueries.oracles))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.flatMap(_._2).toMap
}
