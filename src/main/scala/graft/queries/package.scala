package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the query surface.
  *
  * Cross-engine determinism rules (see SURVEY.md §7.4):
  *  - never sum raw doubles: `sum(double)` order-depends on partitioning.
  *    Cast to decimal first (exact, associative), then back to double so
  *    the result schema matches DuckDB's `CAST(SUM(CAST(..)) AS DOUBLE)`.
  *  - timestamps cross the oracle boundary as epoch integers
  *    (millis for the ms-resolution TPC-H columns, micros for the
  *    ns-resolution events, which DuckDB truncates to micros on read).
  *  - every top-k has a total-order tiebreak on a unique key.
  */
package object queries {
  type QueryFn = (SparkSession, String) => DataFrame

  /** Exact, order-insensitive sum of a double column: decimal-cast
    * partial/final aggregation, result surfaced as double.
    */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** Exact average: decimal sum surfaced as double, then ONE double
    * division — the same op order DuckDB performs for
    * `CAST(SUM(CAST(x AS DECIMAL)) AS DOUBLE) / COUNT(*)`, so results
    * are bit-identical. (Dividing in decimal first is NOT portable:
    * Spark and DuckDB pick different result scales.)
    */
  def davg(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double") / count(lit(1))

  /** Epoch-millis of a (ms-resolution) timestamp column. The payload
    * parquet is TIMESTAMP_NTZ; with the session TZ pinned to UTC the
    * cast to TIMESTAMP is lossless and matches DuckDB's epoch_ms.
    */
  def ms(c: Column): Column = unix_millis(c.cast("timestamp"))
}
