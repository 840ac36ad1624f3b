package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided Parquet corpus (TESTDATA.md).
  *
  * These stand in for the reference's HBase tables: hbacker never
  * materializes payload rows itself, it only orchestrates scans of them
  * (/root/reference/lib/hbacker/export.rb:145-169); our engine reads them
  * as columnar Parquet DataFrames so Catalyst can push filters/projections
  * into the scan.
  */
object Tables {
  /** Every table in an sf dir, in a fixed order (stable across engines). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(sfDir: String, name: String): String = {
    val d = if (sfDir.endsWith("/")) sfDir.dropRight(1) else sfDir
    s"$d/$name.parquet"
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(path(sfDir, name))

  /** events.parquet carries TIMESTAMP(NANOS), which the Spark parquet reader
    * rejects ([PARQUET_TYPE_ILLEGAL]). Read it as raw Long nanos
    * (spark.sql.legacy.parquet.nanosAsLong) and expose both the raw value
    * (`ts_ns`) and a truncated-to-micros proper TimestampType (`ts`). The
    * session-level flag is set once in GraftSession.
    */
  def eventsTs(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, sfDir, "events")
      .withColumnRenamed("ts", "ts_ns")
      // integer `div`, NOT `/`: double division of ~1.7e18 nanos loses
      // the low microsecond digits (53-bit mantissa)
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
