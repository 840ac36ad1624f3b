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

  /** Normalized events view: whatever physical type `ts` carries in the
    * parquet, expose BOTH a raw Long-nanos column (`ts_ns`) and a proper
    * TimestampType column (`ts`), in a fixed column order. The corpus has
    * shipped two encodings so far:
    *
    *   - TIMESTAMP(NANOS), which Spark's reader only accepts as a raw
    *     Long via spark.sql.legacy.parquet.nanosAsLong → LongType branch;
    *   - plain timestamp[us], which Spark reads as TIMESTAMP_NTZ
    *     (inferTimestampNTZ) or TIMESTAMP → timestamp branch.
    *
    * Dispatching on the ACTUAL schema keeps both corpora (and any
    * UpscaleCorpus shards) on the same downstream contract. The NTZ→TZ
    * cast is safe because every entry point pins the session TZ to UTC,
    * so the wall-clock reinterpretation is the identity on the stored
    * micros; `unix_micros` itself rejects NTZ input, hence the cast.
    */
  def eventsTs(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, sfDir, "events")
    val normalized = raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          // integer `div`, NOT `/`: double division of ~1.7e18 nanos loses
          // the low microsecond digits (53-bit mantissa)
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case TimestampNTZType | TimestampType =>
        // the NTZ→TZ cast is the identity on the stored micros ONLY
        // under a UTC session — checked here, not left to entry-point
        // discipline: a library consumer with session TZ
        // Europe/Berlin would otherwise silently shift every event
        require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
          "events.ts is TIMESTAMP_NTZ: set spark.sql.session.timeZone" +
            "=UTC before reading events, or the NTZ->TZ normalization " +
            s"shifts timestamps (session TZ is " +
            s"'${spark.conf.get("spark.sql.session.timeZone")}')")
        raw.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other (expected INT64 nanos or a timestamp)")
    }
    // pin the legacy column order (ts_ns in ts's slot, ts appended) so
    // both branches present an identical schema to every consumer
    val order = raw.columns.map { c => if (c == "ts") "ts_ns" else c } :+ "ts"
    normalized.select(order.map(col).toIndexedSeq: _*)
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
