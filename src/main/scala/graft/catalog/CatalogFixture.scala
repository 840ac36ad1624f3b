package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic catalog fixture shared by the catalog-plane queries and
  * their DuckDB oracles.
  *
  * The reference's catalog is populated by live backup runs; the
  * driver's oracle only sees the payload parquet tables, so the
  * catalog-plane queries (SURVEY.md §2.2-2.4) run against this literal,
  * versioned-in-code catalog instead. The SQL CTE text is *generated
  * from the same case-class rows* the Spark side uses, so the two can
  * never drift.
  *
  * Shapes follow the reference's own spec fixtures
  * (/root/reference/spec/hbacker/export_spec.rb:23-29,
  * worker_spec.rb:56-76): UTC second-resolution session names,
  * epoch-millis windows, `0` sentinel for not-yet-ended sessions.
  */
object CatalogFixture {
  // epoch-millis anchors (UTC midnights)
  val T1995: Long = 788918400000L   // 1995-01-01
  val T1998: Long = 883612800000L   // 1998-01-01
  val T2000: Long = 946684800000L   // 2000-01-01
  val T2002: Long = 1009843200000L  // 2002-01-01 (beyond max l_shipdate)

  val S1 = "20240101_000000" // full export of cluster_a
  val S2 = "20240201_000000" // incremental export of cluster_a
  val S3 = "20240215_120000" // partial export of cluster_b (not ended)
  val S4 = "20240301_000000" // import into cluster_b

  val RootA = "file:///bk/a/"
  val RootB = "file:///bk/b/"

  val allTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  val sessions: Seq[BackupSession] = Seq(
    BackupSession("export", "cluster_a", S1, RootA, 0L, T1998,
      1704067200000L, 1704067500000L, error = false, ""),
    BackupSession("export", "cluster_a", S2, RootA, T1998, T2000,
      1706745600000L, 1706745900000L, error = false, ""),
    BackupSession("export", "cluster_b", S3, RootB, 0L, T2000,
      1707998400000L, 0L, error = false, ""),
    BackupSession("import", "cluster_b", S4, RootA, 0L, 0L,
      1709251200000L, 1709251500000L, error = true,
      "table orders: hadoop import returned 1"))

  val tables: Seq[TableRecord] = {
    val full = allTables.map { t =>
      TableRecord("export", t, S1, 0L, T1998, 100000L,
        empty = false, error = false, "", 1000L)
    }
    val incr = Seq("lineitem", "orders", "events").map { t =>
      TableRecord("export", t, S2, T1998, T2000, 100000L,
        empty = false, error = false, "", 400L)
    }
    val partial = Seq(
      TableRecord("export", "lineitem", S3, 0L, T2000, 100000L,
        empty = false, error = false, "", 1400L),
      TableRecord("export", "orders", S3, 0L, T2000, 100000L,
        empty = false, error = true, "RequestTimeTooSkewed", -1L),
      TableRecord("export", "customer", S3, 0L, T2000, 100000L,
        empty = true, error = false, "", 0L))
    val imp = Seq(
      TableRecord("import", "lineitem", S4, 0L, T2000, 100000L,
        empty = false, error = false, "", 1400L),
      TableRecord("import", "orders", S4, 0L, T2000, 100000L,
        empty = false, error = true, "hadoop import returned 1", -1L))
    full ++ incr ++ partial ++ imp
  }

  val descriptors: Seq[ColumnDescriptor] = {
    var ord = -1
    var prevTable = ""
    def d(table: String, name: String, dt: String, mv: Int): ColumnDescriptor = {
      ord = if (table == prevTable) ord + 1 else 0
      prevTable = table
      ColumnDescriptor(S1, table, ord, name, dt, nullable = true, mv,
        "SNAPPY", in_memory = false, block_cache = true,
        ttl = 2147483647L, blocksize = 65536L, bloomfilter = "NONE")
    }
    Seq(
      d("lineitem", "l_orderkey", "bigint", 1),
      d("lineitem", "l_partkey", "bigint", 1),
      d("lineitem", "l_suppkey", "bigint", 1),
      d("lineitem", "l_linenumber", "int", 1),
      d("lineitem", "l_quantity", "double", 1),
      d("lineitem", "l_extendedprice", "double", 1),
      d("lineitem", "l_discount", "double", 1),
      d("lineitem", "l_tax", "double", 1),
      d("lineitem", "l_returnflag", "string", 3),
      d("lineitem", "l_linestatus", "string", 3),
      d("lineitem", "l_shipdate", "timestamp", 1),
      d("events", "event_id", "bigint", 1),
      d("events", "ts", "timestamp", 100000),
      d("events", "user_id", "bigint", 1),
      d("events", "event_type", "string", 100000),
      d("events", "value", "double", 100000),
      d("events", "props", "string", 100000),
      d("documents", "doc_id", "bigint", 1),
      d("documents", "text", "string", 2),
      d("documents", "lang", "string", 1),
      d("documents", "source", "string", 1),
      d("documents", "n_chars", "bigint", 1))
  }

  def sessionsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    sessions.toDF()
  }
  def tablesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    tables.toDF()
  }
  def descriptorsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    descriptors.toDF()
  }

  // ---- SQL side (generated from the very same rows) ----

  private def lit(v: Any): String = v match {
    case s: String  => "'" + s.replace("'", "''") + "'"
    case b: Boolean => if (b) "true" else "false"
    case n          => n.toString
  }

  private def valuesCte(name: String, cols: Seq[String],
                        rows: Seq[Seq[Any]]): String = {
    val body = rows.map(_.map(lit).mkString("(", ", ", ")")).mkString(",\n    ")
    s"$name(${cols.mkString(", ")}) AS (\n  VALUES\n    $body\n)"
  }

  val sessionsCte: String = valuesCte("sessions_cat",
    Seq("mode", "cluster_name", "session_name", "dest_root",
      "specified_start", "specified_end", "started_at", "ended_at",
      "error", "error_info"),
    sessions.map(s => Seq(s.mode, s.cluster_name, s.session_name,
      s.dest_root, s.specified_start, s.specified_end, s.started_at,
      s.ended_at, s.error, s.error_info)))

  val tablesCte: String = valuesCte("tables_cat",
    Seq("mode", "table_name", "session_name", "start_time", "end_time",
      "specified_versions", "empty", "error", "error_info", "row_count"),
    tables.map(t => Seq(t.mode, t.table_name, t.session_name,
      t.start_time, t.end_time, t.specified_versions, t.empty, t.error,
      t.error_info, t.row_count)))

  val descriptorsCte: String = valuesCte("descs_cat",
    Seq("session_name", "table_name", "ordinal", "name", "data_type",
      "nullable", "max_versions", "compression", "in_memory",
      "block_cache", "ttl", "blocksize", "bloomfilter"),
    descriptors.map(c => Seq(c.session_name, c.table_name, c.ordinal,
      c.name, c.data_type, c.nullable, c.max_versions, c.compression,
      c.in_memory, c.block_cache, c.ttl, c.blocksize, c.bloomfilter)))

  /** Wrap a SELECT with the catalog CTEs (DuckDB side of each
    * catalog-plane oracle).
    */
  def withCatalog(select: String): String =
    s"WITH $sessionsCte,\n$tablesCte,\n$descriptorsCte\n$select"
}
