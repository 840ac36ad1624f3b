package graft.queries

import graft.Tables
import graft.catalog.{CatalogFixture => F, CatalogOps}
import org.apache.spark.sql.functions._

/** Metadata/catalog-plane operators (SURVEY.md §2.2-2.4) over the
  * deterministic [[graft.catalog.CatalogFixture]], so the DuckDB oracle
  * can rebuild the identical catalog from generated VALUES CTEs.
  *
  * The same logic runs against the persistent parquet catalog through
  * [[graft.catalog.BackupCatalog]] (spec-tested); these queries pin the
  * semantics of each CatalogOps operator.
  */
object CatalogQueries {

  val defs: Map[String, QueryFn] = Map(
    // P1 — equality select by session_name (mysql.rb:168,211)
    "c01_session_eq" -> { (s, _) =>
      CatalogOps.sessionInfo(F.sessionsDf(s), "export", F.S1)
    },

    // P2 — 4-way conjunctive already-started probe (mysql.rb:253)
    "c02_session_conj" -> { (s, _) =>
      CatalogOps.sessionStarted(F.sessionsDf(s), "export", "cluster_a",
        F.S1, F.RootA)
    },

    // P3 — LIKE wildcard on table_name (mysql.rb:277-281)
    "c03_table_like" -> { (s, _) =>
      CatalogOps.listTableInfo(F.tablesDf(s), "export", F.S1, "%e%")
        .select("table_name", "start_time", "end_time", "empty", "error")
    },

    // P3b — equality fallback of the same dispatch (mysql.rb:275)
    "c04_table_eq_dispatch" -> { (s, _) =>
      CatalogOps.listTableInfo(F.tablesDf(s), "export", F.S1, "lineitem")
        .select("table_name", "start_time", "end_time")
    },

    // P4 — LIKE wildcard on session_name (mysql.rb:346-353)
    "c05_session_like" -> { (s, _) =>
      CatalogOps.sessionInfo(F.sessionsDf(s), "export", "202402%")
        .select("session_name", "cluster_name", "dest_root", "ended_at")
    },

    // P5+P9+J1 — join-through-parent table_names (mysql.rb:274-288)
    "c06_table_names" -> { (s, _) =>
      CatalogOps.tableNames(F.tablesDf(s), F.sessionsDf(s), "export",
        "%", F.RootA)
    },

    // P8 — existence probes (mysql.rb:290-297)
    "c07_exists" -> { (s, _) =>
      import s.implicits._
      val t = F.tablesDf(s)
      Seq("lineitem", "orders", "widgets")
        .map(n => (n, CatalogOps.exists(t, "export", n, F.S1)))
        .toDF("table_name", "present")
    },

    // P7 — whitelist projection of descriptors (mysql.rb:324-337)
    "c08_descriptor_whitelist" -> { (s, _) =>
      CatalogOps.columnDescriptors(F.descriptorsDf(s), F.S1, "lineitem")
    },

    // J2 — requested vs exported semi/anti (import.rb:56-63)
    "c09_requested_vs_exported" -> { (s, _) =>
      import s.implicits._
      val requested = Seq("lineitem", "orders", "nosuch").toDF("table_name")
      val exported = CatalogOps.listTableInfo(F.tablesDf(s), "export",
        F.S3, "%").filter(!col("error"))
      CatalogOps.requestedVsExported(requested, exported)
    },

    // J3 — display join (cli.rb:299-321)
    "c10_display_join" -> { (s, _) =>
      CatalogOps.displayJoin(F.sessionsDf(s), F.tablesDf(s), "export")
    },

    // A2 — incremental lower bound per table (docs/…HBASE-1684.txt:40-47)
    "c11_last_end_times" -> { (s, _) =>
      CatalogOps.lastEndTimes(F.tablesDf(s), "export")
    },

    // A3 — largest versions over schema (docs/…HBASE-1684.txt:28-34)
    "c12_largest_versions" -> { (s, _) =>
      CatalogOps.largestVersions(F.descriptorsDf(s))
    },

    /** A2 ⋈ payload — the full incremental plan: catalog watermark
      * drives the next window's scan of lineitem. The one-row watermark
      * side is broadcast; the payload scan gets the window predicate
      * pushed into parquet row-group pruning.
      */
    "c13_incremental_window" -> { (s, d) =>
      val lastEnd = CatalogOps.lastEndTimes(F.tablesDf(s), "export")
        .filter(col("table_name") === "lineitem")
        .select(col("last_end"))
      Tables.lineitem(s, d)
        .join(broadcast(lastEnd),
          col("l_shipdate") >= timestamp_millis(col("last_end")) &&
            col("l_shipdate") < timestamp_millis(lit(F.T2002)))
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"),
          min(ms(col("l_shipdate"))).as("min_ship_ms"),
          max(ms(col("l_shipdate"))).as("max_ship_ms"))
    },

    /** F1+F2 — session-name formatting and the now−60 s hot-tail
      * watermark (cli.rb:28-32), over the fixture's started_at values.
      */
    "c14_session_name_fmt" -> { (s, _) =>
      F.sessionsDf(s).select(
        col("session_name"),
        date_format(timestamp_millis(col("started_at")), "yyyyMMdd_HHmmss")
          .as("derived_name"),
        (col("started_at") - 60000L).as("watermark_ms"))
    },

    /** [EXT] c16 — session diff: S1 (full export) vs S3 (partial
      * export of cluster_b): lineitem grew, orders errored, customer
      * went empty-but-present, seven tables exist only in the full
      * session. See CatalogOps.sessionDiff.
      */
    "c16_session_diff" -> { (s, _) =>
      CatalogOps.sessionDiff(F.tablesDf(s), "export", F.S1, F.S3)
    },

    /** P11+F4+F5 — URL/scheme parse (s3.rb:61-64) and hostname
      * canonicalization (cli.rb:354,360) as regexp ops.
      */
    "c15_url_parse" -> { (s, _) =>
      import s.implicits._
      Seq("s3n://somebucket/20110101_111111/table_a/",
        "s3://other-bucket/sess/t/",
        "hdfs://name-node.prod/backups/x/",
        "file:///bk/a/20240101_000000/lineitem/")
        .toDF("url")
        .select(col("url"),
          regexp_extract(col("url"), "(.*)://(.+?)/(.*)", 1).as("scheme"),
          regexp_extract(col("url"), "(.*)://(.+?)/(.*)", 2).as("bucket"),
          regexp_extract(col("url"), "(.*)://(.+?)/(.*)", 3).as("key"),
          regexp_replace(
            regexp_extract(col("url"), "(.*)://(.+?)/(.*)", 2),
            "[-.]", "_").as("bucket_canonical"))
    })

  val oracles: Map[String, String] = Map(
    "c01_session_eq" -> F.withCatalog(
      s"SELECT * FROM sessions_cat WHERE mode = 'export' AND session_name = '${F.S1}'"),

    "c02_session_conj" -> F.withCatalog(
      s"""SELECT * FROM sessions_cat
         |WHERE mode = 'export' AND cluster_name = 'cluster_a'
         |  AND session_name = '${F.S1}' AND dest_root = '${F.RootA}'""".stripMargin),

    "c03_table_like" -> F.withCatalog(
      s"""SELECT table_name, start_time, end_time, empty, error
         |FROM tables_cat
         |WHERE mode = 'export' AND session_name = '${F.S1}'
         |  AND table_name LIKE '%e%'""".stripMargin),

    "c04_table_eq_dispatch" -> F.withCatalog(
      s"""SELECT table_name, start_time, end_time FROM tables_cat
         |WHERE mode = 'export' AND session_name = '${F.S1}'
         |  AND table_name = 'lineitem'""".stripMargin),

    "c05_session_like" -> F.withCatalog(
      """SELECT session_name, cluster_name, dest_root, ended_at
        |FROM sessions_cat
        |WHERE mode = 'export' AND session_name LIKE '202402%'""".stripMargin),

    "c06_table_names" -> F.withCatalog(
      s"""SELECT DISTINCT t.table_name
         |FROM tables_cat t
         |JOIN sessions_cat s
         |  ON t.mode = s.mode AND t.session_name = s.session_name
         |WHERE t.mode = 'export' AND s.dest_root = '${F.RootA}'""".stripMargin),

    "c07_exists" -> F.withCatalog(
      s"""SELECT r.table_name,
         |  EXISTS(SELECT 1 FROM tables_cat t
         |         WHERE t.mode = 'export' AND t.session_name = '${F.S1}'
         |           AND t.table_name = r.table_name) AS present
         |FROM (VALUES ('lineitem'), ('orders'), ('widgets')) r(table_name)""".stripMargin),

    "c08_descriptor_whitelist" -> F.withCatalog(
      s"""SELECT name, max_versions, compression, in_memory, block_cache,
         |  ttl, blocksize, bloomfilter
         |FROM descs_cat
         |WHERE session_name = '${F.S1}' AND table_name = 'lineitem'""".stripMargin),

    "c09_requested_vs_exported" -> F.withCatalog(
      s"""SELECT r.table_name,
         |  CASE WHEN e.table_name IS NOT NULL THEN 'ok' ELSE 'missing' END AS status
         |FROM (VALUES ('lineitem'), ('orders'), ('nosuch')) r(table_name)
         |LEFT JOIN (SELECT DISTINCT table_name FROM tables_cat
         |           WHERE mode = 'export' AND session_name = '${F.S3}'
         |             AND NOT error) e
         |  ON r.table_name = e.table_name""".stripMargin),

    "c10_display_join" -> F.withCatalog(
      """SELECT s.mode, s.session_name, s.cluster_name, s.dest_root,
        |  t.table_name, t.empty, t.error, t.row_count
        |FROM sessions_cat s
        |JOIN tables_cat t
        |  ON s.mode = t.mode AND s.session_name = t.session_name
        |WHERE s.mode = 'export'""".stripMargin),

    "c11_last_end_times" -> F.withCatalog(
      """SELECT table_name, MAX(end_time) AS last_end
        |FROM tables_cat WHERE mode = 'export' AND NOT error
        |GROUP BY table_name""".stripMargin),

    "c12_largest_versions" -> F.withCatalog(
      """SELECT table_name, MAX(max_versions) AS largest_versions
        |FROM descs_cat GROUP BY table_name""".stripMargin),

    "c13_incremental_window" -> F.withCatalog(
      s"""SELECT COUNT(*) AS n_rows,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         |  MIN(epoch_ms(l_shipdate)) AS min_ship_ms,
         |  MAX(epoch_ms(l_shipdate)) AS max_ship_ms
         |FROM lineitem,
         |  (SELECT MAX(end_time) AS last_end FROM tables_cat
         |   WHERE mode = 'export' AND NOT error
         |     AND table_name = 'lineitem') w
         |WHERE l_shipdate >= epoch_ms(w.last_end)
         |  AND l_shipdate < epoch_ms(${F.T2002})""".stripMargin),

    "c14_session_name_fmt" -> F.withCatalog(
      """SELECT session_name,
        |  strftime(epoch_ms(started_at), '%Y%m%d_%H%M%S') AS derived_name,
        |  started_at - 60000 AS watermark_ms
        |FROM sessions_cat""".stripMargin),

    "c16_session_diff" -> F.withCatalog(
      s"""SELECT table_name, a.row_count AS rows_a, b.row_count AS rows_b,
         |  CASE WHEN a.row_count IS NULL THEN 'only_in_b'
         |       WHEN b.row_count IS NULL THEN 'only_in_a'
         |       WHEN a.error OR b.error THEN 'error'
         |       WHEN a.row_count = b.row_count THEN 'unchanged'
         |       ELSE 'changed' END AS status
         |FROM (SELECT table_name, row_count, error FROM tables_cat
         |      WHERE mode = 'export' AND session_name = '${F.S1}') a
         |FULL OUTER JOIN
         |     (SELECT table_name, row_count, error FROM tables_cat
         |      WHERE mode = 'export' AND session_name = '${F.S3}') b
         |USING (table_name)""".stripMargin),

    "c15_url_parse" -> {
      val urls = Seq("s3n://somebucket/20110101_111111/table_a/",
        "s3://other-bucket/sess/t/",
        "hdfs://name-node.prod/backups/x/",
        "file:///bk/a/20240101_000000/lineitem/")
        .map(u => s"('$u')").mkString(", ")
      s"""SELECT url,
         |  regexp_extract(url, '(.*)://(.+?)/(.*)', 1) AS scheme,
         |  regexp_extract(url, '(.*)://(.+?)/(.*)', 2) AS bucket,
         |  regexp_extract(url, '(.*)://(.+?)/(.*)', 3) AS key,
         |  regexp_replace(regexp_extract(url, '(.*)://(.+?)/(.*)', 2),
         |                 '[-.]', '_', 'g') AS bucket_canonical
         |FROM (VALUES $urls) u(url)""".stripMargin
    })
}
