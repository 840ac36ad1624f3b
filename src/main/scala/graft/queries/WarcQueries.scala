package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{Dedup, Html, TextAnalysis, Urls, Warc}

/** WARC ingestion queries [EXT] — the Common Crawl front door
  * (`graft.ext.Warc`): documents synthesize into real multi-record
  * WARC/1.1 archives, the record walk reads every fact (types, URIs,
  * dates, the HTTP split) AND the full offset arithmetic back, and
  * the extracted payload text flows into the text plane's token
  * gate. The oracles replay the fact formulas and the size contract
  * from the document text length; the size constants are derived by
  * CALLING the writer ([[graft.ext.Warc.RespHdrFixed]] family), so
  * SQL and Scala cannot drift.
  */
object WarcQueries {

  val defs: Map[String, QueryFn] = Map(

    /** wa01 — the record walk end-to-end: one row per record of every
      * synthesized archive (warcinfo + responses), with byte-exact
      * offsets/sizes, mandatory-field facts, and the HTTP split
      * (status, content-type, payload bytes). The oracle replays the
      * whole layout — a writer or parser drifting from the ISO 28500
      * framing mismatches on every row.
      */
    "wa01_warc_records" -> { (s, d) =>
      Warc.recordFacts(s,
        Warc.asWarcArchives(s, Tables.documents(s, d))).toDF()
    },

    /** wa03 — the WIRE format: the same archives compressed one gzip
      * member per record (the Common Crawl `.warc.gz` convention),
      * inflated with the real `GZIPInputStream` (multi-member) and
      * walked identically. Offsets live in the DECOMPRESSED stream
      * per the spec, so the oracle is wa01's verbatim — one flipped
      * bit in compression, inflation, or the walk mismatches.
      */
    "wa03_warc_gz_records" -> { (s, d) =>
      Warc.recordFactsGz(s,
        Warc.asWarcGzArchives(s, Tables.documents(s, d))).toDF()
    },

    /** wa02 — the text-plane hand-off: HTTP 200 text/plain payloads
      * extracted from the archives, doc ids recovered from the target
      * URIs, and x01's token gate run over the EXTRACTED text. The
      * oracle is x01's body over the documents the synth gave status
      * 200 — so a walk that mangles one payload byte, or extracts the
      * wrong records, mismatches.
      */
    "wa02_warc_text_gate" -> { (s, d) =>
      val arch = Warc.asWarcArchives(s, Tables.documents(s, d))
      val texts = Warc.httpTexts(s, arch)
        .filter(col("http_status") === 200 &&
          col("http_content_type") === Warc.HttpTextCt)
        .select(
          regexp_extract(col("target_uri"), "(\\d+)$", 1)
            .cast("long").as("doc_id"),
          length(col("text")).as("n_chars"), col("text"))
      TextAnalysis.tokenStats(texts)
    },

    /** wa04 — HTML → text extraction: each document wrapped in the
      * synthesized page (title/nav/heading chrome with entities, the
      * text split into two paragraphs at the token midpoint, plus
      * style/script/comment junk that must NOT leak) and extracted
      * back. The oracle rebuilds the FULL extracted string — chrome
      * lines, decoded entities (NBSP, ©, —), paragraph slices — and
      * hash-compares it, so a leaked tag, an undecoded entity, a
      * swallowed paragraph, or a whitespace-fold drift all mismatch.
      */
    "wa04_html_extract" -> { (s, d) =>
      Html.extractFacts(s,
        Html.asHtmlPages(s, Tables.documents(s, d)))
    },

    /** wa05 — URL canonicalization + SURT keys: each doc id makes a
      * deterministic MESSY url (scheme case, trailing-dot host, a
      * co.uk subtree, explicit default vs real vs absent port,
      * unsorted query, fragment) and the PARSER canonicalizes it.
      * The oracle re-derives every canonical field — lowercased
      * host, elided default ports, sorted query, the reversed-label
      * SURT, the registered domain with the multi-TLD exception —
      * from the id schedule, so a parse or canonicalization drift on
      * any rule mismatches.
      */
    "wa05_url_canonical" -> { (s, d) =>
      Urls.canonicalFacts(s,
        Urls.asUrlRows(s, Tables.documents(s, d)))
    },

    /** wa06 — the CDX index + the random-access contract: member
      * boundaries of each `.warc.gz` recovered READER-side (RFC 1952
      * header walk + raw inflate + CRC/ISIZE verification — the
      * writer is not trusted), one index row per record with its
      * SURT lookup key and coordinates, and `fetch_ok` = the
      * member-sliced single-record fetch reproduces the record the
      * full walk saw. The oracle replays the wa01 facts + the SURT
      * rewrite and pins `fetch_ok` TRUE — any member-walk or fetch
      * defect flips a bit somewhere and mismatches.
      */
    "wa06_cdx_index" -> { (s, d) =>
      Warc.cdxIndex(s,
        Warc.asWarcGzArchives(s, Tables.documents(s, d)))
    },

    /** wa07 — the crawl pipeline end-to-end: HTML pages inside
      * GZIPPED WARC archives (`text/html`, 404 on the id schedule),
      * inflated, walked, status/content-type gated, extracted
      * (wa04's extractor), and reduced to the text-plane gate facts.
      * One oracle chains FOUR modules — gzip, the WARC walk, the
      * HTTP split, HTML extraction — so a drift anywhere in the
      * pipeline mismatches here even if each unit query still
      * passes.
      */
    "wa07_crawl_pipeline" -> { (s, d) =>
      import s.implicits._
      val arch = Warc.asHtmlWarcGzArchives(s, Tables.documents(s, d))
      Warc.httpTextsGz(s, arch)
        .filter(col("http_status") === 200 &&
          col("http_content_type") === Warc.HttpHtmlCt)
        .select(regexp_extract(col("target_uri"), "(\\d+)$", 1)
          .cast("long").as("doc_id"), col("text").as("page"))
        .as[(Long, String)]
        .map { case (id, page) =>
          val t = graft.ext.Html.extractText(page)
          (id, if (t.isEmpty) 0 else 1 + t.count(_ == '\n'),
            t.length, t.split("[ \n]", -1).length)
        }
        .toDF("doc_id", "n_lines", "n_chars", "n_tokens")
    },

    /** d18 — corpus-wide paragraph dedup over the EXTRACTED pages:
      * the CCNet/Dolma boilerplate pass. The synthesized chrome makes
      * a real fixture — "Doc N" repeats INSIDE each page (title + h1)
      * and the footer repeats across every 100th doc — so the global
      * first-occurrence rule must fire both intra- and inter-doc for
      * the clean_text hashes to meet. Winner = min (doc_id, idx),
      * replayed as a row_number in SQL (single-node there; the Spark
      * side uses the skew-safe min-struct aggregation — see the
      * operator's scaladoc).
      */
    "d18_para_dedup" -> { (s, d) =>
      Dedup.paragraphDedup(
        Html.extractFacts(s,
          Html.asHtmlPages(s, Tables.documents(s, d)))
          .select(col("doc_id"), col("text")))
    },

    /** wa08 — the robots.txt fetch-policy gate (RFC 9309): each messy
      * URL's host resolves to its synthesized per-host policy, the
      * REAL parser selects the agent's group (falling back to `*` —
      * and taking that group's crawl-delay ONLY then), and the
      * longest-match precedence decides the path. The schedule
      * exercises group fallback, the empty-Disallow no-op, and a
      * wildcard+anchor re-allow beating a shorter Disallow — each
      * verdict, winning rule, delay, and sitemap re-derived in SQL.
      */
    "wa08_robots_gate" -> { (s, d) =>
      graft.ext.Robots.robotsFacts(s,
        Urls.asUrlRows(s, Tables.documents(s, d)))
    },

    /** wa09 — HTML head metadata: the pre-index fields a curation
      * pass gates on without extracting the body — title, `html
      * lang`, declared charset, `meta robots` (with the derived
      * noindex bit a polite pipeline EXCLUDES on), canonical link,
      * description. The page schedules lang and the noindex tag, the
      * description carries an entity that must decode inside an
      * ATTRIBUTE, and every field is first-wins — all re-derived in
      * SQL.
      */
    "wa09_html_meta" -> { (s, d) =>
      Html.metaFacts(s,
        Html.asHtmlPages(s, Tables.documents(s, d)))
    },

    /** wa10 — the crawl FUNNEL: the per-stage survival counts a
      * pipeline run reports (frontier → robots-allowed → fetched 200
      * → indexable (no meta-noindex) → extraction token gate). Every
      * stage is computed by the REAL operator — robots evaluation,
      * the gz WARC fetch plane, the head-metadata walk, the
      * structural extractor — then joined on doc_id and folded to
      * ONE row; the oracle re-derives each gate from the schedules
      * and the shared extraction CTEs. The doc_id joins co-partition
      * at scale; every per-stage input is a narrow map over the
      * corpus.
      */
    /** wa11 — the politeness fetch schedule: allowed URLs sequenced
      * per host in doc_id order, each slot's earliest start =
      * slot × crawl-delay (default 1 s). The oracle replays the
      * verdicts, the per-host ranking, and the delay arithmetic.
      */
    "wa11_fetch_schedule" -> { (s, d) =>
      graft.ext.Robots.fetchSchedule(s,
        Urls.asUrlRows(s, Tables.documents(s, d)))
    },

    /** wa13 — main-content block scoring (jusText/Arc90 shape): the
      * SAME walk and block segmentation as wa04, but every character
      * carries link attribution, and each block reports chars /
      * link-chars / 6-decimal link density / the keep verdict
      * (≥ MinBlockChars and ≤ MaxLinkDensity). On the synth page the
      * verdicts are the real ones: the link-dense nav and the short
      * title/h1 drop; the paragraphs and footer survive. The oracle
      * rebuilds every block string, the nav's closed-form link
      * count, and the rounded density grid.
      */
    "wa13_main_content" -> { (s, d) =>
      Html.blockFactsDf(s,
        Html.asHtmlPages(s, Tables.documents(s, d)))
    },

    /** wa12 — sitemap ingestion: each distinct host's synthesized
      * sitemap walked by the real parser — every 5th host a
      * SITEMAPINDEX, the rest urlsets with an `&amp;`-escaped loc
      * that must come back DECODED, scheduled lastmod days, and a
      * string-built priority both sides PARSE to double (bit-equal
      * by construction). The oracle re-derives all rows from the
      * distinct-host schedule.
      */
    "wa12_sitemap_walk" -> { (s, d) =>
      graft.ext.Sitemaps.sitemapFacts(s, Tables.documents(s, d))
    },

    "wa10_crawl_funnel" -> { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d)
      val rob = graft.ext.Robots
        .robotsFacts(s, Urls.asUrlRows(s, docs))
        .select(col("doc_id"), col("allowed"))
      val fetched = Warc
        .httpTextsGz(s, Warc.asHtmlWarcGzArchives(s, docs))
        .select(regexp_extract(col("target_uri"), "(\\d+)$", 1)
          .cast("long").as("doc_id"),
          (col("http_status") === 200).as("fetched"),
          col("text").as("page"))
      val toks = fetched.filter(col("fetched"))
        .select(col("doc_id"), col("page")).as[(Long, String)]
        .map { case (id, p) =>
          (id, Html.extractText(p).split("[ \n]", -1).length)
        }.toDF("doc_id", "n_toks")
      val meta = Html.metaFacts(s, Html.asHtmlPages(s, docs))
        .select(col("doc_id"), col("noindex"))
      val pass = col("allowed") && col("fetched") && !col("noindex")
      rob.join(fetched.select("doc_id", "fetched"), Seq("doc_id"))
        .join(meta, Seq("doc_id"))
        .join(toks, Seq("doc_id"), "left")
        .agg(
          count(lit(1)).as("n_frontier"),
          sum(when(col("allowed"), 1L).otherwise(0L)).as("n_allowed"),
          sum(when(col("allowed") && col("fetched"), 1L)
            .otherwise(0L)).as("n_fetched"),
          sum(when(pass, 1L).otherwise(0L)).as("n_indexable"),
          sum(when(pass && col("n_toks") >= FunnelMinTokens, 1L)
            .otherwise(0L)).as("n_token_ok"))
    })

  /** The wa10 extraction token gate — ONE definition for the query
    * and its oracle.
    */
  private val FunnelMinTokens = 25

  private def dateSql(idExpr: String): String =
    s"'2024-01-01T' || lpad(CAST($idExpr % 24 AS VARCHAR), 2, '0') " +
      s"|| ':' || lpad(CAST($idExpr * 3 % 60 AS VARCHAR), 2, '0') " +
      s"|| ':' || lpad(CAST($idExpr * 7 % 60 AS VARCHAR), 2, '0') || 'Z'"

  private def recordIdSql(idExpr: String): String =
    s"'<urn:uuid:00000000-0000-0000-0000-' || " +
      s"lpad(CAST($idExpr AS VARCHAR), 12, '0') || '>'"

  val oracles: Map[String, String] = Map(

    // wa01: every record fact and every byte offset as closed formulas
    // over the text byte count — clen = HttpBlockFixed + status_len +
    // digits(n) + n; rec_bytes = RespHdrFixed + digits(id) +
    // digits(clen) + clen + 4; offsets = warcinfo record + running sum
    // of preceding response records within the archive
    "wa01_warc_records" -> Wa01Sql,

    // wa03: offsets are positions in the DECOMPRESSED stream (the
    // spec's definition), so the gzip round-trip must reproduce wa01's
    // facts EXACTLY — one shared oracle
    "wa03_warc_gz_records" -> Wa01Sql,

    // wa02: x01's token gate over exactly the documents the synth gave
    // HTTP 200 (n % 7 <> 0) — extraction must round-trip each payload
    // byte for the hashes to meet
    "wa02_warc_text_gate" ->
      """SELECT doc_id, CAST(length(text) AS INT) AS n_chars,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
        |  CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS avg_token_len
        |FROM documents
        |WHERE octet_length(encode(text)) % 7 <> 0""".stripMargin,

    // wa04: the extracted string rebuilt line by line — the chrome
    // constants mirror Html.htmlPage's template (title, nav with the
    // decoded NBSP=chr(160), heading, the ⌈n/2⌉ token-midpoint
    // paragraph slices, the footer with ©=chr(169) and em-dash
    // =chr(8212)); empty lines drop, survivors join on chr(10)
    "wa04_html_extract" ->
      s"""${extractedCtes("")}
         |SELECT doc_id, array_to_string(ls, chr(10)) AS text,
         |  CAST(len(ls) AS INT) AS n_lines
         |FROM l""".stripMargin,

    // wa07: the shared extraction CTEs restricted to the id-scheduled
    // 200s, reduced to the gate facts — n_tokens splits the joined
    // string on [space|newline] exactly as the engine does
    "wa07_crawl_pipeline" ->
      s"""${extractedCtes("WHERE doc_id % 7 <> 0")},
         |s AS (SELECT doc_id, array_to_string(ls, chr(10)) AS t,
         |        len(ls) AS nl FROM l)
         |SELECT doc_id, CAST(nl AS INT) AS n_lines,
         |  CAST(length(t) AS INT) AS n_chars,
         |  CAST(len(string_split_regex(t,
         |    '[ ' || chr(10) || ']')) AS INT) AS n_tokens
         |FROM s""".stripMargin,

    // d18: unnest the extracted lines with ordinality, rank each
    // paragraph's occurrences by (doc_id, idx), keep rank 1, rebuild
    // per doc in original order — the single-node replay of the
    // min-struct winner rule
    "d18_para_dedup" ->
      s"""${extractedCtes("")},
         |s AS (SELECT doc_id, array_to_string(ls, chr(10)) AS t
         |      FROM l),
         |e AS (SELECT doc_id,
         |        unnest(string_split(t, chr(10))) AS para,
         |        CAST(generate_subscripts(
         |          string_split(t, chr(10)), 1) - 1 AS INT) AS idx
         |      FROM s),
         |w AS (SELECT doc_id, para, idx,
         |        row_number() OVER (PARTITION BY para
         |          ORDER BY doc_id, idx) AS rn
         |      FROM e)
         |SELECT doc_id, CAST(count(*) AS INT) AS n_paras,
         |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS INT)
         |    AS n_kept,
         |  COALESCE(array_to_string(
         |    list(para ORDER BY idx) FILTER (WHERE rn = 1),
         |    chr(10)), '') AS clean_text
         |FROM w GROUP BY doc_id""".stripMargin,

    // wa08: every verdict re-derived from the id schedule — n=id%50
    // names the host's policy; n%3=0 hosts block /Path/ but re-allow
    // *0$ (longest match), n%3=1 hosts no-op, n%3=2 hosts fall back
    // to * and ONLY then surface the crawl-delay
    "wa08_robots_gate" ->
      """WITH t AS (
        |  SELECT CAST(doc_id AS BIGINT) AS id,
        |    CAST(doc_id % 50 AS BIGINT) AS n
        |  FROM documents)
        |SELECT id AS doc_id,
        |  CASE WHEN id % 7 = 0
        |      THEN 'sub.example' || n || '.co.uk'
        |    WHEN id % 3 = 0 THEN 'www.example' || n || '.com'
        |    ELSE 'example' || n || '.com' END AS host,
        |  CASE WHEN id % 6 = 0 THEN '/'
        |    ELSE '/Path/' || id END AS path,
        |  (id % 6 = 0 OR n % 3 <> 0 OR id % 10 = 0) AS allowed,
        |  CASE WHEN id % 6 <> 0 AND n % 3 = 0 THEN
        |      CASE WHEN id % 10 = 0 THEN '/Path/*0$'
        |        ELSE '/Path/' END
        |    ELSE NULL END AS matched_rule,
        |  CASE WHEN n % 3 = 2 THEN CAST(n % 7 + 1 AS INT)
        |    ELSE CAST(NULL AS INT) END AS crawl_delay,
        |  'https://example' || n || '.com/sitemap.xml' AS sitemap
        |FROM t""".stripMargin,

    // wa09: head metadata from the page template's id schedule — the
    // description's &amp; must come back DECODED from the attribute
    "wa09_html_meta" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  'Doc ' || CAST(doc_id AS VARCHAR) AS title,
        |  CASE WHEN doc_id % 11 = 0 THEN 'de' ELSE 'en' END AS lang,
        |  'utf-8' AS charset,
        |  CASE WHEN doc_id % 9 = 0 THEN 'noindex, follow'
        |    ELSE NULL END AS robots_meta,
        |  (doc_id % 9 = 0) AS noindex,
        |  'http://corpus.example/doc/' || CAST(doc_id AS VARCHAR)
        |    AS canonical,
        |  'synthetic doc ' || CAST(doc_id AS VARCHAR) || ' & friends'
        |    AS description
        |FROM documents""".stripMargin,

    // wa10: every gate re-derived — robots (the wa08 closed form),
    // fetch (id%7), noindex (id%9), and the extraction token count
    // from the shared CTEs — folded to the one funnel row
    "wa10_crawl_funnel" ->
      s"""${extractedCtes("")},
         |s AS (SELECT doc_id,
         |        len(string_split_regex(array_to_string(ls, chr(10)),
         |          '[ ' || chr(10) || ']')) AS ntok
         |      FROM l),
         |g AS (SELECT doc_id, ntok,
         |    (doc_id % 6 = 0 OR (doc_id % 50) % 3 <> 0
         |      OR doc_id % 10 = 0) AS allowed,
         |    (doc_id % 7 <> 0) AS fetched,
         |    (doc_id % 9 = 0) AS noindex
         |  FROM s)
         |SELECT CAST(count(*) AS BIGINT) AS n_frontier,
         |  CAST(sum(CASE WHEN allowed THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_allowed,
         |  CAST(sum(CASE WHEN allowed AND fetched THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_fetched,
         |  CAST(sum(CASE WHEN allowed AND fetched AND NOT noindex
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_indexable,
         |  CAST(sum(CASE WHEN allowed AND fetched AND NOT noindex
         |    AND ntok >= $FunnelMinTokens THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_token_ok
         |FROM g""".stripMargin,

    // wa13: block strings from the shared CTEs; link chars are the
    // nav's closed form (8 + digits(id)) and zero elsewhere; density
    // and verdict replay the rounded grid and both thresholds
    "wa13_main_content" -> {
      import graft.ext.Html
      s"""${extractedCtes("")},
         |e AS (
         |  SELECT doc_id, unnest(ls) AS text,
         |    CAST(generate_subscripts(ls, 1) - 1 AS INT) AS block_idx
         |  FROM l),
         |f AS (
         |  SELECT doc_id, block_idx, text,
         |    CAST(length(text) AS INT) AS n_chars,
         |    CAST(CASE WHEN block_idx = 1
         |      THEN 8 + length(CAST(doc_id AS VARCHAR))
         |      ELSE 0 END AS INT) AS link_chars
         |  FROM e),
         |g AS (
         |  SELECT *, round(CAST(link_chars AS DOUBLE) / n_chars, 6)
         |    + 0.0 AS link_density
         |  FROM f)
         |SELECT doc_id, block_idx, text, n_chars, link_chars,
         |  link_density,
         |  (n_chars >= ${Html.MinBlockChars} AND
         |    link_density <= ${Html.MaxLinkDensity}) AS kept
         |FROM g""".stripMargin
    },

    // wa12: all rows re-derived from the distinct-host schedule; the
    // u1 loc must come back entity-DECODED and its priority is parsed
    // from the same string both sides
    "wa12_sitemap_walk" ->
      """WITH h AS (
        |  SELECT DISTINCT CAST(doc_id % 50 AS BIGINT) AS n
        |  FROM documents),
        |d AS (SELECT n,
        |    lpad(CAST(n % 28 + 1 AS VARCHAR), 2, '0') AS day
        |  FROM h),
        |idx AS (
        |  SELECT n AS host_n, 'sitemap' AS kind,
        |    CAST(k - 1 AS INT) AS ord,
        |    'https://example' || n || '.com/sitemap' || k || '.xml'
        |      AS loc,
        |    '2024-03-' || day AS lastmod,
        |    CAST(NULL AS DOUBLE) AS priority
        |  FROM d, (SELECT unnest([1, 2]) AS k) ks
        |  WHERE n % 5 = 0),
        |u0 AS (
        |  SELECT n AS host_n, 'url' AS kind, CAST(0 AS INT) AS ord,
        |    'https://example' || n || '.com/' AS loc,
        |    '2024-01-' || day AS lastmod,
        |    CAST(1.0 AS DOUBLE) AS priority
        |  FROM d WHERE n % 5 <> 0),
        |u1 AS (
        |  SELECT n AS host_n, 'url' AS kind, CAST(1 AS INT) AS ord,
        |    'https://example' || n || '.com/Path/' || n || '?a=1&b=2'
        |      AS loc,
        |    CAST(NULL AS VARCHAR) AS lastmod,
        |    CAST('0.' || (n % 10) AS DOUBLE) AS priority
        |  FROM d WHERE n % 5 <> 0),
        |u2 AS (
        |  SELECT n AS host_n, 'url' AS kind, CAST(2 AS INT) AS ord,
        |    'https://example' || n || '.com/extra/' || n AS loc,
        |    '2024-02-' || day AS lastmod,
        |    CAST(NULL AS DOUBLE) AS priority
        |  FROM d WHERE n % 5 <> 0 AND n % 2 = 0)
        |SELECT * FROM idx UNION ALL SELECT * FROM u0
        |UNION ALL SELECT * FROM u1 UNION ALL SELECT * FROM u2"""
        .stripMargin,

    // wa11: wa08's verdict schedule filtered to allowed, ranked per
    // host by doc_id, eta = (seq-1) × coalesce(delay, 1)
    "wa11_fetch_schedule" ->
      """WITH t AS (
        |  SELECT CAST(doc_id AS BIGINT) AS id,
        |    CAST(doc_id % 50 AS BIGINT) AS n
        |  FROM documents),
        |g AS (
        |  SELECT id, n,
        |    CASE WHEN id % 7 = 0
        |        THEN 'sub.example' || n || '.co.uk'
        |      WHEN id % 3 = 0 THEN 'www.example' || n || '.com'
        |      ELSE 'example' || n || '.com' END AS host,
        |    CASE WHEN id % 6 = 0 THEN '/'
        |      ELSE '/Path/' || id END AS path,
        |    CASE WHEN n % 3 = 2 THEN n % 7 + 1 ELSE NULL END AS delay
        |  FROM t
        |  WHERE id % 6 = 0 OR n % 3 <> 0 OR id % 10 = 0)
        |SELECT id AS doc_id, host, path,
        |  CAST(row_number() OVER (PARTITION BY host ORDER BY id)
        |    AS INT) AS fetch_seq,
        |  CAST((row_number() OVER (PARTITION BY host ORDER BY id) - 1)
        |    * COALESCE(delay, 1) AS BIGINT) AS eta_sec
        |FROM g""".stripMargin,

    // wa05: the messy url rebuilt verbatim AND every canonical field
    // re-derived from the id schedule (the query sort is a closed
    // form: 'a=…' < 'b=…'/'m=x' < 'z=2' bytewise for every id)
    "wa05_url_canonical" ->
      """WITH t AS (
        |  SELECT CAST(doc_id AS BIGINT) AS id,
        |    CAST(doc_id % 50 AS VARCHAR) AS n
        |  FROM documents),
        |f AS (
        |  SELECT id,
        |    CASE WHEN id % 2 = 0 THEN 'HTTP' ELSE 'https' END
        |      AS scheme_raw,
        |    CASE WHEN id % 2 = 0 THEN 'http' ELSE 'https' END
        |      AS scheme,
        |    CASE WHEN id % 7 = 0 THEN 'Sub.Example' || n || '.Co.UK'
        |         WHEN id % 3 = 0 THEN 'WWW.Example' || n || '.COM.'
        |         ELSE 'Example' || n || '.COM' END AS host_raw,
        |    CASE WHEN id % 7 = 0 THEN 'sub.example' || n || '.co.uk'
        |         WHEN id % 3 = 0 THEN 'www.example' || n || '.com'
        |         ELSE 'example' || n || '.com' END AS host,
        |    CASE WHEN id % 4 = 0 THEN ':80'
        |         WHEN id % 4 = 1 THEN ':8080'
        |         WHEN id % 4 = 3 THEN ':443' ELSE '' END AS port_raw,
        |    CASE WHEN id % 4 = 1 THEN 8080 ELSE NULL END AS port,
        |    CASE WHEN id % 6 = 0 THEN ''
        |         ELSE '/Path/' || id END AS path_raw,
        |    CASE WHEN id % 6 = 0 THEN '/'
        |         ELSE '/Path/' || id END AS path,
        |    CASE WHEN id % 3 = 1 THEN '?b=' || id || '&a=1'
        |         WHEN id % 3 = 2 THEN '?z=2&a=' || id || '&m=x'
        |         ELSE '' END AS query_raw,
        |    CASE WHEN id % 3 = 1 THEN 'a=1&b=' || id
        |         WHEN id % 3 = 2 THEN 'a=' || id || '&m=x&z=2'
        |         ELSE NULL END AS query,
        |    CASE WHEN id % 2 = 1 THEN '#sec' || id ELSE '' END
        |      AS frag,
        |    CASE WHEN id % 7 = 0 THEN 'uk,co,example' || n || ',sub'
        |         WHEN id % 3 = 0 THEN 'com,example' || n || ',www'
        |         ELSE 'com,example' || n END AS rev_host,
        |    CASE WHEN id % 7 = 0 THEN 'example' || n || '.co.uk'
        |         ELSE 'example' || n || '.com' END AS reg_domain
        |  FROM t)
        |SELECT id AS doc_id,
        |  scheme_raw || '://' || host_raw || port_raw || path_raw
        |    || query_raw || frag AS url,
        |  scheme, host, CAST(port AS INT) AS port, path, query,
        |  rev_host || ')' || path
        |    || COALESCE('?' || query, '') AS surt,
        |  reg_domain
        |FROM f""".stripMargin,

    // wa06: the wa01 facts reduced to the index columns, the SURT key
    // rewritten from the synth's fixed URI prefix, fetch_ok pinned
    // TRUE (the engine computes it by ACTUALLY fetching)
    "wa06_cdx_index" ->
      s"""WITH w AS ($Wa01Sql)
         |SELECT archive_id, rec_index,
         |  CASE WHEN target_uri IS NULL THEN NULL
         |    ELSE replace(target_uri, 'http://corpus.example/doc/',
         |      'example,corpus)/doc/') END AS surt_key,
         |  target_uri, rec_offset, rec_bytes,
         |  TRUE AS fetch_ok
         |FROM w""".stripMargin)

  /** The wa04 extraction replay — CTEs ending in `l(doc_id, ls)`
    * where `ls` is the extracted line list (chrome + token-midpoint
    * paragraph slices, empties dropped). `where` filters documents
    * (wa07 keeps the id-scheduled 200s).
    */
  private def extractedCtes(where: String): String =
    s"""WITH t AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |         string_split(text, ' ') AS toks
       |  FROM documents $where),
       |p AS (
       |  SELECT doc_id,
       |    array_to_string(toks[1:((len(toks)+1)//2)], ' ') AS p1,
       |    array_to_string(toks[((len(toks)+1)//2+1):len(toks)], ' ')
       |      AS p2
       |  FROM t),
       |l AS (
       |  SELECT doc_id, list_filter([
       |    'Doc ' || CAST(doc_id AS VARCHAR),
       |    'home | doc' || chr(160) || CAST(doc_id AS VARCHAR),
       |    'Doc ' || CAST(doc_id AS VARCHAR),
       |    p1, p2,
       |    chr(169) || ' corpus ' || CAST(doc_id % 100 AS VARCHAR) ||
       |      ' ' || chr(8212) || ' "graft"'
       |  ], x -> x <> '') AS ls
       |  FROM p)""".stripMargin

  private lazy val Wa01Sql: String = {
      val d = Warc.DocsPerArchive
      s"""WITH d AS (
         |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |         octet_length(encode(text)) AS n
         |  FROM documents),
         |r0 AS (
         |  SELECT doc_id, doc_id // $d AS archive_id, n,
         |    CASE WHEN n % 7 = 0 THEN ${Warc.Status404.length}
         |      ELSE ${Warc.Status200.length} END AS status_len,
         |    CASE WHEN n % 7 = 0 THEN 404 ELSE 200 END AS status
         |  FROM d),
         |r1 AS (
         |  SELECT *, ${Warc.HttpBlockFixed} + status_len
         |    + length(CAST(n AS VARCHAR)) + n AS clen
         |  FROM r0),
         |r2 AS (
         |  SELECT *, ${Warc.RespHdrFixed}
         |    + length(CAST(doc_id AS VARCHAR))
         |    + length(CAST(clen AS VARCHAR)) + clen + 4 AS rb
         |  FROM r1),
         |resp AS (
         |  SELECT archive_id,
         |    CAST(row_number() OVER (PARTITION BY archive_id
         |      ORDER BY doc_id) AS INT) AS rec_index,
         |    CAST(${Warc.InfoRecBytes} + COALESCE(SUM(rb) OVER (
         |      PARTITION BY archive_id ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS rec_offset,
         |    CAST(rb AS BIGINT) AS rec_bytes,
         |    'response' AS warc_type,
         |    ${recordIdSql("doc_id")} AS record_id,
         |    '${Warc.UriPrefix}' || CAST(doc_id AS VARCHAR)
         |      AS target_uri,
         |    ${dateSql("doc_id")} AS warc_date,
         |    CAST(clen AS BIGINT) AS content_length,
         |    CAST(status AS INT) AS http_status,
         |    '${Warc.HttpTextCt}' AS http_content_type,
         |    CAST(n AS BIGINT) AS payload_bytes
         |  FROM r2),
         |info AS (SELECT DISTINCT doc_id // $d AS archive_id FROM d)
         |SELECT archive_id, CAST(0 AS INT) AS rec_index,
         |  CAST(0 AS BIGINT) AS rec_offset,
         |  CAST(${Warc.InfoRecBytes} AS BIGINT) AS rec_bytes,
         |  'warcinfo' AS warc_type,
         |  ${recordIdSql("archive_id")} AS record_id,
         |  CAST(NULL AS VARCHAR) AS target_uri,
         |  ${dateSql("archive_id")} AS warc_date,
         |  CAST(${Warc.InfoBlock.length} AS BIGINT) AS content_length,
         |  CAST(NULL AS INT) AS http_status,
         |  CAST(NULL AS VARCHAR) AS http_content_type,
         |  CAST(${Warc.InfoBlock.length} AS BIGINT) AS payload_bytes
         |FROM info
         |UNION ALL SELECT * FROM resp""".stripMargin
  }
}
