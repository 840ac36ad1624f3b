package graft.queries

import graft.Tables
import graft.ext.{Dedup, Hashing}

/** [EXT] dedup surface over `documents`. The MinHash and SimHash
  * oracles are *generated from the same Hashing constants* as the
  * Spark operators — any drift in the hash family breaks both sides
  * identically, which the oracle then catches.
  */
object DedupQueries {

  import Hashing._

  val defs: Map[String, QueryFn] = Map(
    "d01_exact_dedup" -> { (s, d) =>
      Dedup.exact(Tables.documents(s, d))
    },
    "d02_jaccard_pairs" -> { (s, d) =>
      Dedup.jaccardPairs(Tables.documents(s, d), n = 3, threshold = 0.5,
        maxDf = 50)
    },
    "d03_minhash_lsh" -> { (s, d) =>
      Dedup.minhashCandidates(Tables.documents(s, d), n = 3)
    },

    /** d13 — LSH candidates scored by signature-estimated jaccard
      * (matches/k over the minhash components): the constant-cost
      * similarity threshold the 100 TB path applies instead of d02's
      * exact shingle-set jaccard.
      */
    "d13_minhash_estimate" -> { (s, d) =>
      Dedup.minhashEstimatedPairs(Tables.documents(s, d), n = 3,
        minEst = 0.5)
    },

    /** d15 — winnowing fingerprints (MOSS): each doc's distinct
      * window-minima over its 3-gram shingle hashes, window w=4 — the
      * partial-overlap detection primitive (see Dedup.winnow's
      * guarantee/density notes). Tie-free by emitting the SET of
      * minima, so the DuckDB window-min twin matches exactly.
      */
    "d15_winnow_fp" -> { (s, d) =>
      Dedup.winnow(Tables.documents(s, d), n = 3, w = 4)
    },

    /** d16 — winnowed overlap pairs: doc pairs sharing ≥2 fingerprints
      * — pairwise copy detection at winnowed (~40%) density instead of
      * the full shingle table; d02's counted-pairs shuffle shape.
      */
    "d16_winnow_pairs" -> { (s, d) =>
      Dedup.winnowOverlapPairs(Tables.documents(s, d), n = 3, w = 4,
        minShared = 2, maxDf = 50)
    },

    /** d14 — fuzzy decontamination: train docs (source != src0) that
      * are NEAR-dups of any eval doc (source = src0) by cross-split
      * minhash LSH + signature-estimated jaccard ≥ 0.5 — the leakage
      * x08's exact 5-gram match misses when the copy has small edits.
      * Eval side broadcast; train side never shuffles.
      */
    "d14_cross_contamination" -> { (s, d) =>
      import org.apache.spark.sql.functions.col
      val docs = Tables.documents(s, d)
      Dedup.crossContamination(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"), n = 3, minEst = 0.5)
    },

    /** d11 — per-doc shingle novelty: fraction of a doc's distinct
      * shingles first owned (min doc_id) by the doc itself — the
      * redundancy signal for curriculum/dedup-aware sampling. Docs
      * shorter than n tokens have no shingles and no row (both sides).
      */
    "d11_novelty" -> { (s, d) =>
      Dedup.noveltyScores(Tables.documents(s, d), n = 3)
    },

    /** d10 — directed containment (asymmetric jaccard): catches a doc
      * whose shingles are mostly a SUBSET of another's (excerpts,
      * quotes, boilerplate inclusion) — low jaccard, high containment.
      */
    "d10_containment" -> { (s, d) =>
      Dedup.containmentPairs(Tables.documents(s, d), n = 3,
        threshold = 0.6, maxDf = 50)
    },
    "d04_simhash_pairs" -> { (s, d) =>
      Dedup.simhashPairs(Tables.documents(s, d), maxDist = 3)
    },

    /** d12 — maximal duplicated token spans (substring-level dedup,
      * Lee et al. 2021): runs of 3-token windows shared by ≥2 distinct
      * docs, merged per doc into maximal `[span_start, span_end]`
      * token ranges — the spans a span-removal cleaning pass cuts.
      */
    "d12_dup_spans" -> { (s, d) =>
      Dedup.dupSpans(Tables.documents(s, d), n = 3, minDocs = 2)
    },

    /** p02 — span-removal cleaning: cut d12's duplicated spans from
      * every non-first-owner doc (min-id survivor, ragged n−1
      * boundaries kept) — the transform span detection feeds.
      */
    "p02_despanned_corpus" -> { (s, d) =>
      Dedup.removeDupSpans(Tables.documents(s, d), n = 3, minDocs = 2)
    },

    /** p01 — the composed cleaning pipeline: quality gate → near-dup
      * removal (lower-id survivor) → fingerprint. One Catalyst plan.
      */
    "p01_clean_corpus" -> { (s, d) =>
      graft.ext.Pipeline.cleanCorpus(Tables.documents(s, d))
    },

    /** d08 — duplicate-cluster formation + survivor selection over the
      * d02 jaccard pair set: connected components (min-id label
      * propagation with pointer jumping) turn pairwise candidates into
      * "keep one per cluster" — the last step of a production dedup
      * pass. Since r11 the edges come from [[graft.ext.Dedup
      * .jaccardClusterEdges]] — exact duplicates collapse to
      * representatives BEFORE the in-group pair expansion (connectivity
      * preserved exactly, cap semantics included — spec-pinned against
      * the naive composition), so a k-copy family costs k member edges
      * instead of C(k,2) expanded pairs per shared shingle. Oracle
      * UNCHANGED: the same components via a recursive CTE over the
      * full d02 pair SQL.
      */
    "d08_dup_clusters" -> { (s, d) =>
      Dedup.clusters(
        Dedup.jaccardClusterEdges(Tables.documents(s, d), n = 3,
          threshold = 0.5, maxDf = 50))
    },

    /** d17 — dup-family size distribution over d08's clusters: how
      * many families of each size, how many docs they hold, and how
      * many a keep-one-survivor pass removes — the first diagnostic a
      * dedup run reports (is duplication a few mega-families or a long
      * tail of pairs?). Two cluster-keyed aggregations over d08's
      * output — tiny once the clusters exist; singleton docs are not
      * in any family by construction.
      */
    "d17_cluster_sizes" -> { (s, d) =>
      import org.apache.spark.sql.functions._
      Dedup.clusters(
        Dedup.jaccardClusterEdges(Tables.documents(s, d), n = 3,
          threshold = 0.5, maxDf = 50))
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("cluster_size"))
        .groupBy(col("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("cluster_size")).as("n_docs"),
          sum(col("cluster_size") - 1).as("n_removable"))
    },

    /** d06 — chunk-level (paragraph/boilerplate) dedup: chunk every
      * doc, find chunk digests shared across >1 document. Composition
      * of x06 chunking + d01 exact-dedup grouping — the pipeline shape
      * that strips boilerplate from a crawl.
      */
    "d06_chunk_dedup" -> { (s, d) =>
      import org.apache.spark.sql.functions._
      graft.ext.TextAnalysis.chunk(Tables.documents(s, d), 40, 30)
        .groupBy(col("chunk_digest"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          min(col("doc_id")).as("first_doc"))
        .filter(col("n_docs") > 1)
    },

    /** s27 — signature-store drift advisory, fed entirely from the
      * persisted dedup store (the s23/s26 discipline on the THIRD
      * persisted store): the store inits on a base slice — recording
      * (n, token mass, band-bucket pair mass) as the baseline — then
      * drains a delta of MASS DUPLICATES (base texts re-presented
      * under fresh ids, the re-drained-corpus failure mode), and the
      * report compares the store's own statistics against the
      * baseline: growth and avgdl ratios, candidate pairs per doc at
      * init vs now, and the advisory boolean — NO text re-read. The
      * oracle replays the whole minhash/banding chain from the
      * documents table: every input is an exact integer, so store-fed
      * == corpus arithmetic bit for bit.
      */
    "s27_sig_drift" -> { (s, d) =>
      import org.apache.spark.sql.functions._
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val base = docs.filter(col("doc_id").cast("long") % 4 =!= 3)
      val delta = docs.filter(col("doc_id").cast("long") % 4 === 0)
        .select((col("doc_id").cast("long") + org.apache.spark.sql
          .functions.lit(3L)).as("doc_id"), col("text"))
      val store = sigDriftStoreFor(d)
      Dedup.initSignaturesIfStale(base, store)
      Dedup.updateSignatures(delta, store)
      Dedup.sigDriftReportFromStore(s, store)
    })

  /** s27's store root — keyed by corpus dir (the [[graft.queries
    * .SimilarityQueries]] indexStoreFor discipline); staleness against
    * a regenerated corpus handled by the recorded fingerprint.
    */
  private def sigDriftStoreFor(sfDir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_sig_store_" +
      sfDir.replaceAll("[^A-Za-z0-9._-]", "_") + "_s27"

  /** Distinct word-3-gram shingles per doc, DuckDB side. */
  private val shinglesCte =
    """sh AS (
      |  SELECT DISTINCT doc_id, s FROM (
      |    SELECT doc_id,
      |      unnest(list_transform(range(len(string_split(text, ' ')) - 2),
      |        i -> array_to_string(string_split(text, ' ')[i+1:i+3], ' '))) AS s
      |    FROM documents))""".stripMargin

  /** The d02 jaccard-pair CTE chain, shared by d02 and d08's oracle. */
  private val jaccardCtes =
    s"""$shinglesCte,
       |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |freq AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= 50),
       |sh2 AS (SELECT sh.doc_id, sh.s FROM sh JOIN freq USING (s)),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
       |  FROM sh2 a JOIN sh2 b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)""".stripMargin

  // d02's Spark side joins on xxhash64(shingle) purely as a compact
  // join key; the oracle joins on the raw shingle string — results are
  // identical short of a 64-bit collision.
  private val d02Sql =
    s"""WITH $jaccardCtes
       |SELECT doc_a, doc_b,
       |  CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
       |FROM inter
       |JOIN sizes sa ON sa.doc_id = doc_a
       |JOIN sizes sb ON sb.doc_id = doc_b
       |WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5""".stripMargin

  // d08: connected components of the d02 pair graph. The oracle builds
  // the transitive closure with a recursive CTE (fine at oracle scale;
  // the Spark side is the log-rounds label propagation).
  private val d08Sql =
    s"""WITH RECURSIVE $jaccardCtes,
       |pairs AS (
       |  SELECT doc_a, doc_b
       |  FROM inter
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach AS (
       |  SELECT src AS id, src AS r FROM edges
       |  UNION
       |  SELECT e.src AS id, reach.r FROM edges e
       |  JOIN reach ON reach.id = e.dst)
       |SELECT id AS doc_id, MIN(r) AS cluster_id,
       |  (id = MIN(r)) AS survivor
       |FROM reach GROUP BY id""".stripMargin

  /** The s27 replay: the d03 signature chain applied to a BASE slice
    * and to the grown (base + duplicate-delta) corpus, each reduced to
    * (n, dl_sum, band pair mass), then the shared drift-report tail.
    */
  private val s27Sql = {
    val minhashCols = (0 until K).map(i =>
      s"MIN(${minhashTermSql(i, "h")}) AS mh$i").mkString(",\n    ")
    def side(p: String, rel: String): String = {
      val bandSelects = (0 until NumBands).map { b =>
        val keyParts = (0 until RowsPerBand)
          .map(r => s"mh${b * RowsPerBand + r}").mkString(", ")
        s"SELECT doc_id, $b AS band, concat_ws('_', $keyParts) AS key " +
          s"FROM ${p}sigs"
      }.mkString("\n  UNION ALL\n  ")
      s"""${p}sh AS (
         |  SELECT DISTINCT doc_id, s FROM (
         |    SELECT doc_id,
         |      unnest(list_transform(range(len(string_split(text, ' ')) - 2),
         |        i -> array_to_string(string_split(text, ' ')[i+1:i+3], ' '))) AS s
         |    FROM $rel)),
         |${p}h AS (SELECT doc_id, ${base60Sql("s")} AS h FROM ${p}sh),
         |${p}sigs AS (
         |  SELECT doc_id,
         |    $minhashCols
         |  FROM ${p}h GROUP BY doc_id),
         |${p}dl AS (
         |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT)
         |    AS dl FROM $rel),
         |${p}stats AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS ${p}n,
         |    CAST(SUM(dl) AS BIGINT) AS ${p}dls
         |  FROM ${p}sigs JOIN ${p}dl USING (doc_id)),
         |${p}band AS (
         |  $bandSelects),
         |${p}pm AS (
         |  SELECT CAST(COALESCE(SUM((c * (c - 1)) // 2), 0) AS BIGINT)
         |    AS ${p}pmv
         |  FROM (SELECT band, key, COUNT(*) AS c FROM ${p}band
         |        GROUP BY band, key))""".stripMargin
    }
    s"""WITH base AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 4 <> 3),
       |delta AS (
       |  SELECT doc_id + 3 AS doc_id, text FROM documents
       |  WHERE doc_id % 4 = 0),
       |cur AS (
       |  SELECT * FROM base UNION ALL SELECT * FROM delta),
       |${side("b", "base")},
       |${side("c", "cur")},
       |rep AS (
       |  SELECT bn AS n_base, cn AS n_current,
       |    round(CAST(cn AS DOUBLE) / bn, 6) + 0.0 AS n_ratio,
       |    round((CAST(cdls AS DOUBLE) / cn) /
       |      (CAST(bdls AS DOUBLE) / bn), 6) + 0.0 AS avgdl_ratio,
       |    round(CAST(bpmv AS DOUBLE) / bn, 6) + 0.0 AS ppd_base,
       |    round(CAST(cpmv AS DOUBLE) / cn, 6) + 0.0 AS ppd_cur,
       |    round(CAST(cpmv AS DOUBLE) / cn -
       |      CAST(bpmv AS DOUBLE) / bn, 6) + 0.0 AS pair_delta
       |  FROM bstats, cstats, bpm, cpm)
       |SELECT n_base, n_current, n_ratio, avgdl_ratio, ppd_base,
       |  ppd_cur, pair_delta,
       |  (pair_delta > CAST(0.5 AS DOUBLE)
       |   OR ABS(avgdl_ratio - CAST(1.0 AS DOUBLE))
       |      > CAST(0.05 AS DOUBLE)) AS stale
       |FROM rep""".stripMargin
  }

  private val d03Sql = {
    val minhashCols = (0 until K).map(i =>
      s"MIN(${minhashTermSql(i, "h")}) AS mh$i").mkString(",\n    ")
    val bandSelects = (0 until NumBands).map { b =>
      val keyParts = (0 until RowsPerBand)
        .map(r => s"mh${b * RowsPerBand + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, concat_ws('_', $keyParts) AS key FROM sigs"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH $shinglesCte,
       |hashed AS (
       |  SELECT doc_id, ${base60Sql("s")} AS h FROM sh),
       |sigs AS (
       |  SELECT doc_id,
       |    $minhashCols
       |  FROM hashed GROUP BY doc_id),
       |banded AS (
       |  $bandSelects)
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |FROM banded a
       |JOIN banded b ON a.band = b.band AND a.key = b.key
       |  AND a.doc_id < b.doc_id""".stripMargin
  }

  // d13: d03's CTE chain plus the per-candidate component-match count;
  // 16 is a power of two so /16.0 is exact on both engines
  private val d13Sql = {
    val minhashCols = (0 until K).map(i =>
      s"MIN(${minhashTermSql(i, "h")}) AS mh$i").mkString(",\n    ")
    val bandSelects = (0 until NumBands).map { b =>
      val keyParts = (0 until RowsPerBand)
        .map(r => s"mh${b * RowsPerBand + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, concat_ws('_', $keyParts) AS key FROM sigs"
    }.mkString("\n  UNION ALL\n  ")
    val matchSum = (0 until K).map(i =>
      s"(CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH $shinglesCte,
       |hashed AS (
       |  SELECT doc_id, ${base60Sql("s")} AS h FROM sh),
       |sigs AS (
       |  SELECT doc_id,
       |    $minhashCols
       |  FROM hashed GROUP BY doc_id),
       |banded AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM banded a
       |  JOIN banded b ON a.band = b.band AND a.key = b.key
       |    AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, ($matchSum) / 16.0 AS est_jaccard
       |FROM cand
       |JOIN sigs sa ON sa.doc_id = doc_a
       |JOIN sigs sb ON sb.doc_id = doc_b
       |WHERE ($matchSum) / 16.0 >= 0.5""".stripMargin
  }

  // d14: d03's signature chain split by source; the band probe keeps
  // the train/eval sides disjoint, the estimate is d13's matches/16
  private val d14Sql = {
    val minhashCols = (0 until K).map(i =>
      s"MIN(${minhashTermSql(i, "h")}) AS mh$i").mkString(",\n    ")
    val bandSelects = (0 until NumBands).map { b =>
      val keyParts = (0 until RowsPerBand)
        .map(r => s"mh${b * RowsPerBand + r}").mkString(", ")
      s"SELECT doc_id, ev, $b AS band, concat_ws('_', $keyParts) AS key" +
        " FROM sigs"
    }.mkString("\n  UNION ALL\n  ")
    val matchSum = (0 until K).map(i =>
      s"(CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH sh AS (
       |  SELECT DISTINCT doc_id, ev, s FROM (
       |    SELECT doc_id, source = 'src0' AS ev,
       |      unnest(list_transform(range(len(string_split(text, ' ')) - 2),
       |        i -> array_to_string(string_split(text, ' ')[i+1:i+3], ' ')))
       |        AS s
       |    FROM documents)),
       |hashed AS (
       |  SELECT doc_id, ev, ${base60Sql("s")} AS h FROM sh),
       |sigs AS (
       |  SELECT doc_id, ev,
       |    $minhashCols
       |  FROM hashed GROUP BY doc_id, ev),
       |banded AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS train_doc, b.doc_id AS eval_doc
       |  FROM banded a
       |  JOIN banded b ON a.band = b.band AND a.key = b.key
       |  WHERE NOT a.ev AND b.ev),
       |scored AS (
       |  SELECT train_doc, eval_doc, ($matchSum) / 16.0 AS est
       |  FROM cand
       |  JOIN sigs sa ON sa.doc_id = train_doc AND NOT sa.ev
       |  JOIN sigs sb ON sb.doc_id = eval_doc AND sb.ev
       |  WHERE ($matchSum) / 16.0 >= 0.5)
       |SELECT train_doc, CAST(COUNT(*) AS BIGINT) AS n_eval_dups,
       |  MAX(est) AS max_est_jaccard
       |FROM scored GROUP BY train_doc""".stripMargin
  }

  private val d04Sql = {
    val votes = (0 until SimBits).map(b =>
      s"SUM(CASE WHEN (h >> $b) % 2 = 1 THEN 1 ELSE -1 END) AS v$b")
      .mkString(",\n    ")
    val fpSum = (0 until SimBits).map(b =>
      s"(CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")
    // the oracle takes the brute-force O(n²) route: banded-join result
    // must equal the full cross-join at Hamming ≤ 3 (pigeonhole)
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
       |hashed AS (
       |  SELECT doc_id, ${base60Sql("t")} AS h FROM tok),
       |votes AS (
       |  SELECT doc_id,
       |    $votes
       |  FROM hashed GROUP BY doc_id),
       |fp AS (
       |  SELECT doc_id, $fpSum AS fp FROM votes)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  bit_count(xor(a.fp, b.fp)) AS hamming
       |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.fp, b.fp)) <= 3""".stripMargin
  }

  private val p01Sql =
    s"""WITH tk AS (
       |  SELECT doc_id, lang, source, text,
       |    len(string_split(text, ' ')) AS n_tokens,
       |    len(list_distinct(string_split(text, ' '))) AS n_distinct
       |  FROM documents),
       |quality AS (
       |  SELECT doc_id, lang, source, text, n_tokens FROM tk
       |  WHERE n_tokens >= 15 AND n_tokens <= 500
       |    AND 1.0 - CAST(n_distinct AS DOUBLE) / n_tokens < 0.7),
       |sh AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id,
       |      unnest(list_transform(range(len(string_split(text, ' ')) - 2),
       |        i -> array_to_string(string_split(text, ' ')[i+1:i+3], ' '))) AS s
       |    FROM quality)),
       |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |freq AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= 50),
       |sh2 AS (SELECT sh.doc_id, sh.s FROM sh JOIN freq USING (s)),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
       |  FROM sh2 a JOIN sh2 b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |drops AS (
       |  SELECT DISTINCT doc_b AS doc_id
       |  FROM inter
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5)
       |SELECT doc_id, lang, source, n_tokens, md5(text) AS digest
       |FROM quality
       |WHERE doc_id NOT IN (SELECT doc_id FROM drops)""".stripMargin

  private val d10Sql =
    s"""WITH $jaccardCtes,
       |sel AS (
       |  SELECT doc_a, doc_b, n_inter, sa.n_sh AS na, sb.n_sh AS nb
       |  FROM inter
       |  JOIN sizes sa ON sa.doc_id = doc_a
       |  JOIN sizes sb ON sb.doc_id = doc_b)
       |SELECT doc_a AS src_doc, doc_b AS in_doc,
       |  CAST(n_inter AS DOUBLE) / na AS containment
       |FROM sel WHERE CAST(n_inter AS DOUBLE) / na >= 0.6
       |UNION ALL
       |SELECT doc_b, doc_a, CAST(n_inter AS DOUBLE) / nb
       |FROM sel WHERE CAST(n_inter AS DOUBLE) / nb >= 0.6""".stripMargin

  // d12: positioned windows keep duplicates (no array_distinct) so the
  // island merge sees every duplicated position; the Spark side keys on
  // the window hash, the oracle on the raw window string (same
  // collision note as d02).
  private val d12Sql =
    """WITH tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |wins AS (
      |  SELECT doc_id, i AS pos,
      |    array_to_string(ts[i+1:i+3], ' ') AS w
      |  FROM (SELECT doc_id, ts, unnest(range(len(ts) - 2)) AS i
      |        FROM tok)),
      |freq AS (
      |  SELECT w FROM wins GROUP BY w
      |  HAVING COUNT(DISTINCT doc_id) >= 2),
      |dup AS (SELECT doc_id, pos FROM wins JOIN freq USING (w)),
      |isl AS (
      |  SELECT doc_id, pos,
      |    pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS g
      |  FROM dup)
      |SELECT doc_id,
      |  MIN(pos) AS span_start,
      |  MAX(pos) + 2 AS span_end,
      |  MAX(pos) + 2 - MIN(pos) + 1 AS span_tokens,
      |  CAST(COUNT(*) AS BIGINT) AS n_windows
      |FROM isl GROUP BY doc_id, g""".stripMargin

  // p02: the d12 window chain plus ownership; runs of redundant
  // windows become cut token intervals in the same closed form the
  // Spark side uses, and the text rebuild is an anti-exists over
  // positions + ordered string_agg.
  private val p02Sql =
    """WITH tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |wins AS (
      |  SELECT doc_id, i AS pos,
      |    array_to_string(ts[i+1:i+3], ' ') AS w
      |  FROM (SELECT doc_id, ts, unnest(range(len(ts) - 2)) AS i
      |        FROM tok)),
      |fo AS (
      |  SELECT w, MIN(doc_id) AS first_doc FROM wins GROUP BY w
      |  HAVING COUNT(DISTINCT doc_id) >= 2),
      |red AS (
      |  SELECT doc_id, pos FROM wins JOIN fo USING (w)
      |  WHERE doc_id <> first_doc),
      |isl AS (
      |  SELECT doc_id, pos,
      |    pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS g
      |  FROM red),
      |runs AS (
      |  SELECT doc_id, MIN(pos) AS a, MAX(pos) AS b
      |  FROM isl GROUP BY doc_id, g),
      |meta AS (SELECT doc_id, ts, len(ts) AS L FROM tok),
      |cuts AS (
      |  SELECT r.doc_id,
      |    CASE WHEN r.a = 0 THEN 0 ELSE r.a + 2 END AS s,
      |    CASE WHEN r.b = m.L - 3 THEN m.L - 1 ELSE r.b END AS e
      |  FROM runs r JOIN meta m USING (doc_id)),
      |posn AS (SELECT doc_id, unnest(range(L)) AS j FROM meta),
      |kept AS (
      |  SELECT p.doc_id, p.j FROM posn p
      |  WHERE NOT EXISTS (SELECT 1 FROM cuts c
      |    WHERE c.doc_id = p.doc_id AND p.j >= c.s AND p.j <= c.e)),
      |agg AS (
      |  SELECT k.doc_id,
      |    string_agg(m.ts[CAST(k.j AS INT) + 1], ' ' ORDER BY k.j)
      |      AS text,
      |    COUNT(*) AS n_kept
      |  FROM kept k JOIN meta m USING (doc_id)
      |  GROUP BY k.doc_id)
      |SELECT m.doc_id,
      |  COALESCE(a.text, '') AS text,
      |  CAST(m.L AS BIGINT) AS n_tokens,
      |  CAST(m.L - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed
      |FROM meta m LEFT JOIN agg a USING (doc_id)""".stripMargin

  private val d11Sql =
    s"""WITH $shinglesCte,
       |fo AS (SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY s)
       |SELECT sh.doc_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_shingles,
       |  CAST(SUM(CASE WHEN fo.first_doc = sh.doc_id THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_novel,
       |  CAST(SUM(CASE WHEN fo.first_doc = sh.doc_id THEN 1 ELSE 0 END)
       |    AS DOUBLE) / COUNT(*) AS novelty
       |FROM sh JOIN fo USING (s)
       |GROUP BY sh.doc_id""".stripMargin

  /** The d15/d16 winnowed-fingerprint CTE chain (window-min selection
    * over positioned 3-gram shingle hashes, w=4).
    */
  private val winnowFpCte =
    s"""tok AS (
       |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       |wsh AS (
       |  SELECT doc_id, i AS pos,
       |    ${base60Sql("array_to_string(ts[i+1:i+3], ' ')")} AS h
       |  FROM (SELECT doc_id, unnest(range(len(ts) - 2)) AS i, ts
       |        FROM tok WHERE len(ts) >= 3)),
       |win AS (
       |  SELECT doc_id, pos, h,
       |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
       |    count(*) OVER (PARTITION BY doc_id) AS nw
       |  FROM wsh),
       |fps AS (
       |  SELECT DISTINCT doc_id, wmin AS fp
       |  FROM win
       |  WHERE pos <= nw - 4 OR (nw < 4 AND pos = 0))""".stripMargin

  val oracles: Map[String, String] = Map(
    "p01_clean_corpus" -> p01Sql,
    "d10_containment" -> d10Sql,
    "d11_novelty" -> d11Sql,
    "d01_exact_dedup" ->
      """SELECT md5(text) AS digest, MIN(doc_id) AS keep_id,
        |  COUNT(*) AS n_docs
        |FROM documents GROUP BY 1""".stripMargin,
    "d02_jaccard_pairs" -> d02Sql,
    "d08_dup_clusters" -> d08Sql,

    // d08's recursive-CTE oracle embedded verbatim as a derived table,
    // then the same two cluster-keyed aggregations
    "d17_cluster_sizes" ->
      s"""SELECT cluster_size,
         |  CAST(COUNT(*) AS BIGINT) AS n_clusters,
         |  CAST(SUM(cluster_size) AS BIGINT) AS n_docs,
         |  CAST(SUM(cluster_size - 1) AS BIGINT) AS n_removable
         |FROM (
         |  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
         |  FROM ($d08Sql)
         |  GROUP BY cluster_id)
         |GROUP BY cluster_size""".stripMargin,
    "d03_minhash_lsh" -> d03Sql,
    "d13_minhash_estimate" -> d13Sql,
    "d14_cross_contamination" -> d14Sql,
    // s27: the signature-store drift report recomputed from the
    // documents table — base-slice baseline, the duplicate-mass delta,
    // the full minhash/banding chain per side, exact long pair masses,
    // and the report arithmetic (double divisions in the operator's
    // order, round-6, −0.0 normalize) — the store-fed path and this
    // replay cannot drift
    "s27_sig_drift" -> s27Sql,
    // positioned 3-gram shingle hashes (duplicates KEPT — winnowing is
    // positional), window-min over 4 consecutive, distinct minima;
    // short docs (<4 shingles) give their global min via the clamped
    // frame, same as the Spark side
    "d15_winnow_fp" ->
      s"""WITH $winnowFpCte
         |SELECT doc_id, fp FROM fps""".stripMargin,

    "d16_winnow_pairs" ->
      s"""WITH $winnowFpCte,
         |rare AS (
         |  SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) BETWEEN 2 AND 50),
         |kept AS (SELECT f.doc_id, f.fp FROM fps f JOIN rare USING (fp))
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  COUNT(*) AS n_shared
         |FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2
         |HAVING COUNT(*) >= 2""".stripMargin,
    "d04_simhash_pairs" -> d04Sql,
    "d12_dup_spans" -> d12Sql,
    "p02_despanned_corpus" -> p02Sql,

    "d06_chunk_dedup" ->
      """WITH chunks AS (
        |  SELECT doc_id,
        |    md5(unnest(list_transform(
        |      range(0, len(string_split(text, ' ')), 30),
        |      i -> array_to_string(string_split(text, ' ')[i+1:i+40], ' '))))
        |      AS chunk_digest
        |  FROM documents)
        |SELECT chunk_digest, COUNT(DISTINCT doc_id) AS n_docs,
        |  MIN(doc_id) AS first_doc
        |FROM chunks
        |GROUP BY chunk_digest
        |HAVING COUNT(DISTINCT doc_id) > 1""".stripMargin)
}
