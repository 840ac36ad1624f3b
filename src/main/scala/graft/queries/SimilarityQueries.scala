package graft.queries

import graft.Tables
import graft.ext.{Hashing, Multimodal, Pca, Quantize, Retrieval,
  Similarity, VectorIndex}
import org.apache.spark.sql.functions._

/** [EXT] similarity-search and multimodal surface.
  *
  * s01 (brute-force cosine) has a DuckDB oracle — both engines rank on
  * 4-decimal-rounded similarity with a vec_id tiebreak. s02 (LSH ANN)
  * and d07 (LSH near-dup pairs) are oracle-checked too: the sign-LSH
  * hyperplanes are exact mod-prime integer arithmetic
  * ([[graft.ext.Similarity.lshMix]]), so the oracle GENERATES the
  * planes with a range() CTE and recomputes the signatures — no
  * thousand-literal plane dump, the same way d09 shares its centroid
  * math and d03 its base60 minhash family.
  */
object SimilarityQueries {

  private val NumQueries = 5
  private val K = 3

  /** s13's unrolled power-iteration count — shared by the query and
    * the oracle generator so the two cannot drift.
    */
  private val PcaIters = 4

  /** s14's MMR knobs — shared by the query and the oracle generator
    * (λ and 1−λ interpolate as Scala-printed doubles, which DuckDB
    * parses back to the identical bits).
    */
  private val MmrK = 4
  private val MmrPool = 12
  private val MmrLambda = 0.7

  /** s20's candidate-stage depth: the store nominates this many ADC
    * candidates per query before the exact re-rank cuts to K — shared
    * by the query and the oracle generator.
    */
  private val RerankPool = 8

  /** s22's planted drift: dim-0 of every even-id vector shifts by this
    * much, so the mean delta on dim 0 is ~half of it — above the
    * default 0.01 mean-shift tolerance. Shared by the query and the
    * oracle generator.
    */
  private val DriftShift = 0.05

  /** s09's query bag: chosen to span the corpus df spectrum (`dup`
    * appears in ~5% of documents, the others in ~77%).
    */
  private val Bm25Terms = Seq("dup", "merge", "spark")

  /** s03/s08's coarse-quantizer training depth (seed sample + one
    * Lloyd refinement) — shared by the queries and the oracle
    * generator so the two cannot drift.
    */
  private val CoarseIters = 2

  /** s17's store root: keyed by the (sanitized) corpus dir so ladder
    * legs never share a store; staleness against a REGENERATED corpus
    * at the same path is handled by [[graft.ext.VectorIndex
    * .initIfStale]]'s fingerprint, not the path.
    */
  private def indexStoreFor(sfDir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_vector_index_" +
      sfDir.replaceAll("[^A-Za-z0-9._-]", "_")

  /** s23's store root — separate from [[indexStoreFor]]'s: s23 inits
    * on the BASE slice where s17/s21/s22 init on the full corpus, and
    * sharing a path would make each query's initIfStale rebuild the
    * other's store on every run.
    */
  private def driftStoreFor(sfDir: String): String =
    indexStoreFor(sfDir) + "_s23"

  /** s21's BM25 store root — the lexical sibling of [[indexStoreFor]];
    * staleness handled by [[graft.ext.Retrieval.initIndexIfStale]]'s
    * fingerprint, not the path.
    */
  private def bm25StoreFor(sfDir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_bm25_index_" +
      sfDir.replaceAll("[^A-Za-z0-9._-]", "_")

  /** s26's BM25 store root — separate from [[bm25StoreFor]]'s for the
    * same reason [[driftStoreFor]] is separate from [[indexStoreFor]]:
    * s26 inits on the BASE document slice where s09/s21 init on the
    * full corpus, and sharing a path would make each query's
    * initIndexIfStale rebuild the other's store on every run.
    */
  private def bm25DriftStoreFor(sfDir: String): String =
    bm25StoreFor(sfDir) + "_s26"

  /** s26's planted vocabulary shift: every delta document gains this
    * suffix — four occurrences of a token OUTSIDE the init-time
    * reference vocabulary, enough out-of-vocabulary mass to cross the
    * 0.01 oov tolerance at the corpus's ~55-token average length.
    * Shared by the query and the oracle generator.
    */
  private val LexDriftSuffix = " qqdrift qqdrift qqdrift qqdrift"

  /** Coarse-training replay CTEs ([[graft.ext.Similarity
    * .coarseCentroids]]): the mod-prime seed sample refined by
    * `CoarseIters − 1` Lloyd passes — s05's rounded-4 argmax
    * assignment and DECIMAL-mean update, unrolled — ending in
    * `cent($idAlias, c_emb)`. Assumes a CTE `e(vec_id, emb)`.
    * `nlist` is any scalar SQL expression — a literal for s03's
    * pinned width, [[AutoNlistSql]] for the s08/s17/s19 chain.
    */
  private def coarseCtes(nlist: String, idAlias: String): String = {
    val rounds = (2 to CoarseIters).map { t =>
      s"""ca$t AS (
         |  SELECT vec_id, emb, centroid_id
         |  FROM e CROSS JOIN cc${t - 1}
         |  QUALIFY row_number() OVER (PARTITION BY vec_id
         |    ORDER BY round(list_cosine_similarity(emb, c_emb), 4) DESC,
         |             centroid_id) = 1),
         |cbyd$t AS MATERIALIZED (
         |  SELECT centroid_id, i AS dim, emb[i+1] AS v
         |  FROM (SELECT centroid_id, emb, unnest(range(0, len(emb))) AS i
         |        FROM ca$t)),
         |cc$t AS (
         |  SELECT centroid_id, list(m ORDER BY dim) AS c_emb FROM (
         |    SELECT centroid_id, dim,
         |      CAST(SUM(CAST(v AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS m
         |    FROM cbyd$t GROUP BY centroid_id, dim)
         |  GROUP BY centroid_id)""".stripMargin
    }.mkString(",\n")
    s"""cc1 AS (
       |  SELECT vec_id AS centroid_id, emb AS c_emb FROM e
       |  QUALIFY row_number() OVER (
       |    ORDER BY ((vec_id % 999983) * 40503) % 999983, vec_id)
       |    <= $nlist),
       |$rounds,
       |cent AS (SELECT centroid_id AS $idAlias, c_emb
       |         FROM cc$CoarseIters)""".stripMargin
  }

  /** s11's hybrid queries: id = the probe embedding's vec_id, bag =
    * the lexical side. Two bags carry the rare `dup` so idf genuinely
    * separates the lexical rankings; the rest are common terms where
    * the dense side decides the fusion.
    */
  private val HybridQueries: Seq[(Long, Seq[String])] = Seq(
    0L -> Seq("dup", "merge"),
    1L -> Seq("spark", "window"),
    2L -> Seq("scan", "filter", "key"),
    3L -> Seq("dup", "vector"),
    4L -> Seq("stream", "sort"))

  val defs: Map[String, QueryFn] = Map(
    "s01_cosine_topk" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
      Similarity.cosineTopK(e, e.filter(col("vec_id") < NumQueries), K)
    },

    "s02_ann_lsh" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
      Similarity.annTopK(e, e.filter(col("vec_id") < NumQueries), K)
    },

    /** s12 — hard-negative mining (DPR shape): per query, the top-k
      * most-similar vectors OUTSIDE its `label` class — the
      * contrastive-training negatives a random sampler would miss.
      * s01's exact plan with the positive-class anti-predicate; the
      * oracle is S01Sql's with the same predicate swap.
      */
    "s12_hard_negatives" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
      Similarity.hardNegatives(e, e.filter(col("vec_id") < NumQueries), K)
    },

    /** s13 — top-principal-component projection (deterministic PCA
      * by unrolled ∞-norm power iteration): the embedding-whitening /
      * drift-axis step of a curation pipeline. The ORACLE REPLAYS THE
      * TRAINING (the s05/x35 discipline): mean, covariance and all
      * four iterations re-derive in unrolled CTEs, so the learned
      * direction AND every projection must match hash-exactly.
      * EAGER: training collects the KB-scale model at construction
      * (the pqTrainOn caveat); the projection itself is a zero-
      * shuffle narrow map.
      */
    "s13_pca_project" -> { (s, d) =>
      Pca.pcaProject(Tables.embeddings(s, d), iters = PcaIters)
    },

    /** s14 — MMR diversified top-k (Carbonell & Goldstein 1998): the
      * greedy relevance-vs-redundancy reranker over the exact
      * candidate pool. The ORACLE REPLAYS THE GREEDY: every pick
      * round re-derives in unrolled CTEs (round-4 sims, round-6
      * scores, vec_id ties), so selection AND order must match
      * hash-exactly. EAGER: the pool localCheckpoints at
      * construction (the semDedup idiom).
      */
    "s14_mmr_topk" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
      Similarity.mmrTopK(e, e.filter(col("vec_id") < NumQueries),
        k = MmrK, poolSize = MmrPool, lambda = MmrLambda)
    },

    /** s18 — INDEX-FED MMR (s14's production form): the candidate
      * pool comes from the s02 sign-LSH index (bucket join — never
      * corpus × probes) and the greedy rerank is mmrRerank unchanged.
      * The oracle regenerates the planes, replays the candidate join,
      * the pool cut AND every greedy round (one shared greedy SQL
      * with s14). The only Window ranks the bucket-bounded candidate
      * set, keyed by query (PlanSpec-pinned).
      */
    "s18_mmr_indexed" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
      Similarity.mmrTopKLsh(e, e.filter(col("vec_id") < NumQueries),
        k = MmrK, poolSize = MmrPool, lambda = MmrLambda)
    },

    /** s16 — top-TWO-component PCA projection (power iteration +
      * Hotelling deflation): the 2-D embedding map / drift plane.
      * The ORACLE REPLAYS BOTH RUNS — the deflated grid included —
      * so both learned directions and every (pc1, pc2) pair must
      * match hash-exactly. EAGER at construction (the s13 caveat).
      */
    "s16_pca2_project" -> { (s, d) =>
      Pca.pcaProject2(Tables.embeddings(s, d), iters = PcaIters)
    },

    /** s15 — embedding-corpus integrity audit: the e05-e11 family
      * for the vector table (zero-norm / non-finite / ragged-dim
      * detection + 6-grid L2 norm stats). One narrow explode + two
      * aggregations, scan-bound at any SF.
      */
    "s15_embedding_audit" -> { (s, d) =>
      Similarity.embeddingAudit(Tables.embeddings(s, d))
    },

    /** s06 — ANN recall@k: per-probe fraction of the exact top-k that
      * the s02 LSH index returned — the offline quality metric of the
      * ANN family, run on a probe sample (the exact side is s01's
      * truth twin, quadratic by design; sample size bounds the cost).
      */
    "s06_ann_recall" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
      Similarity.annRecallAtK(e, e.filter(col("vec_id") < NumQueries), K)
    },

    /** s07 — product-quantization ANN (PQ/ADC): per-subspace
      * codebooks (mod-prime seeds + one DECIMAL-mean Lloyd update —
      * the s05 contract, so training itself is oracle-replayable),
      * 16–32× code compression, asymmetric-distance top-k over the
      * codes table only. The missing member between s03's IVF and
      * s04's int8 re-rank; composing s03's coarse cells with these
      * codebooks is the standard IVF-PQ layout.
      */
    "s07_ann_pq" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
      Similarity.pqTopK(e, e.filter(col("vec_id") < NumQueries), K)
    },

    /** s08 — IVF-PQ: s03's coarse cells pruning the probe + s07's
      * product quantizer on the RESIDUALS — the composed Faiss-style
      * index layout, fully oracle-replayed (coarse argmax, exact
      * residual subtraction, residual codebook training, coarse-dot +
      * ADC scoring).
      */
    "s08_ann_ivfpq" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
      Similarity.ivfPqTopK(e, e.filter(col("vec_id") < NumQueries), K,
        coarseIters = CoarseIters)
    },

    /** s17 — PERSISTED-index IVF-PQ top-k (the production serving
      * shape s08 in-query form trains per invocation): init-if-stale
      * builds the parquet store (trained centroids + residual
      * codebooks + corpus codes, corpus-fingerprinted), then the
      * ranking runs FROM THE STORE — the corpus is never read, the
      * probed cell ids push into the codes scan as PushedFilters, and
      * the scoring tail is s08's exactly, so the oracle is s08's SQL
      * verbatim. A warm store (bench reps 2+) serves at pure query
      * cost — the whole point of the lifecycle.
      */
    "s17_ann_index" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
      val store = indexStoreFor(d)
      VectorIndex.initIfStale(e, store, coarseIters = CoarseIters)
      VectorIndex.query(s, store, e.filter(col("vec_id") < NumQueries), K)
    },

    /** s19 — diversified retrieval ENTIRELY from the store: the pool
      * is s17's cell-pruned top-`MmrPool` (rel = the IVF-PQ score),
      * candidate vectors are PQ RECONSTRUCTIONS (coarse centroid +
      * codebook cells — the approximation a PQ serving stack reasons
      * over when the float corpus is off the serving path), and the
      * greedy is mmrRerank unchanged — the third pool family after
      * s14's exact and s18's LSH. The oracle replays the pool
      * ranking, the reconstruction arithmetic and every greedy round
      * (the shared greedy SQL, sims over `rec`).
      */
    "s19_mmr_store" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
      val store = indexStoreFor(d)
      VectorIndex.initIfStale(e, store, coarseIters = CoarseIters)
      VectorIndex.diversifiedQuery(s, store,
        e.filter(col("vec_id") < NumQueries),
        k = MmrK, poolSize = MmrPool, lambda = MmrLambda)
    },

    /** s24 — TWO-STAGE diversified retrieval: s20's exact-re-rank
      * discipline applied to the diversified tail. The store
      * nominates the top-`MmrPool` ADC candidates (cell-pruned), only
      * those candidates' ORIGINAL vectors are fetched by a pushed
      * vec_id filter, relevance recomputes as exact rounded-4 cosine,
      * and the greedy runs over the originals — compression error
      * picks the pool, never the selection among it. Completes the
      * serving matrix (ranked/diversified × approx/exact-tail). The
      * oracle replays the s08 chain, the pool cut, the exact
      * relevance join, and the shared greedy rounds (sims over `e`).
      */
    "s24_mmr_rerank" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
      val store = indexStoreFor(d)
      VectorIndex.initIfStale(e, store, coarseIters = CoarseIters)
      VectorIndex.diversifiedQueryRerank(s, store, e,
        e.filter(col("vec_id") < NumQueries),
        k = MmrK, poolSize = MmrPool, lambda = MmrLambda)
    },

    /** s20 — TWO-STAGE retrieval from the store (the standard PQ
      * serving tail): the persisted index nominates the top-`RerankPool`
      * ADC candidates per probe (s17's cell-pruned path), then ONLY
      * those candidates' original vectors are fetched from the corpus
      * parquet by a pushed vec_id filter and re-ranked by exact
      * rounded-4 cosine — compression error can mis-nominate, never
      * mis-order. The oracle replays the whole s08 candidate chain,
      * the pool cut, and the exact re-rank.
      */
    "s20_ann_rerank" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
      val store = indexStoreFor(d)
      VectorIndex.initIfStale(e, store, coarseIters = CoarseIters)
      VectorIndex.queryRerank(s, store, e,
        e.filter(col("vec_id") < NumQueries), K, rerank = RerankPool)
    },

    /** s09 — Okapi BM25 lexical top-k: the retrieval family's text
      * side (the ANN family covers embeddings). One exploded scan
      * filtered to query terms inside the generate stage; df derived
      * from the tf table, never a second corpus pass; stats broadcast.
      * Query terms span the df spectrum of the synthetic vocabulary
      * (`dup` is ~15× rarer than `merge`/`spark`), so idf genuinely
      * reorders tf ties. See [[graft.ext.Retrieval.bm25TopK]].
      */
    "s09_bm25_topk" -> { (s, d) =>
      Retrieval.bm25TopK(Tables.documents(s, d), Bm25Terms, k = 10)
    },

    /** s11 — hybrid retrieval by reciprocal-rank fusion: the BM25
      * lexical ranking (s09's scoring) and the dense cosine ranking
      * (s01's metric) fused as Σ 1/(60 + rank) over each system's
      * top-`depth`, the standard first-stage retriever composition.
      * Both per-system ranks are depth-bounded bottom-k AGGREGATIONS
      * (the domainCap discipline — no Window over corpus-sized
      * input); the fusion sees ≤ 2·depth rows per query. See
      * [[graft.ext.Retrieval.hybridTopK]].
      */
    "s11_hybrid_rrf" -> { (s, d) =>
      Retrieval.hybridTopK(Tables.documents(s, d), Tables.embeddings(s, d),
        HybridQueries, k = 10, depth = 20)
    },

    /** s22 — drift-triggered reindex advisory: the store records an
      * s15-audit + per-dim-means + s13-PCA-axis baseline at init;
      * driftReport compares a serving corpus against it (norm ratio,
      * mean-shift L2, the shift PROJECTED on the principal axis) and
      * emits the initIfStale-style `stale` boolean. The serving corpus
      * here is a DETERMINISTIC planted drift (dim-0 of even ids
      * shifted — the m04 plant discipline), so the advisory's trip is
      * part of the oracle-checked answer; the oracle replays the
      * baseline PCA training, both audits, both mean grids, and the
      * boolean.
      */
    "s22_drift_advisory" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
      val store = indexStoreFor(d)
      VectorIndex.initIfStale(e, store, coarseIters = CoarseIters)
      val shifted = e.select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          (x, i) => when(i === 0 && col("vec_id") % 2 === 0,
            x + lit(DriftShift)).otherwise(x)).as("embedding"))
      VectorIndex.driftReport(s, store, shifted)
    },

    /** s23 — the drift advisory fed ENTIRELY from the store's own
      * incrementally-maintained statistics (the form a scheduler can
      * afford to run after EVERY drain at 100 TB): the store inits on
      * a base slice (recording the baseline AND the base slice's
      * exact decimal stats), [[graft.ext.VectorIndex.update]] admits
      * a dim-0-shifted delta (appending the delta's stats alongside
      * its codes), and the report folds the stats — NO corpus scan
      * (PlanSpec-pinned). The oracle recomputes the identical report
      * from the tables directly: decimal sums fold associatively, so
      * stats-fed == corpus-scan bit for bit, and any drift between
      * the two paths hash-fails here.
      */
    "s23_drift_from_stats" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
      val base = e.filter(col("vec_id").cast("long") % 4 =!= 3)
      val delta = e.filter(col("vec_id").cast("long") % 4 === 3)
        .select(col("vec_id"),
          transform(col("embedding").cast("array<double>"),
            (x, i) => when(i === 0, x + lit(DriftShift)).otherwise(x))
            .as("embedding"))
      val store = driftStoreFor(d)
      VectorIndex.initIfStale(base, store, coarseIters = CoarseIters)
      VectorIndex.update(delta, store)
      VectorIndex.driftReportFromStats(s, store)
    },

    /** s21 — hybrid retrieval ENTIRELY from the persisted stores
      * (s11's production form): the lexical leg ranks from the BM25
      * inverted index (built-if-stale), the dense leg from the IVF-PQ
      * vector store (s17's), and the query's own vectors arrive WITH
      * the request as a LOCAL relation — the executed plan scans no
      * corpus table at all (PlanSpec-pinned). The oracle replays the
      * s09 weight tree for the lex leg, the s08 ADC chain for the
      * dense leg, and the shared RRF tail.
      */
    "s21_hybrid_store" -> { (s, d) =>
      import s.implicits._
      // the dense oracle's probe CTE is `vec_id < NumQueries` — pin
      // the hybrid ids to exactly that set so the two cannot drift
      require(HybridQueries.map(_._1).sorted ==
        (0L until NumQueries.toLong),
        "hybrid query ids must be 0..NumQueries-1 (the s08 probe set)")
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val e = Tables.embeddings(s, d)
      val bmStore = bm25StoreFor(d)
      Retrieval.initIndexIfStale(docs, bmStore)
      val vStore = indexStoreFor(d)
      VectorIndex.initIfStale(e, vStore, coarseIters = CoarseIters)
      // the request's own vectors: collected to a LOCAL relation (5
      // rows) — a serving path receives them with the query, it does
      // not scan the corpus for them
      val qVecs = e
        .filter(col("vec_id").isin(HybridQueries.map(_._1): _*))
        .select(col("vec_id").cast("long"),
          col("embedding").cast("array<double>"))
        .as[(Long, Array[Double])].collect().toSeq
        .map { case (id, emb) => (id, emb.toSeq) }
        .toDF("vec_id", "embedding")
      Retrieval.hybridQueryStores(s, bmStore, vStore, HybridQueries,
        qVecs, k = 10, depth = 20)
    },

    /** s25 — EXACT-TAIL hybrid retrieval (s21 + the s20 discipline on
      * the dense leg): the stores nominate (postings-pruned lexical
      * rank, cell-pruned ADC candidates), then ONLY the dense
      * nominees' ORIGINAL vectors are fetched by a pushed vec_id
      * filter and re-ranked by exact rounded-4 cosine BEFORE the
      * shared RRF fuse — compression error picks which candidates
      * fuse, never their fused order. Completes the serving matrix on
      * the hybrid plane. The oracle replays the s09 weight tree, the
      * s08 ADC chain, the s20 exact re-rank, and the shared RRF tail.
      */
    "s25_hybrid_rerank" -> { (s, d) =>
      import s.implicits._
      require(HybridQueries.map(_._1).sorted ==
        (0L until NumQueries.toLong),
        "hybrid query ids must be 0..NumQueries-1 (the s08 probe set)")
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val e = Tables.embeddings(s, d)
      val bmStore = bm25StoreFor(d)
      Retrieval.initIndexIfStale(docs, bmStore)
      val vStore = indexStoreFor(d)
      VectorIndex.initIfStale(e, vStore, coarseIters = CoarseIters)
      val qVecs = e
        .filter(col("vec_id").isin(HybridQueries.map(_._1): _*))
        .select(col("vec_id").cast("long"),
          col("embedding").cast("array<double>"))
        .as[(Long, Array[Double])].collect().toSeq
        .map { case (id, emb) => (id, emb.toSeq) }
        .toDF("vec_id", "embedding")
      Retrieval.hybridQueryStoresRerank(s, bmStore, vStore, e,
        HybridQueries, qVecs, k = 10, depth = 20)
    },

    /** s26 — LEXICAL drift advisory, fed entirely from the persisted
      * BM25 stores (the s23 discipline on the retrieval-index plane):
      * the index inits on a base slice — recording the (n, dl_sum)
      * stats and the top-32 reference vocabulary as the baseline —
      * then drains a delta whose documents carry planted
      * OUT-OF-VOCABULARY mass, and the report compares the store's
      * own sufficient statistics (postings df/term-mass, lengths)
      * against the baseline: growth ratio, avgdl ratio, the mean
      * df-fraction L1 shift, the vocabulary-mass (OOV) shift, and the
      * advisory boolean — NO corpus scan (PlanSpec-pinned). The
      * oracle recomputes the identical report from the documents
      * table: every input is an exact integer, so store-fed ==
      * corpus arithmetic bit for bit, and any drift between the two
      * hash-fails here.
      */
    "s26_lex_drift" -> { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val base = docs.filter(col("doc_id").cast("long") % 4 =!= 3)
      val delta = docs.filter(col("doc_id").cast("long") % 4 === 3)
        .select(col("doc_id"),
          concat(col("text"), lit(LexDriftSuffix)).as("text"))
      val store = bm25DriftStoreFor(d)
      Retrieval.initIndexIfStale(base, store)
      Retrieval.updateIndex(delta, store)
      Retrieval.lexDriftReportFromIndex(s, store)
    },

    /** s28 — DIVERSIFIED hybrid retrieval (r13): the s25 exact-tail
      * chain fused into a top-[[MmrPool]] pool, then the s24 greedy
      * MMR over the pool's exact-fetched originals (λ·fused −
      * (1−λ)·max-sim-to-picked) — the hybrid serving matrix's last
      * cell (ranked×{approx,exact} shipped in r12; this is
      * diversified×exact). The oracle replays the whole s25 chain,
      * the pool cut, and every greedy round as unrolled CTEs.
      */
    "s28_hybrid_mmr" -> { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val e = Tables.embeddings(s, d)
      val bmStore = bm25StoreFor(d)
      Retrieval.initIndexIfStale(docs, bmStore)
      val vStore = indexStoreFor(d)
      VectorIndex.initIfStale(e, vStore, coarseIters = CoarseIters)
      val qVecs = e
        .filter(col("vec_id").isin(HybridQueries.map(_._1): _*))
        .select(col("vec_id").cast("long"),
          col("embedding").cast("array<double>"))
        .as[(Long, Array[Double])].collect().toSeq
        .map { case (id, emb) => (id, emb.toSeq) }
        .toDF("vec_id", "embedding")
      Retrieval.hybridQueryStoresDiversify(s, bmStore, vStore, e,
        HybridQueries, qVecs, k = MmrK, poolSize = MmrPool,
        depth = 20, lambda = MmrLambda)
    },

    /** d05 — embedding-cosine near-dup pairs (threshold tuned to the
      * isotropic corpus: max pairwise cosine ≈ 0.48). Exact all-pairs:
      * the oracle-checkable truth twin of d07, kept at small n only.
      */
    "d05_embedding_dups" -> { (s, d) =>
      Similarity.cosineDupPairs(Tables.embeddings(s, d), 0.4)
    },

    /** d07 — candidate-pruned near-dup pairs: the scale path (LSH
      * banding → bucket join → exact verify; no all-pairs anywhere).
      * Oracle-checked: the plane family is exact mod-prime integer
      * arithmetic, so DuckDB regenerates the planes from range() CTEs
      * and recomputes every signature (see [[Similarity.lshMix]]).
      * Precision vs d05 is 1.0 by construction (exact re-verification);
      * recall on this isotropic corpus at threshold 0.4 is deliberately
      * partial (banding prunes weak pairs — near-dup recall is what the
      * spec pins at 1.0 on planted dups).
      */
    "d07_embedding_dups_lsh" -> { (s, d) =>
      Similarity.cosineDupPairsLsh(Tables.embeddings(s, d), 0.4)
    },

    /** d09 — SemDeDup semantic deduplication: coarse clusters bound
      * the quadratic near-dup check (the pair join never crosses a
      * cluster), min-id survivor within each cluster. The threshold
      * matches d05's so the two dedup families are comparable; the
      * centroid sample / assignment arithmetic is engine-portable by
      * construction (see [[graft.ext.Similarity.semDedup]]), which is
      * what makes this one oracle-checkable where s02/s03 are not.
      */
    "d09_semdedup" -> { (s, d) =>
      Similarity.semDedup(Tables.embeddings(s, d), 0.4)
    },

    /** s05 — deterministic spherical k-means over the embedding
      * corpus (2 unrolled Lloyd iterations, mod-prime init): the
      * "cluster, then curate per cluster" structure of a mixture-
      * balancing pipeline. Oracle-checked — init, argmax assignment
      * and decimal-mean updates are all engine-portable arithmetic
      * (see [[graft.ext.Similarity.kmeansClusters]]).
      */
    "s05_kmeans" -> { (s, d) =>
      Similarity.kmeansClusters(Tables.embeddings(s, d), k = 8, iters = 2)
    },

    /** s10 — cluster-balanced sample: s05's assignment + a
      * deterministic hash-order cap per cluster (the x26 domainCap
      * rule on SEMANTIC strata — diversity-preserving downsampling).
      * Skew-safe on the Spark side (cap-bounded bottom-k aggregation,
      * no Window); the oracle replays s05's assignment verbatim and
      * windows over it.
      */
    "s10_cluster_sample" -> { (s, d) =>
      Similarity.clusterBalancedSample(Tables.embeddings(s, d),
        k = 8, cap = 10, iters = 2)
    },

    /** m01 — multimodal feature extraction through the binary-column
      * pipeline (typed Dataset + batched mapPartitions decode stub).
      */
    "m01_media_features" -> { (s, d) =>
      Multimodal.extractFeatures(s,
        Multimodal.asAssets(Tables.documents(s, d))).toDF()
    },

    /** m05 — REAL audio round-trip: documents become genuine WAV
      * containers (8-bit mono PCM at 8 kHz through the JDK's RIFF
      * writer), then the real javax.sound decode path reads the
      * header facts back. The oracle is arithmetic over the
      * container contract: 44-byte canonical PCM header, one frame
      * per text byte, integer-division duration — if the decoder or
      * writer drifted from the WAV spec, every row would mismatch.
      */
    "m05_audio_features" -> { (s, d) =>
      Multimodal.extractFeatures(s,
          Multimodal.asWavAssets(s, Tables.documents(s, d))).toDF()
        .select(col("doc_id"), col("n_bytes"), col("n_frames"),
          col("sample_rate"), col("n_channels"), col("duration_ms"))
    },

    /** m06 — REAL image round-trip, m05's visual twin: documents
      * become genuine 24-bit BMPs (JDK BMP writer, deterministic
      * dims + gradient), then the real ImageIO decode reads pixel
      * dimensions back. The oracle replays the dimension formulas
      * and the BMP size contract (54-byte headers, 4-byte-aligned
      * BGR rows) — the decoder must parse the real container to
      * match, since the payload boundary strips the synth params.
      */
    "m06_image_features" -> { (s, d) =>
      Multimodal.extractFeatures(s,
          Multimodal.asBmpAssets(s, Tables.documents(s, d))).toDF()
        .select(col("doc_id"), col("n_bytes"), col("width"),
          col("height"), col("n_frames"))
    },

    /** m07 — REAL ISO-BMFF (MP4) container round-trip, the video twin
      * of m05/m06: documents become genuine minimal MP4 box trees
      * (ftyp/moov/mvhd/trak/tkhd/mdia/mdhd/hdlr/mdat at their
      * 14496-12 offsets, deterministic facts over the text byte
      * count), then the box walk reads timescale, duration (and its
      * ms conversion), track/handler counts, 16.16 video dims and
      * mdat size back. The oracle replays the fact formulas AND the
      * fixed box-size arithmetic (148 + 173·tracks + n bytes) — a
      * writer or parser drifting from the spec layout mismatches on
      * every row.
      */
    "m07_mp4_features" -> { (s, d) =>
      Multimodal.mp4Features(s,
        Multimodal.asMp4Assets(s, Tables.documents(s, d))).toDF()
    },

    /** m08 — REAL Matroska/WebM (EBML) container round-trip, m07's
      * twin on the other major video container: documents become
      * genuine minimal EBML trees (EBML-header/DocType, Segment,
      * Info with TimestampScale + float Duration, Tracks with
      * alternating video/audio entries and the video track's pixel
      * dims, one Cluster wrapping the text bytes in a SimpleBlock —
      * RFC 8794 vint framing throughout), then the walk reads every
      * fact back. The oracle replays the fact formulas AND the fixed
      * size arithmetic (130 + 60·n_video + 29·n_audio + n bytes —
      * every size written as an 8-byte vint) — a writer or parser
      * drifting from the EBML framing mismatches on every row.
      */
    "m08_mkv_features" -> { (s, d) =>
      Multimodal.mkvFeatures(s,
        Multimodal.asMkvAssets(s, Tables.documents(s, d))).toDF()
    },

    /** m09 — REAL MP3 (ISO 11172-3 + ID3v2) round-trip, the audio
      * sibling of m07/m08 on the most common real-world audio format:
      * documents become genuine minimal MP3 files (the text bytes as
      * the ID3v2.4 tag payload with a syncsafe size, then a
      * deterministic MPEG-1 Layer III frame train — rate/bitrate/
      * frame-count/channel facts over the text byte count), then the
      * frame walk reads every fact back, including the standard
      * frame-length arithmetic (144000·kbps // rate) and the
      * sample-count duration (frames·1152·1000 // rate). The oracle
      * replays the formulas AND the size arithmetic — a writer or
      * parser drifting from the 11172-3 layout mismatches on every
      * row.
      */
    "m09_mp3_features" -> { (s, d) =>
      Multimodal.mp3Features(s,
        Multimodal.asMp3Assets(s, Tables.documents(s, d))).toDF()
    },

    /** m10 — REAL FLAC (RFC 9639) round-trip, completing the audio
      * family m09 started on the lossless side: documents become
      * genuine minimal FLAC files (spec-correct STREAMINFO with the
      * packed rate/channels/depth/total-samples field, the text bytes
      * as the last metadata block, an unparsed audio section), then
      * the metadata walk reads every fact back — CRC-less header
      * facts without touching codec data, the pre-decode filter a
      * 100 TB audio pass runs. The oracle replays the fact formulas
      * and the size arithmetic — a writer or parser drifting from the
      * layout mismatches on every row.
      */
    "m10_flac_features" -> { (s, d) =>
      Multimodal.flacFeatures(s,
        Multimodal.asFlacAssets(s, Tables.documents(s, d))).toDF()
    },

    /** m11 — REAL OGG (RFC 3533) page walk with a Vorbis
      * identification probe: documents become genuine minimal
      * OGG/Vorbis files (BOS page with a spec-correct ID header, the
      * text bytes as a laced body page, an EOS page whose granule is
      * the sample count), then the walk reads pages / streams /
      * channels / rate / granule-duration back — lacing tables and
      * payloads bounds-checked and tiling to the payload end, CRCs
      * carried not verified (the m09/m10 discipline). The oracle
      * replays the fact formulas and the page-size arithmetic
      * including the ⌊n/255⌋+1 lacing-table length.
      */
    "m11_ogg_features" -> { (s, d) =>
      Multimodal.oggFeatures(s,
        Multimodal.asOggAssets(s, Tables.documents(s, d))).toDF()
    },

    /** m12 — REAL JPEG marker-segment walk (r14), completing the
      * image side the way m10/m11 completed audio: documents become
      * genuine JPEGs (the JDK's own writer — baseline, 8-bit, 3
      * components — with a spliced minimal EXIF APP1 carrying a
      * deterministic orientation), then the SOF/EXIF walk reads
      * dims, precision, component count and orientation back WITHOUT
      * pixel decode — the pre-decode filter an image-curation pass
      * runs on the most common format. Only the formula-expressible
      * facts project here (compressed byte counts are the codec's
      * business, spec-checked not oracle-checked); the oracle replays
      * the dims/orientation formulas.
      */
    "m12_jpeg_features" -> { (s, d) =>
      Multimodal.jpegFeatures(s,
          Multimodal.asJpegAssets(s, Tables.documents(s, d))).toDF()
        .select(col("doc_id"), col("width"), col("height"),
          col("precision").as("sample_precision"), col("n_components"),
          col("orientation"))
    },

    /** m14 — PNG chunk walk (r14, the m12 discipline for the
      * second-most-common web image format): documents become REAL
      * PNGs (the JDK writer — 8-bit truecolor, non-interlaced, no
      * palette), and the chunk walk reads IHDR facts back WITHOUT
      * pixel decode. Only formula-expressible facts project (chunk
      * counts and IDAT byte totals are the encoder's business —
      * spec-checked against the real walk, not oracle-projected).
      */
    "m14_png_features" -> { (s, d) =>
      Multimodal.pngFeatures(s,
          Multimodal.asPngAssets(s, Tables.documents(s, d))).toDF()
        .select(col("doc_id"), col("width"), col("height"),
          col("bit_depth"), col("color_type"), col("interlace"),
          col("palette_entries"), col("has_alpha"))
    },

    /** m13 — ID3v2 text-frame extraction (r14, the m09 extension):
      * documents become ID3v2.4-TAGGED MP3s (real TIT2/TPE1/TALB text
      * frames with deterministic values, the document bytes in a
      * binary PRIV frame, deterministic padding, then m09's exact
      * frame train), and the frame walk reads titles/artists/albums
      * back with the same syncsafe arithmetic the envelope walk uses
      * — the metadata a curation pass filters on without decoding a
      * single audio frame. The oracle replays the value formulas AND
      * the whole tag-size arithmetic.
      */
    "m13_id3_tags" -> { (s, d) =>
      Multimodal.id3Tags(s,
        Multimodal.asMp3TaggedAssets(s, Tables.documents(s, d))).toDF()
    },

    /** s03 — IVF ANN: Lloyd-trained coarse centroids (the d09
      * mod-prime seed sample + one DECIMAL-mean refinement — the
      * oracle replays the TRAINING, r10), nprobe-cell probing, exact
      * re-rank. Recall improves with training at fixed nprobe
      * (spec-measured); the scale story is the bucketed posting-list
      * scan.
      */
    "s03_ann_ivf" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
      Similarity.ivfTopK(e, e.filter(col("vec_id") < NumQueries), K,
        coarseIters = CoarseIters)
    },

    /** m02 — frame sampling through the same binary pipeline: payload
      * split into 64-byte pseudo-frames, every 4th kept. The corpus
      * text is pure ASCII, so the oracle can reproduce the byte chunks
      * with substr().
      */
    "m02_frame_samples" -> { (s, d) =>
      Multimodal.sampleFrames(s,
        Multimodal.asAssets(Tables.documents(s, d))).toDF()
    },

    /** m03 — resize through the binary pipeline. The stub's output
      * size is exactly min(n_bytes_in, 224·224/64), which the oracle
      * reproduces arithmetically; the digest column is provenance-only
      * (not oracle-expressible) and excluded here.
      */
    "m03_resize" -> { (s, d) =>
      Multimodal.resize(s,
          Multimodal.asAssets(Tables.documents(s, d))).toDF()
        .select(col("doc_id"), col("target_w"), col("target_h"),
          col("n_bytes_in"), col("n_bytes_out"))
    },

    /** m04 — media near-dup pairs via perceptual hash (engine-only:
      * the chunked dHash over payload BYTES has no SQL twin — DuckDB
      * can't fold over blobs; exactness vs brute force and planted
      * recall are spec-pinned in SimilaritySpec instead). Near-copies
      * are planted in-query (same-length tail edits, doc_id + 10⁹) so
      * the result demonstrably contains the pairs the operator
      * exists to find.
      */
    "m04_phash_dups" -> { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val near = docs
        .filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + lit(1000000000L)).as("doc_id"),
          concat(expr("substring(text, 1, length(text) - 1)"), lit("Z"))
            .as("text"))
      Multimodal.phashPairs(s,
        Multimodal.asAssets(docs.unionByName(near)), maxDist = 3).toDF()
    },

    /** s04 — int8-quantized ANN. Oracle-checked since r6: x19 already
      * proved the double→int8 rounding portable, and the candidate
      * score is an EXACT integer dot rescaled by two multiplies whose
      * order the oracle mirrors parenthesis-for-parenthesis (IEEE
      * multiplication is not associative; a reordered rescale would
      * perturb the unrounded ranking key). Exact-equality-at-full-
      * rerank and recall stay spec-pinned.
      */
    "s04_ann_int8" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
      Similarity.quantizedTopK(e, e.filter(col("vec_id") < NumQueries), K)
    },

    /** x19 — int8 embedding quantization, oracle-checked through
      * integer checksums of the quantized vectors (sum / L1 / min /
      * max fully determine element-wise agreement up to permutation,
      * and the per-dim values are pinned by QuantizeSpec's
      * reconstruction bound). A narrow no-shuffle map — the whole
      * query is one codegen stage over the parquet scan.
      */
    "x19_quantize_int8" -> { (s, d) =>
      Quantize.int8(Tables.embeddings(s, d), "embedding")
        .select(col("vec_id"),
          size(col("embedding")).cast("long").as("n_dims"),
          col("q_scale"),
          aggregate(col("q_vec"), lit(0L),
            (acc, x) => acc + x.cast("long")).as("q_sum"),
          aggregate(col("q_vec"), lit(0L),
            (acc, x) => acc + abs(x.cast("long"))).as("q_l1"),
          array_min(col("q_vec")).cast("long").as("q_min"),
          array_max(col("q_vec")).cast("long").as("q_max"))
    },

    /** x05 — label-centroid similarity: mean embedding per label, then
      * each vector's cosine to its own label centroid (the
      * embedding-quality probe of a curation pipeline).
      *
      * Oracle-checkable formulation: every float reduction goes through
      * a decimal cast (exact, order-free — the dsum trick of
      * [[graft.queries]]), so centroid components, dot products and
      * norms are bit-identical across engines; sqrt and the final
      * division are single IEEE ops on identical doubles. Fully
      * relational (explode → two hash aggregations + one broadcast
      * join) — at 100 TB this is two ordinary shuffles on (label,dim)
      * and vec_id, no arrays of state anywhere.
      */
    "x05_label_centroid_sim" -> { (s, d) =>
      val byDim = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding").cast("array<double>"))
            .as(Seq("dim", "v")))
      // exact mean: decimal sum surfaced as double, ONE double division
      // (the op order DuckDB performs — see davg's contract)
      val centroids = byDim.groupBy(col("label"), col("dim"))
        .agg((sum(col("v").cast("decimal(38,18)")).cast("double") /
          count(lit(1))).as("c"))
      byDim.join(broadcast(centroids), Seq("label", "dim"))
        .groupBy(col("vec_id"), col("label"))
        .agg(
          sum((col("v") * col("c")).cast("decimal(38,18)")).cast("double")
            .as("dot"),
          sum((col("v") * col("v")).cast("decimal(38,18)")).cast("double")
            .as("vn"),
          sum((col("c") * col("c")).cast("decimal(38,18)")).cast("double")
            .as("cn"))
        .select(col("vec_id"), col("label"),
          round(col("dot") / (sqrt(col("vn")) * sqrt(col("cn"))), 4)
            .as("centroid_sim"))
    })

  /** Signature CTEs shared by the d07/s02 oracles: regenerate the
    * sign-LSH planes from range() cross-products with the exact
    * mod-prime arithmetic of [[graft.ext.Similarity.lshMix]] (every
    * intermediate < 2⁶³ — DuckDB BIGINT computes it exactly), surface
    * each plane component as (Σk)/p − 2.0 (one exact integer sum, two
    * IEEE ops — bit-identical to the Scala side), then fold sign bits
    * into per-(vec, table) buckets. Assumes a CTE `e(vec_id, emb)`
    * with emb already DOUBLE[]. `bitsSql` is any scalar expression —
    * a literal for s02's fixed width, the [[Similarity.autoBits]]
    * integer sizing rule (ceil-div to groups, bit length via bin(),
    * clamp to [6,20] — range() can't take a subquery bound, so bits
    * generate to the cap and filter) for d07's occupancy-constant
    * banding.
    */
  private def sigCtes(tables: Int, bitsSql: String): String =
    s"""nb AS (SELECT ($bitsSql) AS bits),
       |dims AS (
       |  SELECT vec_id, i AS j, emb[i+1] AS v
       |  FROM (SELECT vec_id, emb,
       |          unnest(range(0, least(len(emb), 64))) AS i FROM e)),
       |seeds AS (
       |  SELECT t, b, j,
       |    ((t * 1099511627776 + b * 4294967296 + j) * 4 + s) AS x
       |  FROM range(0,$tables) r1(t), range(0,20) r2(b),
       |       range(0,64) r3(j), range(0,4) r4(s), nb
       |  WHERE b < nb.bits),
       |h1 AS (SELECT t, b, j,
       |  ((x % 2147483647) * (x % 2147483647) + 12345) % 2147483647 AS k
       |  FROM seeds),
       |h2 AS (SELECT t, b, j, (k * 48271) % 2147483647 AS k FROM h1),
       |h3 AS (SELECT t, b, j, (k * k + 6789) % 2147483647 AS k FROM h2),
       |planes AS (
       |  SELECT t, b, j, CAST(SUM(k) AS DOUBLE) / 2147483647 - 2.0 AS p
       |  FROM h3 GROUP BY t, b, j),
       |dots AS (
       |  SELECT d.vec_id, pl.t, pl.b, SUM(d.v * pl.p) AS dt
       |  FROM dims d JOIN planes pl ON d.j = pl.j
       |  GROUP BY d.vec_id, pl.t, pl.b),
       |sig AS (
       |  SELECT vec_id, t,
       |    SUM(CASE WHEN dt > 0
       |        THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END)
       |      AS bucket
       |  FROM dots GROUP BY vec_id, t)""".stripMargin

  /** s01/s02 oracle bodies as standalone vals: the s06 recall oracle
    * embeds BOTH verbatim (nested WITH subqueries), so the metric's
    * exact and approximate sides cannot drift from the queries they
    * grade.
    */
  private lazy val S01Sql: String =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, emb AS q_emb FROM e
       |      WHERE vec_id < $NumQueries)
       |SELECT query_id, vec_id AS neighbor_id,
       |  round(list_cosine_similarity(emb, q_emb), 4) + 0.0 AS sim,
       |  CAST(row_number() OVER w AS INT) AS rank
       |FROM e, q
       |WHERE vec_id != query_id
       |WINDOW w AS (PARTITION BY query_id
       |  ORDER BY round(list_cosine_similarity(emb, q_emb), 4) DESC, vec_id)
       |QUALIFY rank <= $K""".stripMargin

  // S01Sql with the positive-class anti-predicate: the class filter
  // replaces the self-exclusion (different label implies different id)
  private lazy val S12Sql: String =
    s"""WITH e AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, label AS q_label,
       |             emb AS q_emb
       |      FROM e WHERE vec_id < $NumQueries)
       |SELECT query_id, vec_id AS negative_id,
       |  round(list_cosine_similarity(emb, q_emb), 4) + 0.0 AS sim,
       |  CAST(row_number() OVER w AS INT) AS rank
       |FROM e, q
       |WHERE label != q_label
       |WINDOW w AS (PARTITION BY query_id
       |  ORDER BY round(list_cosine_similarity(emb, q_emb), 4) DESC, vec_id)
       |QUALIFY rank <= $K""".stripMargin

  private lazy val S02Sql: String =
    s"""WITH e AS (
       |  SELECT CAST(vec_id AS BIGINT) AS vec_id,
       |         CAST(embedding AS DOUBLE[]) AS emb
       |  FROM embeddings),
       |${sigCtes(tables = 8, bitsSql = "8")},
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, s.vec_id
       |  FROM sig s JOIN (SELECT * FROM sig WHERE vec_id < $NumQueries) q
       |    ON s.t = q.t AND s.bucket = q.bucket AND s.vec_id != q.vec_id)
       |SELECT c.query_id, c.vec_id AS neighbor_id,
       |  round(list_cosine_similarity(ce.emb, qe.emb), 4) + 0.0 AS sim,
       |  CAST(row_number() OVER w AS INT) AS rank
       |FROM cand c
       |JOIN e ce ON ce.vec_id = c.vec_id
       |JOIN e qe ON qe.vec_id = c.query_id
       |WINDOW w AS (PARTITION BY c.query_id
       |  ORDER BY round(list_cosine_similarity(ce.emb, qe.emb), 4) DESC,
       |           c.vec_id)
       |QUALIFY rank <= $K""".stripMargin

  /** s13's full training replay: mean → centering → covariance →
    * `PcaIters` unrolled ∞-norm power iterations → sign canon →
    * projection. Every sum is order-free EXACT on the 6-grid — the
    * covariance by the moment identity over 1e-6-quantized BIGINT
    * raw-product sums (integer addition: the engine's codegen-fast,
    * exactly-mergeable form — the same statistic its streaming store
    * folds), everything else through DECIMAL(38,18) (the s05 vector
    * contract); normalisation divides
    * by MAX(ABS(w)) — exact operations an engine cannot drift on —
    * and v₀ = 1⃗ enters as literal arithmetic. Generated by a loop
    * over the SAME iteration count the query uses.
    */
  /** Shared PCA oracle prelude: data, per-dim decimal means, centered
    * values, and the moment-identity covariance over 1e-6-quantized
    * BIGINT raw-product sums.
    */
  private lazy val PcaBaseCtes: String = pcaBaseCtes("")

  /** [[PcaBaseCtes]] with an optional WHERE tail on the source scan —
    * s23's drift baseline trains on the BASE slice only, exactly as
    * its store records it.
    */
  private def pcaBaseCtes(where: String): String =
    s"""e AS (
      |  SELECT CAST(vec_id AS BIGINT) AS vec_id,
      |         CAST(embedding AS DOUBLE[]) AS emb
      |  FROM embeddings$where),
      |byd AS MATERIALIZED (
      |  SELECT vec_id, i AS dim, emb[i+1] AS x
      |  FROM (SELECT vec_id, emb, unnest(range(0, len(emb))) AS i
      |        FROM e)),
      |mu AS MATERIALIZED (
      |  SELECT dim,
      |    round(CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE)
      |      / COUNT(*), 6) AS m
      |  FROM byd GROUP BY dim),
      |cen AS MATERIALIZED (
      |  SELECT b.vec_id, b.dim, b.x - mu.m AS c
      |  FROM byd b JOIN mu ON mu.dim = b.dim),
      |cov AS MATERIALIZED (
      |  SELECT a.dim AS i, b.dim AS j,
      |    round(CAST(SUM(CAST(round((a.x * b.x) * 1e6, 0) AS BIGINT))
      |        AS DOUBLE) / 1e6
      |      - CAST(COUNT(*) AS DOUBLE) * (mi.m * mj.m), 6) AS m
      |  FROM byd a JOIN byd b ON a.vec_id = b.vec_id
      |  JOIN mu mi ON mi.dim = a.dim
      |  JOIN mu mj ON mj.dim = b.dim
      |  GROUP BY a.dim, b.dim, mi.m, mj.m)""".stripMargin

  /** `PcaIters` power-iteration CTE pairs over matrix `mat`, vectors
    * named `$vp0..$vp$PcaIters` and work vectors `$wp1..`.
    *
    * The normalising divisor MAX(ABS(w)) is guarded: on a
    * zero-covariance (constant) corpus it is 0 and a bare division
    * would yield NaN v-vectors where the Scala operator stops
    * iterating and keeps the previous vector (the spec-pinned
    * degenerate branch — all-ones v, 0.0 projections). The CASE keeps
    * the previous iterate exactly as the Scala side does; when the
    * matvec is ever-zero, every later iteration reproduces the same
    * zero w, so "keep v" and "stop iterating" coincide. Non-degenerate
    * corpora take the ELSE arm — the identical division as before.
    */
  private def pcaIterCtes(mat: String, wp: String, vp: String): String =
    (1 to PcaIters).map { k =>
      s"""$wp$k AS MATERIALIZED (
         |  SELECT c.i,
         |    round(CAST(SUM(CAST(c.m * v.v AS DECIMAL(38,18))) AS DOUBLE),
         |          6) AS w
         |  FROM $mat c JOIN $vp${k - 1} v ON v.i = c.j GROUP BY c.i),
         |$vp$k AS MATERIALIZED (
         |  SELECT w.i,
         |    CASE WHEN (SELECT MAX(ABS(w)) FROM $wp$k) = CAST(0.0 AS DOUBLE)
         |      THEN pv.v
         |      ELSE round(w.w / (SELECT MAX(ABS(w)) FROM $wp$k), 6) END AS v
         |  FROM $wp$k w JOIN $vp${k - 1} pv ON pv.i = w.i)""".stripMargin
    }.mkString(",\n")

  /** Sign canonicalisation of `$vlast` into `$vf`. */
  private def pcaSignCtes(vlast: String, sgn: String, vf: String): String =
    s"""$sgn AS (
       |  SELECT CASE WHEN (SELECT v FROM $vlast
       |                    WHERE ABS(v) = CAST(1.0 AS DOUBLE)
       |                    ORDER BY i LIMIT 1) < CAST(0.0 AS DOUBLE)
       |    THEN CAST(-1.0 AS DOUBLE) ELSE CAST(1.0 AS DOUBLE) END AS s),
       |$vf AS MATERIALIZED (SELECT i, v * (SELECT s FROM $sgn) AS v FROM $vlast)""".stripMargin

  /** s08/s17's shared oracle body: the composed IVF-PQ replayed
    * end-to-end over the TRAINED coarse quantizer. One definition —
    * the persisted-index query (s17) must rank exactly as the
    * in-query form (s08), so they check against the SAME SQL — and
    * the chain up to `adc` is reused by s19's store-fed MMR pool.
    */
  private lazy val S08Sql: String =
    s"""WITH $S08Ctes
       |SELECT query_id, vec_id AS neighbor_id,
       |  round(qc + r_ip, 4) + 0.0 AS approx_ip,
       |  CAST(row_number() OVER w AS INT) AS rank
       |FROM adc
       |WINDOW w AS (PARTITION BY query_id
       |  ORDER BY round(qc + r_ip, 4) DESC, vec_id)
       |QUALIFY rank <= $K""".stripMargin

  /** The ⌈N/128⌉-floor-16 auto-sizing rule ([[graft.ext.Similarity
    * .autoNlist]]) as a scalar SQL expression over the corpus CTE `e`
    * — exact integer arithmetic (floored-div ceil), so the oracle and
    * the operator resolve the IDENTICAL nlist at every corpus size
    * (128 a power of two keeps the rule float-free on both sides).
    */
  private val AutoNlistSql: String =
    "(SELECT GREATEST(16, (COUNT(*) + 127) // 128) FROM e)"

  private lazy val S08Ctes: String =
    s"""e AS (
         |  SELECT CAST(vec_id AS BIGINT) AS vec_id,
         |         CAST(embedding AS DOUBLE[]) AS emb
         |  FROM embeddings),
         |${coarseCtes(nlist = AutoNlistSql, idAlias = "coarse_id")},
         |post0 AS (
         |  SELECT vec_id, emb, coarse_id, c_emb
         |  FROM e CROSS JOIN cent
         |  QUALIFY row_number() OVER (PARTITION BY vec_id
         |    ORDER BY round(list_cosine_similarity(emb, c_emb), 6) DESC,
         |             coarse_id) = 1),
         |rbyd AS (
         |  SELECT vec_id, coarse_id, CAST(i AS INT) AS i,
         |         emb[CAST(i+1 AS INT)] - c_emb[CAST(i+1 AS INT)] AS v
         |  FROM (SELECT vec_id, coarse_id, emb, c_emb,
         |          unnest(range(0, len(emb))) AS i FROM post0)),
         |er AS (
         |  SELECT vec_id, coarse_id, list(v ORDER BY i) AS emb
         |  FROM rbyd GROUP BY vec_id, coarse_id),
         |sv AS (
         |  SELECT vec_id, CAST(s AS INT) AS sub,
         |         emb[CAST(s*8+1 AS INT):CAST(s*8+8 AS INT)] AS sv
         |  FROM (SELECT vec_id, emb, unnest(range(0, 8)) AS s FROM er)),
         |seeds AS (
         |  SELECT vec_id AS cell, emb FROM er
         |  WHERE vec_id != coarse_id
         |  QUALIFY row_number() OVER (
         |    ORDER BY ((vec_id % 999983) * 40503) % 999983, vec_id) <= 16),
         |cb0 AS (
         |  SELECT cell, CAST(s AS INT) AS sub,
         |         emb[CAST(s*8+1 AS INT):CAST(s*8+8 AS INT)] AS c_sv
         |  FROM (SELECT cell, emb, unnest(range(0, 8)) AS s FROM seeds)),
         |a1 AS (
         |  SELECT vec_id, sub, cell, sv
         |  FROM sv JOIN cb0 USING (sub)
         |  QUALIFY row_number() OVER (PARTITION BY vec_id, sub
         |    ORDER BY round(list_sum(list_transform(range(1, len(sv)+1),
         |      i -> (sv[i]-c_sv[i])*(sv[i]-c_sv[i]))), 4), cell) = 1),
         |byd AS MATERIALIZED (
         |  SELECT sub, cell, CAST(i AS INT) AS dim,
         |         sv[CAST(i+1 AS INT)] AS v
         |  FROM (SELECT sub, cell, sv, unnest(range(0, len(sv))) AS i
         |        FROM a1)),
         |cb1 AS (
         |  SELECT sub, cell, list(c ORDER BY dim) AS c_sv FROM (
         |    SELECT sub, cell, dim,
         |      CAST(SUM(CAST(v AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS c
         |    FROM byd GROUP BY sub, cell, dim) GROUP BY sub, cell),
         |codes AS (
         |  SELECT vec_id, sub, cell
         |  FROM sv JOIN cb1 USING (sub)
         |  QUALIFY row_number() OVER (PARTITION BY vec_id, sub
         |    ORDER BY round(list_sum(list_transform(range(1, len(sv)+1),
         |      i -> (sv[i]-c_sv[i])*(sv[i]-c_sv[i]))), 4), cell) = 1),
         |codesc AS MATERIALIZED (
         |  SELECT c.vec_id, c.sub, c.cell, r.coarse_id
         |  FROM codes c JOIN er r USING (vec_id)),
         |probes AS (
         |  SELECT vec_id AS query_id, coarse_id,
         |         round(list_dot_product(emb, c_emb), 4) AS qc
         |  FROM e CROSS JOIN cent
         |  WHERE vec_id < $NumQueries
         |  QUALIFY row_number() OVER (PARTITION BY vec_id
         |    ORDER BY round(list_cosine_similarity(emb, c_emb), 6) DESC,
         |             coarse_id) <= 4),
         |qsv AS (
         |  SELECT query_id, CAST(s AS INT) AS sub,
         |         emb[CAST(s*8+1 AS INT):CAST(s*8+8 AS INT)] AS q_sv
         |  FROM (SELECT vec_id AS query_id, emb, unnest(range(0, 8)) AS s
         |        FROM e WHERE vec_id < $NumQueries)),
         |dt AS (
         |  SELECT query_id, sub, cell,
         |         round(list_dot_product(q_sv, c_sv), 4) AS pd
         |  FROM qsv JOIN cb1 USING (sub)),
         |adc AS (
         |  SELECT p.query_id, cc.vec_id, p.qc,
         |    CAST(SUM(CAST(dt.pd AS DECIMAL(38,18))) AS DOUBLE) AS r_ip
         |  FROM codesc cc
         |  JOIN probes p ON p.coarse_id = cc.coarse_id
         |    AND cc.vec_id != p.query_id
         |  JOIN dt ON dt.query_id = p.query_id AND dt.sub = cc.sub
         |    AND dt.cell = cc.cell
         |  GROUP BY p.query_id, cc.vec_id, p.qc)""".stripMargin

  /** s20: the s08 chain ends in `adc`; candidates are its
    * top-`RerankPool` cut, and the final ranking is the EXACT s01
    * cosine over just those candidates' original vectors — the
    * two-stage serving tail end-to-end in SQL.
    */
  private lazy val S20Sql: String =
    s"""WITH $S08Ctes,
       |cand AS (
       |  SELECT query_id, vec_id
       |  FROM adc
       |  QUALIFY row_number() OVER (PARTITION BY query_id
       |    ORDER BY round(qc + r_ip, 4) DESC, vec_id) <= $RerankPool)
       |SELECT c.query_id, c.vec_id AS neighbor_id,
       |  round(list_cosine_similarity(ce.emb, qe.emb), 4) + 0.0 AS sim,
       |  CAST(row_number() OVER w AS INT) AS rank
       |FROM cand c
       |JOIN e ce ON ce.vec_id = c.vec_id
       |JOIN e qe ON qe.vec_id = c.query_id
       |WINDOW w AS (PARTITION BY c.query_id
       |  ORDER BY round(list_cosine_similarity(ce.emb, qe.emb), 4) DESC,
       |           c.vec_id)
       |QUALIFY rank <= $K""".stripMargin

  private lazy val S13Sql: String =
    s"""WITH $PcaBaseCtes,
       |v0 AS (SELECT DISTINCT i, CAST(1.0 AS DOUBLE) AS v FROM cov),
       |${pcaIterCtes("cov", "w", "v")},
       |${pcaSignCtes(s"v$PcaIters", "sgn", "vf")}
       |SELECT c.vec_id,
       |  round(CAST(SUM(CAST(c.c * f.v AS DECIMAL(38,18))) AS DOUBLE), 6)
       |    + 0.0 AS pc1
       |FROM cen c JOIN vf f ON f.i = c.dim
       |GROUP BY c.vec_id""".stripMargin

  /** s16: s13's chain, then the Hotelling deflation —
    * f = round6(vᵀCv / (vᵀv)²), C' = round6(C − f·vᵢvⱼ) — and a
    * second full iteration run over the deflated grid; both
    * projections come off ONE grouped pass.
    */
  private lazy val S16Sql: String =
    s"""WITH $PcaBaseCtes,
       |v0 AS (SELECT DISTINCT i, CAST(1.0 AS DOUBLE) AS v FROM cov),
       |${pcaIterCtes("cov", "w", "v")},
       |${pcaSignCtes(s"v$PcaIters", "sgn1", "vf1")},
       |num AS (
       |  SELECT round(CAST(SUM(CAST(c.m * a.v * b.v AS DECIMAL(38,18)))
       |    AS DOUBLE), 6) AS num
       |  FROM cov c JOIN vf1 a ON a.i = c.i JOIN vf1 b ON b.i = c.j),
       |den AS (
       |  SELECT round(CAST(SUM(CAST(v * v AS DECIMAL(38,18))) AS DOUBLE),
       |    6) AS den FROM vf1),
       |cov2 AS MATERIALIZED (
       |  SELECT c.i, c.j,
       |    round(c.m - round(num / (den * den), 6) * (a.v * b.v), 6) AS m
       |  FROM cov c JOIN vf1 a ON a.i = c.i JOIN vf1 b ON b.i = c.j,
       |       num, den),
       |u0 AS (SELECT DISTINCT i, CAST(1.0 AS DOUBLE) AS v FROM cov2),
       |${pcaIterCtes("cov2", "x", "u")},
       |${pcaSignCtes(s"u$PcaIters", "sgn2", "vf2")}
       |SELECT c.vec_id,
       |  round(CAST(SUM(CAST(c.c * f1.v AS DECIMAL(38,18))) AS DOUBLE), 6)
       |    + 0.0 AS pc1,
       |  round(CAST(SUM(CAST(c.c * f2.v AS DECIMAL(38,18))) AS DOUBLE), 6)
       |    + 0.0 AS pc2
       |FROM cen c
       |JOIN vf1 f1 ON f1.i = c.dim
       |JOIN vf2 f2 ON f2.i = c.dim
       |GROUP BY c.vec_id""".stripMargin

  /** s22: the drift report replayed end-to-end — the baseline's PCA
    * axis (s13's training CTEs verbatim), both corpora's audit
    * norm stats (the s15 pv accounting), both 6-grid mean vectors,
    * the planted dim-0 shift applied in byd space (identical double
    * adds to the operator's in-array shift), the shift projections,
    * and the advisory boolean over the rounded values.
    */
  private lazy val S22Sql: String =
    s"""WITH $PcaBaseCtes,
       |v0 AS (SELECT DISTINCT i, CAST(1.0 AS DOUBLE) AS v FROM cov),
       |${pcaIterCtes("cov", "w", "v")},
       |${pcaSignCtes(s"v$PcaIters", "sgn", "vf")},
       |${driftOracleTail(
           s"""curbyd AS MATERIALIZED (
              |  SELECT vec_id, dim,
              |    CASE WHEN dim = 0 AND vec_id % 2 = 0
              |      THEN x + CAST($DriftShift AS DOUBLE) ELSE x END AS x
              |  FROM byd)""".stripMargin, "e")}""".stripMargin

  /** s23: the STATS-FED drift report replayed end-to-end — the
    * baseline chain (PCA axis + audit) over the BASE slice only
    * (vec_id % 4 <> 3, the slice the store was init'd on), the
    * current corpus as base ∪ the dim-0-shifted delta (the exact
    * double adds [[graft.ext.VectorIndex.update]]'s admitted batch
    * carried), and the shared report tail. The QUERY side reads the
    * report from the store's incrementally-maintained decimal stats
    * without rescanning any corpus; this SQL recomputes the same
    * values from the tables directly — if the fold-at-read stats path
    * ever drifts from the corpus-scan arithmetic, the hash fails.
    */
  private lazy val S23Sql: String =
    s"""WITH ${pcaBaseCtes(" WHERE vec_id % 4 <> 3")},
       |v0 AS (SELECT DISTINCT i, CAST(1.0 AS DOUBLE) AS v FROM cov),
       |${pcaIterCtes("cov", "w", "v")},
       |${pcaSignCtes(s"v$PcaIters", "sgn", "vf")},
       |cure AS (
       |  SELECT CAST(vec_id AS BIGINT) AS vec_id,
       |         CAST(embedding AS DOUBLE[]) AS emb
       |  FROM embeddings),
       |${driftOracleTail(
           s"""curbyd AS MATERIALIZED (
              |  SELECT vec_id, i AS dim,
              |    CASE WHEN i = 0 AND vec_id % 4 = 3
              |      THEN emb[i+1] + CAST($DriftShift AS DOUBLE)
              |      ELSE emb[i+1] END AS x
              |  FROM (SELECT vec_id, emb, unnest(range(0, len(emb))) AS i
              |        FROM cure))""".stripMargin, "cure")}""".stripMargin

  /** The drift report's oracle tail, shared by s22 (corpus-scan form,
    * base = full corpus) and s23 (stats-fed form, base = the init
    * slice): baseline audit over `byd`/`e`, the parameterized
    * current-corpus CTE (must be named `curbyd(vec_id, dim, x)`),
    * current audit over `curbyd`/`curSrc`, mean grids, projections,
    * ratios, and the advisory boolean — ONE definition so the two
    * report surfaces check against identical arithmetic.
    */
  private def driftOracleTail(curbydCte: String, curSrc: String): String =
    s"""bnorm AS (
       |  SELECT vec_id,
       |    CAST(SUM(CAST(CASE WHEN isnan(x) OR isinf(x) THEN 0.0
       |      ELSE x * x END AS DECIMAL(38,18))) AS DOUBLE) AS nsq
       |  FROM byd GROUP BY vec_id),
       |bpv AS (
       |  SELECT e.vec_id, COALESCE(b.nsq, 0.0) AS nsq
       |  FROM e LEFT JOIN bnorm b ON b.vec_id = e.vec_id),
       |bstat AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_base,
       |    round(CAST(SUM(CAST(round(sqrt(nsq), 6) AS DECIMAL(38,18)))
       |      AS DOUBLE) / COUNT(*), 6) AS norm_base
       |  FROM bpv),
       |$curbydCte,
       |curmu AS (
       |  SELECT dim,
       |    round(CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE)
       |      / COUNT(*), 6) AS m
       |  FROM curbyd GROUP BY dim),
       |cnorm AS (
       |  SELECT vec_id,
       |    CAST(SUM(CAST(CASE WHEN isnan(x) OR isinf(x) THEN 0.0
       |      ELSE x * x END AS DECIMAL(38,18))) AS DOUBLE) AS nsq
       |  FROM curbyd GROUP BY vec_id),
       |cpv AS (
       |  SELECT s.vec_id, COALESCE(c.nsq, 0.0) AS nsq
       |  FROM $curSrc s LEFT JOIN cnorm c ON c.vec_id = s.vec_id),
       |cstat AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_current,
       |    round(CAST(SUM(CAST(round(sqrt(nsq), 6) AS DECIMAL(38,18)))
       |      AS DOUBLE) / COUNT(*), 6) AS norm_current
       |  FROM cpv),
       |dd AS (
       |  SELECT c.dim, c.m - mu.m AS dd, vf.v
       |  FROM curmu c JOIN mu ON mu.dim = c.dim JOIN vf ON vf.i = c.dim),
       |shifts AS (
       |  SELECT
       |    round(sqrt(CAST(SUM(CAST(dd * dd AS DECIMAL(38,18)))
       |      AS DOUBLE)), 6) AS mean_shift,
       |    round(CAST(SUM(CAST(dd * v AS DECIMAL(38,18))) AS DOUBLE), 6)
       |      AS axis_shift
       |  FROM dd),
       |ratios AS (
       |  SELECT n_base, n_current,
       |    round(CAST(n_current AS DOUBLE) / n_base, 6) AS n_ratio,
       |    round(CASE WHEN norm_base = CAST(0.0 AS DOUBLE) THEN 0.0
       |      ELSE norm_current / norm_base END, 6) AS norm_ratio,
       |    mean_shift, axis_shift
       |  FROM bstat, cstat, shifts)
       |SELECT n_base, n_current, n_ratio + 0.0 AS n_ratio,
       |  norm_ratio + 0.0 AS norm_ratio,
       |  mean_shift + 0.0 AS mean_shift,
       |  axis_shift + 0.0 AS axis_shift,
       |  (mean_shift > CAST(0.01 AS DOUBLE)
       |   OR ABS(axis_shift) > CAST(0.005 AS DOUBLE)
       |   OR ABS(norm_ratio - CAST(1.0 AS DOUBLE)) > CAST(0.02 AS DOUBLE))
       |    AS stale
       |FROM ratios""".stripMargin

  /** s14's greedy replay: the exact pool (s01's window shape capped
    * at `MmrPool`), then `MmrK − 1` unrolled pick rounds — each a
    * NOT-EXISTS over the picks so far, a per-candidate MAX of
    * round-4 sims to the selected set, the round-6 MMR score, and a
    * vec_id-tiebroken argmax. Generated by a loop over the SAME
    * constants the query uses.
    */
  /** The greedy replay shared by s14 (exact pool), s18 (LSH pool) and
    * s19 (store pool over PQ-reconstructed vectors): `poolCtes` must
    * end in a CTE `cand(query_id, vec_id, rel)`, and `simCte` names
    * the (vec_id, emb) table the pairwise sims read — the corpus `e`
    * for s14/s18, the reconstruction `rec` for s19. The rounds and
    * the final fold are ONE definition, so all three diversified
    * retrievers replay through identical selection SQL.
    */
  private def mmrGreedySql(poolCtes: String,
                           simCte: String = "e"): String = {
    val lam = s"CAST($MmrLambda AS DOUBLE)"
    val oml = s"CAST(${1.0d - MmrLambda} AS DOUBLE)"
    val rounds = (2 to MmrK).map { t =>
      s"""p$t AS (
         |  SELECT c.query_id, c.vec_id,
         |    round($lam * c.rel - $oml *
         |      MAX(round(list_cosine_similarity(ce.emb, se.emb), 4)),
         |      6) AS score
         |  FROM cand c
         |  JOIN $simCte ce ON ce.vec_id = c.vec_id
         |  JOIN s${t - 1} s ON s.query_id = c.query_id
         |  JOIN $simCte se ON se.vec_id = s.vec_id
         |  WHERE NOT EXISTS (SELECT 1 FROM s${t - 1} x
         |    WHERE x.query_id = c.query_id AND x.vec_id = c.vec_id)
         |  GROUP BY c.query_id, c.vec_id, c.rel),
         |k$t AS (
         |  SELECT query_id, vec_id FROM p$t
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY score DESC, vec_id) = 1),
         |s$t AS (
         |  SELECT query_id, vec_id, pick_rank FROM s${t - 1}
         |  UNION ALL
         |  SELECT query_id, vec_id, $t AS pick_rank FROM k$t)""".stripMargin
    }.mkString(",\n")
    s"""WITH $poolCtes,
       |s1 AS (
       |  SELECT query_id, vec_id, 1 AS pick_rank FROM cand
       |  QUALIFY row_number() OVER (PARTITION BY query_id
       |    ORDER BY rel DESC, vec_id) = 1),
       |$rounds
       |SELECT query_id, vec_id AS neighbor_id, pick_rank
       |FROM s$MmrK""".stripMargin
  }

  /** The s25 nomination + exact-rerank chain (lex replay, ADC chain,
    * depth-20 nominee cut, exact dense re-rank) ending in `lexr` +
    * `denser` — shared by the s25 ranked tail and the s28 pool cut.
    */
  private lazy val S25Ctes: String =
    s"""$HybridLexCtes,
       |$S08Ctes,
       |hcand AS (
       |  SELECT query_id, vec_id
       |  FROM adc
       |  QUALIFY row_number() OVER (PARTITION BY query_id
       |    ORDER BY round(qc + r_ip, 4) DESC, vec_id) <= 20),
       |denser AS (
       |  SELECT c.query_id, c.vec_id AS doc_id,
       |    CAST(row_number() OVER (PARTITION BY c.query_id
       |      ORDER BY round(list_cosine_similarity(ce.emb, qe.emb), 4)
       |        DESC, c.vec_id) AS INT) AS dense_rank
       |  FROM hcand c
       |  JOIN e ce ON ce.vec_id = c.vec_id
       |  JOIN e qe ON qe.vec_id = c.query_id)""".stripMargin

  /** s28: the s25 chain, the RRF fuse, the EMBEDDING-BACKED pool cut
    * (a candidate without a vector cannot be diversified — lexical-only
    * ids are excluded BEFORE the top-[[MmrPool]] cut, mirroring the
    * operator's id-space semantics; rel = the fused score), and the
    * shared unrolled greedy with pairwise sims from the exact
    * originals.
    */
  private lazy val S28Sql: String = mmrGreedySql(
    s"""$S25Ctes,
       |$RrfFuseCte,
       |cand AS (
       |  SELECT f.query_id, f.doc_id AS vec_id, f.fused AS rel
       |  FROM f JOIN e ON e.vec_id = f.doc_id
       |  QUALIFY row_number() OVER (PARTITION BY f.query_id
       |    ORDER BY f.fused DESC, f.doc_id) <= $MmrPool)""".stripMargin)

  /** The corpus CTE the s14/s18 pools (and their pairwise sims) read. */
  private val CorpusECte: String =
    """e AS (
      |  SELECT CAST(vec_id AS BIGINT) AS vec_id,
      |         CAST(embedding AS DOUBLE[]) AS emb
      |  FROM embeddings)""".stripMargin

  private lazy val S14Sql: String = mmrGreedySql(
    s"""$CorpusECte,
       |q AS (SELECT vec_id AS query_id, emb AS q_emb FROM e
       |      WHERE vec_id < $NumQueries),
       |cand AS (
       |  SELECT query_id, vec_id,
       |    round(list_cosine_similarity(emb, q_emb), 4) AS rel
       |  FROM e, q
       |  WHERE vec_id != query_id
       |  QUALIFY row_number() OVER (PARTITION BY query_id
       |    ORDER BY round(list_cosine_similarity(emb, q_emb), 4) DESC,
       |             vec_id) <= $MmrPool)""".stripMargin)

  /** s18: the s02 candidate generation (regenerated planes +
    * signatures, bucket join, distinct) feeding the SAME greedy —
    * the pool cut ranks candidates only.
    */
  private lazy val S18Sql: String = mmrGreedySql(
    s"""$CorpusECte,
       |${sigCtes(tables = 8, bitsSql = "8")},
       |cand0 AS (
       |  SELECT DISTINCT q.vec_id AS query_id, s.vec_id
       |  FROM sig s JOIN (SELECT * FROM sig WHERE vec_id < $NumQueries) q
       |    ON s.t = q.t AND s.bucket = q.bucket AND s.vec_id != q.vec_id),
       |cand AS (
       |  SELECT c.query_id, c.vec_id,
       |    round(list_cosine_similarity(ce.emb, qe.emb), 4) AS rel
       |  FROM cand0 c
       |  JOIN e ce ON ce.vec_id = c.vec_id
       |  JOIN e qe ON qe.vec_id = c.query_id
       |  QUALIFY row_number() OVER (PARTITION BY c.query_id
       |    ORDER BY rel DESC, c.vec_id) <= $MmrPool)""".stripMargin)

  /** s19: the s08 chain ends in `adc`; the pool is its
    * top-`MmrPool` cut (rel = the rounded-4 IVF-PQ score), candidate
    * vectors are the PQ RECONSTRUCTIONS (coarse centroid + codebook
    * cells, replayed element-for-element), and the greedy reads its
    * pairwise sims from `rec` — the store-only diversified retriever
    * end-to-end in SQL.
    */
  private lazy val S19Sql: String = mmrGreedySql(
    s"""$S08Ctes,
       |cand AS MATERIALIZED (
       |  SELECT query_id, vec_id, round(qc + r_ip, 4) AS rel
       |  FROM adc
       |  QUALIFY row_number() OVER (PARTITION BY query_id
       |    ORDER BY round(qc + r_ip, 4) DESC, vec_id) <= $MmrPool),
       |rflat AS MATERIALIZED (
       |  SELECT cc.vec_id, flatten(list(cb1.c_sv ORDER BY cc.sub))
       |    AS remb
       |  FROM codesc cc
       |  JOIN cb1 ON cb1.sub = cc.sub AND cb1.cell = cc.cell
       |  GROUP BY cc.vec_id),
       |rbase AS (SELECT DISTINCT vec_id, coarse_id FROM codesc),
       |radd AS (
       |  SELECT r.vec_id, CAST(r.i AS INT) AS i,
       |         ct.c_emb[CAST(r.i + 1 AS INT)] +
       |           r.remb[CAST(r.i + 1 AS INT)] AS v
       |  FROM (SELECT vec_id, remb, unnest(range(0, len(remb))) AS i
       |        FROM rflat) r
       |  JOIN rbase b ON b.vec_id = r.vec_id
       |  JOIN cent ct ON ct.coarse_id = b.coarse_id),
       |rec AS MATERIALIZED (SELECT vec_id, list(v ORDER BY i) AS emb
       |        FROM radd GROUP BY vec_id)""".stripMargin,
    simCte = "rec")

  /** s24: the s08 candidate chain cut at `MmrPool` (s19's nomination
    * CTE, ranking only), then relevance RECOMPUTED as the exact
    * rounded-4 cosine against the corpus `e`, and the shared greedy
    * rounds with sims over `e` — the two-stage diversified tail.
    */
  private lazy val S24Sql: String = mmrGreedySql(
    s"""$S08Ctes,
       |cand0 AS MATERIALIZED (
       |  SELECT query_id, vec_id
       |  FROM adc
       |  QUALIFY row_number() OVER (PARTITION BY query_id
       |    ORDER BY round(qc + r_ip, 4) DESC, vec_id) <= $MmrPool),
       |cand AS MATERIALIZED (
       |  SELECT c.query_id, c.vec_id,
       |    round(list_cosine_similarity(ce.emb, qe.emb), 4) AS rel
       |  FROM cand0 c
       |  JOIN e ce ON ce.vec_id = c.vec_id
       |  JOIN e qe ON qe.vec_id = c.query_id)""".stripMargin,
    simCte = "e")

  /** The lexical-leg replay shared by s11 and s21 (the postings store
    * holds exactly the facts tokenization produced, so ONE replay
    * serves both the in-query and the store-fed ranker): the s09
    * weight tree fanned out to the hybrid query bags, per-system rank
    * cut at depth 20, ending in `lexr(query_id, doc_id, lex_rank)`.
    */
  private lazy val HybridLexCtes: String = {
    val allTerms = HybridQueries.flatMap(_._2).distinct
      .map(t => s"'$t'").mkString(", ")
    val qtRows = HybridQueries.flatMap { case (qid, ts) =>
      ts.distinct.map(t => s"($qid, '$t')")
    }.mkString(", ")
    s"""qt AS (
       |  SELECT CAST(query_id AS BIGINT) AS query_id, token
       |  FROM (VALUES $qtRows) t(query_id, token)),
       |tok AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
       |         unnest(string_split(text, ' ')) AS token
       |  FROM documents),
       |tf AS (
       |  SELECT doc_id, dl, token, COUNT(*) AS tf
       |  FROM tok WHERE token IN ($allTerms)
       |  GROUP BY doc_id, dl, token),
       |dft AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
       |stats AS (
       |  SELECT COUNT(*) AS n_docs,
       |    CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)
       |      / COUNT(*) AS avgdl
       |  FROM documents),
       |w AS (
       |  SELECT query_id, doc_id,
       |    round(ln(CAST(1.0 AS DOUBLE) +
       |        (n_docs - df + CAST(0.5 AS DOUBLE)) /
       |        (df + CAST(0.5 AS DOUBLE))) *
       |      ((tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))) /
       |       (tf + CAST(1.2 AS DOUBLE) *
       |        ((CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)) +
       |         (CAST(0.75 AS DOUBLE) * dl) / avgdl))),
       |      6) AS w
       |  FROM tf JOIN qt USING (token) JOIN dft USING (token)
       |  CROSS JOIN stats),
       |lex AS (
       |  SELECT query_id, doc_id,
       |    round(CAST(SUM(CAST(w AS DECIMAL(38,18))) AS DOUBLE), 4)
       |      AS s
       |  FROM w GROUP BY query_id, doc_id),
       |lexr AS (
       |  SELECT query_id, doc_id,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY s DESC, doc_id) AS INT) AS lex_rank
       |  FROM lex
       |  QUALIFY lex_rank <= 20)""".stripMargin
  }

  /** The RRF fusion tail shared by s11 and s21 — expects `lexr` and
    * `denser` CTEs; the fixed lex+dense IEEE addition order, round 6,
    * ranks COALESCE to 0.
    */
  /** The RRF fuse CTE (`lexr` ⋈ `denser` → `f`), shared by the ranked
    * tails and the s28 pool cut — one definition of the fused score.
    */
  private lazy val RrfFuseCte: String =
    """f AS (
      |  SELECT COALESCE(l.query_id, d.query_id) AS query_id,
      |         COALESCE(l.doc_id, d.doc_id) AS doc_id,
      |         COALESCE(l.lex_rank, 0) AS lex_rank,
      |         COALESCE(d.dense_rank, 0) AS dense_rank,
      |         round(
      |           (CASE WHEN l.lex_rank IS NULL THEN CAST(0 AS DOUBLE)
      |             ELSE CAST(1.0 AS DOUBLE) / (60 + l.lex_rank) END)
      |         + (CASE WHEN d.dense_rank IS NULL
      |             THEN CAST(0 AS DOUBLE)
      |             ELSE CAST(1.0 AS DOUBLE) / (60 + d.dense_rank)
      |           END), 6) AS fused
      |  FROM lexr l FULL OUTER JOIN denser d
      |    ON l.query_id = d.query_id AND l.doc_id = d.doc_id)""".stripMargin

  private lazy val RrfTailSql: String =
    s"""$RrfFuseCte
      |SELECT query_id, doc_id, lex_rank, dense_rank,
      |  fused + 0.0 AS fused,
      |  CAST(row_number() OVER (PARTITION BY query_id
      |    ORDER BY fused DESC, doc_id) AS INT) AS rank
      |FROM f QUALIFY rank <= 10""".stripMargin

  val oracles: Map[String, String] = Map(
    // arithmetic mirrors Retrieval.termWeight parenthesis-for-
    // parenthesis (IEEE double ops are order-sensitive); per-term
    // weights round to 6 and decimal-sum per doc — the dsum contract
    "s09_bm25_topk" -> {
      val termList = Bm25Terms.map(t => s"'$t'").mkString(", ")
      s"""WITH tok AS (
         |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
         |         unnest(string_split(text, ' ')) AS token
         |  FROM documents),
         |tf AS (
         |  SELECT doc_id, dl, token, COUNT(*) AS tf
         |  FROM tok WHERE token IN ($termList)
         |  GROUP BY doc_id, dl, token),
         |dft AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
         |stats AS (
         |  SELECT COUNT(*) AS n_docs,
         |    CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)
         |      / COUNT(*) AS avgdl
         |  FROM documents),
         |w AS (
         |  SELECT doc_id,
         |    round(ln(CAST(1.0 AS DOUBLE) +
         |        (n_docs - df + CAST(0.5 AS DOUBLE)) /
         |        (df + CAST(0.5 AS DOUBLE))) *
         |      ((tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))) /
         |       (tf + CAST(1.2 AS DOUBLE) *
         |        ((CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)) +
         |         (CAST(0.75 AS DOUBLE) * dl) / avgdl))),
         |      6) AS w
         |  FROM tf JOIN dft USING (token) CROSS JOIN stats)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
         |  round(CAST(SUM(CAST(w AS DECIMAL(38,18))) AS DOUBLE), 4)
         |    AS score
         |FROM w GROUP BY doc_id
         |ORDER BY score DESC, doc_id
         |LIMIT 10""".stripMargin
    },

    // s11: both system rankings replayed verbatim (the s09 weight tree
    // and the s01 rounded cosine), fused in the same fixed lex+dense
    // IEEE addition order; ranks COALESCE to 0, never NULL
    "s11_hybrid_rrf" -> {
      val qIds = HybridQueries.map(_._1).mkString(", ")
      s"""WITH $HybridLexCtes,
         |e AS (
         |  SELECT CAST(vec_id AS BIGINT) AS vec_id,
         |         CAST(embedding AS DOUBLE[]) AS emb
         |  FROM embeddings),
         |qv AS (SELECT vec_id AS query_id, emb AS q_emb FROM e
         |       WHERE vec_id IN ($qIds)),
         |denser AS (
         |  SELECT query_id, vec_id AS doc_id,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY round(list_cosine_similarity(emb, q_emb), 4)
         |        DESC, vec_id) AS INT) AS dense_rank
         |  FROM e CROSS JOIN qv
         |  QUALIFY dense_rank <= 20),
         |$RrfTailSql""".stripMargin
    },

    // s21: the SAME lex replay (the postings store holds the exact
    // facts tokenization produced) + the s08/s17 ADC chain as the
    // dense leg (probes are the hybrid query ids — the store ranking,
    // self-excluded), fused by the shared tail. The whole store-fed
    // retrieval stack replays end-to-end.
    "s21_hybrid_store" ->
      s"""WITH $HybridLexCtes,
         |$S08Ctes,
         |denser AS (
         |  SELECT query_id, vec_id AS doc_id,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY round(qc + r_ip, 4) DESC, vec_id) AS INT)
         |      AS dense_rank
         |  FROM adc
         |  QUALIFY dense_rank <= 20),
         |$RrfTailSql""".stripMargin,

    // s26: the lexical drift report recomputed from the documents
    // table — base-slice baseline (stats + top-32 vocabulary with the
    // df DESC, token ASC cut), the planted-suffix delta, per-vocab df
    // and term-mass integers, and the report arithmetic (double
    // divisions in the operator's order, decimal L1 sum, round-6) —
    // the store-fed path and this replay cannot drift
    "s26_lex_drift" ->
      s"""WITH base AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 4 <> 3),
         |cur AS (
         |  SELECT doc_id, text FROM base
         |  UNION ALL
         |  SELECT doc_id, text || '$LexDriftSuffix' AS text
         |  FROM documents WHERE doc_id % 4 = 3),
         |btok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
         |  FROM base),
         |bdf AS (
         |  SELECT token, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS tfm
         |  FROM btok GROUP BY token),
         |vocab AS (
         |  SELECT token, df, tfm FROM bdf
         |  QUALIFY row_number() OVER (ORDER BY df DESC, token)
         |    <= ${Retrieval.LexDriftVocabSize}),
         |bs AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_base,
         |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS dl_base
         |  FROM base),
         |ctok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
         |  FROM cur),
         |cdf AS (
         |  SELECT token, COUNT(DISTINCT doc_id) AS df_c,
         |    COUNT(*) AS tfm_c
         |  FROM ctok WHERE token IN (SELECT token FROM vocab)
         |  GROUP BY token),
         |cs AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_current,
         |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS dl_cur
         |  FROM cur),
         |j AS (
         |  SELECT v.df AS df_b, COALESCE(c.df_c, 0) AS df_c
         |  FROM vocab v LEFT JOIN cdf c USING (token)),
         |shift AS (
         |  SELECT round(CAST(SUM(CAST(
         |      ABS(CAST(df_c AS DOUBLE) / n_current -
         |          CAST(df_b AS DOUBLE) / n_base)
         |      AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*), 6) AS df_shift
         |  FROM j, bs, cs),
         |vmass AS (
         |  SELECT (SELECT CAST(SUM(tfm) AS BIGINT) FROM vocab) AS vtf_b,
         |    (SELECT CAST(COALESCE(SUM(tfm_c), 0) AS BIGINT) FROM cdf)
         |      AS vtf_c),
         |rep AS (
         |  SELECT n_base, n_current,
         |    round(CAST(n_current AS DOUBLE) / n_base, 6) + 0.0
         |      AS n_ratio,
         |    round((CAST(dl_cur AS DOUBLE) / n_current) /
         |      (CAST(dl_base AS DOUBLE) / n_base), 6) + 0.0
         |      AS avgdl_ratio,
         |    df_shift + 0.0 AS df_shift,
         |    round(CAST(vtf_b AS DOUBLE) / dl_base -
         |      CAST(vtf_c AS DOUBLE) / dl_cur, 6) + 0.0 AS oov_shift
         |  FROM bs, cs, shift, vmass)
         |SELECT n_base, n_current, n_ratio, avgdl_ratio, df_shift,
         |  oov_shift,
         |  (df_shift > CAST(0.02 AS DOUBLE)
         |   OR ABS(oov_shift) > CAST(0.01 AS DOUBLE)
         |   OR ABS(avgdl_ratio - CAST(1.0 AS DOUBLE))
         |      > CAST(0.05 AS DOUBLE)) AS stale
         |FROM rep""".stripMargin,

    // s25: s21's lex replay + the s08 ADC chain cut at depth (s20's
    // nomination CTE) + the exact rounded-4 cosine re-rank of just
    // those nominees' ORIGINAL vectors as the dense rank, fused by
    // the shared tail — the exact-tail hybrid end-to-end.
    "s25_hybrid_rerank" ->
      s"""WITH $S25Ctes,
         |$RrfTailSql""".stripMargin,

    // s28: the s25 chain fused into a top-MmrPool pool (rel = the
    // round-6 fused score), then the SAME unrolled greedy the s14/s18/
    // s19/s24 oracles replay — pairwise sims from the exact originals.
    "s28_hybrid_mmr" -> S28Sql,

    "d07_embedding_dups_lsh" ->
      s"""WITH e AS (
         |  SELECT CAST(vec_id AS BIGINT) AS vec_id,
         |         CAST(embedding AS DOUBLE[]) AS emb
         |  FROM embeddings),
         |${sigCtes(tables = 12, bitsSql =
             "SELECT LEAST(20, GREATEST(6, length(bin(" +
               "GREATEST(1, (count(*) + 31) // 32) - 1)))) FROM e")},
         |cand AS (
         |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
         |  FROM sig x JOIN sig y
         |    ON x.t = y.t AND x.bucket = y.bucket AND x.vec_id < y.vec_id)
         |SELECT c.vec_a, c.vec_b,
         |  round(list_cosine_similarity(a.emb, b.emb), 4) AS cosine
         |FROM cand c
         |JOIN e a ON a.vec_id = c.vec_a
         |JOIN e b ON b.vec_id = c.vec_b
         |WHERE round(list_cosine_similarity(a.emb, b.emb), 4) >= 0.4""".stripMargin,

    "s02_ann_lsh" -> S02Sql,

    // s08: the composed IVF-PQ replayed end-to-end — the TRAINED
    // coarse quantizer (r10: seed sample + one Lloyd refinement, the
    // s05 arithmetic), coarse argmax (rounded-6 cosine, centroid-id
    // tiebreak), exact element-wise residuals, then the s07 pipeline
    // verbatim over the residual vectors, scored as
    // round(coarse_dot + ADC, 4).
    "s08_ann_ivfpq" -> S08Sql,

    // s17: the index-backed ranking IS s08's — same model, same codes,
    // same scoring (spec-pinned store == in-query equality) — so the
    // oracle is s08's SQL verbatim: any drift between the persisted
    // store lifecycle and the in-query form hash-fails here.
    "s17_ann_index" -> S08Sql,

    // s20: the s08 candidate chain cut at RerankPool + the exact
    // cosine re-rank of just those candidates' originals
    "s20_ann_rerank" -> S20Sql,

    // s22: baseline PCA + audits + mean grids + the advisory boolean,
    // replayed end-to-end over the planted drift
    "s22_drift_advisory" -> S22Sql,

    // s23: the same report read from the store's folded decimal stats
    // on the query side; the oracle recomputes it from the tables —
    // the stats path and the corpus-scan arithmetic cannot drift
    "s23_drift_from_stats" -> S23Sql,

    // s07: the full PQ pipeline replayed — seed slice, one Lloyd
    // update through DECIMAL means (bit-identical codebooks), argmin
    // encode with the (d2, cell) tiebreak, ADC DECIMAL sum. Slices
    // are 1-based inclusive in DuckDB: emb[s*dsub+1 : s*dsub+dsub].
    "s07_ann_pq" ->
      s"""WITH e AS (
         |  SELECT CAST(vec_id AS BIGINT) AS vec_id,
         |         CAST(embedding AS DOUBLE[]) AS emb
         |  FROM embeddings),
         |sv AS (
         |  SELECT vec_id, CAST(s AS INT) AS sub,
         |         emb[CAST(s*8+1 AS INT):CAST(s*8+8 AS INT)] AS sv
         |  FROM (SELECT vec_id, emb, unnest(range(0, 8)) AS s FROM e)),
         |seeds AS (
         |  SELECT vec_id AS cell, emb FROM e
         |  QUALIFY row_number() OVER (
         |    ORDER BY ((vec_id % 999983) * 40503) % 999983, vec_id) <= 16),
         |cb0 AS (
         |  SELECT cell, CAST(s AS INT) AS sub,
         |         emb[CAST(s*8+1 AS INT):CAST(s*8+8 AS INT)] AS c_sv
         |  FROM (SELECT cell, emb, unnest(range(0, 8)) AS s FROM seeds)),
         |a1 AS (
         |  SELECT vec_id, sub, cell, sv
         |  FROM sv JOIN cb0 USING (sub)
         |  QUALIFY row_number() OVER (PARTITION BY vec_id, sub
         |    ORDER BY round(list_sum(list_transform(range(1, len(sv)+1),
         |      i -> (sv[i]-c_sv[i])*(sv[i]-c_sv[i]))), 4), cell) = 1),
         |byd AS MATERIALIZED (
         |  SELECT sub, cell, CAST(i AS INT) AS dim,
         |         sv[CAST(i+1 AS INT)] AS v
         |  FROM (SELECT sub, cell, sv, unnest(range(0, len(sv))) AS i
         |        FROM a1)),
         |cb1 AS (
         |  SELECT sub, cell, list(c ORDER BY dim) AS c_sv FROM (
         |    SELECT sub, cell, dim,
         |      CAST(SUM(CAST(v AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS c
         |    FROM byd GROUP BY sub, cell, dim) GROUP BY sub, cell),
         |codes AS (
         |  SELECT vec_id, sub, cell
         |  FROM sv JOIN cb1 USING (sub)
         |  QUALIFY row_number() OVER (PARTITION BY vec_id, sub
         |    ORDER BY round(list_sum(list_transform(range(1, len(sv)+1),
         |      i -> (sv[i]-c_sv[i])*(sv[i]-c_sv[i]))), 4), cell) = 1),
         |qsv AS (
         |  SELECT query_id, CAST(s AS INT) AS sub,
         |         emb[CAST(s*8+1 AS INT):CAST(s*8+8 AS INT)] AS q_sv
         |  FROM (SELECT vec_id AS query_id, emb, unnest(range(0, 8)) AS s
         |        FROM e WHERE vec_id < $NumQueries)),
         |dt AS (
         |  SELECT query_id, sub, cell,
         |         round(list_dot_product(q_sv, c_sv), 4) AS pd
         |  FROM qsv JOIN cb1 USING (sub)),
         |adc AS (
         |  SELECT query_id, vec_id,
         |    round(CAST(SUM(CAST(pd AS DECIMAL(38,18))) AS DOUBLE), 4)
         |      AS approx_ip
         |  FROM codes JOIN dt USING (sub, cell)
         |  WHERE vec_id != query_id
         |  GROUP BY query_id, vec_id)
         |SELECT query_id, vec_id AS neighbor_id, approx_ip + 0.0 AS approx_ip,
         |  CAST(row_number() OVER w AS INT) AS rank
         |FROM adc
         |WINDOW w AS (PARTITION BY query_id
         |  ORDER BY approx_ip DESC, vec_id)
         |QUALIFY rank <= $K""".stripMargin,

    // recall@k: exact and approximate sides are the s01/s02 oracle
    // bodies verbatim (nested WITH), graded per probe; probe-complete
    // (a degenerate probe rows out as k_eval 0 / recall 0.0)
    "s06_ann_recall" ->
      s"""WITH exact AS ($S01Sql),
         |approx AS ($S02Sql),
         |per_probe AS (
         |  SELECT e.query_id, COUNT(*) AS k_eval,
         |    COUNT(a.neighbor_id) AS n_hits
         |  FROM exact e LEFT JOIN approx a
         |    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
         |  GROUP BY e.query_id),
         |probes AS (
         |  SELECT DISTINCT vec_id AS query_id FROM embeddings
         |  WHERE vec_id < $NumQueries)
         |SELECT p.query_id,
         |  CAST(COALESCE(k_eval, 0) AS BIGINT) AS k_eval,
         |  CAST(COALESCE(n_hits, 0) AS BIGINT) AS n_hits,
         |  CASE WHEN COALESCE(k_eval, 0) = 0 THEN 0.0
         |       ELSE round(CAST(n_hits AS DOUBLE) / k_eval, 4) END
         |    AS recall
         |FROM probes p LEFT JOIN per_probe USING (query_id)""".stripMargin,
    "x19_quantize_int8" ->
      """WITH q AS (
        |  SELECT vec_id, CAST(len(embedding) AS BIGINT) AS n_dims,
        |    CAST(list_max(list_transform(embedding, x -> abs(x)))
        |      AS DOUBLE) / 127.0 AS q_scale,
        |    embedding
        |  FROM embeddings),
        |qq AS (
        |  SELECT vec_id, n_dims, q_scale,
        |    CASE WHEN q_scale = 0.0
        |      THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
        |      ELSE list_transform(embedding,
        |             x -> CAST(round(CAST(x AS DOUBLE) / q_scale) AS BIGINT))
        |    END AS qv
        |  FROM q)
        |SELECT vec_id, n_dims, q_scale,
        |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
        |  CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_l1,
        |  CAST(list_min(qv) AS BIGINT) AS q_min,
        |  CAST(list_max(qv) AS BIGINT) AS q_max
        |FROM qq""".stripMargin,

    /** `+ 0.0` on rounded double outputs (here and in the s01–s04
      * sims): DuckDB's float-path round() PRESERVES -0.0 for tiny
      * negatives where Spark's BigDecimal HALF_UP cannot represent it
      * (always +0.0), and the driver compares float repr()s — so a
      * centroid_sim in (-5e-5, 0) differs as '-0.0' vs '0.0' even
      * though the values are SQL-equal. Adding positive zero maps
      * -0.0 → +0.0 (IEEE) and is a no-op on every other value. Found
      * by the r6 10×-corpus oracle stress run (one such row in 20k).
      */
    "x05_label_centroid_sim" ->
      """WITH byd AS (
        |  SELECT vec_id, label, i AS dim, emb[i+1] AS v
        |  FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb,
        |               unnest(range(0, len(embedding))) AS i
        |        FROM embeddings)),
        |cent AS (
        |  SELECT label, dim,
        |    CAST(SUM(CAST(v AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS c
        |  FROM byd GROUP BY label, dim)
        |SELECT b.vec_id, b.label,
        |  round(CAST(SUM(CAST(b.v * c.c AS DECIMAL(38,18))) AS DOUBLE) /
        |    (sqrt(CAST(SUM(CAST(b.v * b.v AS DECIMAL(38,18))) AS DOUBLE)) *
        |     sqrt(CAST(SUM(CAST(c.c * c.c AS DECIMAL(38,18))) AS DOUBLE))), 4)
        |    + 0.0 AS centroid_sim
        |FROM byd b JOIN cent c ON b.label = c.label AND b.dim = c.dim
        |GROUP BY b.vec_id, b.label""".stripMargin,

    "s01_cosine_topk" -> S01Sql,
    "s12_hard_negatives" -> S12Sql,

    // the whole PCA training run replayed: mean/covariance decimal
    // sums, 4 unrolled ∞-norm power iterations, sign canon, projection
    "s13_pca_project" -> S13Sql,

    // the whole MMR greedy replayed: pool, then one CTE per pick round
    "s14_mmr_topk" -> S14Sql,

    // the LSH-pool twin: s02's candidate CTEs feeding the SAME greedy
    "s18_mmr_indexed" -> S18Sql,

    // the store-pool twin: s08's chain cut at MmrPool + replayed PQ
    // reconstruction feeding the SAME greedy, sims over `rec`
    "s19_mmr_store" -> S19Sql,

    // s24: the s08 chain + pool cut + exact relevance join + the
    // shared greedy rounds over the ORIGINAL vectors
    "s24_mmr_rerank" -> S24Sql,

    // s13 plus the replayed deflation and the second iteration run
    "s16_pca2_project" -> S16Sql,

    // every audit stat replayed relationally: per-vector decimal
    // norm-square sums (non-finite mass excluded), then the one-row
    // corpus fold; BIGINT casts per the HUGEINT-vs-pandas contract.
    // The left join back onto e mirrors the operator's NULL/empty-
    // embedding accounting (d = 0 zero-norm rows).
    "s15_embedding_audit" ->
      """WITH e AS (
        |  SELECT CAST(vec_id AS BIGINT) AS vec_id,
        |         CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings),
        |byd AS MATERIALIZED (
        |  SELECT vec_id, emb[i+1] AS x
        |  FROM (SELECT vec_id, emb, unnest(range(0, len(emb))) AS i
        |        FROM e)),
        |pv0 AS (
        |  SELECT vec_id, COUNT(*) AS d,
        |    CAST(SUM(CAST(CASE WHEN isnan(x) OR isinf(x) THEN 0.0
        |      ELSE x * x END AS DECIMAL(38,18))) AS DOUBLE) AS nsq,
        |    MAX(CASE WHEN isnan(x) OR isinf(x) THEN 1 ELSE 0 END) AS bad
        |  FROM byd GROUP BY vec_id),
        |pv AS (
        |  SELECT e.vec_id, COALESCE(p.d, 0) AS d,
        |    COALESCE(p.nsq, 0.0) AS nsq, COALESCE(p.bad, 0) AS bad
        |  FROM e LEFT JOIN pv0 p ON p.vec_id = e.vec_id)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
        |  CAST(MAX(d) AS INT) AS dim,
        |  MIN(d) = MAX(d) AS dim_consistent,
        |  CAST(SUM(CASE WHEN nsq = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_zero,
        |  CAST(SUM(bad) AS BIGINT) AS n_nonfinite,
        |  round(MIN(sqrt(nsq)), 6) + 0.0 AS min_norm,
        |  round(MAX(sqrt(nsq)), 6) + 0.0 AS max_norm,
        |  round(CAST(SUM(CAST(round(sqrt(nsq), 6) AS DECIMAL(38,18)))
        |    AS DOUBLE) / COUNT(*), 6) + 0.0 AS avg_norm
        |FROM pv""".stripMargin,

    // since r10 the coarse quantizer is TRAINED (seed sample + one
    // Lloyd refinement): the training CTEs replay s05's
    // assignment/update arithmetic, then posting/probe assignment
    // proceeds over the trained cent exactly as before
    "s03_ann_ivf" ->
      s"""WITH e AS (
         |  SELECT CAST(vec_id AS BIGINT) AS vec_id,
         |         CAST(embedding AS DOUBLE[]) AS emb
         |  FROM embeddings),
         |${coarseCtes(nlist = "16", idAlias = "centroid_id")},
         |post AS (
         |  SELECT vec_id, emb, centroid_id
         |  FROM e CROSS JOIN cent
         |  QUALIFY row_number() OVER (PARTITION BY vec_id
         |    ORDER BY round(list_cosine_similarity(emb, c_emb), 6) DESC,
         |             centroid_id) = 1),
         |probes AS (
         |  SELECT vec_id AS query_id, emb AS q_emb, centroid_id
         |  FROM e CROSS JOIN cent
         |  WHERE vec_id < $NumQueries
         |  QUALIFY row_number() OVER (PARTITION BY vec_id
         |    ORDER BY round(list_cosine_similarity(emb, c_emb), 6) DESC,
         |             centroid_id) <= 4)
         |SELECT p.query_id, o.vec_id AS neighbor_id,
         |  round(list_cosine_similarity(o.emb, p.q_emb), 4) + 0.0 AS sim,
         |  CAST(row_number() OVER w AS INT) AS rank
         |FROM post o JOIN probes p ON o.centroid_id = p.centroid_id
         |WHERE o.vec_id != p.query_id
         |WINDOW w AS (PARTITION BY p.query_id
         |  ORDER BY round(list_cosine_similarity(o.emb, p.q_emb), 4) DESC,
         |           o.vec_id)
         |QUALIFY rank <= $K""".stripMargin,

    /** The int8 pipeline in SQL: q1/q8 mirror x19's quantization; the
      * candidate score keeps Spark's exact multiply order
      * ((intdot·sa)·sb)/denom and the raw-double ranking key (no
      * round — the doubles are bit-identical, so the order is too).
      */
    "s04_ann_int8" ->
      s"""WITH e AS (
         |  SELECT CAST(vec_id AS BIGINT) AS vec_id,
         |         CAST(embedding AS DOUBLE[]) AS emb
         |  FROM embeddings),
         |q1 AS (
         |  SELECT vec_id, emb,
         |    CAST(list_max(list_transform(emb, x -> abs(x))) AS DOUBLE)
         |      / 127.0 AS s
         |  FROM e),
         |q8 AS (
         |  SELECT vec_id, s,
         |    CASE WHEN s = 0.0
         |      THEN list_transform(emb, x -> CAST(0 AS BIGINT))
         |      ELSE list_transform(emb, x -> CAST(round(x / s) AS BIGINT))
         |    END AS qv
         |  FROM q1),
         |qn AS (
         |  SELECT vec_id, s, qv,
         |    sqrt(CAST(list_sum(list_transform(qv, x -> x * x)) AS DOUBLE))
         |      * s AS nrm
         |  FROM q8),
         |cand AS (
         |  SELECT qr.vec_id AS query_id, ce.vec_id,
         |    CASE WHEN ce.nrm * qr.nrm = 0.0 THEN -1.0
         |      ELSE ((CAST(list_sum(list_transform(
         |               range(1, len(ce.qv) + 1), i -> ce.qv[i] * qr.qv[i]))
         |             AS DOUBLE) * ce.s) * qr.s) / (ce.nrm * qr.nrm)
         |    END AS q_sim
         |  FROM qn ce CROSS JOIN (SELECT * FROM qn WHERE vec_id < $NumQueries) qr
         |  WHERE ce.vec_id != qr.vec_id
         |  QUALIFY row_number() OVER (PARTITION BY qr.vec_id
         |    ORDER BY q_sim DESC, ce.vec_id) <= ${K * 4})
         |SELECT c.query_id, c.vec_id AS neighbor_id,
         |  round(list_cosine_similarity(ce.emb, qe.emb), 4) + 0.0 AS sim,
         |  CAST(row_number() OVER w AS INT) AS rank
         |FROM cand c
         |JOIN e ce ON ce.vec_id = c.vec_id
         |JOIN e qe ON qe.vec_id = c.query_id
         |WINDOW w AS (PARTITION BY c.query_id
         |  ORDER BY round(list_cosine_similarity(ce.emb, qe.emb), 4) DESC,
         |           c.vec_id)
         |QUALIFY rank <= $K""".stripMargin,

    /** The two Lloyd iterations as a CTE chain: assignment is the
      * d09 QUALIFY-argmax, centroid means are x05's decimal-sum
      * contract (`list(c ORDER BY dim)` rebuilds the vector), so the
      * doubles entering iteration 2 are bit-identical to the
      * engine's.
      */
    "s05_kmeans" ->
      """WITH e AS (
        |  SELECT CAST(vec_id AS BIGINT) AS vec_id,
        |         CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings),
        |c0 AS (
        |  SELECT vec_id AS cluster_id, emb AS c_emb FROM e
        |  QUALIFY row_number() OVER (
        |    ORDER BY ((vec_id % 999983) * 40503) % 999983, vec_id) <= 8),
        |a1 AS (
        |  SELECT vec_id, emb, cluster_id
        |  FROM e CROSS JOIN c0
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |    ORDER BY round(list_cosine_similarity(emb, c_emb), 4) DESC,
        |             cluster_id) = 1),
        |byd AS MATERIALIZED (
        |  SELECT cluster_id, i AS dim, emb[i+1] AS v
        |  FROM (SELECT cluster_id, emb, unnest(range(0, len(emb))) AS i
        |        FROM a1)),
        |c1 AS (
        |  SELECT cluster_id, list(c ORDER BY dim) AS c_emb FROM (
        |    SELECT cluster_id, dim,
        |      CAST(SUM(CAST(v AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS c
        |    FROM byd GROUP BY cluster_id, dim) GROUP BY cluster_id)
        |SELECT vec_id, cluster_id,
        |  round(list_cosine_similarity(emb, c_emb), 4) + 0.0 AS sim
        |FROM e CROSS JOIN c1
        |QUALIFY row_number() OVER (PARTITION BY vec_id
        |  ORDER BY round(list_cosine_similarity(emb, c_emb), 4) DESC,
        |           cluster_id) = 1""".stripMargin,

    "s10_cluster_sample" ->
      s"""WITH e AS (
        |  SELECT CAST(vec_id AS BIGINT) AS vec_id,
        |         CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings),
        |c0 AS (
        |  SELECT vec_id AS cluster_id, emb AS c_emb FROM e
        |  QUALIFY row_number() OVER (
        |    ORDER BY ((vec_id % 999983) * 40503) % 999983, vec_id) <= 8),
        |a1 AS (
        |  SELECT vec_id, emb, cluster_id
        |  FROM e CROSS JOIN c0
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |    ORDER BY round(list_cosine_similarity(emb, c_emb), 4) DESC,
        |             cluster_id) = 1),
        |byd AS MATERIALIZED (
        |  SELECT cluster_id, i AS dim, emb[i+1] AS v
        |  FROM (SELECT cluster_id, emb, unnest(range(0, len(emb))) AS i
        |        FROM a1)),
        |c1 AS (
        |  SELECT cluster_id, list(c ORDER BY dim) AS c_emb FROM (
        |    SELECT cluster_id, dim,
        |      CAST(SUM(CAST(v AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS c
        |    FROM byd GROUP BY cluster_id, dim) GROUP BY cluster_id),
        |assign AS (
        |  SELECT vec_id, cluster_id,
        |  round(list_cosine_similarity(emb, c_emb), 4) + 0.0 AS sim
        |FROM e CROSS JOIN c1
        |QUALIFY row_number() OVER (PARTITION BY vec_id
        |  ORDER BY round(list_cosine_similarity(emb, c_emb), 4) DESC,
        |           cluster_id) = 1),
        |h AS (
        |  SELECT vec_id, cluster_id,
        |    ${Hashing.base60Sql("CAST(vec_id AS VARCHAR)")} AS h
        |  FROM assign)
        |SELECT vec_id, cluster_id,
        |  CAST(row_number() OVER (PARTITION BY cluster_id
        |    ORDER BY h, vec_id) AS BIGINT) AS pick
        |FROM h
        |QUALIFY pick <= 10""".stripMargin,

    "d09_semdedup" ->
      """WITH e AS (
        |  SELECT CAST(vec_id AS BIGINT) AS vec_id,
        |         CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings),
        |cent AS (
        |  SELECT vec_id AS centroid_id, emb AS c_emb FROM e
        |  QUALIFY row_number() OVER (
        |    ORDER BY ((vec_id % 999983) * 40503) % 999983, vec_id) <=
        |    (SELECT GREATEST(16, CAST(ceil(count(*) / 128.0) AS BIGINT))
        |     FROM e)),
        |assigned AS (
        |  SELECT vec_id, emb, centroid_id AS cluster_id
        |  FROM e CROSS JOIN cent
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |    ORDER BY round(list_cosine_similarity(emb, c_emb), 4) DESC,
        |             centroid_id) = 1)
        |SELECT a.vec_id, a.cluster_id FROM assigned a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM assigned b
        |  WHERE b.cluster_id = a.cluster_id AND b.vec_id < a.vec_id
        |    AND round(list_cosine_similarity(a.emb, b.emb), 4) >= 0.4)""".stripMargin,

    "d05_embedding_dups" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(list_cosine_similarity(a.emb, b.emb), 4) AS cosine
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.emb, b.emb), 4) >= 0.4""".stripMargin,

    "m02_frame_samples" ->
      """SELECT doc_id, CAST(i AS INT) AS frame_idx,
        |  CAST(length(substr(text, CAST(i*64+1 AS INT), 64)) AS BIGINT)
        |    AS n_frame_bytes,
        |  md5(substr(text, CAST(i*64+1 AS INT), 64)) AS frame_digest
        |FROM (SELECT doc_id, text,
        |        unnest(range(0, (length(text)+63)//64)) AS i
        |      FROM documents)
        |WHERE i % 4 = 0""".stripMargin,

    "m03_resize" ->
      """SELECT doc_id, CAST(224 AS INT) AS target_w,
        |  CAST(224 AS INT) AS target_h,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes_in,
        |  CAST(LEAST(octet_length(encode(text)), 784) AS BIGINT)
        |    AS n_bytes_out
        |FROM documents""".stripMargin,

    "m01_media_features" ->
      """SELECT doc_id, 'application/octet-stream' AS mime,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS digest,
        |  CAST(64 + octet_length(encode(text)) % 960 AS INT) AS width,
        |  CAST(64 + (octet_length(encode(text)) * 31) % 960 AS INT) AS height,
        |  1 AS n_frames,
        |  CAST(0 AS INT) AS sample_rate,
        |  CAST(0 AS INT) AS n_channels,
        |  CAST(0 AS BIGINT) AS duration_ms
        |FROM documents""".stripMargin,

    // the BMP container contract in arithmetic: the synth dimension
    // formulas + 54-byte headers + 4-byte-aligned 24-bit rows
    "m06_image_features" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    CAST(octet_length(encode(text)) AS INT) AS nb
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, 4 + nb % 29 AS w, 3 + (7 * nb) % 23 AS h
        |  FROM n)
        |SELECT doc_id,
        |  CAST(54 + h * ((3 * w + 3) // 4 * 4) AS BIGINT) AS n_bytes,
        |  CAST(w AS INT) AS width,
        |  CAST(h AS INT) AS height,
        |  1 AS n_frames
        |FROM d""".stripMargin,

    // the WAV container contract in arithmetic: canonical 44-byte
    // PCM header, one frame per byte at 8-bit mono, integer duration
    // m07: every fact is integer arithmetic over the text byte count —
    // the container contract (duration on the 600-unit timescale and
    // its floor-div ms conversion, alternating vide/soun handlers,
    // 16.16 dims, and the exact 148 + 173·tracks + n file size)
    "m07_mp4_features" ->
      """WITH d AS (
        |  SELECT doc_id, octet_length(encode(text)) AS n
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(148 + 173 * (1 + n % 3) + n AS BIGINT) AS n_bytes,
        |  CAST(600 AS BIGINT) AS timescale,
        |  CAST(500 + (n * 13) % 9000 AS BIGINT) AS duration_units,
        |  CAST((500 + (n * 13) % 9000) * 1000 // 600 AS BIGINT)
        |    AS duration_ms,
        |  CAST(1 + n % 3 AS INT) AS n_tracks,
        |  CAST((2 + n % 3) // 2 AS INT) AS n_video,
        |  CAST((1 + n % 3) // 2 AS INT) AS n_audio,
        |  CAST(16 * (4 + n % 28) AS INT) AS width,
        |  CAST(16 * (3 + (5 * n) % 17) AS INT) AS height,
        |  CAST(n AS BIGINT) AS mdat_bytes
        |FROM d""".stripMargin,

    // m08: the EBML container contract in arithmetic — duration on a
    // 500 µs TimestampScale and its integer ms conversion, alternating
    // video/audio track types, the first video track's pixel dims,
    // the Cluster content size, and the exact fixed-vint file size
    "m08_mkv_features" ->
      """WITH d AS (
        |  SELECT doc_id, octet_length(encode(text)) AS n
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(130 + 60 * ((2 + n % 3) // 2) + 29 * ((1 + n % 3) // 2)
        |    + n AS BIGINT) AS n_bytes,
        |  'webm' AS doc_type,
        |  CAST(500000 AS BIGINT) AS timescale_ns,
        |  CAST(700 + (11 * n) % 8000 AS BIGINT) AS duration_ticks,
        |  CAST((700 + (11 * n) % 8000) // 2 AS BIGINT) AS duration_ms,
        |  CAST(1 + n % 3 AS INT) AS n_tracks,
        |  CAST((2 + n % 3) // 2 AS INT) AS n_video,
        |  CAST((1 + n % 3) // 2 AS INT) AS n_audio,
        |  CAST(8 * (10 + n % 100) AS INT) AS width,
        |  CAST(8 * (6 + (3 * n) % 70) AS INT) AS height,
        |  CAST(23 + n AS BIGINT) AS cluster_bytes
        |FROM d""".stripMargin,

    // m09: every fact is integer arithmetic over the text byte count —
    // the ID3v2 envelope (10 + n), the shared MPEG-1 L3 bitrate/rate
    // tables as CASE ladders, the standard frame-length formula, and
    // the sample-count duration
    "m09_mp3_features" -> {
      val kbpsCase = (1 to 14).map(i =>
        s"WHEN $i THEN ${graft.ext.Multimodal.Mp3BitrateKbpsV1L3(i)}")
        .mkString("CASE 1 + n % 14 ", " ", " END")
      val rateCase = graft.ext.Multimodal.Mp3SampleRatesV1.zipWithIndex
        .map { case (r, i) => s"WHEN $i THEN $r" }
        .mkString("CASE n % 3 ", " ", " END")
      s"""WITH d AS (
         |  SELECT doc_id, octet_length(encode(text)) AS n
         |  FROM documents),
         |f AS (
         |  SELECT doc_id, n, $kbpsCase AS kbps, $rateCase AS rate,
         |    2 + n % 24 AS frames
         |  FROM d)
         |SELECT doc_id,
         |  CAST(10 + n + frames * (144000 * kbps // rate) AS BIGINT)
         |    AS n_bytes,
         |  CAST(10 + n AS BIGINT) AS id3_bytes,
         |  CAST(frames AS INT) AS n_frames,
         |  CAST(kbps AS INT) AS bitrate_kbps,
         |  CAST(rate AS INT) AS sample_rate,
         |  CAST(1 + n % 2 AS INT) AS n_channels,
         |  CAST(frames * 1152 * 1000 // rate AS BIGINT) AS duration_ms,
         |  CAST(frames * (144000 * kbps // rate) AS BIGINT)
         |    AS audio_bytes
         |FROM f""".stripMargin
    },

    "m05_audio_features" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) + 44 AS BIGINT) AS n_bytes,
        |  CAST(octet_length(encode(text)) AS INT) AS n_frames,
        |  CAST(8000 AS INT) AS sample_rate,
        |  CAST(1 AS INT) AS n_channels,
        |  CAST(octet_length(encode(text)) * 1000 // 8000 AS BIGINT)
        |    AS duration_ms
        |FROM documents""".stripMargin,

    // m10: every fact is integer arithmetic over the text byte count —
    // the shared rate/depth menus as CASE ladders, the fixed envelope
    // sizes (magic 4 + STREAMINFO 38 + tag header 4), and the
    // total-samples duration
    "m10_flac_features" -> {
      val rateCase = graft.ext.Multimodal.FlacSampleRates.zipWithIndex
        .map { case (r, i) => s"WHEN $i THEN $r" }
        .mkString("CASE n % 8 ", " ", " END")
      val bpsCase = graft.ext.Multimodal.FlacBitDepths.zipWithIndex
        .map { case (v, i) => s"WHEN $i THEN $v" }
        .mkString("CASE n % 5 ", " ", " END")
      s"""WITH d AS (
         |  SELECT doc_id, octet_length(encode(text)) AS n
         |  FROM documents),
         |f AS (
         |  SELECT doc_id, n, $rateCase AS rate, 1 + n % 8 AS ch,
         |    $bpsCase AS bps,
         |    1000 + (n * 441) % 1000000 AS total,
         |    1 + n % 17 AS audio
         |  FROM d)
         |SELECT doc_id,
         |  CAST(46 + n + audio AS BIGINT) AS n_bytes,
         |  CAST(46 + n AS BIGINT) AS meta_bytes,
         |  CAST(2 AS INT) AS n_blocks,
         |  CAST(rate AS INT) AS sample_rate,
         |  CAST(ch AS INT) AS n_channels,
         |  CAST(bps AS INT) AS bits_per_sample,
         |  CAST(total AS BIGINT) AS total_samples,
         |  CAST(total * 1000 // rate AS BIGINT) AS duration_ms,
         |  CAST(audio AS BIGINT) AS audio_bytes
         |FROM f""".stripMargin
    },

    // m12: the m06 dims formulas + the EXIF orientation formula; the
    // walk must read them from real SOF/APP1 segments to match
    "m12_jpeg_features" ->
      """WITH d AS (
        |  SELECT doc_id, octet_length(encode(text)) AS n
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(4 + n % 29 AS INT) AS width,
        |  CAST(3 + 7 * n % 23 AS INT) AS height,
        |  CAST(8 AS INT) AS sample_precision,
        |  CAST(3 AS INT) AS n_components,
        |  CAST(1 + n % 8 AS INT) AS orientation
        |FROM d""".stripMargin,

    // m14: the shared dims formulas + the JDK PNG writer's fixed IHDR
    // facts for TYPE_INT_RGB input (8-bit truecolor, no interlace,
    // no palette, no alpha) — the walk must read them from real
    // chunks to match
    "m14_png_features" ->
      """WITH d AS (
        |  SELECT doc_id, octet_length(encode(text)) AS n
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(4 + n % 29 AS INT) AS width,
        |  CAST(3 + 7 * n % 23 AS INT) AS height,
        |  CAST(8 AS INT) AS bit_depth,
        |  CAST(2 AS INT) AS color_type,
        |  CAST(0 AS INT) AS interlace,
        |  CAST(0 AS INT) AS palette_entries,
        |  FALSE AS has_alpha
        |FROM d""".stripMargin,

    // m13: frame values are closed formulas over doc_id; the tag size
    // is the exact frame-by-frame byte sum (constants computed from
    // the SAME prefix/owner strings the writer uses) + n + padding
    "m13_id3_tags" -> {
      import graft.ext.Multimodal._
      val fixed = 10 + // tag header
        (10 + 1 + Id3TitlePrefix.length) + // TIT2 net of digits(id)
        (10 + 1 + Id3ArtistPrefix.length + 1) + // TPE1 (1-digit mod)
        (10 + 1 + Id3AlbumPrefix.length + 1) + // TALB (1-digit mod)
        (10 + Id3PrivOwner.length + 1) // PRIV net of n
      s"""WITH d AS (
         |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |         octet_length(encode(text)) AS n
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(4 AS INT) AS n_id3_frames,
         |  CAST(3 AS INT) AS n_text_frames,
         |  '$Id3TitlePrefix' || CAST(doc_id AS VARCHAR) AS title,
         |  '$Id3ArtistPrefix' || CAST(doc_id % $Id3ArtistMod AS VARCHAR)
         |    AS artist,
         |  '$Id3AlbumPrefix' || CAST(doc_id % $Id3AlbumMod AS VARCHAR)
         |    AS album,
         |  CAST($fixed + length(CAST(doc_id AS VARCHAR)) + n
         |    + n % $Id3PadMod AS BIGINT) AS tag_bytes
         |FROM d""".stripMargin
    },

    // m11: every fact is integer arithmetic over the text byte count —
    // the shared Vorbis rate menu as a CASE ladder, the RFC 3533 page
    // envelope sizes (58 BOS + 27+L+n body with L = n//255+1 lacing
    // bytes + 28+p3 EOS), and the granule-position duration
    "m11_ogg_features" -> {
      val rateCase = graft.ext.Multimodal.OggSampleRates.zipWithIndex
        .map { case (r, i) => s"WHEN $i THEN $r" }
        .mkString("CASE n % 7 ", " ", " END")
      s"""WITH d AS (
         |  SELECT doc_id, octet_length(encode(text)) AS n
         |  FROM documents),
         |f AS (
         |  SELECT doc_id, n, $rateCase AS rate, 1 + n % 8 AS ch,
         |    1000 + (n * 331) % 500000 AS total,
         |    1 + n % 9 AS p3, n // 255 + 1 AS lace
         |  FROM d)
         |SELECT doc_id,
         |  CAST(113 + lace + n + p3 AS BIGINT) AS n_bytes,
         |  CAST(3 AS INT) AS n_pages,
         |  CAST(1 AS INT) AS n_streams,
         |  CAST(ch AS INT) AS vorbis_channels,
         |  CAST(rate AS INT) AS vorbis_rate,
         |  CAST(total AS BIGINT) AS total_samples,
         |  CAST(30 + n + p3 AS BIGINT) AS payload_bytes,
         |  CAST(total * 1000 // rate AS BIGINT) AS duration_ms
         |FROM f""".stripMargin
    })
}
