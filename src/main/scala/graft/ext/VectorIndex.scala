package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted vector ANN index [EXT] — the BM25 inverted-index
  * lifecycle ([[Retrieval.updateIndex]] / [[Retrieval.queryIndex]])
  * on the vector plane: the deployment shape a 100 TB corpus actually
  * uses, where every in-query ANN form (s02/s03/s07/s08) rebuilds its
  * index per query.
  *
  * Store layout (all parquet under one root):
  *  - `centroids/` — (coarse_id, c_emb): the Lloyd-trained coarse
  *    quantizer ([[Similarity.coarseCentroids]]), KB-scale;
  *  - `codebooks/` — (sub, cell, c_sv): the residual PQ codebooks
  *    ([[Similarity.ivfPqIndex]]), KB-scale;
  *  - `codes/` — (vec_id, sub, cell, coarse_id): the corpus codes —
  *    the ONLY corpus-sized artifact (~3% of a float corpus). Appends
  *    are id-gated ([[update]] anti-joins the batch against the ids
  *    already coded), so at-least-once replays of a batch append
  *    NOTHING — stronger than the fold-at-read contract the BM25
  *    postings use, and it closes the divergent-re-present hole (a
  *    changed embedding under an existing id can never plant a second
  *    code set whose ADC terms would double-count);
  *  - `tombstones/` — (vec_id, deleted_at): deletion facts appended by
  *    [[delete]]; every read path anti-joins them, [[compact]] drops
  *    the dead rows physically;
  *  - `driftstats/` — (batch_key, i, sx, cnt): per-batch EXACT decimal
  *    statistics of the served corpus (per-dim sums, a norm-sum row),
  *    appended by [[init]] and every [[update]] so the drift advisory
  *    ([[driftReportFromStats]]) never has to rescan the corpus —
  *    decimal sums fold associatively, so the stats-fed report equals
  *    the corpus-scan report BIT FOR BIT;
  *  - `meta/` — one row: the training knobs plus a corpus fingerprint
  *    (row count + vec_id sum + a first-component content sum on the
  *    1e-6 grid), written LAST so a crash mid-init leaves a store that
  *    [[initIfStale]] rebuilds rather than a silently half-written
  *    one; an UNREADABLE meta (crash mid-commit) also reads as stale.
  *
  * The model (centroids + codebooks) is FROZEN at init — [[update]]
  * encodes new vectors under it without retraining (a production PQ
  * index re-trains on a schedule, not per batch), as a PURE NARROW
  * MAP with two bit-identical execution forms picked by model size
  * (see [[update]]): no shuffle, no state, runs unchanged on a
  * `readStream` batch ([[graft.streaming.StreamingVectorIndex]]).
  *
  * [[query]] never touches the corpus: probes rank the KB centroid
  * table, the probed cell ids push into the codes parquet scan as
  * PushedFilters (spec-pinned — query cost is proportional to the
  * probed cells' posting lists), and scoring is [[Similarity
  * .ivfPqRank]] — the EXACT tail the in-query s08 uses, so the two
  * surfaces return identical rankings over the same corpus
  * (spec-pinned AND oracle-checked: s17 replays s08's SQL).
  */
object VectorIndex {

  final case class IndexMeta(nlist: Int, m: Int, ksub: Int, dim: Int,
                             iters: Int, coarseIters: Int,
                             nRows: Long, idSum: Long, embSum: Long)

  /** Above this raw-model size, [[update]] switches the in-row encode
    * from planted plan literals to a closure-based mapPartitions (the
    * KeywordMatch 4 MiB TorrentBroadcast precedent): a production
    * nlist (≈√N — thousands of centroids × dim doubles) would
    * otherwise re-serialize a multi-MiB literal tree into EVERY task
    * binary of every update stage.
    */
  private[graft] val LitEncodeMaxBytes: Long = 4L << 20

  private def fs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p, p.getFileSystem(spark.sparkContext.hadoopConfiguration))
  }

  def exists(spark: SparkSession, store: String): Boolean = {
    recoverIfSwapped(spark, store)
    val (p, f) = fs(spark, s"$store/meta")
    f.exists(p)
  }

  /** Crash recovery for an interrupted [[rebuild]] swap: if a crash
    * landed between the two renames, the store root is missing and
    * `<store>__old` holds the previous copy — the truth. Restore it
    * before any read or write (the BackupCatalog.recoverIfNeeded
    * discipline). Called from [[exists]], which gates every entry
    * point.
    *
    * The probe-then-rename pair runs under [[graft.engine.Compactor
    * .swapLock]]: "root missing, __old present" is ALSO what a healthy
    * in-flight swap looks like between its two renames, and an
    * unserialized recovery would rename `__old` back mid-swap,
    * aborting the live rebuild (r13; in-process only — across
    * processes the store assumes a SINGLE writer, see [[rebuild]]).
    */
  private def recoverIfSwapped(spark: SparkSession, store: String): Unit =
    graft.engine.Compactor.swapLock.synchronized {
      val (p, f) = fs(spark, store)
      val pOld = new org.apache.hadoop.fs.Path(store + "__old")
      if (!f.exists(p) && f.exists(pOld))
        require(f.rename(pOld, p),
          s"store recovery failed: cannot restore $pOld to $p")
    }

  private def readMeta(spark: SparkSession, store: String): IndexMeta = {
    require(exists(spark, store),
      s"no vector index store at $store (run init first)")
    val r = spark.read.parquet(s"$store/meta").collect()(0)
    IndexMeta(r.getAs[Int]("nlist"), r.getAs[Int]("m"),
      r.getAs[Int]("ksub"), r.getAs[Int]("dim"), r.getAs[Int]("iters"),
      r.getAs[Int]("coarse_iters"), r.getAs[Long]("n_rows"),
      r.getAs[Long]("id_sum"), r.getAs[Long]("emb_sum"))
  }

  /** The corpus fingerprint recorded at init: one cheap narrow
    * aggregate over the id column AND the embedding content — count,
    * vec_id sum, and a POSITION-WEIGHTED full-component sum on the
    * 1e-6 grid (in-row Σ (i+1)·xᵢ, then round·1e6 and sum — every
    * component of every vector contributes, and the weight makes a
    * within-vector permutation visible too; the first-component-only
    * term it replaces (r11) went blind to a re-embedding that
    * happened to preserve dim 0). [[initIfStale]] compares all
    * three, so neither a REGENERATED corpus at the same path nor a
    * RE-EMBEDDED corpus under the same ids (the stable 0..n-1 id
    * stream a new encoder run produces) can be served from a stale
    * index — ids alone would pass the second case silently.
    *
    * Each ROW's rounded term casts to LONG before the sum and the sum
    * runs over longs (modular, associative, order-free — the
    * [[Retrieval.initIndexIfStale]] crc_sum discipline): a double sum
    * across rows would exceed 2⁵³ at tens of millions of vectors
    * (terms scale ~d²/2·10⁶ per row), going inexact AND
    * partition-order-dependent — a nondeterministic fingerprint that
    * spuriously rebuilds (or, rarely, falsely serves) the store.
    */
  private def fingerprint(e: DataFrame): (Long, Long, Long) = {
    val weighted = aggregate(
      zip_with(col("emb"),
        transform(col("emb"), (_, i) => (i + 1).cast("double")),
        (x, w) => x * w),
      lit(0.0d), (acc, t) => acc + t)
    val r = e.agg(count(lit(1)).as("n"),
      coalesce(sum(col("vec_id")), lit(0L)).as("s"),
      coalesce(sum(coalesce(round(weighted * 1e6, 0), lit(0.0d))
        .cast("long")), lit(0L)).as("es")).collect()(0)
    (r.getAs[Long]("n"), r.getAs[Long]("s"), r.getAs[Long]("es"))
  }

  private def prep(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id").cast("long").as("vec_id"),
      col("embedding").cast("array<double>").as("emb"))

  /** `nlist = 0` auto-sizes to ⌈N/128⌉ (floor 16) — d09/d07's
    * occupancy-constant rule ([[Similarity.autoNlist]]), so a 100×
    * corpus gets 100× the cells and nprobe/nlist pruning stays a
    * constant fraction instead of degrading to 4/16. The s08/s17
    * oracle replays the same integer rule in SQL.
    */
  private def resolveNlist(nlist: Int, n: Long): Int =
    if (nlist > 0) nlist else Similarity.autoNlist(n)

  /** Bootstrap: train the coarse quantizer and residual codebooks on
    * `embeddings` ([[Similarity.ivfPqIndex]] — ONE definition with the
    * in-query s08) and write the full store. Overwrites any previous
    * store at `store` (tombstones included — a rebuild starts clean);
    * meta lands last.
    */
  /** The power-iteration depth of the drift baseline's PCA axis —
    * MUST match the s13/s22 oracle generators' unrolled count (a
    * mismatch hash-fails the s22 oracle loudly).
    */
  private[graft] val DriftPcaIters = 4

  def init(embeddings: DataFrame, store: String, nlist: Int = 0,
           m: Int = 8, ksub: Int = 16, dim: Int = 64, iters: Int = 1,
           coarseIters: Int = 2): Unit = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val e = prep(embeddings)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val (n, s, es) = fingerprint(e)
      val nl = resolveNlist(nlist, n)
      val (centroids, cb1, codes) =
        Similarity.ivfPqIndex(e, nl, m, ksub, dim, iters, coarseIters)
      centroids.write.mode("overwrite").parquet(s"$store/centroids")
      cb1.write.mode("overwrite").parquet(s"$store/codebooks")
      codes.write.mode("overwrite").parquet(s"$store/codes")
      val (tp, tf) = fs(spark, s"$store/tombstones")
      tf.delete(tp, true)
      // drift stats epoch 0: the init corpus's exact decimal sums —
      // [[update]] appends one batch per admitted delta, and
      // [[driftReportFromStats]] folds them instead of rescanning
      driftStatsOf(e, "init")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$store/driftstats")
      // drift baseline (the [[driftReport]] reference): the s15 audit
      // row, and the per-dim 6-grid means + s13 PCA axis as d KB-scale
      // rows — what a scheduled-retrain advisory compares the serving
      // corpus against. Written BEFORE meta: a readable meta implies a
      // complete baseline.
      val withEmb = e.select(col("vec_id"), col("emb").as("embedding"))
      Similarity.embeddingAudit(withEmb)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$store/baseline/audit")
      val pm = Pca.pcaModel(withEmb, iters = DriftPcaIters)
      pm.mu.indices.map(i => (i, pm.mu(i), pm.v(i)))
        .toDF("i", "mu", "v")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$store/baseline/axis")
      Seq((nl, m, ksub, dim, iters, coarseIters, n, s, es))
        .toDF("nlist", "m", "ksub", "dim", "iters", "coarse_iters",
          "n_rows", "id_sum", "emb_sum")
        .coalesce(1).write.mode("overwrite").parquet(s"$store/meta")
    } finally e.unpersist()
  }

  /** ATOMIC rebuild: retrain + re-encode into a STAGED sibling
    * (`<store>__rebuild_tmp`), then publish via the checked-rename
    * swap ([[graft.engine.Compactor.swapInto]]) — the action a
    * tripped drift advisory (s22/s23) takes without ever exposing a
    * half-built store: a reader at ANY point during the retrain
    * serves the OLD model (spec-pinned via the beforeSwap hook), the
    * swap is all-or-nothing (two renames, rollback on failure), and a
    * crash between them restores from `__old` on the next read
    * ([[exists]]' recovery). Contrast [[init]], which deletes in
    * place — correct for bootstrap, unsafe under live readers.
    * Tombstones clear with the rebuild (the re-init semantics:
    * takedowns are honored by excluding the rows from `embeddings`).
    *
    * Writer contract: ONE rebuilder per store path at a time, in the
    * process that owns the store (readers are free). In-process,
    * [[graft.engine.Compactor.swapLock]] serializes the swap against
    * every concurrent read's crash recovery; across processes nothing
    * can — a second JVM recovering mid-swap would rename `__old` back
    * and abort the live rebuild.
    */
  def rebuild(embeddings: DataFrame, store: String, nlist: Int = 0,
              m: Int = 8, ksub: Int = 16, dim: Int = 64, iters: Int = 1,
              coarseIters: Int = 2): Unit =
    rebuild(embeddings, store, nlist, m, ksub, dim, iters, coarseIters,
      () => ())

  private[graft] def rebuild(embeddings: DataFrame, store: String,
                             nlist: Int, m: Int, ksub: Int, dim: Int,
                             iters: Int, coarseIters: Int,
                             beforeSwap: () => Unit): Unit = {
    val spark = embeddings.sparkSession
    require(exists(spark, store),
      s"no vector index store at $store to rebuild (run init first)")
    val tmp = store + "__rebuild_tmp"
    val (tp, tf) = fs(spark, tmp)
    // the writer lease spans the WHOLE retrain (r14): a second
    // process double-launching this rebuild refuses at entry instead
    // of racing the stage/swap — StoreLease's takeover rules apply
    graft.engine.StoreLease.withLease(tf, store) {
      tf.delete(tp, true) // a crashed rebuild's stage is garbage
      init(embeddings, tmp, nlist, m, ksub, dim, iters, coarseIters)
      beforeSwap()
      graft.engine.Compactor.swapInto(tf, store, tmp)
    }
  }

  /** Init unless a complete store already matches this corpus and
    * these knobs — the idempotent form contract queries and the CLI
    * use (a re-run serves from the store; a regenerated OR re-embedded
    * corpus, a knob change, or an unreadable/half-committed meta
    * rebuilds). Returns true when it (re)built.
    */
  def initIfStale(embeddings: DataFrame, store: String, nlist: Int = 0,
                  m: Int = 8, ksub: Int = 16, dim: Int = 64,
                  iters: Int = 1, coarseIters: Int = 2): Boolean = {
    val spark = embeddings.sparkSession
    // an unreadable meta (crash between the directory create and the
    // parquet footer commit) must read as STALE, not throw — the
    // "meta lands last so a crash mid-init rebuilds" contract
    val fresh = exists(spark, store) && scala.util.Try {
      val meta = readMeta(spark, store)
      val (n, s, es) = fingerprint(prep(embeddings))
      // a pre-baseline or pre-driftstats store (older layouts) must
      // rebuild so the drift advisory has its reference and its
      // incrementally-maintained serving-corpus statistics
      val (bp, bf) = fs(spark, s"$store/baseline/axis")
      val (dp, df) = fs(spark, s"$store/driftstats")
      bf.exists(bp) && df.exists(dp) &&
        meta == IndexMeta(resolveNlist(nlist, n), m, ksub, dim, iters,
          coarseIters, n, s, es)
    }.getOrElse(false)
    if (!fresh)
      init(embeddings, store, nlist, m, ksub, dim, iters, coarseIters)
    !fresh
  }

  /** The frozen model, collected: centroids sorted by id and the
    * (sub, cell) → subvector codebook map — KB-to-MB scale by the
    * store contract (the pqCodebook collect discipline).
    */
  private def readModel(spark: SparkSession, store: String)
      : (Array[(Long, Array[Double])], Map[(Int, Long), Array[Double]]) = {
    val centroids = spark.read.parquet(s"$store/centroids").collect()
      .map(r => (r.getAs[Long]("coarse_id"),
        r.getAs[Seq[Double]]("c_emb").toArray))
      .sortBy(_._1)
    require(centroids.nonEmpty, s"empty centroid table at $store")
    val model = spark.read.parquet(s"$store/codebooks").collect()
      .map(r => (r.getAs[Int]("sub"), r.getAs[Long]("cell")) ->
        r.getAs[Seq[Double]]("c_sv").toArray)
      .toMap
    (centroids, model)
  }

  /** Literal-plan in-row encode: coarse assignment is an in-row
    * argmin over (−round6 cosine, coarse_id) structs of the literal
    * centroid list (identical argmax + tiebreak to the distributed
    * assignment — [[Similarity.ivfPqIndex]]'s max_by — spec-pinned
    * code-for-code), the residual an in-row zip_with against the
    * chosen centroid, and the PQ cells [[Similarity.pqEncode]]'s
    * in-row argmin. Whole-stage-codegen'd, but the model rides the
    * expression tree — right below [[LitEncodeMaxBytes]] only.
    */
  private def encodeLiteral(b: DataFrame, meta: IndexMeta,
      centroids: Array[(Long, Array[Double])],
      model: Map[(Int, Long), Array[Double]]): DataFrame = {
    val best = array_min(array(centroids.map { case (cid, cEmb) =>
      struct(
        (-round(Similarity.cosine(col("emb"), typedLit(cEmb.toSeq)), 6))
          .as("nsim"),
        lit(cid).as("coarse_id"),
        typedLit(cEmb.toSeq).as("c_emb"))
    }.toIndexedSeq: _*))
    val encoded = b.withColumn("best", best)
      .withColumn("coarse_id", col("best").getField("coarse_id"))
      .withColumn("resid",
        zip_with(col("emb"), col("best").getField("c_emb"), _ - _))
      .select(col("vec_id"), col("coarse_id"), col("resid"))
    Similarity.pqEncode(encoded, model, meta.m, meta.dim,
        embCol = "resid")
      .select(col("vec_id"),
        posexplode(col("codes")).as(Seq("sub", "cell")),
        col("coarse_id"))
      .select(col("vec_id"), col("sub").cast("int").as("sub"),
        col("cell"), col("coarse_id"))
  }

  /** Closure-based in-row encode — the same math as [[encodeLiteral]]
    * BIT FOR BIT (spec-pinned: codes identical across both paths),
    * with the model shipped once per executor in the task closure
    * (TorrentBroadcast) instead of re-serialized into every task's
    * expression tree: cosine is the [[graft.functions
    * .CosineSimilarity]] fused loop verbatim (dot/nx/ny accumulated
    * left-to-right, denom-zero → 0.0), rounds are the scala
    * BigDecimal HALF_UP Spark's `round` executes, d² the
    * [[graft.functions.L2Squared]] loop, and both tiebreaks the same
    * (min coarse_id / min cell).
    */
  private def encodeClosure(b: DataFrame, meta: IndexMeta,
      centroids: Array[(Long, Array[Double])],
      model: Map[(Int, Long), Array[Double]]): DataFrame = {
    val spark = b.sparkSession
    import spark.implicits._
    val m = meta.m
    val dsub = meta.dim / meta.m
    // per-subspace cell arrays, sorted by cell id (the argmin tiebreak)
    val cells: Array[Array[(Long, Array[Double])]] =
      Array.tabulate(m)(s => model.collect {
        case ((`s`, cell), c_sv) => (cell, c_sv)
      }.toArray.sortBy(_._1))
    cells.zipWithIndex.foreach { case (cs, s) =>
      require(cs.nonEmpty, s"codebook has no cells for subspace $s") }
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def round4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    b.select(col("vec_id"), col("emb")).as[(Long, Array[Double])]
      .mapPartitions { it =>
        it.flatMap { case (id, e) =>
          // coarse argmax: round6 cosine, tie -> smaller coarse_id
          var bestSim = Double.NegativeInfinity
          var bestCid = 0L
          var bestEmb: Array[Double] = null
          var c = 0
          while (c < centroids.length) {
            val (cid, ce) = centroids(c)
            var dot = 0.0; var nx = 0.0; var ny = 0.0
            var i = 0
            val n = math.min(e.length, ce.length)
            // dims are validated equal upstream; the min is belt only
            while (i < n) {
              val xi = e(i); val yi = ce(i)
              dot += xi * yi; nx += xi * xi; ny += yi * yi
              i += 1
            }
            val denom = math.sqrt(nx) * math.sqrt(ny)
            val sim = round6(if (denom == 0.0) 0.0 else dot / denom)
            if (sim > bestSim) { bestSim = sim; bestCid = cid; bestEmb = ce }
            c += 1
          }
          val resid = Array.tabulate(e.length)(i => e(i) - bestEmb(i))
          (0 until m).iterator.map { s =>
            val cs = cells(s)
            var bestD2 = Double.PositiveInfinity
            var bestCell = 0L
            var k = 0
            while (k < cs.length) {
              val (cell, sv) = cs(k)
              var acc = 0.0
              var i = 0
              while (i < dsub) {
                val d = resid(s * dsub + i) - sv(i)
                acc += d * d
                i += 1
              }
              val d2 = round4(acc)
              if (d2 < bestD2) { bestD2 = d2; bestCell = cell }
              k += 1
            }
            (id, s, bestCell, bestCid)
          }
        }
      }.toDF("vec_id", "sub", "cell", "coarse_id")
  }

  /** The in-row encode of a prepped (vec_id, emb) frame under the
    * frozen stored model — the two execution forms above, picked by
    * raw model size. Exposed for the parity spec.
    */
  private[graft] def encodeUnderModel(b: DataFrame, meta: IndexMeta,
      centroids: Array[(Long, Array[Double])],
      model: Map[(Int, Long), Array[Double]],
      litMaxBytes: Long): DataFrame = {
    val modelBytes =
      (centroids.length.toLong * meta.dim +
        model.size.toLong * (meta.dim / meta.m)) * 8L
    if (modelBytes <= litMaxBytes) encodeLiteral(b, meta, centroids, model)
    else encodeClosure(b, meta, centroids, model)
  }

  private[graft] def encodeForStore(spark: SparkSession, store: String,
      batch: DataFrame, litMaxBytes: Long = LitEncodeMaxBytes): DataFrame = {
    val meta = readMeta(spark, store)
    val (centroids, model) = readModel(spark, store)
    encodeUnderModel(prep(batch), meta, centroids, model, litMaxBytes)
  }

  /** Append one batch of new vectors under the FROZEN stored model —
    * the index-maintenance narrow map ([[encodeUnderModel]]): no
    * explode over the corpus, no retrain — scan speed on a 100 TB
    * delta, and unchanged on a `readStream` batch. Contract guards:
    *
    *  - the batch must carry exactly `meta.dim`-dimensional vectors —
    *    a mismatched delta would slice wrong and encode garbage codes
    *    SILENTLY, so it fails loudly instead;
    *  - ids are immutable: the batch anti-joins the ids already coded
    *    (and the tombstoned ones — a deleted id stays deleted until a
    *    re-init), so an at-least-once replay appends NOTHING and a
    *    re-presented id with a CHANGED embedding cannot plant a second
    *    divergent code set (whose ADC terms would double-count and
    *    whose first(qc) would go nondeterministic). Re-embedding an
    *    existing id is a model-drift event — re-init handles it.
    *
    * The anti-join's code-store read is materialized (eager
    * localCheckpoint of the delta-sized survivor set) BEFORE the
    * append begins, so the store is never read and written by the
    * same job.
    */
  def update(batch: DataFrame, store: String): Unit =
    update(batch, store, LitEncodeMaxBytes)

  private[graft] def update(batch: DataFrame, store: String,
                            litMaxBytes: Long): Unit = {
    val spark = batch.sparkSession
    val meta = readMeta(spark, store)
    val (centroids, model) = readModel(spark, store)
    val b0 = prep(batch).distinct()
    val dims = b0.agg(min(size(col("emb"))).as("mn"),
      max(size(col("emb"))).as("mx")).collect()(0)
    if (dims.isNullAt(0)) return // empty batch: nothing to encode
    require(dims.getInt(0) == meta.dim && dims.getInt(1) == meta.dim,
      s"update batch carries ${dims.getInt(0)}..${dims.getInt(1)}-dim " +
        s"embeddings where the store at $store is trained on " +
        s"${meta.dim}-dim vectors (re-init to change the model)")
    val known = spark.read.parquet(s"$store/codes")
      .select(col("vec_id")).distinct()
      .unionByName(tombstones(spark, store).select(col("vec_id")))
    val fresh = b0.join(known, Seq("vec_id"), "left_anti")
      .localCheckpoint(true)
    if (fresh.isEmpty) return
    // drift stats land BEFORE the codes: a crash between the two
    // leaves the batch's ids un-coded, so the replay re-admits them
    // and re-appends BYTE-IDENTICAL stats under the same content-
    // derived key — the read-side distinct folds the duplicate.
    // (Codes-first would lose the stats forever: the replay's
    // anti-join sees the ids as known and admits nothing.) The key
    // is unique across batches by construction: batches are id-
    // disjoint (the anti-join), so min(vec_id) alone separates them.
    // CONTRACT: a crashed update must be retried with the IDENTICAL
    // batch — the semantics Structured Streaming's foreachBatch
    // recovery provides by construction (same epoch replays the same
    // batch). A DIVERGENT retry whose batch overlaps the crashed one
    // admits the overlap again under a different key and the folded
    // stats double-count it; [[reconcileDriftStats]] is the repair
    // (one corpus scan, checked-rename swap) for non-streaming
    // callers that cannot replay identically.
    val kr = fresh.agg(count(lit(1)), sum(col("vec_id")),
      min(col("vec_id"))).collect()(0)
    val batchKey = s"b${kr.getLong(0)}_${kr.getLong(1)}_${kr.getLong(2)}"
    driftStatsOf(fresh, batchKey)
      .coalesce(1).write.mode("append").parquet(s"$store/driftstats")
    encodeUnderModel(fresh, meta, centroids, model, litMaxBytes)
      .write.mode("append").parquet(s"$store/codes")
  }

  /** Per-batch EXACT drift statistics of a prepped (vec_id, emb)
    * frame — the incremental form of the aggregates [[driftReport]]
    * scans the corpus for, written so folding per-batch rows
    * reproduces the corpus-scan values BIT FOR BIT (exact
    * DECIMAL(38,18) sums are associative; the lossy cast-to-double /
    * divide / round-6 steps all happen at READ time in
    * [[driftReportFromStats]], never here):
    *
    *  - rows `i >= 0`: per-dimension Σ decimal(xᵢ) and the exploded
    *    row count at that dimension (the curMu accounting — a NULL
    *    embedding contributes to neither, exactly as posexplode
    *    drops it);
    *  - row `i = -1`: Σ decimal(round₆‖x‖) over the batch's vectors
    *    and the VECTOR count including NULL/empty embeddings — the
    *    [[Similarity.embeddingAudit]] pv accounting (non-finite
    *    components contribute 0 to the norm, a missing embedding is
    *    a zero-norm row), so the folded avg reproduces `avg_norm`.
    */
  private def driftStatsOf(e: DataFrame, batchKey: String): DataFrame = {
    val dims = e
      .select(posexplode(col("emb")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(sum(col("x").cast("decimal(38,18)")).as("sx"),
        count(lit(1)).as("cnt"))
    val bad = isnan(col("x")) ||
      col("x") === lit(Double.PositiveInfinity) ||
      col("x") === lit(Double.NegativeInfinity)
    val nsq = e
      .select(col("vec_id"), posexplode(col("emb")).as(Seq("i", "x")))
      .groupBy(col("vec_id"))
      .agg(sum(when(bad, lit(0.0d)).otherwise(col("x") * col("x"))
        .cast("decimal(38,18)")).cast("double").as("nsq"))
    val norms = e.select(col("vec_id"))
      .join(nsq, Seq("vec_id"), "left_outer")
      .select(coalesce(col("nsq"), lit(0.0d)).as("nsq"))
      .agg(sum(round(sqrt(col("nsq")), 6).cast("decimal(38,18)"))
        .as("sx"), count(lit(1)).as("cnt"))
      .select(lit(-1).as("i"), col("sx"), col("cnt"))
    dims.unionByName(norms)
      .select(lit(batchKey).as("batch_key"), col("i"),
        col("sx"), col("cnt"))
  }

  /** Rebuild the driftstats table from the SUPPLIED serving corpus —
    * the repair for the one window the content-keyed idempotence
    * cannot cover: a crash inside [[update]]'s stats→codes window
    * followed by a retry with a DIFFERENT-but-overlapping batch (or a
    * vectors-free [[delete]] whose subtraction never happened)
    * permanently double-counts the overlap in the folded stats. One
    * corpus scan writes the exact decimal statistics of `corpus` as a
    * single reconcile batch and swaps it into place via the engine's
    * checked-rename ([[graft.engine.Compactor.swapInto]] — crash-safe,
    * never leaves the table missing). After it, [[driftReportFromStats]]
    * equals the corpus-scan report over `corpus` bit for bit again
    * (spec-pinned), and subsequent [[update]] batches fold on top as
    * usual. The `r…` key prefix cannot collide with the `b…`/`d…`
    * update/delete keys.
    */
  def reconcileDriftStats(spark: SparkSession, store: String,
                          corpus: DataFrame): Unit = {
    require(exists(spark, store),
      s"no vector index store at $store (run init first)")
    val e = prep(corpus)
    val kr = e.agg(count(lit(1)), coalesce(sum(col("vec_id")), lit(0L)),
      coalesce(min(col("vec_id")), lit(0L))).collect()(0)
    val key = s"r${kr.getLong(0)}_${kr.getLong(1)}_${kr.getLong(2)}"
    val dir = s"$store/driftstats"
    val (_, f) = fs(spark, dir)
    val tmp = dir + "__reconcile_tmp"
    f.delete(new org.apache.hadoop.fs.Path(tmp), true)
    // the i = -2 bookkeeping row: every tombstone existing at
    // reconcile time is now fully accounted (the supplied corpus IS
    // the survivors), so [[unreconciledTombstones]] stops counting
    // them; the report reads only i >= -1, so the row is invisible
    // to the drift arithmetic
    val covered = tombstones(spark, store)
      .select(col("vec_id")).distinct().count()
    val mark = spark.range(1).select(lit(key).as("batch_key"),
      lit(-2).as("i"), lit(null).cast("decimal(38,18)").as("sx"),
      lit(covered).as("cnt"))
    driftStatsOf(e, key).unionByName(mark)
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    graft.engine.Compactor.swapInto(f, dir, tmp)
  }

  /** Tombstoned ids whose drift statistics were never subtracted —
    * the count a stats-fed drift report must CAVEAT: the vectors-free
    * [[delete]] appends tombstones without reconciling the stats (the
    * deleted rows' values aren't in hand), so [[driftReportFromStats]]
    * keeps describing the APPENDED corpus while queries serve the
    * survivors. Distinct tombstone ids, minus the vectors subtracted
    * by `d…`-keyed negative batches, minus the tombstones a
    * [[reconcileDriftStats]] marked covered (its i = -2 row) — all
    * KB-scale reads; clamped at zero.
    */
  def unreconciledTombstones(spark: SparkSession, store: String): Long = {
    require(exists(spark, store),
      s"no vector index store at $store (run init first)")
    val nTomb = tombstones(spark, store)
      .select(col("vec_id")).distinct().count()
    val (dp, df) = fs(spark, s"$store/driftstats")
    val accounted =
      if (!df.exists(dp)) 0L
      else spark.read.parquet(s"$store/driftstats").distinct()
        .filter((col("i") === -1 && col("cnt") < 0 &&
            col("batch_key").startsWith("d")) ||
          (col("i") === -2 && col("batch_key").startsWith("r")))
        .agg(coalesce(sum(abs(col("cnt"))), lit(0L)))
        .collect()(0).getLong(0)
    math.max(0L, nTomb - accounted)
  }

  /** The tombstone facts (vec_id, deleted_at) — empty frame when none
    * have ever been written.
    */
  private def tombstones(spark: SparkSession, store: String): DataFrame = {
    val (p, f) = fs(spark, s"$store/tombstones")
    if (!f.exists(p))
      spark.range(0).select(col("id").as("vec_id"),
        lit(0L).as("deleted_at"))
    else spark.read.parquet(s"$store/tombstones")
  }

  /** Delete vectors from the store — the takedown path an append-only
    * store otherwise lacks: appends (vec_id, deleted_at) tombstone
    * FACTS (at-least-once replays append duplicate facts, harmless —
    * every consumer anti-joins on vec_id only), every read path
    * ([[query]], [[reconstruct]], [[diversifiedQuery]]) filters them
    * out immediately, and [[compact]] later drops the dead code rows
    * physically. A tombstoned id also never re-enters via [[update]]
    * (id immutability); only a re-[[init]] resurrects it.
    */
  def delete(spark: SparkSession, store: String,
             vecIds: Seq[Long]): Unit = {
    require(exists(spark, store),
      s"no vector index store at $store (run init first)")
    require(vecIds.nonEmpty, "delete needs at least one vec_id")
    import spark.implicits._
    val now = System.currentTimeMillis()
    vecIds.distinct.map((_, now)).toDF("vec_id", "deleted_at")
      .coalesce(1).write.mode("append").parquet(s"$store/tombstones")
  }

  /** [[delete]] WITH drift-stats reconciliation — the takedown form
    * to use when the caller has the deleted vectors in hand (a
    * takedown request names the document): alongside the tombstones,
    * it appends the EXACT NEGATIVE of the deleted rows' drift
    * statistics, so [[driftReportFromStats]] keeps matching the
    * corpus-scan report over the SURVIVORS bit for bit (exact decimal
    * sums subtract as exactly as they add — spec-pinned). Contract
    * guards, mirroring [[update]]'s:
    *
    *  - already-tombstoned ids are skipped, so an at-least-once
    *    replay subtracts NOTHING twice;
    *  - the supplied frame must cover every newly-deleted id (a
    *    missing vector would silently leave the stats over-counting
    *    — it fails loudly instead) at the store's trained dimension;
    *  - the negative stats land BEFORE the tombstones: a crash
    *    between the two replays to byte-identical rows under the
    *    same content-derived key, folded at read — tombstones-first
    *    would skip the replay's subtraction forever.
    *
    * Without the vectors, the base [[delete]] applies and the stats
    * keep counting the appended corpus (documented there).
    */
  def delete(spark: SparkSession, store: String, vecIds: Seq[Long],
             vectors: DataFrame): Unit = {
    require(exists(spark, store),
      s"no vector index store at $store (run init first)")
    require(vecIds.nonEmpty, "delete needs at least one vec_id")
    import spark.implicits._
    val meta = readMeta(spark, store)
    val fresh = vecIds.distinct.toDF("vec_id")
      .join(tombstones(spark, store).select(col("vec_id")),
        Seq("vec_id"), "left_anti")
      .collect().map(_.getLong(0)).sorted // takedown-list-sized
    if (fresh.isEmpty) return // full replay: already tombstoned
    val rows = prep(vectors).distinct()
      .filter(col("vec_id").isin(fresh.toIndexedSeq: _*))
    val dims = rows.agg(count(lit(1)).as("nd"),
      min(size(col("emb"))).as("mn"),
      max(size(col("emb"))).as("mx")).collect()(0)
    require(dims.getLong(0) == fresh.length,
      s"${fresh.length - dims.getLong(0)} of the ids to delete are " +
        s"missing from the supplied vectors frame — stats would " +
        "over-count the survivors (supply the full rows, or use the " +
        "vectors-free delete and accept append-only stats)")
    require(dims.getInt(1) == meta.dim && dims.getInt(2) == meta.dim,
      s"supplied vectors carry ${dims.getInt(1)}..${dims.getInt(2)}" +
        s"-dim embeddings where the store at $store is trained on " +
        s"${meta.dim}-dim vectors")
    val key = s"d${fresh.length}_${fresh.sum}_${fresh.head}"
    driftStatsOf(rows, key)
      .select(col("batch_key"), col("i"),
        (-col("sx")).cast("decimal(38,18)").as("sx"),
        (-col("cnt")).as("cnt"))
      .coalesce(1).write.mode("append").parquet(s"$store/driftstats")
    val now = System.currentTimeMillis()
    fresh.toSeq.map((_, now)).toDF("vec_id", "deleted_at")
      .coalesce(1).write.mode("append").parquet(s"$store/tombstones")
  }

  /** Live codes: the store's append log with replay duplicates folded
    * and tombstoned ids removed — ONE definition for every read path.
    */
  private def liveCodes(spark: SparkSession, store: String): DataFrame =
    spark.read.parquet(s"$store/codes")
      .join(tombstones(spark, store).select(col("vec_id")),
        Seq("vec_id"), "left_anti")
      .distinct()

  final case class CompactReport(codeRowsBefore: Long, codeRowsAfter: Long,
                                 filesBefore: Int, filesAfter: Int)

  /** Physically compact the codes store: rewrite it as the folded,
    * tombstone-free row set ([[liveCodes]]) in few sized files, then
    * publish via the engine's checked-rename swap
    * ([[graft.engine.Compactor.swapInto]] — crash-safe, never leaves
    * the store missing). Query results are unchanged BY CONSTRUCTION
    * (reads already fold + anti-join; spec-pinned anyway); what
    * changes is the physics — N streaming drains' small append files
    * and replay duplicates stop accumulating. Tombstones stay in
    * place (they are cheap facts and still gate [[update]]); only
    * re-[[init]] clears them.
    */
  def compact(spark: SparkSession, store: String,
              targetBytes: Long = 512L << 20): CompactReport = {
    require(exists(spark, store),
      s"no vector index store at $store (run init first)")
    val dir = s"$store/codes"
    val (p, f) = fs(spark, dir)
    def dataFiles = f.listStatus(p).filter { s =>
      val n = s.getPath.getName
      s.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    val before = dataFiles
    // leased on the STORE root (not the codes subdir), so a compact
    // and a rebuild of the same store exclude each other cross-process
    graft.engine.StoreLease.withLease(f, store) {
      val rowsBefore = spark.read.parquet(dir).count()
      val bytes = before.map(_.getLen).sum
      val nOut =
        math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      val tmp = dir + "__compact_tmp"
      f.delete(new org.apache.hadoop.fs.Path(tmp), true)
      liveCodes(spark, store).coalesce(nOut)
        .write.mode("overwrite").parquet(tmp)
      graft.engine.Compactor.swapInto(f, dir, tmp)
      CompactReport(rowsBefore, spark.read.parquet(dir).count(),
        before.length, dataFiles.length)
    }
  }

  /** Store-vs-corpus drift report — the SIGNAL behind "the frozen
    * model retrains on a schedule": one row comparing the serving
    * corpus against the baseline recorded at [[init]] (s15's audit +
    * s13's PCA axis, composed):
    *
    *  - `n_ratio` — corpus growth (REPORTED, not a staleness trigger:
    *    same-distribution growth is a capacity question [[initIfStale]]
    *    already answers; drift is a DISTRIBUTION question);
    *  - `norm_ratio` — avg L2 norm now / at init (both the round-6
    *    audit statistic) — catches re-scaled or degenerating encoders;
    *  - `mean_shift` — round-6 L2 distance between the per-dim 6-grid
    *    mean vectors — the bulk translation of the embedding cloud;
    *  - `axis_shift` — the mean delta PROJECTED ON THE BASELINE's
    *    top principal axis — where the variance concentrates, a small
    *    translation matters most along it;
    *  - `stale` — the [[initIfStale]]-style advisory: true when
    *    mean_shift > tolMean, |axis_shift| > tolAxis, or norm_ratio
    *    leaves [1−tolNorm, 1+tolNorm].
    *
    * All arithmetic is the engine-portable kind (decimal sums, 6-grid
    * rounds, fixed-order IEEE ops), so the whole report — including
    * the boolean — replays in SQL (oracle-checked, s22). Cost: one
    * narrow explode + two aggregations over the corpus; the baseline
    * is d KB-scale rows broadcast.
    */
  def driftReport(spark: SparkSession, store: String, corpus: DataFrame,
                  tolMean: Double = 0.01, tolAxis: Double = 0.005,
                  tolNorm: Double = 0.02): DataFrame = {
    require(exists(spark, store),
      s"no vector index store at $store (run init first)")
    val e = prep(corpus)
    val curAudit = Similarity.embeddingAudit(corpus)
      .select(col("n_vectors").as("n_current"),
        col("avg_norm").as("norm_current"))
    val curMu = e.select(posexplode(col("emb")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(round(sum(col("x").cast("decimal(38,18)")).cast("double") /
        count(lit(1)), 6).as("m"))
    driftTail(spark, store, curAudit, curMu, tolMean, tolAxis, tolNorm)
  }

  /** The drift report fed from the store's OWN incrementally-
    * maintained statistics ([[driftStatsOf]] rows appended by
    * [[init]] and every admitted [[update]] batch) — the serving
    * corpus is never rescanned: the report reads the baseline (d
    * KB-scale rows) and the driftstats table (d+1 rows per batch),
    * folds the exact decimal sums, and applies the IDENTICAL
    * cast/divide/round-6 tail as [[driftReport]], so on the same
    * served rows the two reports are equal BIT FOR BIT (spec-pinned;
    * oracle-checked, s23). At-least-once stats replays are
    * byte-identical under their content-derived batch key and fold
    * via distinct. Takedowns: the vectors-supplied [[delete]]
    * overload appends the deleted rows' exact NEGATIVE stats, so the
    * report keeps matching the SURVIVING corpus; the vectors-free
    * delete leaves the stats counting the appended corpus (same
    * bookkeeping as `n_rows` in meta — a takedown-heavy store
    * re-inits). Cost: independent of corpus size — this is the
    * advisory a scheduler can afford to run every drain at 100 TB.
    */
  def driftReportFromStats(spark: SparkSession, store: String,
                           tolMean: Double = 0.01,
                           tolAxis: Double = 0.005,
                           tolNorm: Double = 0.02): DataFrame = {
    require(exists(spark, store),
      s"no vector index store at $store (run init first)")
    val (dp, df) = fs(spark, s"$store/driftstats")
    require(df.exists(dp),
      s"store at $store predates drift stats — re-init to record them")
    val folded = spark.read.parquet(s"$store/driftstats")
      .distinct() // byte-identical at-least-once replays fold
      .groupBy(col("i"))
      .agg(sum(col("sx")).as("sx"), sum(col("cnt")).as("cnt"))
    // a store whose reconciled stats cover no vectors (everything
    // deleted) has no serving corpus to report on — fail loudly
    // rather than emit a divide-by-zero row (KB-scale eager check)
    val nRow = folded.filter(col("i") === -1).collect()
    require(nRow.nonEmpty && nRow(0).getAs[Long]("cnt") > 0,
      s"drift stats at $store cover no vectors — re-init the store")
    val curAudit = folded.filter(col("i") === -1)
      .select(col("cnt").as("n_current"),
        (round(col("sx").cast("double") / col("cnt"), 6) + lit(0.0d))
          .as("norm_current"))
    val curMu = folded.filter(col("i") >= 0)
      .select(col("i"),
        round(col("sx").cast("double") / col("cnt"), 6).as("m"))
    driftTail(spark, store, curAudit, curMu, tolMean, tolAxis, tolNorm)
  }

  /** The advisory boolean from the stats-fed report — the form a
    * per-drain scheduler calls (cost independent of corpus size).
    */
  def reindexAdvisedFromStats(spark: SparkSession, store: String,
                              tolMean: Double = 0.01,
                              tolAxis: Double = 0.005,
                              tolNorm: Double = 0.02): Boolean =
    driftReportFromStats(spark, store, tolMean, tolAxis, tolNorm)
      .collect()(0).getAs[Boolean]("stale")

  /** The shared report tail: baseline vs a current-corpus audit row
    * and 6-grid mean vector, however those were obtained (corpus scan
    * or folded stats) — ONE definition so the two report forms cannot
    * drift.
    */
  private def driftTail(spark: SparkSession, store: String,
                        curAudit: DataFrame, curMu: DataFrame,
                        tolMean: Double, tolAxis: Double,
                        tolNorm: Double): DataFrame = {
    val (bp, bf) = fs(spark, s"$store/baseline/axis")
    require(bf.exists(bp),
      s"store at $store predates drift baselines — re-init to record one")
    val baseAudit = spark.read.parquet(s"$store/baseline/audit")
      .select(col("n_vectors").as("n_base"),
        col("avg_norm").as("norm_base"))
    val axis = spark.read.parquet(s"$store/baseline/axis")
    val shifts = curMu.join(broadcast(axis), "i")
      .select((col("m") - col("mu")).as("dd"), col("v"))
      .agg(
        round(sqrt(sum((col("dd") * col("dd")).cast("decimal(38,18)"))
          .cast("double")), 6).as("mean_shift"),
        round(sum((col("dd") * col("v")).cast("decimal(38,18)"))
          .cast("double"), 6).as("axis_shift"))
    baseAudit.crossJoin(curAudit).crossJoin(shifts)
      .withColumn("n_ratio",
        round(col("n_current").cast("double") / col("n_base"), 6))
      .withColumn("norm_ratio",
        round(when(col("norm_base") === 0.0, lit(0.0))
          .otherwise(col("norm_current") / col("norm_base")), 6))
      .select(col("n_base"), col("n_current"), col("n_ratio"),
        col("norm_ratio"), col("mean_shift"), col("axis_shift"),
        (col("mean_shift") > lit(tolMean) ||
          abs(col("axis_shift")) > lit(tolAxis) ||
          abs(col("norm_ratio") - lit(1.0d)) > lit(tolNorm)).as("stale"))
  }

  /** The advisory as a boolean — compose with a scheduler: re-[[init]]
    * (and re-drain) when true.
    */
  def reindexAdvised(spark: SparkSession, store: String,
                     corpus: DataFrame, tolMean: Double = 0.01,
                     tolAxis: Double = 0.005,
                     tolNorm: Double = 0.02): Boolean =
    driftReport(spark, store, corpus, tolMean, tolAxis, tolNorm)
      .collect()(0).getAs[Boolean]("stale")

  /** PQ-reconstruct the stored approximation of selected vectors —
    * coarse centroid + the concatenation of each subspace's codebook
    * cell (the standard PQ decode): (vec_id, emb) with emb the
    * ~3%-of-float approximation every PQ serving stack reasons over
    * when the originals are too big to fetch. The vec_id list is
    * collected-KB by contract (a candidate pool), so the codes scan
    * prunes on vec_id (PushedFilters) and the codebook/centroid joins
    * broadcast — corpus never read, work proportional to |vecIds|·m.
    */
  def reconstruct(spark: SparkSession, store: String,
                  vecIds: Seq[Long]): DataFrame = {
    require(exists(spark, store),
      s"no vector index store at $store (run init first)")
    val cb1 = spark.read.parquet(s"$store/codebooks")
    val cents = spark.read.parquet(s"$store/centroids")
    val codes = spark.read.parquet(s"$store/codes")
      .filter(col("vec_id").isin(vecIds: _*))
      .join(tombstones(spark, store).select(col("vec_id")),
        Seq("vec_id"), "left_anti")
      .distinct()
    codes.join(broadcast(cb1), Seq("sub", "cell"))
      .groupBy(col("vec_id"))
      .agg(first(col("coarse_id")).as("coarse_id"),
        flatten(transform(
          array_sort(collect_list(struct(col("sub"), col("c_sv")))),
          s => s.getField("c_sv"))).as("remb"))
      .join(broadcast(cents), Seq("coarse_id"))
      .select(col("vec_id"),
        zip_with(col("c_emb"), col("remb"), _ + _).as("emb"))
  }

  /** Diversified retrieval ENTIRELY from the store — the production
    * MMR shape when the float corpus is not on the serving path: the
    * candidate pool is [[query]]'s cell-pruned top-`poolSize` (rel =
    * the rounded-4 IVF-PQ score), candidate embeddings are the PQ
    * [[reconstruct]]ions, and the greedy is
    * [[Similarity.mmrRerank]] UNCHANGED (the reranker-accepts-any-pool
    * contract, third pool family after s14's exact and s18's LSH).
    * Oracle-checked (s19): pool ranking, reconstruction arithmetic
    * and every greedy round replay in SQL.
    */
  def diversifiedQuery(spark: SparkSession, store: String,
                       queries: DataFrame, k: Int, poolSize: Int = 12,
                       lambda: Double = 0.7,
                       nprobe: Int = 4): DataFrame = {
    require(poolSize >= k, s"pool ($poolSize) must cover k ($k)")
    // r15: the pool build is KB by construction (|Q|·poolSize rows) —
    // collect the store ranking once (one job, replacing the eager
    // checkpoint + id-collect pair) and join the PQ reconstructions
    // back driver-side (multiset inner join, null keys never match —
    // SQL equality). The reconstruct itself keeps its distributed
    // pushed-codes plan; the MMR greedy was already a driver fold.
    val pool0 = query(spark, store, queries, poolSize, nprobe)
      .select(col("query_id"), col("neighbor_id").as("vec_id"),
        col("approx_ip").as("rel"))
      .collect().toIndexedSeq
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    val ids = pool0.flatMap(_._2).distinct
    val embById = reconstruct(spark, store, ids)
      .collect().toIndexedSeq
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) null else r.getSeq[Any](1)))
      .collect { case (Some(id), emb) => id -> emb }
      .groupBy(_._1).map { case (key, v) => key -> v.map(_._2) }
    val pool = for {
      (qid, vid, rel) <- pool0
      emb <- vid.toSeq.flatMap(embById.getOrElse(_, Nil))
    } yield (qid, vid, emb, rel)
    Similarity.mmrRerank(localPoolDf(spark, pool), k, lambda)
  }

  /** A collected (query_id, vec_id, emb, rel) pool as a LOCAL
    * relation — the zero-job input [[Similarity.mmrRerank]]'s
    * one-collect fold consumes.
    */
  private def localPoolDf(spark: SparkSession,
      pool: Seq[(Option[Long], Option[Long], Seq[Any], Option[Double])])
      : DataFrame = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      pool.map(t => org.apache.spark.sql.Row(
        t._1.orNull, t._2.orNull, t._3, t._4.orNull)).asJava,
      StructType(Seq(
        StructField("query_id", LongType),
        StructField("vec_id", LongType),
        StructField("emb", ArrayType(DoubleType)),
        StructField("rel", DoubleType))))
  }

  /** Two-stage retrieval — the standard PQ serving tail: the store's
    * ADC ranking nominates the top-`rerank` candidates per query
    * ([[query]] — cell-pruned, corpus never scanned), then ONLY those
    * candidates' ORIGINAL vectors are fetched from the corpus parquet
    * by a pushed vec_id filter (spec-pinned PushedFilters — the fetch
    * reads |Q|·rerank rows' worth of row groups, not the corpus) and
    * re-ranked by exact rounded-4 cosine with the family's vec_id
    * tiebreak. The discipline s04 proves in-query (quantized
    * candidates → exact re-rank of survivors), composed over the
    * persisted store: ADC compression error affects only WHICH
    * candidates are nominated, never their final order. With `rerank`
    * covering the corpus and `nprobe` covering the cells this
    * degenerates to the exact ranking (spec-pinned, the s04
    * contract). Oracle-checked (s20): the s08 candidate chain + the
    * exact re-rank CTE replay end-to-end.
    */
  def queryRerank(spark: SparkSession, store: String, corpus: DataFrame,
                  queries: DataFrame, k: Int, rerank: Int = 8,
                  nprobe: Int = 4): DataFrame = {
    require(rerank >= k,
      s"rerank pool ($rerank) must cover k ($k)")
    // r15: the re-rank tail runs over KB-by-construction frames
    // (|Q|·rerank candidates, their pushed-fetched originals, the
    // query vectors), yet cost an eager checkpoint, an id collect and
    // a join+window plan per call. Collect the three frames (the
    // corpus fetch keeps its pushed PARALLEL scan) and fold the exact
    // re-rank driver-side — [[Similarity.exactRerankLocal]], the one
    // definition the hybrid dense legs share, spec-pinned against the
    // expression form.
    val candRows = query(spark, store, queries, rerank, nprobe)
      .select(col("query_id"), col("neighbor_id").as("vec_id"))
      .collect().toIndexedSeq
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) None else Some(r.getLong(1))))
    val ids = candRows.flatMap(_._2).distinct
    val fetchedRows = prep(corpus)
      .filter(col("vec_id").isin(ids: _*))
      .collect().toIndexedSeq
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) null else r.getSeq[Any](1)))
    val qRows = prep(queries)
      .select(col("vec_id").as("query_id"), col("emb"))
      .collect().toIndexedSeq
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) null else r.getSeq[Any](1)))
    val ranked = Similarity.exactRerankLocal(candRows, fetchedRows,
      qRows, k)
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      ranked.map(t => org.apache.spark.sql.Row(
        t._1.orNull, t._2.orNull, t._3.orNull, t._4)).asJava,
      StructType(Seq(
        StructField("query_id", LongType),
        StructField("neighbor_id", LongType),
        StructField("sim", DoubleType),
        StructField("rank", IntegerType, nullable = false))))
  }

  /** TWO-STAGE diversified retrieval — [[queryRerank]]'s discipline
    * applied to [[diversifiedQuery]]: the persisted index nominates
    * the top-`poolSize` ADC candidates per probe (cell-pruned, the
    * corpus never scanned for nomination), then ONLY those
    * candidates' ORIGINAL vectors are fetched from the corpus
    * parquet by a pushed vec_id filter, relevance recomputes as the
    * exact rounded-4 cosine, and the greedy MMR selection
    * ([[Similarity.mmrRerank]], unchanged) runs over the originals —
    * so PQ compression error affects only WHICH candidates enter the
    * pool, never the relevance/diversity trade that picks among
    * them. Completes the serving matrix: ranked approx ([[query]]) /
    * ranked exact-tail ([[queryRerank]]) / diversified approx
    * ([[diversifiedQuery]]) / diversified exact-tail (this).
    * Oracle-checked (s24): the s08 candidate chain, the pool cut,
    * the exact relevance join and every greedy round replay
    * end-to-end.
    */
  def diversifiedQueryRerank(spark: SparkSession, store: String,
                             corpus: DataFrame, queries: DataFrame,
                             k: Int, poolSize: Int = 12,
                             lambda: Double = 0.7,
                             nprobe: Int = 4): DataFrame = {
    require(poolSize >= k, s"pool ($poolSize) must cover k ($k)")
    // r15: the pool build (cands ⋈ originals ⋈ q, rel = round-4 exact
    // cosine, NO cut — the greedy sees the whole nomination) folds
    // driver-side over the three collected KB frames, the
    // queryRerank/diversify discipline; the pushed corpus fetch keeps
    // its parallel scan.
    val candRows = query(spark, store, queries, poolSize, nprobe)
      .select(col("query_id"), col("neighbor_id").as("vec_id"))
      .collect().toIndexedSeq
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) None else Some(r.getLong(1))))
    val ids = candRows.flatMap(_._2).distinct
    val embById = prep(corpus)
      .filter(col("vec_id").isin(ids: _*))
      .collect().toIndexedSeq
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) null else r.getSeq[Any](1)))
      .collect { case (Some(id), emb) => id -> emb }
      .groupBy(_._1).map { case (key, v) => key -> v.map(_._2) }
    val qById = prep(queries)
      .select(col("vec_id").as("query_id"), col("emb"))
      .collect().toIndexedSeq
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) null else r.getSeq[Any](1)))
      .collect { case (Some(id), emb) => id -> emb }
      .groupBy(_._1).map { case (key, v) => key -> v.map(_._2) }
    val pool = for {
      (qid, vid) <- candRows
      emb <- vid.toSeq.flatMap(embById.getOrElse(_, Nil))
      qEmb <- qid.toSeq.flatMap(qById.getOrElse(_, Nil))
    } yield (qid, vid, emb,
      Similarity.localCosine(emb, qEmb)
        .map(Similarity.localRound(_, 4)))
    Similarity.mmrRerank(localPoolDf(spark, pool), k, lambda)
  }

  /** Rank from the store WITHOUT touching the corpus: probes rank the
    * KB centroid table, the probed cell ids (collected — |Q|·nprobe
    * longs, the bm25-terms discipline) push into the codes scan as
    * PushedFilters, replayed appends fold via distinct, tombstoned
    * ids anti-join out, and the scoring tail is [[Similarity
    * .ivfPqRank]] verbatim. Identical rankings to
    * [[Similarity.ivfPqTopK]] over the same corpus and knobs
    * (spec-pinned; s17's oracle replays s08's SQL).
    */
  def query(spark: SparkSession, store: String, queries: DataFrame,
            k: Int, nprobe: Int = 4): DataFrame = {
    val meta = readMeta(spark, store)
    val q = prep(queries)
      .select(col("vec_id").as("query_id"), col("emb"))
    // r15 (VERDICT r14 item 3, the mmrRerank-fold discipline): the
    // probe table (|Q|·nprobe rows) and the ADC distance table
    // (|Q|·m·ksub rows) are KB BY CONTRACT — the former eager
    // probe plan (crossJoin + window + checkpoint), the cell collect,
    // and the dtable's posexplode/join subtree cost ~10 pool-bounded
    // jobs + their Catalyst planning per call, the measured majority
    // of every serving query's wall time. Fold them driver-side over
    // the collected query/centroid/codebook tables when the model
    // fits the literal valve (sized from META — no collect needed to
    // decide; a 100 TB autoNlist model keeps the distributed form)
    // and the request is serving-sized. Arithmetic is replicated op
    // for op in [[Similarity.ivfPqProbesLocal]]/[[ivfPqDtableLocal]]
    // (spec-pinned against the expression forms); the corpus-sized
    // codes scan + rank tail is UNCHANGED either way.
    val dsub = meta.dim / meta.m
    val centroidBytesEst = meta.nlist.toLong * (8L + 8L * meta.dim)
    val cbBytesEst = meta.m.toLong * meta.ksub * (12L + 8L * dsub)
    val qRows: Option[IndexedSeq[(Option[Long], Seq[Any])]] =
      if (centroidBytesEst + cbBytesEst <= Similarity.LitAssignMaxBytes) {
        val collected = q.limit(Similarity.LocalFoldMaxQueryRows + 1)
          .collect()
        if (collected.length <= Similarity.LocalFoldMaxQueryRows)
          Some(collected.toIndexedSeq.map(r =>
            (if (r.isNullAt(0)) None else Some(r.getLong(0)),
              if (r.isNullAt(1)) null else r.getSeq[Any](1))))
        else None // not a serving-sized request: distributed form
      } else None
    val (probes, dtable, cells) = qRows match {
      case Some(rows) =>
        val cents = spark.read.parquet(s"$store/centroids")
          .select(col("coarse_id").cast("long"),
            col("c_emb").cast("array<double>"))
          .collect().toIndexedSeq.map(r =>
            (if (r.isNullAt(0)) None else Some(r.getLong(0)),
              if (r.isNullAt(1)) null else r.getSeq[Any](1)))
        val cb = spark.read.parquet(s"$store/codebooks")
          .select(col("sub").cast("int"), col("cell").cast("long"),
            col("c_sv").cast("array<double>"))
          .collect().toIndexedSeq
          .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
          .map(r => (r.getInt(0), r.getLong(1),
            if (r.isNullAt(2)) null else r.getSeq[Any](2)))
        val pl = Similarity.ivfPqProbesLocal(rows, cents, nprobe)
        val dl = Similarity.ivfPqDtableLocal(rows, cb, meta.m, dsub)
        import scala.jdk.CollectionConverters._
        import org.apache.spark.sql.Row
        import org.apache.spark.sql.types._
        val pDf = spark.createDataFrame(
          pl.map(t => Row(t._1.orNull, t._2.orNull, t._3.orNull))
            .asJava,
          StructType(Seq(StructField("query_id", LongType),
            StructField("coarse_id", LongType),
            StructField("qc", DoubleType))))
        val dDf = spark.createDataFrame(
          dl.map(t => Row(t._1.orNull, t._2, t._3, t._4.orNull)).asJava,
          StructType(Seq(StructField("query_id", LongType),
            StructField("sub", IntegerType, nullable = false),
            StructField("cell", LongType, nullable = false),
            StructField("pd", DoubleType))))
        (pDf, dDf, pl.flatMap(_._2).distinct.toIndexedSeq)
      case None =>
        val centroids = spark.read.parquet(s"$store/centroids")
        val cb1 = spark.read.parquet(s"$store/codebooks")
        // coalesce(1): |Q|·nprobe rows by construction (KB at any
        // scale) — single-partition checkpoint keeps the collect and
        // the rank join's probe side 1-task (guide §2.2)
        val probes = Similarity.ivfPqProbes(q, centroids, nprobe)
          .coalesce(1)
          .localCheckpoint(true) // consumed twice: collect + rank join
        val cells = probes.select(col("coarse_id")).distinct()
          .collect().map(_.getLong(0)).toIndexedSeq
        (probes, Similarity.ivfPqDtable(q, cb1, meta.m, dsub), cells)
    }
    val codes = spark.read.parquet(s"$store/codes")
      .filter(col("coarse_id").isin(cells: _*))
      .join(tombstones(spark, store).select(col("vec_id")),
        Seq("vec_id"), "left_anti")
      .distinct()
    Similarity.ivfPqRank(codes, probes, dtable, k)
  }
}
