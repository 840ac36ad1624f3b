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
  *    the ONLY corpus-sized artifact (~3% of a float corpus), an
  *    APPEND-ONLY set of pure facts that folds at read (the consumers'
  *    distinct), so at-least-once replays of an [[update]] batch are
  *    harmless — the [[graft.streaming.StreamingDedup]] idempotence
  *    contract, chosen over transactional sinks for the same reason;
  *  - `meta/` — one row: the training knobs plus a corpus fingerprint
  *    (row count + vec_id sum), written LAST so a crash mid-init
  *    leaves a store that [[initIfStale]] rebuilds rather than a
  *    silently half-written one.
  *
  * The model (centroids + codebooks) is FROZEN at init — [[update]]
  * encodes new vectors under it without retraining (a production PQ
  * index re-trains on a schedule, not per batch), as a PURE NARROW
  * MAP: in-row coarse argmax over the literal centroid list, in-row
  * residual, [[Similarity.pqEncode]]'s in-row argmin — no shuffle, no
  * state, runs unchanged on a `readStream` batch
  * ([[graft.streaming.StreamingVectorIndex]]).
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
                             nRows: Long, idSum: Long)

  private def fs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p, p.getFileSystem(spark.sparkContext.hadoopConfiguration))
  }

  def exists(spark: SparkSession, store: String): Boolean = {
    val (p, f) = fs(spark, s"$store/meta")
    f.exists(p)
  }

  private def readMeta(spark: SparkSession, store: String): IndexMeta = {
    require(exists(spark, store),
      s"no vector index store at $store (run init first)")
    val r = spark.read.parquet(s"$store/meta").collect()(0)
    IndexMeta(r.getAs[Int]("nlist"), r.getAs[Int]("m"),
      r.getAs[Int]("ksub"), r.getAs[Int]("dim"), r.getAs[Int]("iters"),
      r.getAs[Int]("coarse_iters"), r.getAs[Long]("n_rows"),
      r.getAs[Long]("id_sum"))
  }

  /** The corpus fingerprint recorded at init: one cheap aggregate over
    * the id column. [[initIfStale]] compares it so a REGENERATED
    * corpus at the same path can never be served from a stale index.
    */
  private def fingerprint(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)).as("n"),
      coalesce(sum(col("vec_id")), lit(0L)).as("s")).collect()(0)
    (r.getAs[Long]("n"), r.getAs[Long]("s"))
  }

  private def prep(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id").cast("long").as("vec_id"),
      col("embedding").cast("array<double>").as("emb"))

  /** Bootstrap: train the coarse quantizer and residual codebooks on
    * `embeddings` ([[Similarity.ivfPqIndex]] — ONE definition with the
    * in-query s08) and write the full store. Overwrites any previous
    * store at `store`; meta lands last.
    */
  def init(embeddings: DataFrame, store: String, nlist: Int = 16,
           m: Int = 8, ksub: Int = 16, dim: Int = 64, iters: Int = 1,
           coarseIters: Int = 2): Unit = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val e = prep(embeddings)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val (centroids, cb1, codes) =
        Similarity.ivfPqIndex(e, nlist, m, ksub, dim, iters, coarseIters)
      centroids.write.mode("overwrite").parquet(s"$store/centroids")
      cb1.write.mode("overwrite").parquet(s"$store/codebooks")
      codes.write.mode("overwrite").parquet(s"$store/codes")
      val (n, s) = fingerprint(e)
      Seq((nlist, m, ksub, dim, iters, coarseIters, n, s))
        .toDF("nlist", "m", "ksub", "dim", "iters", "coarse_iters",
          "n_rows", "id_sum")
        .coalesce(1).write.mode("overwrite").parquet(s"$store/meta")
    } finally e.unpersist()
  }

  /** Init unless a complete store already matches this corpus and
    * these knobs — the idempotent form contract queries and the CLI
    * use (a re-run serves from the store; a regenerated corpus or a
    * knob change rebuilds). Returns true when it (re)built.
    */
  def initIfStale(embeddings: DataFrame, store: String, nlist: Int = 16,
                  m: Int = 8, ksub: Int = 16, dim: Int = 64,
                  iters: Int = 1, coarseIters: Int = 2): Boolean = {
    val spark = embeddings.sparkSession
    val fresh = exists(spark, store) && {
      val meta = readMeta(spark, store)
      val (n, s) = fingerprint(prep(embeddings))
      meta == IndexMeta(nlist, m, ksub, dim, iters, coarseIters, n, s)
    }
    if (!fresh)
      init(embeddings, store, nlist, m, ksub, dim, iters, coarseIters)
    !fresh
  }

  /** Append one batch of new vectors under the FROZEN stored model —
    * the index-maintenance narrow map: coarse assignment is an in-row
    * argmin over (−round6 cosine, coarse_id) structs of the literal
    * centroid list (identical argmax + tiebreak to the distributed
    * assignment — [[Similarity.ivfPqIndex]]'s max_by — spec-pinned
    * code-for-code), the residual an in-row zip_with against the
    * chosen centroid, and the PQ cells [[Similarity.pqEncode]]'s
    * in-row argmin. No explode over the corpus, no join, no shuffle,
    * no retrain — scan speed on a 100 TB delta, and unchanged on a
    * `readStream` batch. The batch is row-deduplicated first (the
    * [[Retrieval.updateIndex]] discipline) and the append folds at
    * read, so replays are no-ops.
    */
  def update(batch: DataFrame, store: String): Unit = {
    val spark = batch.sparkSession
    val meta = readMeta(spark, store)
    val centroids = spark.read.parquet(s"$store/centroids").collect()
      .map(r => (r.getAs[Long]("coarse_id"),
        r.getAs[Seq[Double]]("c_emb").toArray))
      .sortBy(_._1)
    require(centroids.nonEmpty, s"empty centroid table at $store")
    val model = spark.read.parquet(s"$store/codebooks").collect()
      .map(r => (r.getAs[Int]("sub"), r.getAs[Long]("cell")) ->
        r.getAs[Seq[Double]]("c_sv").toArray)
      .toMap
    val b = prep(batch).distinct()
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
      .write.mode("append").parquet(s"$store/codes")
  }

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
    val pool0 = query(spark, store, queries, poolSize, nprobe)
      .select(col("query_id"), col("neighbor_id").as("vec_id"),
        col("approx_ip").as("rel"))
      .localCheckpoint(true) // consumed twice: id collect + pool join
    val ids = pool0.select(col("vec_id")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val pool = pool0
      .join(broadcast(reconstruct(spark, store, ids)), Seq("vec_id"))
      .select(col("query_id"), col("vec_id"), col("emb"), col("rel"))
    Similarity.mmrRerank(pool, k, lambda)
  }

  /** Rank from the store WITHOUT touching the corpus: probes rank the
    * KB centroid table, the probed cell ids (collected — |Q|·nprobe
    * longs, the bm25-terms discipline) push into the codes scan as
    * PushedFilters, replayed appends fold via distinct, and the
    * scoring tail is [[Similarity.ivfPqRank]] verbatim. Identical
    * rankings to [[Similarity.ivfPqTopK]] over the same corpus and
    * knobs (spec-pinned; s17's oracle replays s08's SQL).
    */
  def query(spark: SparkSession, store: String, queries: DataFrame,
            k: Int, nprobe: Int = 4): DataFrame = {
    val meta = readMeta(spark, store)
    val centroids = spark.read.parquet(s"$store/centroids")
    val cb1 = spark.read.parquet(s"$store/codebooks")
    val q = prep(queries)
      .select(col("vec_id").as("query_id"), col("emb"))
    val probes = Similarity.ivfPqProbes(q, centroids, nprobe)
      .localCheckpoint(true) // consumed twice: cell collect + rank join
    val cells = probes.select(col("coarse_id")).distinct()
      .collect().map(_.getLong(0))
    val codes = spark.read.parquet(s"$store/codes")
      .filter(col("coarse_id").isin(cells.toIndexedSeq: _*))
      .distinct()
    Similarity.ivfPqRank(codes, probes,
      Similarity.ivfPqDtable(q, cb1, meta.m, meta.dim / meta.m), k)
  }
}
