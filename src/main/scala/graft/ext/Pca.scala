package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Deterministic top-principal-component extraction and projection
  * over the embedding corpus [EXT] — the dimensionality-reduction /
  * whitening step of an embedding-curation pipeline (visualisation,
  * cheap pre-clustering, drift monitoring along the dominant
  * direction; SemDeDup-style pipelines run exactly this before
  * clustering very high-dimensional spaces).
  *
  * The reference has no linear-algebra surface at all (its analytics
  * stop at the catalog plane, `mysql.rb:12-363`); this is a
  * from-scratch [EXT] operator in the repo's portable-arithmetic
  * style, so the WHOLE run — mean, covariance, every power-iteration
  * step — replays in the DuckDB oracle (the s05/x35 discipline):
  *
  *  - per-dimension mean: exact DECIMAL(38,18) sums, double division,
  *    6-grid round;
  *  - centering: plain double subtraction (IEEE-exact, portable);
  *  - covariance: C = Σ (x−μ)(x−μ)ᵀ — un-normalised (the 1/n scalar
  *    rescales eigenvalues, not eigenvectors). Each product rounds
  *    onto the 1e-6 grid and sums as a plain LONG (order-free EXACT
  *    integer addition, replayed verbatim in SQL — and ~4× the
  *    throughput of a decimal buffer), then the total lands back on
  *    the 6-grid;
  *  - power iteration from v₀ = 1⃗ with INFINITY-norm normalisation:
  *    w = C·v (decimal sums, 6-grid), v ← round(w / max|wᵢ|, 6).
  *    The ∞-norm is the portability choice: max and |·| are exact,
  *    and the division's denominator is one of the wᵢ themselves, so
  *    the dominant component lands on EXACTLY ±1.0 — no sqrt-of-sum
  *    whose last ulp an engine could disagree on;
  *  - sign canonicalisation: the lowest-indexed component with
  *    |vᵢ| = 1 is made positive (eigenvectors are defined up to sign;
  *    this pins one representative, replayable as a CASE in SQL).
  *
  * EAGER (the pqTrainOn discipline): training collects the
  * per-dimension mean (d doubles), the covariance grid (d² doubles)
  * and one d-vector per iteration — all KB-scale BY CONSTRUCTION for
  * embedding-sized d. The iteration's matrix-vector products run as
  * Spark jobs over a LOCAL RELATION of the collected grid, so every
  * double→decimal cast in the pipeline is the same already-proven
  * Spark↔DuckDB contract — the driver never does its own decimal
  * arithmetic beyond the shared round6.
  *
  * At 100 TB: the mean and covariance are the only corpus-sized jobs —
  * one narrow posexplode² pass whose hash aggregation is d²-bounded
  * per partition, so the shuffle moves (#partitions · d²) rows, never
  * the corpus. Everything after is KB-scale model arithmetic; the
  * oracle-checked projection shuffles one partial per vector
  * ([[pcaScore]]) and the deployment scorer is a zero-shuffle narrow
  * map ([[pcaScoreMap]]) that runs unchanged on a stream. For very
  * large d (≥ 4096) the d² blow-up per row dominates — there you'd
  * subsample rows for C (standard practice) or band the dimension
  * pairs; the operator takes the corpus it's given.
  */
object Pca {

  /** The trained component: per-dimension mean and the ∞-norm-unit
    * principal direction (sign-canonicalised), both on the 6-grid.
    */
  final case class PcaModel(mu: Array[Double], v: Array[Double])

  private def round6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private val Dec = "decimal(38,18)"

  /** Train the top component by `iters` unrolled power iterations.
    * Degenerate input (zero covariance — a constant corpus) keeps the
    * all-ones start vector: no direction is better than another, and
    * every projection is 0 (spec-pinned).
    */
  def pcaModel(embeddings: DataFrame, iters: Int = 4): PcaModel = {
    require(iters >= 1, s"power iteration needs at least 1 step, got $iters")
    val spark = embeddings.sparkSession
    val e = embeddings
      .select(col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("emb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // per-dimension decimal-exact mean on the 6-grid; d rows, KB
      val muRows = e.select(posexplode(col("emb")).as(Seq("i", "x")))
        .groupBy(col("i"))
        .agg(round(sum(col("x").cast(Dec)).cast("double") /
          count(lit(1)), 6).as("m"))
        .collect()
      require(muRows.nonEmpty, "cannot fit PCA on an empty corpus")
      val dim = muRows.length
      val mu = new Array[Double](dim)
      muRows.foreach(r => mu(r.getInt(0)) = r.getDouble(1))
      val muArr = array(mu.map(lit).toIndexedSeq: _*)

      // covariance grid: posexplode² with a d²-bounded hash agg —
      // the shuffle moves (#partitions · d²) rows, not the corpus.
      // The n·d² product terms sum as QUANTIZED LONGS: each centered
      // product rounds onto the 1e-6 grid (the established HALF_UP
      // round contract) and accumulates in a plain BIGINT — codegen
      // long adds, measured ~4× the throughput of a BigDecimal-backed
      // DECIMAL(38,18) buffer, at identical portability (integer sums
      // are order-free exact and the oracle replays the same tree).
      // |Σ| stays far under 2⁶³ for any n·max|product| < 9·10¹² —
      // beyond that a corpus would subsample for C anyway. Centering
      // is element_at over the literal mean (no lambda — the HOF
      // no-codegen trap). Symmetry halves the aggregation: only
      // j ≤ i pairs aggregate, the mirror fills in at collect time
      // (double products commute exactly).
      val covRows = e
        .select(col("emb"), posexplode(col("emb")).as(Seq("i", "a")))
        .select(col("emb"), col("i"),
          (col("a") - element_at(muArr, col("i") + 1)).as("xi"))
        .select(col("i"), col("xi"),
          posexplode(col("emb")).as(Seq("j", "b")))
        .filter(col("j") <= col("i"))
        .groupBy(col("i"), col("j"))
        .agg(round(sum(round((col("xi") *
            (col("b") - element_at(muArr, col("j") + 1))) * lit(1e6), 0)
            .cast("long")).cast("double") / lit(1e6), 6).as("m"))
        .collect()
        .flatMap { r =>
          val (i, j, m) = (r.getInt(0), r.getInt(1), r.getDouble(2))
          if (i == j) Seq((i, j, m)) else Seq((i, j, m), (j, i, m))
        }

      // KB-scale local relation: every iteration is a tiny Spark job,
      // so its double→decimal casts follow the engine contract the
      // oracle replays — not a driver-side re-implementation of it
      import spark.implicits._
      val covDf = covRows.toSeq.toDF("i", "j", "m").cache()
      try {
        var v = Array.fill(dim)(1.0d)
        var it = 0
        var degenerate = false
        while (it < iters && !degenerate) {
          val vMap = map(v.zipWithIndex.toIndexedSeq.flatMap {
            case (x, i) => Seq(lit(i), lit(x)) }: _*)
          val w = new Array[Double](dim)
          covDf.withColumn("vj", element_at(vMap, col("j")))
            .groupBy(col("i"))
            .agg(round(sum((col("m") * col("vj")).cast(Dec))
              .cast("double"), 6).as("w"))
            .collect()
            .foreach(r => w(r.getInt(0)) = r.getDouble(1))
          val mx = w.map(math.abs).max
          if (mx == 0.0d) degenerate = true
          else {
            var i = 0
            while (i < dim) { v(i) = round6(w(i) / mx); i += 1 }
          }
          it += 1
        }
        // sign canon: lowest-indexed dominant component positive
        // (|v_j| = 1.0 EXACTLY — it is w_argmax / w_argmax rounded)
        val j = v.indices.find(i => math.abs(v(i)) == 1.0d).getOrElse(0)
        if (v(j) < 0) v = v.map(x => -x)
        PcaModel(mu, v)
      } finally covDf.unpersist()
    } finally e.unpersist()
  }

  /** Project every vector onto a trained component — the ORACLE-
    * CHECKED truth form: per-dimension terms explode and sum through
    * a DECIMAL(38,18) aggregate (order-free and EXACT — Spark's
    * in-row `aggregate` cannot hold a (38,18) accumulator without
    * precision loss, its add rule caps (38,18)+(38,18) at (38,17),
    * so the exact form is the grouped sum; the shuffle moves one
    * d²-free partial per vector, not the terms). The `+ 0.0`
    * normalises a possible −0.0 projection. For the scan-speed
    * streaming form see [[pcaScoreMap]].
    */
  def pcaScore(embeddings: DataFrame, model: PcaModel): DataFrame = {
    require(model.mu.length == model.v.length && model.mu.nonEmpty,
      "model mean and direction must share a positive dimension")
    val muArr = array(model.mu.map(lit).toIndexedSeq: _*)
    val vArr = array(model.v.map(lit).toIndexedSeq: _*)
    embeddings
      .select(col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("emb"))
      .select(col("vec_id"),
        explode(zip_with(zip_with(col("emb"), muArr, (x, m) => x - m),
          vArr, (c, vv) => c * vv)).as("t"))
      .groupBy(col("vec_id"))
      .agg((round(sum(col("t").cast(Dec)).cast("double"), 6) +
        lit(0.0d)).as("pc1"))
  }

  /** The projection's DEPLOYMENT scorer — a PURE NARROW MAP (the
    * dsirScore/qualityProbeScoreMap idiom): center and dot in-row as
    * a left-to-right double fold, no explode, no shuffle, no state —
    * runs unchanged on a `readStream` frame at scan speed. Within
    * float-sum error of [[pcaScore]]'s order-free decimal sum
    * (spec-pinned); the decimal form stays the oracle-checked truth
    * twin.
    */
  def pcaScoreMap(embeddings: DataFrame, model: PcaModel): DataFrame = {
    require(model.mu.length == model.v.length && model.mu.nonEmpty,
      "model mean and direction must share a positive dimension")
    val muArr = array(model.mu.map(lit).toIndexedSeq: _*)
    val vArr = array(model.v.map(lit).toIndexedSeq: _*)
    embeddings
      .select(col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("emb"))
      .select(col("vec_id"),
        (round(aggregate(
          zip_with(zip_with(col("emb"), muArr, (x, m) => x - m), vArr,
            (c, vv) => c * vv),
          lit(0.0d), (acc, t) => acc + t), 6) + lit(0.0d)).as("pc1"))
  }

  /** Train-then-project in one call — the s13 query shape. EAGER at
    * construction (training collects the KB-scale model; the x23
    * caveat), lazy in the returned projection.
    */
  def pcaProject(embeddings: DataFrame, iters: Int = 4): DataFrame =
    pcaScore(embeddings, pcaModel(embeddings, iters))
}
