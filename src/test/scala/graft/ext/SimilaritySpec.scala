package graft.ext

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkTestBase {

  private lazy val emb = Tables.embeddings(spark, sf0001)
  private lazy val queries = emb.filter(col("vec_id") < 10)

  test("ANN LSH recall on planted near-neighbors") {
    // The corpus embeddings are isotropic (top-neighbor cosine ≈ 0.35,
    // θ≈70° — no LSH family is simultaneously selective and
    // high-recall there). Recall is therefore measured where ground
    // truth exists: planted perturbed copies at cosine ≈ 0.95+.
    import spark.implicits._
    def mixD(s: Long, j: Int): Double = {
      var z = s * 64 + j + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      ((z ^ (z >>> 31)) >>> 11).toDouble / (1L << 53) - 0.5
    }
    val base = (0L until 200L).map { i =>
      (i, Array.tabulate(64)(j => mixD(i, j).toFloat))
    }
    val planted = base.flatMap { case (i, v) =>
      Seq((i, v)) ++ Seq(1, 2).map { c =>
        (1000L * c + i,
          v.zipWithIndex.map { case (x, j) =>
            x + 0.08f * mixD(i * 7919 + c, j).toFloat })
      }
    }
    val df = planted.toDF("vec_id", "embedding")
    val qs = df.filter($"vec_id" < 10)
    val truth = Similarity.cosineTopK(df, qs, 2)
      .select("query_id", "neighbor_id")
    val ann = Similarity.annTopK(df, qs, 2)
      .select("query_id", "neighbor_id")
    val nTruth = truth.count()
    val recall = truth.intersect(ann).count().toDouble / nTruth
    assert(recall >= 0.9, s"ANN recall $recall < 0.9 on planted pairs")
  }

  test("annRecallAtK equals the hand-computed truth∩ann ratio, " +
    "bounded and per-probe") {
    import spark.implicits._
    def mixD(s: Long, j: Int): Double = {
      var z = s * 64 + j + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      ((z ^ (z >>> 31)) >>> 11).toDouble / (1L << 53) - 0.5
    }
    val base = (0L until 200L).map { i =>
      (i, Array.tabulate(64)(j => mixD(i, j).toFloat))
    }
    val planted = base.flatMap { case (i, v) =>
      Seq((i, v)) ++ Seq(1, 2).map { c =>
        (1000L * c + i,
          v.zipWithIndex.map { case (x, j) =>
            x + 0.08f * mixD(i * 7919 + c, j).toFloat })
      }
    }
    val df = planted.toDF("vec_id", "embedding")
    val qs = df.filter($"vec_id" < 10)
    val got = Similarity.annRecallAtK(df, qs, 2).collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("k_eval"), r.getAs[Long]("n_hits"),
          r.getAs[Double]("recall"))).toMap
    assert(got.keySet == (0L until 10L).toSet, "one row per probe")
    assert(got.values.forall { case (k, h, r) =>
      k == 2L && h <= k && r >= 0.0 && r <= 1.0 })
    // the metric IS the intersect ratio, probe by probe
    val truth = Similarity.cosineTopK(df, qs, 2)
      .select("query_id", "neighbor_id")
    val ann = Similarity.annTopK(df, qs, 2)
      .select("query_id", "neighbor_id")
    val hand = truth.intersect(ann).groupBy("query_id").count().collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("count")).toMap
    got.foreach { case (q, (k, h, r)) =>
      assert(h == hand.getOrElse(q, 0L), s"probe $q hit count")
      assert(math.abs(r - h.toDouble / k) < 1e-9, s"probe $q ratio")
    }
    // planted corpus: the index should be nearly perfect overall
    val mean = got.values.map(_._3).sum / got.size
    assert(mean >= 0.9, s"mean recall $mean < 0.9 on planted pairs")
    // probe-complete on the degenerate corpus: a probe that is the
    // ONLY vector has no exact neighbors, but still gets a row
    val solo = Seq((0L, Array.fill(64)(0.5f)))
      .toDF("vec_id", "embedding")
    val degenerate = Similarity.annRecallAtK(solo, solo, 2).collect()
    assert(degenerate.length == 1)
    assert(degenerate.head.getAs[Long]("k_eval") == 0L &&
      degenerate.head.getAs[Double]("recall") == 0.0)
  }

  test("recallAtK is index-agnostic: PQ and IVF-PQ grade through the " +
    "same definition, metric == hand intersect") {
    import spark.implicits._
    def mixD(s: Long, j: Int): Double = {
      var z = s * 64 + j + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      ((z ^ (z >>> 31)) >>> 11).toDouble / (1L << 53) - 0.5
    }
    val df = (0L until 120L).map { i =>
      (i, Array.tabulate(64)(j => mixD(i, j).toFloat))
    }.toDF("vec_id", "embedding")
    val qs = df.filter($"vec_id" < 6)
    for ((name, graded, index) <- Seq(
      ("pq", Similarity.pqRecallAtK(df, qs, 3),
        Similarity.pqTopK(df, qs, 3)),
      ("ivfpq", Similarity.ivfPqRecallAtK(df, qs, 3),
        Similarity.ivfPqTopK(df, qs, 3)))) {
      val got = graded.collect()
        .map(r => r.getAs[Long]("query_id") ->
          (r.getAs[Long]("k_eval"), r.getAs[Long]("n_hits"),
            r.getAs[Double]("recall"))).toMap
      assert(got.keySet == (0L until 6L).toSet, s"$name: a row per probe")
      assert(got.values.forall { case (k, h, r) =>
        k == 3L && h <= k && r >= 0.0 && r <= 1.0 }, s"$name: bounds")
      // the metric is the intersect ratio whatever the index is
      val hand = Similarity.cosineTopK(df, qs, 3)
        .select("query_id", "neighbor_id")
        .intersect(index.select("query_id", "neighbor_id"))
        .groupBy("query_id").count().collect()
        .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("count"))
        .toMap
      got.foreach { case (q, (k, h, r)) =>
        assert(h == hand.getOrElse(q, 0L), s"$name probe $q hit count")
        // the operator reports on the 4-decimal grid (k=3 → 1/3)
        val want = BigDecimal(h.toDouble / k)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r == want, s"$name probe $q ratio: $r vs $want")
      }
    }
  }

  test("multi-iteration Lloyd: quantization SSE non-increasing per " +
    "pass with strict gains, PQ recall improves, nothing stays cached") {
    import spark.implicits._
    def mixD(sd: Long, j: Int): Double = {
      var z = sd * 64 + j + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      ((z ^ (z >>> 31)) >>> 11).toDouble / (1L << 53) - 0.5
    }
    val df = (0L until 120L).map { i =>
      (i, Array.tabulate(64)(j => mixD(i, j).toFloat))
    }.toDF("vec_id", "embedding")
    val vecs = df.collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    // plain-Scala fresh-assignment SSE of a trained codebook: per
    // subspace, min over cells of the exact squared L2 — the quantity
    // each Lloyd pass is guaranteed not to increase (up to the
    // operator's 4-decimal assignment rounding, hence the tolerance)
    def sse(iters: Int): Double = {
      val model = Similarity.pqCodebook(df, iters = iters)
      val bySub = model.toSeq.groupBy(_._1._1)
      vecs.map { v =>
        (0 until 8).map { sub =>
          val sv = v.slice(sub * 8, sub * 8 + 8)
          bySub(sub).map { case (_, c) =>
            sv.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
          }.min
        }.sum
      }.sum
    }
    val errs = Seq(1, 2, 3, 5).map(sse)
    errs.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-2, s"SSE increased across a Lloyd pass: $errs")
    }
    assert(errs(2) < errs.head * 0.95,
      s"no real convergence gain by iters=3: $errs")
    // the gain reaches the served metric: s06-graded recall at a
    // converged codebook beats the single-pass one on this corpus
    val qs = df.filter($"vec_id" < 12)
    def meanRecall(iters: Int): Double =
      Similarity.pqRecallAtK(df, qs, 5, iters = iters)
        .agg(avg(col("recall"))).head.getDouble(0)
    val (r1, r10) = (meanRecall(1), meanRecall(10))
    assert(r10 > r1, s"recall did not improve with training: $r1 -> $r10")
    // the ADVICE leak pin: training caches are dropped before the
    // lazy plan returns, so repeated invocations (bench sweeps)
    // accumulate nothing in the cache manager
    val before = spark.sparkContext.getPersistentRDDs.size
    Similarity.pqTopK(df, qs, 3, iters = 2).collect()
    Similarity.ivfPqTopK(df, qs, 3, iters = 2).collect()
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "PQ/IVF-PQ invocations must not leave cached intermediates")
  }

  test("ANN candidate generation is selective (not a cross join)") {
    // count candidate pairs before re-rank: must be far below Q*N
    val e = Similarity.withNorm(emb).select(col("vec_id"), col("emb"))
    val n = emb.count()
    val q = 10L
    val ann = Similarity.annTopK(emb, queries, Int.MaxValue)
    assert(ann.count() < q * n / 2, "LSH bucketing isn't pruning pairs")
  }

  test("IVF ANN recall on planted near-neighbors") {
    import spark.implicits._
    def mixD(s: Long, j: Int): Double = {
      var z = s * 64 + j + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      ((z ^ (z >>> 31)) >>> 11).toDouble / (1L << 53) - 0.5
    }
    val base = (0L until 200L).map { i =>
      (i, Array.tabulate(64)(j => mixD(i, j).toFloat))
    }
    val planted = base.flatMap { case (i, v) =>
      Seq((i, v)) ++ Seq(1, 2).map { c =>
        (1000L * c + i,
          v.zipWithIndex.map { case (x, j) =>
            x + 0.08f * mixD(i * 7919 + c, j).toFloat })
      }
    }
    val df = planted.toDF("vec_id", "embedding")
    val qs = df.filter($"vec_id" < 10)
    val truth = Similarity.cosineTopK(df, qs, 2)
      .select("query_id", "neighbor_id")
    val ivf = Similarity.ivfTopK(df, qs, 2, nlist = 16, nprobe = 4)
      .select("query_id", "neighbor_id")
    val recall = truth.intersect(ivf).count().toDouble / truth.count()
    // perturbed copies land in the same (or a probed) coarse cell
    assert(recall >= 0.9, s"IVF recall $recall < 0.9 on planted pairs")
  }

  test("IVF probes a fraction of the corpus (selectivity)") {
    val ivfAll = Similarity.ivfTopK(emb, queries, Int.MaxValue,
      nlist = 16, nprobe = 4)
    val n = emb.count()
    // nprobe/nlist = 1/4 of cells probed → well under half the corpus
    assert(ivfAll.count() < 10 * n / 2, "IVF probing isn't pruning")
  }

  test("LSH near-dup pairs: recall 1.0 on planted dups, precision 1.0 always") {
    // planted triplets (i, 1000+i, 2000+i) sit at cosine ≈ 0.997 —
    // true near-dups; isotropic non-pairs top out near 0.35, so at
    // threshold 0.9 ground truth is exactly the 3 pairs per triplet.
    import spark.implicits._
    def mixD(s: Long, j: Int): Double = {
      var z = s * 64 + j + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      ((z ^ (z >>> 31)) >>> 11).toDouble / (1L << 53) - 0.5
    }
    val base = (0L until 200L).map { i =>
      (i, Array.tabulate(64)(j => mixD(i, j).toFloat))
    }
    val planted = base.flatMap { case (i, v) =>
      Seq((i, v)) ++ Seq(1, 2).map { c =>
        (1000L * c + i,
          v.zipWithIndex.map { case (x, j) =>
            x + 0.08f * mixD(i * 7919 + c, j).toFloat })
      }
    }
    val df = planted.toDF("vec_id", "embedding")
    val truth = Similarity.cosineDupPairs(df, 0.9)
      .select("vec_a", "vec_b")
    val lsh = Similarity.cosineDupPairsLsh(df, 0.9)
      .select("vec_a", "vec_b")
    assert(truth.count() == 600L, "expected 3 pairs per planted triplet")
    assert(lsh.except(truth).isEmpty,
      "LSH near-dup emitted a pair brute force rejects (precision < 1)")
    assert(truth.except(lsh).isEmpty,
      "banding missed a true near-dup pair (recall < 1)")
  }

  test("autoBits: constant occupancy, floor 6, cap 20, exact power " +
    "boundaries") {
    // groups = ceil(n/32); bits = bit length of groups-1, clamped
    assert(Similarity.autoBits(0) == 6 && Similarity.autoBits(1) == 6)
    assert(Similarity.autoBits(500) == 6)   // sf0.01 contract: unchanged
    assert(Similarity.autoBits(2048) == 6)  // groups=64 exactly -> 6
    assert(Similarity.autoBits(2080) == 7)  // groups=65 -> 7
    assert(Similarity.autoBits(20000) == 10)
    assert(Similarity.autoBits(Long.MaxValue) == 20)
    // occupancy 2^bits covers groups: 2^autoBits(n) >= ceil(n/32)
    for (n <- Seq(100L, 999L, 4097L, 123457L, 10000000L))
      assert((1L << Similarity.autoBits(n)) >= (n + 31) / 32 ||
        Similarity.autoBits(n) == 20)
  }

  test("LSH near-dup pairs are a subset of brute force on the corpus") {
    // exact verification makes precision 1.0 by construction, at any
    // threshold, even where banding recall is partial (isotropic data)
    val brute = Similarity.cosineDupPairs(emb, 0.4).select("vec_a", "vec_b")
    val lsh = Similarity.cosineDupPairsLsh(emb, 0.4).select("vec_a", "vec_b")
    assert(lsh.except(brute).isEmpty)
  }


  test("semDedup drops planted near-dups, keeps min-id survivors") {
    // identical copies (cosine = 1.0) land in the same cluster by
    // construction (same embedding → same argmax centroid), so every
    // copy with a larger id MUST be dropped; its base must survive
    // unless the base itself has a smaller-id near-dup.
    import spark.implicits._
    val base = emb.select($"vec_id".cast("long"), $"embedding")
      .as[(Long, Array[Float])].collect().toSeq
    val copies = base.filter(_._1 % 7 == 0)
      .map { case (i, v) => (100000L + i, v) }
    val df = (base ++ copies).toDF("vec_id", "embedding")
    val kept = Similarity.semDedup(df, 0.95)
      .select("vec_id").as[Long].collect().toSet
    assert(copies.forall { case (cid, _) => !kept.contains(cid) },
      "an identical larger-id copy survived semDedup")
    // at 0.95 the isotropic base corpus has no true near-dups, so all
    // original ids survive
    assert(base.forall { case (i, _) => kept.contains(i) },
      "a base vector with no smaller-id near-dup was dropped")
  }

  test("semDedup survivor rule matches the per-cluster brute-force rule") {
    import spark.implicits._
    val assignedKept = Similarity.semDedup(emb, 0.3)
      .select("vec_id").as[Long].collect().toSet
    // recompute the rule from first principles: pairwise cosine on the
    // driver, restricted to same-cluster pairs
    val e = emb.select($"vec_id".cast("long"), $"embedding")
      .as[(Long, Array[Float])].collect()
      .map { case (i, v) => (i, v.map(_.toDouble)) }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d, na, nb = 0.0
      var j = 0
      while (j < a.length) { d += a(j)*b(j); na += a(j)*a(j); nb += b(j)*b(j); j += 1 }
      // HALF_UP to match Spark's round()
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val nlist = 16
    val cents = e.sortBy { case (i, _) => (Similarity.centroidKey(i), i) }
      .take(nlist)
    val cluster = e.map { case (i, v) =>
      i -> cents.map { case (cid, cv) => (cid, cos(v, cv)) }
        .maxBy { case (cid, s) => (s, -cid) }._1
    }.toMap
    val expectKept = e.collect { case (i, v)
      if !e.exists { case (j, w) =>
        j < i && cluster(j) == cluster(i) && cos(v, w) >= 0.3 } => i
    }.toSet
    assert(assignedKept == expectKept,
      s"semDedup diverges from brute-force rule: " +
        s"extra=${(assignedKept -- expectKept).take(5)} " +
        s"missing=${(expectKept -- assignedKept).take(5)}")
  }

  test("hardNegatives: positive class excluded even when it holds the " +
    "nearest vector; ranks = cosineTopK over the other-label corpus") {
    import spark.implicits._
    // planted geometry around query 0 (label 0, along e1):
    //   id 1 label 0 — nearest overall (cos≈0.995) but POSITIVE class
    //   id 2 label 1 — nearest admissible (cos≈0.95)      → rank 1
    //   id 3 label 2 — orthogonal (cos 0)                 → rank 2
    //   id 4 label 1 — antipodal (cos −1)                 → k=2 cuts
    val df = Seq(
      (0L, 0, Array(1f, 0f, 0f, 0f)),
      (1L, 0, Array(0.99f, 0.1f, 0f, 0f)),
      (2L, 1, Array(0.9f, 0.3f, 0f, 0f)),
      (3L, 2, Array(0f, 1f, 0f, 0f)),
      (4L, 1, Array(-1f, 0f, 0f, 0f)))
      .toDF("vec_id", "label", "embedding")
    val qs = df.filter($"vec_id" === 0L)
    val got = Similarity.hardNegatives(df, qs, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toList
      .sortBy(_._3)
    assert(got == List((0L, 2L, 1), (0L, 3L, 2)),
      s"wrong negatives: $got")
    // the mined set IS exact top-k over the label-excluded corpus
    val twin = Similarity.cosineTopK(df.filter($"label" =!= 0), qs, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      .toList.sortBy(_._3)
    assert(got == twin, "diverged from the filtered cosineTopK twin")
    // on the corpus table: never self, never same-label
    val mined = Similarity.hardNegatives(emb, queries, 3)
      .join(emb.select($"vec_id", $"label".as("n_label")),
        col("negative_id") === col("vec_id"))
      .join(emb.select($"vec_id".as("query_id"), $"label".as("q_label")),
        "query_id")
    assert(mined.filter($"negative_id" === $"query_id" ||
      $"n_label" === $"q_label").isEmpty,
      "a positive-class vector leaked into the negatives")
  }

  test("top-k ranking is deterministic across runs") {
    val a = Similarity.cosineTopK(emb, queries, 3).collect().toSeq
    val b = Similarity.cosineTopK(emb, queries, 3).collect().toSeq
    assert(a.sortBy(_.getLong(0)).map(_.toString) ==
      b.sortBy(_.getLong(0)).map(_.toString))
  }

  test("HLL NDV within configured error of exact (integrity metrics)") {
    val li = Tables.lineitem(spark, sf0001)
    val exact = li.agg(countDistinct(col("l_orderkey"))).first().getLong(0)
    val est = li.agg(approx_count_distinct(col("l_orderkey"), 0.02))
      .first().getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.1,
      s"HLL est $est vs exact $exact")
  }

  test("multimodal pipeline: binary payload survives the typed boundary") {
    val docs = Tables.documents(spark, sf0001)
    val feats = Multimodal.extractFeatures(spark, Multimodal.asAssets(docs))
    // digest computed from bytes inside mapPartitions == column md5(text)
    val viaSql = docs.select(col("doc_id"), md5(col("text")).as("digest"))
    val mismatch = feats.toDF().select("doc_id", "digest")
      .except(viaSql)
    assert(mismatch.isEmpty)
    // stub features are pure functions of byte length
    val bad = feats.filter(f =>
      f.width != (64 + f.n_bytes % 960).toInt ||
        f.height != (64 + (f.n_bytes * 31) % 960).toInt)
    assert(bad.isEmpty)
  }

  test("phash pairs find planted same-length edits and nothing random") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
      .filter(length(col("text")) > 130) // one chunk ≥ 2 bytes
      .limit(50)
    // same-length tail edit: only the last chunk's sum moves, so the
    // fingerprint stays within a couple of bits (dHash locality)
    val near = docs.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(expr("substring(text, 1, length(text) - 1)"), lit("Z"))
        .as("text"))
    val assets = Multimodal.asAssets(docs.unionByName(near))
    val pairs = Multimodal.phashPairs(spark, assets, maxDist = 3)
      .collect()
    val planted = pairs.filter(p => p.doc_b - p.doc_a == 1000000L)
    val nDocs = docs.count()
    assert(planted.length >= nDocs * 0.9,
      s"found ${planted.length} of $nDocs planted near-dups")
    assert(planted.forall(_.hamming <= 3))
  }

  test("phash banding is exact: equals brute force at hamming <= 3") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
      .limit(120)
    val assets = Multimodal.asAssets(docs)
    val banded = Multimodal.phashPairs(spark, assets, maxDist = 3)
      .collect().map(p => (p.doc_a, p.doc_b)).toSet
    val fps = assets.collect().map(r => r.getLong(0) ->
      Multimodal.pHashStub(r.getAs[Array[Byte]]("payload")))
    val brute = (for {
      (ida, fa) <- fps; (idb, fb) <- fps
      if ida < idb && java.lang.Long.bitCount(fa ^ fb) <= 3
    } yield (ida, idb)).toSet
    assert(banded == brute, s"banded=${banded.size} brute=${brute.size}")
  }

  test("real image payloads decode genuinely: pixel dims, pixel resize, " +
    "re-encoding-invariant dHash") {
    import spark.implicits._
    def img(w: Int, h: Int): java.awt.image.BufferedImage = {
      val i = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h)
        i.setRGB(x, y, (x * 255 / w) << 16 | (y * 255 / h) << 8)
      i
    }
    def enc(i: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(i, fmt, bos)
      bos.toByteArray
    }
    val text = "not an image, just bytes".getBytes("UTF-8")
    val assets = Seq(
      Multimodal.MediaAsset(1L, "image/png", enc(img(13, 7), "png")),
      Multimodal.MediaAsset(2L, "image/bmp", enc(img(32, 16), "bmp")),
      Multimodal.MediaAsset(3L, "application/octet-stream", text)).toDS()
      .toDF()
    val feats = Multimodal.extractFeatures(spark, assets).collect()
      .map(f => f.doc_id -> f).toMap
    // genuine decoded dimensions, not byte-derived ones
    assert(feats(1L).width == 13 && feats(1L).height == 7, s"${feats(1L)}")
    assert(feats(2L).width == 32 && feats(2L).height == 16, s"${feats(2L)}")
    // opaque payloads keep the deterministic byte-derived fallback
    assert(feats(3L).width == (64 + text.length % 960), s"${feats(3L)}")
    // resize genuinely rescales: the output IS an image of target dims
    val resized = Multimodal.resizeBytes(enc(img(64, 48), "png"), 224, 224)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized))
    assert(back != null && back.getWidth == 224 && back.getHeight == 224,
      "resized payload is not a decodable 224x224 image")
    // dHash is a function of PIXELS: lossless re-encode (png vs bmp of
    // the same pixels) hashes identically; the gradient and its
    // transpose-ish inverse differ in many bits
    val hPng = Multimodal.pHash(enc(img(40, 30), "png"))
    val hBmp = Multimodal.pHash(enc(img(40, 30), "bmp"))
    assert(hPng == hBmp, "dHash must see pixels, not encoded bytes")
    val flipped = {
      val i = img(40, 30)
      val j = new java.awt.image.BufferedImage(40, 30,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 40; y <- 0 until 30)
        j.setRGB(39 - x, y, i.getRGB(x, y))
      enc(j, "png")
    }
    assert(java.lang.Long.bitCount(hPng ^ Multimodal.pHash(flipped)) > 16,
      "mirrored image should be far in dHash space")
    // a small local edit stays near: overwrite one 4x4 corner block
    val edited = {
      val i = img(40, 30)
      for (x <- 0 until 4; y <- 0 until 4) i.setRGB(x, y, 0xffffff)
      enc(i, "png")
    }
    assert(java.lang.Long.bitCount(hPng ^ Multimodal.pHash(edited)) <= 6,
      "local edit should stay within a few dHash bits")
  }

  test("real audio payloads decode genuinely: WAV/AIFF rate, channels, " +
    "duration, PCM-frame-aligned sampling") {
    import spark.implicits._
    def pcmBytes(nFrames: Int, frameSize: Int): Array[Byte] =
      Array.tabulate(nFrames * frameSize)(i => (i * 31 % 251).toByte)
    def enc(tpe: javax.sound.sampled.AudioFileFormat.Type, rate: Float,
            bits: Int, channels: Int, nFrames: Int,
            bigEndian: Boolean): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(rate, bits, channels,
        true, bigEndian)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcmBytes(nFrames, fmt.getFrameSize)),
        fmt, nFrames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais, tpe, bos)
      bos.toByteArray
    }
    import javax.sound.sampled.AudioFileFormat.Type.{AIFF, WAVE}
    val assets = Seq(
      Multimodal.MediaAsset(1L, "audio/wav",
        enc(WAVE, 8000f, 16, 2, 1024, bigEndian = false)),
      Multimodal.MediaAsset(2L, "audio/aiff",
        enc(AIFF, 44100f, 16, 1, 4410, bigEndian = true)),
      Multimodal.MediaAsset(3L, "audio/wav", // odd frame size: 24-bit mono
        enc(WAVE, 16000f, 24, 1, 300, bigEndian = false)),
      Multimodal.MediaAsset(4L, "application/octet-stream",
        "not audio".getBytes("UTF-8"))).toDS().toDF()
    val feats = Multimodal.extractFeatures(spark, assets).collect()
      .map(f => f.doc_id -> f).toMap
    // genuine container-header facts, not byte-derived stand-ins
    assert(feats(1L).sample_rate == 8000 && feats(1L).n_channels == 2 &&
      feats(1L).n_frames == 1024 &&
      feats(1L).duration_ms == 1024L * 1000 / 8000, s"${feats(1L)}")
    assert(feats(2L).sample_rate == 44100 && feats(2L).n_channels == 1 &&
      feats(2L).n_frames == 4410 && feats(2L).duration_ms == 100L,
      s"${feats(2L)}")
    assert(feats(3L).sample_rate == 16000 && feats(3L).n_frames == 300,
      s"${feats(3L)}")
    // audio has no pixel dims; opaque payloads keep the old fallback
    assert(feats(1L).width == 0 && feats(1L).height == 0)
    assert(feats(4L).sample_rate == 0 && feats(4L).n_frames == 1 &&
      feats(4L).width == (64 + 9 % 960))

    // fail-soft: corrupt bytes behind a valid RIFF/WAVE magic fall
    // back to byte-derived features instead of poisoning the partition
    val corrupt = "RIFF    WAVEgarbage-not-a-header"
      .getBytes("ISO-8859-1")
    assert(Multimodal.looksLikeAudio(corrupt))
    val cf = Multimodal.extractFeatures(spark,
      Seq(Multimodal.MediaAsset(9L, "audio/wav", corrupt)).toDS().toDF())
      .collect().head
    assert(cf.sample_rate == 0 && cf.width == (64 + corrupt.length % 960),
      s"corrupt audio must fall back, got $cf")

    // frame sampling splits the DECODED PCM at true frame boundaries:
    // 16-bit stereo → frameSize 4, so 64-byte chunks hold exactly 16
    // PCM frames; 1024 frames → 64 chunks, every 4th kept → 16 rows
    val stereo = Multimodal.sampleFrames(spark,
      assets.filter($"doc_id" === 1L)).collect().sortBy(_.frame_idx)
    assert(stereo.length == 16, s"${stereo.length}")
    assert(stereo.forall(_.n_frame_bytes == 64))
    // digest of chunk 0 == md5 of the first 64 PCM bytes — the WAV
    // container header must NOT leak into frame data
    val md = java.security.MessageDigest.getInstance("MD5")
    val exp = md.digest(pcmBytes(1024, 4).take(64))
      .map("%02x".format(_)).mkString
    assert(stereo.head.frame_digest == exp, "frame 0 is not pure PCM")
    // 24-bit mono → frameSize 3: chunks shrink to 63 bytes (21 frames)
    // so no chunk ever bisects a sample; 900 PCM bytes → 15 chunks,
    // idx 0,4,8,12 kept
    val mono24 = Multimodal.sampleFrames(spark,
      assets.filter($"doc_id" === 3L)).collect().sortBy(_.frame_idx)
    assert(mono24.map(_.frame_idx).toSeq == Seq(0, 4, 8, 12), s"${mono24.toSeq}")
    assert(mono24.take(3).forall(_.n_frame_bytes == 63))
  }

  test("asWavAssets: the JDK-written container round-trips through the " +
    "real decoder with exact header facts; magic damage goes opaque") {
    import spark.implicits._
    val docs = Seq((1L, "hello wav"), (2L, "x" * 8000), (3L, "ab"))
      .toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.asWavAssets(spark, docs)).collect()
      .map(f => f.doc_id -> f).toMap
    for ((id, n) <- Seq(1L -> 9, 2L -> 8000, 3L -> 2)) {
      val f = feats(id)
      assert(f.sample_rate == 8000 && f.n_channels == 1 &&
        f.n_frames == n && f.n_bytes == n + 44 &&
        f.duration_ms == n * 1000L / 8000,
        s"doc $id decoded wrong: $f")
    }
    // a one-second clip really reports one second
    assert(feats(2L).duration_ms == 1000L)
    // the decode is container-parsing, not arithmetic: breaking the
    // RIFF magic makes the same bytes opaque (rate 0), it doesn't
    // "remember" the synth parameters
    val wav = Multimodal.wavBytes("hello wav".getBytes("UTF-8"), 8000)
    val broken = wav.clone(); broken(0) = 'X'.toByte
    val d = Multimodal.decode(broken)
    assert(d._4 == 0, s"corrupt magic still decoded as audio: $d")
    assert(Multimodal.decode(wav)._4 == 8000)
  }

  test("asBmpAssets: the JDK-written BMP round-trips through the real " +
    "ImageIO decoder with exact dims and the 24-bit size contract") {
    import spark.implicits._
    val docs = Seq((1L, "ab"), (2L, "x" * 29), (3L, "y" * 100))
      .toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.asBmpAssets(spark, docs)).collect()
      .map(f => f.doc_id -> f).toMap
    for ((id, n) <- Seq(1L -> 2, 2L -> 29, 3L -> 100)) {
      val (w, h) = (4 + n % 29, 3 + (7 * n) % 23)
      val f = feats(id)
      assert(f.width == w && f.height == h && f.n_frames == 1 &&
        f.n_bytes == 54L + h * ((3 * w + 3) / 4 * 4),
        s"doc $id (n=$n, expect ${w}x$h): $f")
    }
    // dimension wraparound: n=29 maps to the minimum width again
    assert(feats(2L).width == 4)
  }

  test("audio pHash sees samples, not containers: WAV == AIFF, edits local") {
    def pcm(n: Int, fs: Int, f: Int => Int): Array[Byte] =
      Array.tabulate(n * fs)(i => f(i).toByte)
    def enc(tpe: javax.sound.sampled.AudioFileFormat.Type, bytes: Array[Byte],
            channels: Int, bigEndian: Boolean): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, channels,
        true, bigEndian)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt,
        bytes.length / fmt.getFrameSize)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais, tpe, bos)
      bos.toByteArray
    }
    import javax.sound.sampled.AudioFileFormat.Type.{AIFF, WAVE}
    // WAV stores the samples little-endian, AIFF big-endian. The
    // fingerprint must depend on the SAMPLES, so encode the same
    // stereo signal both ways — with the sample bytes swapped to
    // match each container's native order — and demand equality.
    val n = 2048
    val le = pcm(n, 4, i => (i * 31) % 251)
    val be = {
      val b = le.clone()
      var i = 0
      while (i < b.length) { // swap each 16-bit sample's bytes
        val t = b(i); b(i) = b(i + 1); b(i + 1) = t; i += 2
      }
      b
    }
    val hWav = Multimodal.pHash(enc(WAVE, le, 2, bigEndian = false))
    val hAiff = Multimodal.pHash(enc(AIFF, be, 2, bigEndian = true))
    assert(hWav == hAiff,
      "audio pHash must fingerprint PCM samples, not container bytes")
    // a tail edit moves only the final chunks' sums → a few bits
    val edited = le.clone()
    for (i <- (edited.length - 16) until edited.length) edited(i) = 0
    val hEdit = Multimodal.pHash(enc(WAVE, edited, 2, bigEndian = false))
    assert(java.lang.Long.bitCount(hWav ^ hEdit) <= 3,
      "local audio edit should stay within a few fingerprint bits")
    // structurally different audio lands far away (a rising step
    // envelope vs the flat noise ramp — flat-vs-flat signals can
    // legitimately share many envelope bits, so the contrast case
    // must differ in STRUCTURE, not just in sample values)
    val other = pcm(n, 4, i => if (i < n * 2) (i % 7) else 180 + (i % 13))
    val hOther = Multimodal.pHash(enc(WAVE, other, 2, bigEndian = false))
    assert(java.lang.Long.bitCount(hWav ^ hOther) > 16,
      "unrelated audio should be far in fingerprint space")
  }

  test("animated GIF demuxes for real: true frame count in features, " +
    "frame sampling at real frame boundaries") {
    import spark.implicits._
    // 5 solid-color 16x16 frames, colors far enough apart to survive
    // GIF palette quantization distinctly
    val frames = (0 until 5).map { i =>
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(i * 40, 255 - i * 40, 128))
      g.fillRect(0, 0, 16, 16); g.dispose(); img
    }
    val bos = new java.io.ByteArrayOutputStream()
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach(f => writer.writeToSequence(
      new javax.imageio.IIOImage(f, null, null), null))
    writer.endWriteSequence(); ios.close(); writer.dispose()
    val gif = bos.toByteArray

    // decode() reports the REAL frame count (and real pixel dims)
    val (w, h, n, _, _, _) = Multimodal.decode(gif)
    assert((w, h, n) == (16, 16, 5), s"decode said ($w,$h,$n)")

    // sampling every 2nd REAL frame: indices 0,2,4; each digest is over
    // the frame's decoded pixels (w*h*4 bytes), distinct per color
    val assets = Seq(Multimodal.MediaAsset(1L, "image/gif", gif)).toDS()
      .toDF()
    val fs = Multimodal.sampleFrames(spark, assets, sampleEvery = 2)
      .collect().sortBy(_.frame_idx)
    assert(fs.map(_.frame_idx).toSeq == Seq(0, 2, 4), fs.mkString(","))
    assert(fs.forall(_.n_frame_bytes == 16L * 16 * 4))
    assert(fs.map(_.frame_digest).distinct.length == 3,
      "distinct solid-color frames must digest distinctly")

    // a single-frame (static) GIF stays a 1-frame stream
    val bos1 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(frames.head, "gif", bos1)
    val (_, _, n1, _, _, _) = Multimodal.decode(bos1.toByteArray)
    assert(n1 == 1)
  }

  test("AVI video demuxes for real: RIFF chunk walk finds true frame " +
    "boundaries, MJPEG frames decode to pixels, header facts surface") {
    import spark.implicits._
    // synthesize an MJPEG-in-AVI: RIFF('AVI ') { LIST(hdrl){avih},
    // LIST(movi){ '00dc' JPEG-frame ... } } — the canonical container
    // layout, 6 distinct-color 16x16 JPEG frames at 25 fps
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      id.getBytes("US-ASCII") ++ le32(data.length.toLong) ++ data ++ pad
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ body)
    val jpegs = (0 until 6).map { i =>
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(i * 40, 255 - i * 40, 60))
      g.fillRect(0, 0, 16, 16); g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val avih = le32(40000L) ++ le32(0L) ++ le32(0L) ++ le32(0L) ++
      le32(jpegs.length.toLong) ++ le32(0L) ++ le32(1L) ++ le32(0L) ++
      le32(16L) ++ le32(16L) ++ Array.fill(16)(0.toByte)
    val body = list("hdrl", chunk("avih", avih)) ++
      list("movi", jpegs.map(j => chunk("00dc", j)).reduce(_ ++ _))
    val avi = "RIFF".getBytes("US-ASCII") ++
      le32(4L + body.length) ++ "AVI ".getBytes("US-ASCII") ++ body

    // decode() reports container facts: header dims, real frame
    // count from the chunk walk, duration = n * usPerFrame
    val (w, h, n, sr, ch, ms) = Multimodal.decode(avi)
    assert((w, h, n, sr, ch, ms) == (16, 16, 6, 0, 0, 240L),
      s"decode said ($w,$h,$n,$sr,$ch,$ms)")

    // sampling every 2nd REAL frame: indices 0,2,4; MJPEG frames are
    // plain JPEGs, so digests are over DECODED PIXELS (w*h*4 bytes) —
    // re-encoding invariant, distinct per color, no header bytes leak
    val assets = Seq(Multimodal.MediaAsset(7L, "video/avi", avi)).toDS()
      .toDF()
    val fs = Multimodal.sampleFrames(spark, assets, sampleEvery = 2)
      .collect().sortBy(_.frame_idx)
    assert(fs.map(_.frame_idx).toSeq == Seq(0, 2, 4), fs.mkString(","))
    assert(fs.forall(_.n_frame_bytes == 16L * 16 * 4),
      "MJPEG frame digests must cover decoded pixels, not stored bytes")
    assert(fs.map(_.frame_digest).distinct.length == 3,
      "distinct solid-color frames must digest distinctly")
    // digest parity with a direct decode of the stored JPEG — the
    // demuxed chunk IS the stored frame payload
    val direct = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpegs(2)))
    val pxDirect = {
      val out = java.nio.ByteBuffer.allocate(16 * 16 * 4)
      for (y <- 0 until 16; x <- 0 until 16) out.putInt(direct.getRGB(x, y))
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(out.array()).map("%02x".format(_)).mkString
    }
    assert(fs.find(_.frame_idx == 2).get.frame_digest == pxDirect,
      "frame 2's digest must equal the direct decode of its stored JPEG")

    // a truncated AVI (frame chunk size past the buffer) fails soft:
    // no exception, falls back to the opaque byte-stride path
    val truncated = avi.take(avi.length - jpegs.last.length / 2)
    val (_, _, nT, _, _, _) = Multimodal.decode(truncated)
    assert(nT >= 1) // stub or partial — never a crash
  }

  test("multimodal resize bounds output size and is deterministic") {
    val docs = Tables.documents(spark, sf0001)
    val assets = Multimodal.asAssets(docs)
    val r1 = Multimodal.resize(spark, assets).collect()
      .map(r => r.doc_id -> r).toMap
    // output size = min(input, 224*224/64) exactly; never larger than input
    assert(r1.values.forall(r =>
      r.n_bytes_out == math.min(r.n_bytes_in, 224L * 224 / 64)))
    // deterministic under repartitioning (digest included)
    val r2 = Multimodal.resize(spark, assets.repartition(7)).collect()
      .map(r => r.doc_id -> r).toMap
    assert(r1 == r2)
  }
  test("cluster-balanced sample: dominant cluster capped, small one " +
    "kept whole, reshuffle-stable, no Window, kmeans leaves no cache") {
    import spark.implicits._
    // two orthogonal blobs, one 5x the other — the semantic-skew shape
    val mk = (ids: Range, dim: Int) => ids.map { i =>
      val v = Array.fill(64)(0.001f * (i % 7))
      v(dim) = 1.0f
      (i.toLong, v)
    }
    val df = (mk(0 until 100, 0) ++ mk(1000 until 1020, 40))
      .toDF("vec_id", "embedding")
    val before = spark.sparkContext.getPersistentRDDs.size
    val got = Similarity.clusterBalancedSample(df, k = 4, cap = 8)
    assert(!got.queryExecution.executedPlan.toString.contains("Window"),
      "cluster cap planned a Window — the skew-safe contract is broken")
    val rows = got.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "kmeansClusters left cached intermediates behind")
    val byCluster = rows.groupBy(_._2)
    assert(byCluster.values.forall(_.length <= 8), "cap exceeded")
    // truth assignment from the oracle-checked operator: every cluster
    // with >= cap members is fully used; smaller ones kept whole
    val sizes = Similarity.kmeansClusters(df, k = 4)
      .groupBy("cluster_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byCluster.foreach { case (c, picked) =>
      assert(picked.length == math.min(8L, sizes(c)),
        s"cluster $c: picked ${picked.length} of ${sizes(c)}")
    }
    // the small blob's cluster(s) survive the cap intact
    val smallIds = rows.filter(_._1 >= 1000L).map(_._1).toSet
    assert(smallIds.size >= 8,
      s"minority topic underrepresented: $smallIds")
    // deterministic hash order: a reshuffled input picks the SAME rows
    val again = Similarity.clusterBalancedSample(df.repartition(7),
      k = 4, cap = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == rows.toSet, "picks must not depend on partitioning")
  }

  test("kmeans separates two orthogonal blobs and is partition-invariant") {
    import spark.implicits._
    // choose blob membership AFTER the init ranking: the two smallest
    // mod-prime keys among ids 1..40 become the seeds, one per blob,
    // so two Lloyd iterations must separate the blobs exactly
    val ids = (1L to 40L)
    val ranked = ids.sortBy(id => (Similarity.centroidKey(id), id))
    val (seedA, seedB) = (ranked(0), ranked(1))
    def blobA(id: Long) = id == seedA || (id != seedB && id % 2 == 0)
    def vecOf(id: Long): Seq[Float] = {
      val v = Array.fill(8)(0.001f * (id % 7).toInt)
      if (blobA(id)) v(0) = 1f else v(4) = 1f
      v.toSeq
    }
    val emb = ids.map(id => (id, vecOf(id), "b")).toDF("vec_id", "embedding", "label")
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.kmeansClusters(df, k = 2, iters = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val out = run(emb)
    assert(out.size == 40, "every vector assigned exactly once")
    val byCluster = out.groupBy(_._2)
    assert(byCluster.keySet == Set(seedA, seedB),
      s"cluster ids must be the seed ids, got ${byCluster.keySet}")
    ids.foreach { id =>
      val cl = out.find(_._1 == id).get._2
      assert(cl == (if (blobA(id)) seedA else seedB),
        s"vec $id landed in cluster $cl")
    }
    // near-axis blobs: final similarity to the blob mean stays high
    assert(out.forall(_._3 > 0.9))
    assert(out == run(emb.repartition(7)), "partition invariance")
  }

  test("IVF recall improves with a trained coarse quantizer at fixed " +
    "nprobe") {
    import spark.implicits._
    // adversarial seeding: blob membership is chosen AFTER the
    // mod-prime ranking so BOTH untrained seeds land in blob A — the
    // untrained quantizer then has two near-identical A-cells, and
    // blob B's vectors split between them on wobble-noise cosine
    // differences, so an nprobe=1 probe sees only part of its true
    // neighborhood. One Lloyd pass (coarseIters = 2, exactly s03/s08's
    // setting) pulls the means apart: the cell with the larger B mass
    // attracts ALL of B (|B| is odd, so the split is never even) and
    // recall recovers.
    val ids = (1L to 81L)
    val ranked = ids.sortBy(id => (Similarity.centroidKey(id), id))
    val seeds = ranked.take(2).toSet
    val probeIds = Set(3L, 4L, 5L, 6L, 7L)
    def inBlobA(id: Long): Boolean = seeds(id) || id % 2 == 0
    def vecOf(id: Long): Seq[Float] = {
      val v = Array.fill(8)(0f)
      if (inBlobA(id)) v(0) = 1f else v(4) = 1f
      // neighbor structure: three subgroups per blob — a probe's true
      // top-5 are its same-subgroup blob-mates
      v(if (inBlobA(id)) 1 else 5) = 0.1f * (id % 3).toInt
      // cell-splitting wobble on a SHARED axis, orthogonal to the
      // neighbor structure: the two seeds carry opposite large wobble,
      // every non-probe vector ±0.01 by (id/2)%2 — the untrained cell
      // choice is sign(w), cutting every subgroup in half. Probes
      // carry w = 0, so their EXACT top-5 ranking is blind to the
      // wobble while their own cell choice ties to one cell — the
      // nprobe=1 scan then sees only ~half the true neighborhood.
      v(2) =
        if (seeds(id)) { if (id == ranked(0)) 0.04f else -0.04f }
        else if (probeIds(id)) 0f
        else if ((id / 2) % 2 == 0) 0.01f
        else -0.01f
      v.toSeq
    }
    val emb = ids.map(id => (id, vecOf(id), "b"))
      .toDF("vec_id", "embedding", "label")
    val probes = emb.filter(col("vec_id").isin(3L, 5L, 7L, 4L, 6L))
    def avgRecall(coarseIters: Int): Double =
      Similarity.recallAtK(
        Similarity.cosineTopK(emb, probes, 5),
        Similarity.ivfTopK(emb, probes, 5, nlist = 2, nprobe = 1,
          coarseIters = coarseIters),
        probes.select(col("vec_id").as("query_id")))
        .agg(avg(col("recall"))).first().getDouble(0)
    val (untrained, trained) = (avgRecall(1), avgRecall(2))
    assert(untrained < 0.9,
      s"untrained baseline should miss neighbors, got $untrained")
    assert(trained > untrained,
      s"training must improve recall: $untrained -> $trained")
    assert(trained == 1.0,
      s"one Lloyd pass separates the blobs, got $trained")
  }

  test("PQ ADC ranks planted near-copies first and is partition-invariant") {
    import spark.implicits._
    def mixD(s: Long, j: Int): Double = {
      var z = s * 64 + j + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      ((z ^ (z >>> 31)) >>> 11).toDouble / (1L << 53) - 0.5
    }
    val base = (0L until 200L).map { i =>
      (i, Array.tabulate(64)(j => mixD(i, j).toFloat))
    }
    // planted twin at cosine ≈ 0.99: quantization noise (16 cells per
    // 8-dim subspace) is far smaller than the twin/stranger gap, so
    // ADC must put the twin at rank 1 for every probe
    val planted = base.flatMap { case (i, v) =>
      Seq((i, v)) ++ (if (i < 10)
        Seq((1000L + i, v.zipWithIndex.map { case (x, j) =>
          x + 0.02f * mixD(i * 7919 + 1, j).toFloat }))
      else Nil)
    }
    val df = planted.toDF("vec_id", "embedding")
    val qs = df.filter($"vec_id" < 10)
    def run(d: org.apache.spark.sql.DataFrame) =
      Similarity.pqTopK(d, qs, k = 3)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    val out = run(df)
    // contract shape: exactly k ranked rows per probe, ranks 1..k
    (0L until 10L).foreach { q =>
      val rows = out.filter(_._1 == q)
      assert(rows.map(_._4) == Set(1, 2, 3), s"probe $q ranks: $rows")
      val top = rows.find(_._4 == 1).get
      assert(top._2 == 1000L + q,
        s"probe $q rank-1 neighbor ${top._2}, expected planted twin")
    }
    assert(out == run(df.repartition(7)), "partition invariance")
  }

  test("PQ deployment encoder: in-row codes == distributed assignment") {
    val model = Similarity.pqCodebook(emb)
    assert(model.nonEmpty && model.size <= 8 * 16,
      s"model size ${model.size} out of bounds")
    assert(model.keys.map(_._1).toSet == (0 until 8).toSet,
      "every subspace must keep at least one cell")
    val inRow = Similarity.pqEncode(emb, model)
      .select(col("vec_id").cast("long"), col("codes"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val distributed = Similarity.pqCodesDistributed(emb)
      .groupBy(col("vec_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("cell")))),
        s => s.getField("cell")).as("codes"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(inRow.keySet == distributed.keySet)
    val diverged = inRow.keys.filter(k => inRow(k) != distributed(k))
    assert(diverged.isEmpty,
      s"codes diverged for vec_ids ${diverged.take(5).toList}")
    // and the encoder stays a narrow map: no exchange in its plan
    val plan = Similarity.pqEncode(emb, model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"pqEncode must plan no shuffle:\n$plan")
  }

  test("IVF-PQ ranks planted near-copies first; degenerates to PQ at " +
    "full probe width") {
    import spark.implicits._
    def mixD(s: Long, j: Int): Double = {
      var z = s * 64 + j + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      ((z ^ (z >>> 31)) >>> 11).toDouble / (1L << 53) - 0.5
    }
    val base = (0L until 200L).map { i =>
      (i, Array.tabulate(64)(j => mixD(i, j).toFloat))
    }
    val planted = base.flatMap { case (i, v) =>
      Seq((i, v)) ++ (if (i < 10)
        Seq((1000L + i, v.zipWithIndex.map { case (x, j) =>
          x + 0.02f * mixD(i * 7919 + 1, j).toFloat }))
      else Nil)
    }
    val df = planted.toDF("vec_id", "embedding")
    val qs = df.filter($"vec_id" < 10)
    val out = Similarity.ivfPqTopK(df, qs, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    // a twin at cosine ≈ 0.99 lands in the probe's own coarse cell and
    // survives residual quantization: rank 1 for every probe
    (0L until 10L).foreach { q =>
      val top = out.find(t => t._1 == q && t._3 == 1).get
      assert(top._2 == 1000L + q,
        s"probe $q rank-1 neighbor ${top._2}, expected planted twin")
    }
    // probing EVERY cell removes the coarse pruning: the ranking must
    // then agree with plain PQ on what the top neighbor is (residual
    // coding refines, never loses, the in-cell candidates)
    val full = Similarity.ivfPqTopK(df, qs, k = 1, nlist = 4, nprobe = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 10L).foreach { q =>
      assert(full(q) == 1000L + q, s"full-probe top for $q: ${full(q)}")
    }
  }

  test("PQ with seed-only corpus reproduces exact inner products") {
    import spark.implicits._
    // every vector is one of the ksub seeds → after one Lloyd pass
    // each cell's mean is the seed itself, every subvector encodes to
    // its own cell, and the ADC sum telescopes to the per-subspace
    // rounded exact dot products
    def mixD(s: Long, j: Int): Double = {
      var z = s * 64 + j + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 31)) * 0x94D049BB133111EBL
      ((z ^ (z >>> 29)) >>> 11).toDouble / (1L << 53) - 0.5
    }
    val vecs = (0L until 16L).map { i =>
      (i, Array.tabulate(64)(j => mixD(i, j).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val qs = df.filter($"vec_id" < 3)
    val out = Similarity.pqTopK(df, qs, k = 15)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val dvecs = vecs.map { case (i, v) => i -> v.map(_.toDouble) }.toMap
    def exactSubRounded(a: Array[Double], b: Array[Double]): Double =
      (0 until 8).map { s =>
        BigDecimal((s * 8 until s * 8 + 8)
            .foldLeft(0.0)((acc, j) => acc + a(j) * b(j)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.sum
    assert(out.nonEmpty)
    out.foreach { case ((q, n), ip) =>
      val want = BigDecimal(exactSubRounded(dvecs(q), dvecs(n)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(ip - want) < 1e-9,
        s"probe $q neighbor $n: adc $ip != exact-by-subspace $want")
    }
  }

  test("mmr: picks the diverse facet a raw top-k would bury under a near-dup") {
    import spark.implicits._
    // q = e1; c1/c2 near-copies of each other at rel ~0.9; d the
    // diverse facet at rel 0.8 (sim to the c-pair only through q);
    // filler keeps the pool honest. Raw top-2 = {c1, c2}; MMR's
    // second pick must be d: score(c2) = .7*.9 - .3*1 = .33 <
    // score(d) = .7*.8 - .3*.72 = .344.
    def n(v: Array[Double]) = {
      val s = math.sqrt(v.map(x => x * x).sum); v.map(_ / s)
    }
    val rows = Seq(
      100L -> Array(1.0, 0.0, 0.0, 0.0),
      201L -> n(Array(0.9, 0.436, 0.0, 0.0)),
      202L -> n(Array(0.9, 0.4355, 0.0, 0.02)),
      300L -> n(Array(0.8, 0.0, 0.6, 0.0)),
      400L -> n(Array(0.3, -0.2, -0.1, 0.9)),
      401L -> n(Array(0.2, 0.1, -0.5, -0.8)))
    val df = rows.map { case (id, v) => (id, v) }.toDF("vec_id", "embedding")
    val got = Similarity.mmrTopK(df, df.filter($"vec_id" === 100L),
        k = 2, poolSize = 5, lambda = 0.7)
      .orderBy("pick_rank").collect()
      .map(r => (r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq((201L, 1), (300L, 2)),
      s"mmr picked ${got.toSeq}, want the near-dup once then the facet")
    // the raw ranking DOES bury the facet behind the second copy
    val raw = Similarity.cosineTopK(df, df.filter($"vec_id" === 100L), 2)
      .orderBy("rank").collect().map(_.getLong(1))
    assert(raw.toSeq == Seq(201L, 202L))
  }

  test("mmr greedy == driver reference over the real corpus pool") {
    val e = Tables.embeddings(spark, sf0001)
    val probes = e.filter(col("vec_id") < 5)
    val got = Similarity.mmrTopK(e, probes, k = 4, poolSize = 10,
        lambda = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // reference: collect the same pool and greedy-select in plain Scala
    def r4(d: Double) = BigDecimal(d)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(d: Double) = BigDecimal(d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val emb = e.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = (0L until 5L).flatMap { q =>
      val pool = emb.keys.filter(_ != q).toSeq
        .map(id => id -> r4(cos(emb(id), emb(q))))
        .sortBy { case (id, rel) => (-rel, id) }.take(10)
      var selected = Vector.empty[Long]
      (1 to 4).foreach { t =>
        val remaining = pool.filterNot(p => selected.contains(p._1))
        if (remaining.nonEmpty) {
          val pick =
            if (t == 1) remaining.maxBy { case (id, rel) => (rel, -id) }
            else remaining.maxBy { case (id, rel) =>
              val ms = selected.map(s => r4(cos(emb(id), emb(s)))).max
              (r6(0.7 * rel - 0.30000000000000004 * ms), -id)
            }
          selected :+= pick._1
        }
      }
      selected.zipWithIndex.map { case (id, i) => (q, id, i + 1) }
    }.toSet
    assert(got == want, "engine mmr diverged from the reference greedy")
  }

  test("mmr driver fold == unrolled expression-form greedy on " +
    "adversarial pools (nulls, NaN, ties, near-zero scores)") {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    // the pre-r14 expression-form rounds, verbatim — the semantics
    // contract the driver fold replicates op for op
    def reference(pool: DataFrame, k: Int, lambda: Double): DataFrame = {
      def localize(df: DataFrame): DataFrame =
        df.select(col("query_id").cast("long"), col("vec_id").cast("long"),
            col("pick_rank").cast("int"))
          .collect().toSeq
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
          .toDF("query_id", "vec_id", "pick_rank")
      val p = pool.select(col("query_id").cast("long").as("query_id"),
          col("vec_id").cast("long").as("vec_id"),
          col("emb").cast("array<double>").as("emb"),
          col("rel").cast("double").as("rel"))
        .coalesce(1).localCheckpoint(true)
      var all = localize(p.groupBy(col("query_id"))
        .agg(max_by(col("vec_id"),
          struct(col("rel"), (-col("vec_id")).as("neg"))).as("vec_id"))
        .withColumn("pick_rank", lit(1)))
      var t = 2
      while (t <= k) {
        val selEmb = all.select(col("query_id"), col("vec_id"))
          .join(p.select(col("query_id"), col("vec_id"), col("emb")),
            Seq("query_id", "vec_id"))
          .select(col("query_id"), col("emb").as("s_emb"))
        val pick = p
          .join(all.select(col("query_id"), col("vec_id")),
            Seq("query_id", "vec_id"), "left_anti")
          .join(selEmb, Seq("query_id"))
          .groupBy(col("query_id"), col("vec_id"), col("rel"))
          .agg(max(round(Similarity.cosine(col("emb"), col("s_emb")), 4))
            .as("maxsim"))
          .withColumn("score", round(lit(lambda) * col("rel") -
            lit(1.0d - lambda) * col("maxsim"), 6))
          .groupBy(col("query_id"))
          .agg(max_by(col("vec_id"),
            struct(col("score"), (-col("vec_id")).as("neg"))).as("vec_id"))
          .withColumn("pick_rank", lit(t))
        all = localize(all.unionByName(pick))
        t += 1
      }
      all.select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("pick_rank"))
    }
    val dup = Seq(0.6, 0.8, 0.0)           // exact-duplicate embedding pair
    val pool: Seq[(Long, Long, Seq[java.lang.Double], java.lang.Double)] =
      Seq(
        // q0: duplicate embeddings (maxsim ties), equal rel (first-pick
        // tie broken by id), and a score engineered near zero
        (0L, 11L, dup.map(Double.box), Double.box(0.9)),
        (0L, 12L, dup.map(Double.box), Double.box(0.9)),
        (0L, 13L, Seq(0.0, 0.0, 1.0).map(Double.box), Double.box(0.3)),
        (0L, 14L, Seq(-0.6, -0.8, 0.0).map(Double.box), Double.box(0.0)),
        // q1: null rel, null emb, null element, length mismatch, NaN
        (1L, 21L, Seq(1.0, 0.0, 0.0).map(Double.box), Double.box(0.5)),
        (1L, 22L, Seq(1.0, 0.0, 0.0).map(Double.box), null),
        (1L, 23L, null, Double.box(0.8)),
        (1L, 24L, Seq[java.lang.Double](Double.box(1.0), null,
          Double.box(0.0)), Double.box(0.7)),
        (1L, 25L, Seq(1.0, 0.0).map(Double.box), Double.box(0.6)),
        (1L, 26L, Seq(Double.NaN, 1.0, 0.0).map(Double.box),
          Double.box(0.4)),
        // q2: zero vectors (denominator 0 -> sim 0.0) and negatives
        (2L, 31L, Seq(0.0, 0.0, 0.0).map(Double.box), Double.box(-0.2)),
        (2L, 32L, Seq(0.0, 1.0, 0.0).map(Double.box), Double.box(-0.2)),
        (2L, 33L, Seq(0.0, -1.0, 0.0).map(Double.box), Double.box(-0.4)),
        // q3: pool smaller than k
        (3L, 41L, Seq(1.0, 1.0, 0.0).map(Double.box), Double.box(0.1)))
    val df = pool.toDF("query_id", "vec_id", "emb", "rel")
    for (k <- Seq(1, 3, 6); lambda <- Seq(0.0, 0.5, 0.7, 1.0)) {
      val got = Similarity.mmrRerank(df, k, lambda).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = reference(df, k, lambda).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == want,
        s"driver fold diverged from the expression greedy at k=$k, " +
          s"lambda=$lambda:\n got $got\nwant $want")
    }
  }

  test("mmr with lambda = 1 degenerates to the relevance ranking") {
    val e = Tables.embeddings(spark, sf0001)
    val probes = e.filter(col("vec_id") < 5)
    val got = Similarity.mmrTopK(e, probes, k = 3, poolSize = 10,
        lambda = 1.0)
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    val raw = Similarity.cosineTopK(e, probes, 3)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    assert(got == raw, "pure-relevance mmr must equal the raw top-k")
  }

  test("mmr over a pool smaller than k picks the pool and stops") {
    import spark.implicits._
    val df = Seq(
      (100L, Array(1.0, 0.0)), (201L, Array(0.9, 0.1)),
      (202L, Array(0.5, 0.5))).toDF("vec_id", "embedding")
    val got = Similarity.mmrTopK(df, df.filter($"vec_id" === 100L),
      k = 4, poolSize = 5, lambda = 0.7).collect()
    assert(got.length == 2, s"want 2 picks from a 2-candidate pool")
    assert(got.map(_.getInt(2)).sorted.toSeq == Seq(1, 2))
  }

  test("mmr rejects an uncapped (corpus-sized) pool instead of " +
    "collecting it") {
    import spark.implicits._
    // one query, MmrMaxPoolRows + 1 candidates: the KB-by-contract
    // bound must refuse before the driver holds the whole thing
    val big = spark.range(Similarity.MmrMaxPoolRows + 1)
      .select(lit(1L).as("query_id"), col("id").as("vec_id"),
        array(lit(1.0), lit(0.0)).as("emb"),
        lit(0.5).as("rel"))
    val e = intercept[IllegalArgumentException] {
      Similarity.mmrRerank(big, k = 2, lambda = 0.7)
    }
    assert(e.getMessage.contains("pool exceeds"),
      s"wrong failure: ${e.getMessage}")
  }

  test("mmr fails fast, by name, on null pool ids") {
    import spark.implicits._
    val pool = Seq(
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(10L),
        Array(1.0, 0.0), 0.9),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(11L),
        Array(0.0, 1.0), 0.8)
    ).toDF("query_id", "vec_id", "emb", "rel")
    val e = intercept[IllegalArgumentException] {
      Similarity.mmrRerank(pool, k = 1, lambda = 0.7)
    }
    assert(e.getMessage.contains("null query_id/vec_id"),
      s"wrong failure: ${e.getMessage}")
  }

  test("serving-path driver folds == expression forms on adversarial " +
    "queries (nulls, NaN, ragged, duplicate/zero/null ids)") {
    import spark.implicits._
    // doubles must compare SQL-style (NaN == NaN) — normalize to bits
    def bits(o: Option[Double]): Option[Long] =
      o.map(java.lang.Double.doubleToLongBits)
    val qDf = Seq[(java.lang.Long, Array[java.lang.Double])](
      (1L, Array[java.lang.Double](1.0, 0.0, 0.0, 0.0)),
      (1L, Array[java.lang.Double](0.0, 1.0, 0.0, 0.0)),   // dup qid
      (2L, Array[java.lang.Double](0.0, 0.0, 0.0, 0.0)),   // zero vec
      (3L, null),                                          // null emb
      (4L, Array[java.lang.Double](1.0, 1.0)),             // ragged
      (5L, Array[java.lang.Double](Double.NaN, 1.0, 0.0, 0.0)), // NaN
      (6L, Array[java.lang.Double](1.0, null, 0.0, 0.0)),  // null elem
      (null.asInstanceOf[java.lang.Long],
        Array[java.lang.Double](0.5, 0.5, 0.0, 0.0))       // null qid
    ).toDF("vec_id", "embedding")
    val q = qDf.select(col("vec_id").cast("long").as("query_id"),
      col("embedding").cast("array<double>").as("emb"))
    val cents = Seq(
      (0L, Array(1.0, 0.0, 0.0, 0.0)),
      (1L, Array(0.0, 1.0, 0.0, 0.0)),
      (2L, Array(1.0, 0.0, 0.0, 0.0)),  // duplicate of 0: id tiebreak
      (3L, Array(0.5, 0.5, 0.5, 0.5))
    ).toDF("coarse_id", "c_emb")
    val centsLocal = cents.collect().toIndexedSeq.map(r =>
      (Some(r.getLong(0)), r.getSeq[Any](1)))
    val qLocal = q.collect().toIndexedSeq.map(r =>
      (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) null else r.getSeq[Any](1)))
    for (nprobe <- Seq(1, 2, 3)) {
      val expr = Similarity.ivfPqProbes(q, cents, nprobe).collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          bits(if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
        .toSeq.sortBy(_.toString)
      val local = Similarity.ivfPqProbesLocal(qLocal, centsLocal, nprobe)
        .map(t => (t._1, t._2, bits(t._3))).sortBy(_.toString)
      assert(local == expr, s"probes diverge at nprobe=$nprobe:\n" +
        s"  local: $local\n  expr:  $expr")
    }
    // dtable: m=2, dsub=2 over the same adversarial queries
    val cb = Seq(
      (0, 0L, Array(1.0, 0.0)), (0, 1L, Array(0.0, 1.0)),
      (1, 0L, Array(1.0, 1.0)), (1, 1L, Array(0.5, -0.5)),
      (1, 2L, Array(0.0, 0.0))
    ).toDF("sub", "cell", "c_sv")
    val cbLocal = cb.collect().toIndexedSeq.map(r =>
      (r.getInt(0), r.getLong(1), r.getSeq[Any](2)))
    val exprD = Similarity.ivfPqDtable(q, cb, m = 2, dsub = 2).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getInt(1), r.getLong(2),
        bits(if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toSeq.sortBy(_.toString)
    val localD = Similarity.ivfPqDtableLocal(qLocal, cbLocal,
        m = 2, dsub = 2)
      .map(t => (t._1, t._2, t._3, bits(t._4))).sortBy(_.toString)
    assert(localD == exprD, s"dtable diverges:\n  local: $localD\n" +
      s"  expr:  $exprD")
  }

  test("embedding audit: planted corruption is counted exactly") {
    import spark.implicits._
    val rows = Seq(
      (1L, Array(3.0, 4.0)),                    // norm 5
      (2L, Array(0.6, 0.8)),                    // norm 1
      (3L, Array(0.0, 0.0)),                    // zero vector
      (4L, Array(Double.NaN, 1.0)),             // non-finite
      (5L, Array(1.0, Double.PositiveInfinity)) // non-finite
    ).toDF("vec_id", "embedding")
      .unionByName(Seq((6L, Array(2.0, 0.0, 0.0)))  // ragged dim
        .toDF("vec_id", "embedding"))
    val a = Similarity.embeddingAudit(rows).collect().head
    assert(a.getAs[Long]("n_vectors") == 6)
    assert(a.getAs[Int]("dim") == 3)
    assert(!a.getAs[Boolean]("dim_consistent"))
    assert(a.getAs[Long]("n_zero") == 1)
    assert(a.getAs[Long]("n_nonfinite") == 2)
    assert(a.getAs[Double]("min_norm") == 0.0)
    assert(a.getAs[Double]("max_norm") == 5.0)
    // norms: 5, 1, 0, 1 (NaN masked), 1 (Inf masked), 2 -> avg 10/6
    assert(a.getAs[Double]("avg_norm") == 1.666667)
    // audit stats are partitioning-invariant (order-free sums)
    val b = Similarity.embeddingAudit(rows.repartition(5)).collect().head
    assert(a == b)
  }

  test("embedding audit: NULL and empty embeddings count as d=0 zero-norm") {
    import spark.implicits._
    // the corruption class the audit exists for: a broken export ships
    // rows whose embedding column is NULL or [] — they must appear in
    // the report, not silently vanish from the explode
    val rows = Seq(
      (1L, Some(Array(3.0, 4.0))),
      (2L, Some(Array.empty[Double])),
      (3L, Option.empty[Array[Double]])
    ).toDF("vec_id", "embedding")
    val a = Similarity.embeddingAudit(rows).collect().head
    assert(a.getAs[Long]("n_vectors") == 3)
    assert(!a.getAs[Boolean]("dim_consistent"))
    assert(a.getAs[Long]("n_zero") == 2, "empty + NULL are zero-norm rows")
    assert(a.getAs[Long]("n_nonfinite") == 0)
    assert(a.getAs[Double]("min_norm") == 0.0)
    assert(a.getAs[Double]("max_norm") == 5.0)
    assert(a.getAs[Double]("avg_norm") == 1.666667) // (5 + 0 + 0) / 3
  }

  test("embedding audit on the corpus: clean, unit-normalized") {
    val a = Similarity.embeddingAudit(Tables.embeddings(spark, sf0001))
      .collect().head
    assert(a.getAs[Long]("n_vectors") == 500)
    assert(a.getAs[Boolean]("dim_consistent") && a.getAs[Int]("dim") == 64)
    assert(a.getAs[Long]("n_zero") == 0 && a.getAs[Long]("n_nonfinite") == 0)
  }

  test("wavBytes == AudioSystem.write byte-for-byte (the canonical " +
    "44-byte PCM RIFF form)") {
    def jdk(pcm: Array[Byte], rate: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
        rate.toFloat, 8, 1, 1, rate.toFloat, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, pcm.length.toLong)
      val bos = new java.io.ByteArrayOutputStream(pcm.length + 64)
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    for ((pcm, rate) <- Seq(
        ("hello container world".getBytes("UTF-8"), 8000),
        (Array.tabulate[Byte](8000)(i => (i % 251).toByte), 8000),
        (Array.emptyByteArray, 44100),
        (Array[Byte](0, 127, -128, -1), 16000)))
      assert(java.util.Arrays.equals(
        Multimodal.wavBytes(pcm, rate), jdk(pcm, rate)),
        s"direct RIFF writer diverged from AudioSystem.write at " +
          s"n=${pcm.length}, rate=$rate")
  }

  test("wav header walk == the real javax.sound decode, fact for fact") {
    def enc(rate: Float, bits: Int, channels: Int,
            nFrames: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(rate, bits, channels,
        true, false)
      val pcm = Array.tabulate(nFrames * fmt.getFrameSize)(
        i => (i * 31 % 251).toByte)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    def viaJdk(b: Array[Byte]): (Int, Int, Long, Long) = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(b))
      try {
        val f = ais.getFormat
        val frames = ais.getFrameLength
        val rate = math.round(f.getSampleRate)
        (rate, f.getChannels, frames, frames * 1000L / rate)
      } finally ais.close()
    }
    for (b <- Seq(enc(8000f, 16, 2, 1024), enc(44100f, 8, 1, 4410),
        enc(16000f, 24, 1, 301), // odd data-chunk size: pad-byte walk
        Multimodal.wavBytes("hello header".getBytes("UTF-8"), 8000)))
      assert(Multimodal.wavHeaderFacts(b).contains(viaJdk(b)),
        s"header walk diverged from javax.sound: " +
          s"${Multimodal.wavHeaderFacts(b)} vs ${viaJdk(b)}")
    // non-WAV containers and corrupt chunk walks fall through to the
    // real decoder (AIFF) or to opaque (hostile size field), never loop
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
    val aiff = {
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](200)), fmt, 100L)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.AIFF, bos)
      bos.toByteArray
    }
    assert(Multimodal.wavHeaderFacts(aiff).isEmpty)
    val hostile = ("RIFF    WAVE" + "fmt " + "ÿÿÿ")
      .getBytes("ISO-8859-1")
    assert(Multimodal.wavHeaderFacts(hostile).isEmpty)
  }

  test("decodeHinted: the mime hint changes probe order, never the outcome") {
    val wav = Multimodal.wavBytes("hello media world".getBytes("UTF-8"), 8000)
    val bmp = Multimodal.bmpBytes(8, 6, 42)
    val opaque = Array.tabulate[Byte](97)(i => (i * 37).toByte)
    for (p <- Seq(wav, bmp, opaque)) {
      // correct hint, wrong hint, and no-hint all agree with decode()
      assert(Multimodal.decodeHinted("audio/wav", p) == Multimodal.decode(p))
      assert(Multimodal.decodeHinted("image/bmp", p) == Multimodal.decode(p))
      assert(Multimodal.decodeHinted(null, p) == Multimodal.decode(p))
    }
  }

  test("MP4 box walk: synthesized fixture round-trips fact for fact " +
    "(largesize form included); hostile sizes, truncation and non-MP4 " +
    "fail soft") {
    val n = 100
    val body = Array.tabulate(n)(i => (i % 251).toByte)
    val payload = Multimodal.mp4Bytes(body, 600L)
    val k = 1 + n % 3
    // the size contract the m07 oracle replays
    assert(payload.length == 148 + 173 * k + n)
    val m = Multimodal.parseMp4(payload).get
    assert(m.timescale == 600L)
    assert(m.durationUnits == 500L + (n * 13) % 9000)
    assert(m.durationMs == m.durationUnits * 1000L / 600L)
    assert(m.nTracks == k && m.nVideo == (k + 1) / 2 &&
      m.nAudio == k / 2)
    assert(m.width == 16 * (4 + n % 28) &&
      m.height == 16 * (3 + (5 * n) % 17))
    assert(m.mdatBytes == n)
    // decode() integration: container facts flow into the feature tuple
    val (w, h, f, rate, ch, ms) = Multimodal.decode(payload)
    assert(w == m.width && h == m.height && f == 1 && rate == 0 &&
      ch == 0 && ms == m.durationMs)
    // the 64-bit largesize form (size field 1 + 8-byte size) must
    // parse to the SAME facts
    val bb0 = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    val moovTotal = bb0.getInt(24)
    val moovBody = payload.slice(24 + 8, 24 + moovTotal)
    val rest = payload.drop(24 + moovTotal)
    val big = java.nio.ByteBuffer
      .allocate(24 + 16 + moovBody.length + rest.length)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    big.put(payload, 0, 24).putInt(1)
      .put("moov".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      .putLong(16L + moovBody.length).put(moovBody).put(rest)
    assert(Multimodal.parseMp4(big.array()).contains(m),
      "largesize moov parsed differently")
    // fail-soft: non-MP4, truncation mid-tree, hostile size field
    assert(Multimodal.parseMp4(
      "plain text far from a box tree".getBytes).isEmpty)
    assert(Multimodal.parseMp4(payload.take(60)).isEmpty)
    val hostile = payload.clone()
    hostile(24) = 0x7f.toByte // moov size ~2 GiB past the buffer
    assert(Multimodal.parseMp4(hostile).isEmpty,
      "hostile size field did not fail soft")
    // a zero/absent-moov stream terminates without throwing
    assert(Multimodal.parseMp4(payload.take(24) ++
      Array.fill(16)(0.toByte)).isEmpty)
  }

  test("EBML (Matroska/WebM) walk: synthesized fixture round-trips " +
    "fact for fact; minimal vints, f32 duration and unknown-size " +
    "segments parse; hostile payloads fail soft") {
    val n = 100
    val body = Array.tabulate(n)(i => (i % 251).toByte)
    val payload = Multimodal.mkvBytes(body, 500000L)
    val k = 1 + n % 3
    // the size contract the m08 oracle replays
    assert(payload.length == 130 + 60 * ((k + 1) / 2) + 29 * (k / 2) + n)
    val m = Multimodal.parseMkv(payload).get
    assert(m.docType == "webm")
    assert(m.timescaleNs == 500000L)
    assert(m.durationTicks == 700L + (n * 11) % 8000)
    assert(m.durationMs == m.durationTicks * 500000L / 1000000L)
    assert(m.nTracks == k && m.nVideo == (k + 1) / 2 &&
      m.nAudio == k / 2)
    assert(m.width == 8 * (10 + n % 100) &&
      m.height == 8 * (6 + (3 * n) % 70))
    assert(m.clusterBytes == 23 + n)
    // decode() integration: container facts flow into the tuple
    val (w, h, f, rate, ch, ms) = Multimodal.decode(payload)
    assert(w == m.width && h == m.height && f == 1 && rate == 0 &&
      ch == 0 && ms == m.durationMs)
    // a hand-built file with MINIMAL vints, an f32 Duration and an
    // UNKNOWN-SIZE Segment (all legal EBML the fixed-vint writer
    // never emits) must parse through the same walk
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val f32 = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
      .putFloat(1000.0f).array()
    val tiny =
      bytes(0x1A, 0x45, 0xDF, 0xA3, 0x87,       // EBML header, size 7
        0x42, 0x82, 0x84) ++ "webm".getBytes ++ // DocType
      bytes(0x18, 0x53, 0x80, 0x67, 0xFF) ++    // Segment, UNKNOWN size
      bytes(0x15, 0x49, 0xA9, 0x66, 0x8E,       // Info, size 14
        0x2A, 0xD7, 0xB1, 0x83, 0x07, 0xA1, 0x20, // TimestampScale
        0x44, 0x89, 0x84) ++ f32 ++             // Duration f32 = 1000
      bytes(0x16, 0x54, 0xAE, 0x6B, 0x8D,       // Tracks, size 13
        0xAE, 0x8B,                             // TrackEntry, size 11
        0x83, 0x81, 0x01,                       // TrackType video
        0xE0, 0x86,                             // Video, size 6
        0xB0, 0x81, 0x40,                       // PixelWidth 64
        0xBA, 0x81, 0x30) ++                    // PixelHeight 48
      bytes(0x1F, 0x43, 0xB6, 0x75, 0x83,       // Cluster, size 3
        0xE7, 0x81, 0x00)                       // Timestamp 0
    val t = Multimodal.parseMkv(tiny).get
    assert(t.docType == "webm" && t.timescaleNs == 500000L &&
      t.durationTicks == 1000L && t.durationMs == 500L &&
      t.nTracks == 1 && t.nVideo == 1 && t.nAudio == 0 &&
      t.width == 64 && t.height == 48 && t.clusterBytes == 3,
      s"minimal-vint fixture parsed wrong: $t")
    // a Video element planted inside an AUDIO entry claims no dims
    val planted =                               // TrackEntry content
      tiny.take(43) ++                          // sits at bytes 43..53
      bytes(0x83, 0x81, 0x02,                   // TrackType AUDIO
        0xE0, 0x86, 0xB0, 0x81, 0x40, 0xBA, 0x81, 0x30) ++
      tiny.drop(54)
    val pm = Multimodal.parseMkv(planted).get
    assert(pm.nAudio == 1 && pm.nVideo == 0 &&
      pm.width == 0 && pm.height == 0,
      s"hostile in-audio Video element claimed dims: $pm")
    // fail-soft: non-EBML, truncation mid-tree, hostile size field,
    // invalid 0x00 vint
    assert(Multimodal.parseMkv(
      "plain text far from an ebml tree".getBytes).isEmpty)
    assert(Multimodal.parseMkv(payload.take(40)).isEmpty)
    val hostile = payload.clone()
    hostile(31) = 0x7f.toByte // segment size far past the buffer
    assert(Multimodal.parseMkv(hostile).isEmpty,
      "hostile size field did not fail soft")
    val badVint = payload.clone()
    badVint(26) = 0x00.toByte // invalid >8-byte vint where an ID starts
    assert(Multimodal.parseMkv(badVint).isEmpty,
      "invalid vint did not fail soft")
    // RFC 8794 §6.2: unknown size is legal on MASTER elements only —
    // an unknown-size LEAF (TimestampScale here) must read as corrupt
    // instead of swallowing the rest of Info as its payload and
    // yielding a garbage timescale
    val unkLeaf = tiny.clone()
    unkLeaf(25) = 0xFF.toByte // TimestampScale size -> all-ones
    assert(Multimodal.parseMkv(unkLeaf).isEmpty,
      "unknown-size leaf did not fail soft")
  }

  test("MP3 walk: synthesized fixture round-trips fact for fact; " +
    "MPEG-2 and VBR frame trains parse; hostile payloads fail soft") {
    val n = 100
    val body = Array.tabulate(n)(i => (i % 251).toByte)
    val payload = Multimodal.mp3Bytes(body)
    val kbps = Multimodal.Mp3BitrateKbpsV1L3(1 + n % 14)
    val rate = Multimodal.Mp3SampleRatesV1(n % 3)
    val frameLen = (144000L * kbps / rate).toInt
    val frames = 2 + n % 24
    // the size contract the m09 oracle replays
    assert(payload.length == 10 + n + frames * frameLen)
    val m = Multimodal.parseMp3(payload).get
    assert(m.id3Bytes == 10 + n)
    assert(m.nFrames == frames && m.bitrateKbps == kbps &&
      m.sampleRate == rate && m.nChannels == 1 + n % 2)
    assert(m.durationMs == frames.toLong * 1152 * 1000 / rate)
    assert(m.audioBytes == frames.toLong * frameLen)
    // decode() integration: frame facts flow into the tuple
    val (w, h, f, r, ch, ms) = Multimodal.decode(payload)
    assert(w == 0 && h == 0 && f == frames && r == rate &&
      ch == m.nChannels && ms == m.durationMs)
    // a hand-built tagless MPEG-2 VBR train (both things the writer
    // never emits): 576-sample frames, bitrate varying per frame —
    // reported bitrate is the FIRST frame's, duration sums samples
    def frame(ver: Int, bIdx: Int, srIdx: Int): Array[Byte] = {
      val kb = (if (ver == 3) Multimodal.Mp3BitrateKbpsV1L3
                else Multimodal.Mp3BitrateKbpsV2L3)(bIdx)
      val rt = (if (ver == 3) Multimodal.Mp3SampleRatesV1
                else Multimodal.Mp3SampleRatesV2)(srIdx)
      val spf = if (ver == 3) 1152 else 576
      val fl = (spf / 8) * kb * 1000 / rt
      val b = new Array[Byte](fl)
      b(0) = 0xff.toByte
      b(1) = (0xe0 | (ver << 3) | (1 << 1) | 1).toByte
      b(2) = ((bIdx << 4) | (srIdx << 2)).toByte
      b(3) = 0x00 // stereo
      b
    }
    val vbr = frame(2, 4, 1) ++ frame(2, 8, 1) ++ frame(2, 4, 1)
    val vm = Multimodal.parseMp3(vbr).get
    assert(vm.id3Bytes == 0 && vm.nFrames == 3 &&
      vm.bitrateKbps == Multimodal.Mp3BitrateKbpsV2L3(4) &&
      vm.sampleRate == 24000 && vm.nChannels == 2 &&
      vm.durationMs == 3L * 576 * 1000 / 24000,
      s"MPEG-2 VBR train parsed wrong: $vm")
    // fail-soft: plain text, truncated tag, non-syncsafe size byte,
    // bad bitrate/reserved version codes, a frame crossing the end,
    // trailing garbage, a bare ID3 tag with no frames, and a
    // mid-stream sample-rate change (no single duration divisor)
    assert(Multimodal.parseMp3("plain text".getBytes).isEmpty)
    assert(Multimodal.parseMp3(payload.take(8)).isEmpty)
    val badSync = payload.clone()
    badSync(6) = 0x80.toByte // syncsafe bytes must have bit 7 clear
    assert(Multimodal.parseMp3(badSync).isEmpty,
      "non-syncsafe tag size did not fail soft")
    val badBr = payload.clone()
    badBr(10 + n + 2) = 0xF0.toByte // bitrate index 15 = bad
    assert(Multimodal.parseMp3(badBr).isEmpty,
      "bad bitrate index did not fail soft")
    val badVer = payload.clone()
    badVer(10 + n + 1) = 0xEB.toByte // version code 1 = reserved
    assert(Multimodal.parseMp3(badVer).isEmpty,
      "reserved version did not fail soft")
    assert(Multimodal.parseMp3(payload.dropRight(1)).isEmpty,
      "truncated final frame did not fail soft")
    assert(Multimodal.parseMp3(payload ++ Array(0x00.toByte)).isEmpty,
      "trailing garbage did not fail soft")
    assert(Multimodal.parseMp3(payload.take(10 + n)).isEmpty,
      "a bare ID3 tag is not an MP3 stream")
    assert(Multimodal.parseMp3(frame(2, 4, 1) ++ frame(2, 4, 2)).isEmpty,
      "mid-stream sample-rate change did not fail soft")
  }

  test("ID3v2 frame walk (m13): tagged fixture round-trips title/" +
    "artist/album, PRIV counted not decoded, padding stops the walk, " +
    "v2.3 plain sizes parse, m09 facts hold on tagged files, " +
    "hostile tags fail soft") {
    val n = 83
    val body = Array.tabulate(n)(i => (65 + i % 26).toByte)
    val id = 1234L
    val tagged = Multimodal.mp3TaggedBytes(id, body)
    val (nf, ts) = Multimodal.id3TextFrames(tagged).get
    assert(nf == 4 && ts.size == 3, s"frame counts wrong: $nf, $ts")
    val m = ts.toMap
    assert(m("TIT2") == s"doc-$id" && m("TPE1") == s"artist-${id % 7}" &&
      m("TALB") == s"album-${id % 5}")
    // the envelope figure == the m13 oracle's closed formula
    val meta = Multimodal.parseMp3(tagged).get
    assert(meta.id3Bytes ==
      (78 + id.toString.length + n + n % 11).toLong)
    // m09's frame-train facts are IDENTICAL on tagged and plain files
    val plain = Multimodal.parseMp3(Multimodal.mp3Bytes(body)).get
    assert(meta.nFrames == plain.nFrames &&
      meta.bitrateKbps == plain.bitrateKbps &&
      meta.sampleRate == plain.sampleRate &&
      meta.nChannels == plain.nChannels &&
      meta.durationMs == plain.durationMs,
      "tagging changed the m09 stream facts")
    // a hand-built v2.3 tag (plain big-endian frame sizes) parses
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val v3val = "hello".getBytes(ascii)
    val v3frame = "TIT2".getBytes(ascii) ++ Array[Byte](0, 0, 0,
      (1 + v3val.length).toByte, 0, 0, 0x00.toByte) ++ v3val
    val v3tag = "ID3".getBytes(ascii) ++ Array[Byte](3, 0, 0,
      0, 0, 0, v3frame.length.toByte) ++ v3frame
    val (nf3, ts3) = Multimodal.id3TextFrames(v3tag).get
    assert(nf3 == 1 && ts3 == Seq("TIT2" -> "hello"),
      s"v2.3 walk wrong: $nf3 $ts3")
    // hostile cases fail soft (None), never throw
    assert(Multimodal.id3TextFrames("no tag here".getBytes(ascii)).isEmpty)
    assert(Multimodal.id3TextFrames(tagged.take(8)).isEmpty,
      "truncated header accepted")
    val badVer = tagged.clone(); badVer(3) = 9
    assert(Multimodal.id3TextFrames(badVer).isEmpty,
      "unknown major version accepted")
    val badSync = tagged.clone(); badSync(6) = 0x80.toByte
    assert(Multimodal.id3TextFrames(badSync).isEmpty,
      "non-syncsafe tag size accepted")
    val badId = tagged.clone(); badId(10) = '~'.toByte
    assert(Multimodal.id3TextFrames(badId).isEmpty,
      "frame ID outside [A-Z0-9] accepted")
    val overrun = tagged.clone()
    overrun(17) = 0x7f.toByte // TIT2's size low byte blown up
    assert(Multimodal.id3TextFrames(overrun).isEmpty,
      "frame overrunning the tag accepted")
    val utf16 = tagged.clone()
    utf16(20) = 0x01.toByte // TIT2 encoding byte -> UTF-16
    assert(Multimodal.id3TextFrames(utf16).isEmpty,
      "UTF-16 text encoding must refuse, not mangle")
    // the fail-soft row shape flows through id3Tags
    import spark.implicits._
    val assets = Seq(
      Multimodal.MediaAsset(1L, "audio/mpeg", tagged),
      Multimodal.MediaAsset(2L, "audio/mpeg", badSync)).toDF()
    val rows = Multimodal.id3Tags(spark, assets).collect()
      .map(f => f.doc_id -> f).toMap
    assert(rows(1L).title.contains(s"doc-$id") &&
      rows(1L).n_id3_frames == 4)
    assert(rows(2L).n_id3_frames == 0 && rows(2L).title.isEmpty,
      "hostile payload did not zero its facts row")
  }

  test("FLAC walk: synthesized fixture round-trips fact for fact; " +
    "extra metadata blocks count; hostile payloads fail soft") {
    val n = 100
    val body = Array.tabulate(n)(i => (i % 251).toByte)
    val payload = Multimodal.flacBytes(body)
    val rate = Multimodal.FlacSampleRates(n % 8)
    val total = 1000L + (n.toLong * 441L) % 1000000L
    val audio = 1 + n % 17
    // the size contract the m10 oracle replays
    assert(payload.length == 46 + n + audio)
    val m = Multimodal.parseFlac(payload).get
    assert(m.metaBytes == 46 + n && m.nBlocks == 2)
    assert(m.sampleRate == rate && m.nChannels == 1 + n % 8 &&
      m.bitsPerSample == Multimodal.FlacBitDepths(n % 5))
    assert(m.totalSamples == total &&
      m.durationMs == total * 1000L / rate)
    assert(m.audioBytes == audio)
    // decode() integration: STREAMINFO facts flow into the tuple
    val (w, h, f, r, ch, ms) = Multimodal.decode(payload)
    assert(w == 0 && h == 0 && f == 1 && r == rate &&
      ch == m.nChannels && ms == m.durationMs)
    // a hand-built three-block file (STREAMINFO + PADDING + last
    // SEEKTABLE): the walk counts blocks it does not understand
    val si = payload.slice(0, 42) // magic + STREAMINFO
    val padding = Array[Byte](0x01, 0, 0, 2, 0, 0)
    val seektable = Array[Byte]((0x80 | 3).toByte, 0, 0, 0)
    val multi = si ++ padding ++ seektable ++ Array.fill(5)(0x7a.toByte)
    val mm = Multimodal.parseFlac(multi).get
    assert(mm.nBlocks == 3 && mm.sampleRate == rate &&
      mm.audioBytes == 5, s"multi-block walk wrong: $mm")
    // fail-soft: plain text, truncated magic, truncated STREAMINFO,
    // a first block that is not STREAMINFO, a block length past the
    // end, the invalid type 127, and a zero sample rate
    assert(Multimodal.parseFlac("plain text".getBytes).isEmpty)
    assert(Multimodal.parseFlac(payload.take(3)).isEmpty)
    assert(Multimodal.parseFlac(payload.take(20)).isEmpty,
      "truncated STREAMINFO did not fail soft")
    val notFirst = payload.clone()
    notFirst(4) = 0x01.toByte // PADDING first: refused
    assert(Multimodal.parseFlac(notFirst).isEmpty,
      "non-STREAMINFO first block did not fail soft")
    val hostileLen = payload.clone()
    hostileLen(43) = 0x7f.toByte // tag length far past the buffer
    assert(Multimodal.parseFlac(hostileLen).isEmpty,
      "hostile block length did not fail soft")
    val bad127 = si ++ Array[Byte]((0x80 | 127).toByte, 0, 0, 0)
    assert(Multimodal.parseFlac(bad127).isEmpty,
      "invalid block type 127 did not fail soft")
    // STREAMINFO body starts at offset 8; rate lives in bytes 18, 19
    // and the high nibble of 20
    val zeroRate = payload.clone()
    zeroRate(18) = 0; zeroRate(19) = 0
    zeroRate(20) = (zeroRate(20) & 0x0f).toByte
    assert(Multimodal.parseFlac(zeroRate).isEmpty,
      "zero sample rate did not fail soft")
  }

  test("OGG walk: synthesized fixture round-trips fact for fact; " +
    "multi-stream serials count; hostile payloads fail soft") {
    val n = 300 // > 255: the lacing table needs a full segment
    val body = Array.tabulate(n)(i => (i % 251).toByte)
    val payload = Multimodal.oggBytes(body)
    val rate = Multimodal.OggSampleRates(n % 7)
    val total = 1000L + (n.toLong * 331L) % 500000L
    val p3 = 1 + n % 9
    val lace = n / 255 + 1
    // the size contract the m11 oracle replays
    assert(payload.length == 113 + lace + n + p3)
    val m = Multimodal.parseOgg(payload).get
    assert(m.nPages == 3 && m.nStreams == 1)
    assert(m.vorbisChannels == 1 + n % 8 && m.vorbisRate == rate)
    assert(m.lastGranule == total &&
      m.durationMs == total * 1000L / rate)
    assert(m.payloadBytes == 30L + n + p3)
    // two multiplexed streams: distinct serials both count
    val second = payload.clone()
    // page 2's serial field sits at 58 + 14
    second(58 + 14) = 0x11.toByte
    val ms = Multimodal.parseOgg(second).get
    assert(ms.nStreams == 2, s"distinct serials not counted: $ms")
    // fail-soft: plain text, truncated header, non-zero version,
    // lacing table past the end, payload past the end, trailing
    // garbage, a broken mid-stream capture
    assert(Multimodal.parseOgg("plain text".getBytes).isEmpty)
    assert(Multimodal.parseOgg(payload.take(20)).isEmpty,
      "truncated page header did not fail soft")
    val badVer = payload.clone()
    badVer(4) = 1
    assert(Multimodal.parseOgg(badVer).isEmpty,
      "non-zero version did not fail soft")
    val badLace = payload.clone()
    badLace(26) = 0xff.toByte // 255 lacing bytes in a 58-byte page
    assert(Multimodal.parseOgg(badLace).isEmpty,
      "lacing table past the end did not fail soft")
    assert(Multimodal.parseOgg(payload.dropRight(1)).isEmpty,
      "truncated final page did not fail soft")
    assert(Multimodal.parseOgg(payload ++ Array(0x00.toByte)).isEmpty,
      "trailing garbage did not fail soft")
    val badMid = payload.clone()
    badMid(58) = 'X'.toByte // page 2's capture pattern broken
    assert(Multimodal.parseOgg(badMid).isEmpty,
      "broken mid-stream capture did not fail soft")
  }

  test("JPEG marker walk (m12): synthesized fixture round-trips fact " +
    "for fact without pixel decode, dims == the real ImageIO decode, " +
    "EXIF both byte orders, progressive SOF2, decode() integration") {
    val n = 137
    val (w, h, orient) = (4 + n % 29, 3 + (7 * n) % 23, 1 + n % 8)
    val payload = Multimodal.jpegBytes(w, h, n, orient)
    val m = Multimodal.parseJpegMeta(payload).get
    assert(m.width == w && m.height == h, s"dims wrong: $m")
    assert(m.precision == 8 && m.nComponents == 3 && !m.progressive)
    assert(m.orientation == orient)
    assert(m.headerBytes > 0 && m.headerBytes < payload.length.toLong)
    assert(m.nSegments >= 4) // SOI counted? no: APP1+DQTs+SOF+DHTs+SOS
    // the walk's dims == the REAL pixel decode's (ImageIO stays the
    // pixel decoder; the walk is the metadata path)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    assert(img.getWidth == w && img.getHeight == h)
    // decode() routes JPEG dims through the walk now
    val (dw, dh, df, _, _, _) = Multimodal.decode(payload)
    assert(dw == w && dh == h && df == 1)
    // EXIF big-endian (MM) variant reads the same orientation
    val le = Multimodal.app1Exif(orient)
    val tiffLe = le.drop(10) // FF E1 len(2) "Exif\0\0"
    def u16le(a: Array[Byte], o: Int) =
      (a(o) & 0xff) | ((a(o + 1) & 0xff) << 8)
    assert(u16le(tiffLe, 2) == 42)
    val be = java.nio.ByteBuffer.allocate(36)
    be.put(0xff.toByte).put(0xe1.toByte).put(0x00.toByte).put(34.toByte)
    be.put("Exif".getBytes("US-ASCII")).put(0.toByte).put(0.toByte)
    be.put('M'.toByte).put('M'.toByte).putShort(42).putInt(8)
    be.putShort(1)
    be.putShort(0x0112).putShort(3).putInt(1)
    be.putShort(orient.toShort).putShort(0).putInt(0)
    val raw = Multimodal.jpegBytes(w, h, n, orient)
    // replace the LE APP1 (36 bytes after SOI) with the MM build
    val beJpeg = raw.take(2) ++ be.array() ++ raw.drop(2 + 36)
    assert(Multimodal.parseJpegMeta(beJpeg).get.orientation == orient,
      "big-endian EXIF orientation not read")
    // a hand-built PROGRESSIVE frame: SOI + SOF2 + SOS(empty)
    val sof2 = Array[Byte](0xff.toByte, 0xc2.toByte, 0, 8,
      8, 0, 5, 0, 7, 1) // precision 8, h=5, w=7, 1 component
    val sos = Array[Byte](0xff.toByte, 0xda.toByte, 0, 2)
    val prog = Array[Byte](0xff.toByte, 0xd8.toByte) ++ sof2 ++ sos
    val pm = Multimodal.parseJpegMeta(prog).get
    assert(pm.progressive && pm.width == 7 && pm.height == 5 &&
      pm.nComponents == 1 && pm.orientation == 0)
    assert(pm.headerBytes == prog.length.toLong)
    // RSTn standalone markers and FF fill bytes walk through
    val filled = prog.take(2) ++
      Array[Byte](0xff.toByte, 0xd0.toByte) ++ // RST0, length-free
      Array[Byte](0xff.toByte, 0xff.toByte, 0xc2.toByte, 0, 8,
        8, 0, 5, 0, 7, 1) ++ sos // a fill FF before the SOF marker
    assert(Multimodal.parseJpegMeta(filled).get.width == 7,
      "fill bytes / standalone RST broke the walk")
  }

  test("JPEG marker walk fails soft on hostile payloads: truncations, " +
    "bad lengths, double SOI, early EOI, zero dims, broken EXIF") {
    val good = Multimodal.jpegBytes(10, 8, 42, 3)
    assert(Multimodal.parseJpegMeta("not a jpeg".getBytes).isEmpty)
    assert(Multimodal.parseJpegMeta(Array[Byte]()).isEmpty)
    assert(Multimodal.parseJpegMeta(good.take(2)).isEmpty,
      "bare SOI did not fail soft")
    assert(Multimodal.parseJpegMeta(good.take(30)).isEmpty,
      "truncated segment did not fail soft")
    // hostile segment length: APP1's length bytes (offsets 2,3 after
    // SOI) pushed far past the buffer
    val badLen = good.clone()
    badLen(2 + 2) = 0x7f.toByte
    assert(Multimodal.parseJpegMeta(badLen).isEmpty,
      "segment length past the end did not fail soft")
    // a length UNDER 2 is structurally impossible
    val tinyLen = good.clone()
    tinyLen(2 + 2) = 0; tinyLen(2 + 3) = 1
    assert(Multimodal.parseJpegMeta(tinyLen).isEmpty,
      "segment length < 2 accepted")
    // a second SOI mid-stream is hostile
    val doubleSoi = good.take(2) ++ good
    assert(Multimodal.parseJpegMeta(doubleSoi).isEmpty,
      "second SOI accepted")
    // EOI with no SOF/SOS: no image
    val eoiOnly = Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xd9.toByte)
    assert(Multimodal.parseJpegMeta(eoiOnly).isEmpty)
    // zero dims in SOF are refused
    val zeroDim = Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xc0.toByte, 0, 8, 8, 0, 0, 0, 7, 1,
      0xff.toByte, 0xda.toByte, 0, 2)
    assert(Multimodal.parseJpegMeta(zeroDim).isEmpty,
      "zero height accepted")
    // a structurally broken EXIF TIFF (bad magic) is a framing
    // violation, not a silent orientation-0
    val badTiff = good.clone()
    badTiff(2 + 12) = 0x13 // TIFF magic 42 -> 0x13xx
    assert(Multimodal.parseJpegMeta(badTiff).isEmpty,
      "broken EXIF TIFF accepted")
    // the fail-soft row shape flows through jpegFeatures
    import spark.implicits._
    val assets = Seq(
      Multimodal.MediaAsset(1L, "image/jpeg", good),
      Multimodal.MediaAsset(2L, "image/jpeg", good.take(30))).toDF()
    val rows = Multimodal.jpegFeatures(spark, assets).collect()
      .map(f => f.doc_id -> f).toMap
    assert(rows(1L).width == 10 && rows(1L).orientation == 3)
    assert(rows(2L).width == 0 && rows(2L).n_bytes == 30L,
      "corrupt payload did not zero its facts row")
  }

  test("m14 png walk: chunk train tiles to IEND, IHDR facts equal " +
    "the real decode, headerBytes points at the first IDAT, " +
    "hostile chunks refuse, fail-soft rows zero") {
    import spark.implicits._
    val good = Multimodal.pngBytes(10, 6, 42)
    val m = Multimodal.parsePngMeta(good).get
    assert(m.width == 10 && m.height == 6)
    assert(m.bitDepth == 8 && m.colorType == 2 && m.interlace == 0)
    assert(m.paletteEntries == 0 && !m.hasAlpha)
    assert(m.idatBytes > 0 && m.nChunks >= 3) // IHDR + IDAT+ + IEND
    // headerBytes points at a chunk whose type reads IDAT
    val t = new String(good, m.headerBytes.toInt + 4, 4, "US-ASCII")
    assert(t == "IDAT", s"headerBytes points at $t")
    // the walk agrees with the real pixel decode
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(good))
    assert(img.getWidth == m.width && img.getHeight == m.height)
    // an ARGB png gains alpha (color type 6)
    val argb = {
      val i2 = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_ARGB)
      i2.setRGB(1, 1, 0x80102030)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(i2, "png", bos)
      bos.toByteArray
    }
    val am = Multimodal.parsePngMeta(argb).get
    assert(am.colorType == 6 && am.hasAlpha)
    // hostile: bad signature, truncated header/data, over-running
    // length, IHDR not first, zero dims, lost IEND
    assert(Multimodal.parsePngMeta("not a png".getBytes).isEmpty)
    assert(Multimodal.parsePngMeta(Array[Byte]()).isEmpty)
    assert(Multimodal.parsePngMeta(good.take(12)).isEmpty)
    assert(Multimodal.parsePngMeta(good.dropRight(5)).isEmpty,
      "truncated tail (lost IEND) accepted")
    val overrun = good.clone()
    overrun(8) = 0x7f.toByte // IHDR length -> enormous
    assert(Multimodal.parsePngMeta(overrun).isEmpty)
    val zeroDim = good.clone()
    java.util.Arrays.fill(zeroDim, 16, 20, 0.toByte) // width = 0
    assert(Multimodal.parsePngMeta(zeroDim).isEmpty)
    val notFirst = good.clone()
    notFirst(12) = 'J'.toByte // IHDR -> JHDR
    assert(Multimodal.parsePngMeta(notFirst).isEmpty)
    // distributed fail-soft: corrupt payloads zero their rows
    val assets2 = Seq(Multimodal.MediaAsset(1L, "image/png", good),
      Multimodal.MediaAsset(2L, "image/png", good.take(20))).toDF()
    val rows2 = Multimodal.pngFeatures(spark, assets2).collect()
      .map(f => f.doc_id -> f).toMap
    assert(rows2(1L).width == 10 && rows2(1L).color_type == 2)
    assert(rows2(2L).width == 0 && rows2(2L).n_bytes == 20L,
      "corrupt payload did not zero its facts row")
  }
}
