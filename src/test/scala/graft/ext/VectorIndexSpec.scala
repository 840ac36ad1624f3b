package graft.ext

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** The persisted vector-index lifecycle: the store query must rank
  * EXACTLY as the in-query IVF-PQ (which is oracle-checked), the
  * in-row delta encode must equal the distributed one ACROSS BOTH
  * execution forms (plan literals and the size-gated mapPartitions
  * closure), replays and re-presented ids must append nothing,
  * staleness must see embedding CONTENT and half-written meta,
  * tombstones must delete for every read path, compaction must be
  * invisible to queries, and a store must fail loudly rather than
  * serve from nothing.
  */
class VectorIndexSpec extends SparkTestBase {

  private def store(prefix: String): String = tmpDir(prefix) + "/vidx"

  test("store query == in-query ivfPqTopK exactly (the s17/s08 pin)") {
    val e = Tables.embeddings(spark, sf0001)
    val probes = e.filter(col("vec_id") < 5)
    val st = store("vidx-pin")
    VectorIndex.init(e, st, coarseIters = 2)
    val got = VectorIndex.query(spark, st, probes, k = 3)
    val exp = Similarity.ivfPqTopK(e, probes, 3, coarseIters = 2)
    assert(got.collect().toSeq.map(_.toSeq).sortBy(_.toString)
      == exp.collect().toSeq.map(_.toSeq).sortBy(_.toString),
      "index-backed ranking diverged from the in-query IVF-PQ")
    // the whole point of the store: query cost ∝ probed cells'
    // posting lists — the coarse_id isin must reach the codes scan
    val p = got.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [In(coarse_id"),
      s"coarse_id filter not pushed into the codes scan:\n$p")
  }

  test("both in-row encode forms == init's distributed encode bit for " +
    "bit, and a replayed/re-presented batch appends NOTHING") {
    val e = Tables.embeddings(spark, sf0001)
    val st = store("vidx-parity")
    VectorIndex.init(e, st, coarseIters = 2)
    val initCodes = spark.read.parquet(s"$st/codes")
      .collect().map(_.toSeq).toSet
    // re-encode the WHOLE corpus through both in-row paths under the
    // frozen model: coarse argmax, residual, and PQ argmin must agree
    // code for code with the distributed init encode
    val litCodes = VectorIndex.encodeForStore(spark, st, e,
      litMaxBytes = Long.MaxValue).collect().map(_.toSeq).toSet
    assert(litCodes == initCodes,
      "literal-path in-row codes diverged from the distributed init")
    val clo = VectorIndex.encodeForStore(spark, st, e, litMaxBytes = 0L)
      .collect().map(_.toSeq).toSet
    assert(clo == initCodes,
      "closure-path in-row codes diverged from the distributed init")
    // id immutability: a replayed batch (same ids) appends nothing —
    // and neither does a re-presented id with a CHANGED embedding
    // (the divergent-code-set corruption class)
    VectorIndex.update(e, st)
    assert(spark.read.parquet(s"$st/codes").count() == initCodes.size,
      "replayed batch must append nothing (ids already coded)")
    val mutated = e.filter(col("vec_id") < 10)
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          x => x + lit(0.5)).as("embedding"))
    VectorIndex.update(mutated, st)
    assert(spark.read.parquet(s"$st/codes").count() == initCodes.size,
      "a re-presented id with a changed embedding must be skipped")
    val probes = e.filter(col("vec_id") < 5)
    val got = VectorIndex.query(spark, st, probes, k = 3)
    val exp = Similarity.ivfPqTopK(e, probes, 3, coarseIters = 2)
    assert(got.collect().toSeq.map(_.toSeq).sortBy(_.toString)
      == exp.collect().toSeq.map(_.toSeq).sortBy(_.toString),
      "replays/re-presents changed the ranking")
  }

  test("update refuses a wrong-dimension batch loudly") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf0001)
    val st = store("vidx-dim")
    VectorIndex.init(e, st, coarseIters = 2)
    val short = Seq((990000L, Seq.fill(32)(0.1)))
      .toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      VectorIndex.update(short, st)
    }
    assert(ex.getMessage.contains("64-dim") &&
      ex.getMessage.contains("32"),
      s"dim mismatch not reported: ${ex.getMessage}")
    // an empty batch is a no-op, not an error
    VectorIndex.update(e.limit(0), st)
  }

  test("incremental growth: a delta near-copy is found by the store " +
    "query without retraining") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf0001)
    val st = store("vidx-delta")
    VectorIndex.init(e, st, coarseIters = 2)
    // the delta: a near-copy of probe vector 2 (its embedding with a
    // tiny last-component nudge) under a fresh id
    val twin = e.filter(col("vec_id") === 2L)
      .select(lit(900000L).as("vec_id"),
        transform(col("embedding").cast("array<double>"),
          (x, i) => when(i === 63, x + lit(1e-4)).otherwise(x))
          .as("embedding"))
    VectorIndex.update(twin, st)
    val got = VectorIndex.query(spark, st,
        e.filter(col("vec_id") === 2L), k = 1)
      .collect()
    assert(got.length == 1 && got.head.getLong(1) == 900000L,
      s"delta near-copy not top-1: ${got.mkString(",")}")
  }

  test("initIfStale: serves a warm store; rebuilds on corpus, knob, " +
    "CONTENT (re-embedded same ids), or half-written-meta change") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf0001)
    val st = store("vidx-stale")
    assert(VectorIndex.initIfStale(e, st, coarseIters = 2),
      "first call must build")
    assert(!VectorIndex.initIfStale(e, st, coarseIters = 2),
      "unchanged corpus + knobs must serve warm")
    assert(VectorIndex.initIfStale(e, st, coarseIters = 1),
      "a knob change must rebuild")
    val grown = e.unionByName(e.limit(1)
      .select(lit(910000L).as("vec_id"), col("embedding"), col("label")))
    assert(VectorIndex.initIfStale(grown, st, coarseIters = 1),
      "a changed corpus fingerprint must rebuild")
    // the ADVICE case: same ids (count and id-sum unchanged), new
    // embedding VALUES — a re-embedding run must read as stale
    val reembedded = e.select(col("vec_id"),
      transform(col("embedding").cast("array<double>"),
        x => x + lit(0.25)).as("embedding"))
    assert(VectorIndex.initIfStale(reembedded, st, coarseIters = 1),
      "a re-embedded corpus under the same ids served from a stale store")
    // ...including one that PRESERVES dim 0 (the first-component-only
    // content term's blind spot): the weighted full-component sum
    // must still see it
    val dim1Only = reembedded.select(col("vec_id"),
      transform(col("embedding").cast("array<double>"),
        (x, i) => when(i === 1, x + lit(0.5)).otherwise(x))
        .as("embedding"))
    assert(VectorIndex.initIfStale(dim1Only, st, coarseIters = 1),
      "a re-embedding preserving dim 0 served from a stale store")
    // a crash between the meta directory create and the parquet commit
    // leaves an unreadable meta: must read as stale, not throw
    val metaDir = new java.io.File(s"$st/meta")
    metaDir.listFiles().foreach(_.delete())
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$st/meta/part-00000.parquet"),
      "not a parquet footer".getBytes)
    assert(VectorIndex.initIfStale(reembedded, st, coarseIters = 1),
      "an unreadable meta must rebuild, not propagate the read failure")
    assert(!VectorIndex.initIfStale(reembedded, st, coarseIters = 1),
      "the rebuild must have produced a servable store")
  }

  test("queryRerank: exact re-rank of the store's candidate set — " +
    "degenerates to cosineTopK at full coverage, fetch is vec_id-pushed") {
    val e = Tables.embeddings(spark, sf0001)
    val probes = e.filter(col("vec_id") < 5)
    val st = store("vidx-rerank")
    VectorIndex.init(e, st, coarseIters = 2)
    // composition: the re-ranked set IS the store's top-r candidate
    // set, re-ordered by exact cosine (never anything outside it)
    val got = VectorIndex.queryRerank(spark, st, e, probes,
      k = 3, rerank = 8)
    val candIds = VectorIndex.query(spark, st, probes, k = 8)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotRows = got.collect()
    assert(gotRows.forall(r => candIds((r.getLong(0), r.getLong(1)))),
      "re-rank returned an id outside the store's candidate set")
    // exactness of the final order: sims are the s01 rounded-4 cosine
    // (pin one row against the brute-force form)
    val pinQ = gotRows.head.getLong(0)
    val pinN = gotRows.head.getLong(1)
    val pinSim = Similarity.cosineTopK(e,
        e.filter(col("vec_id") === pinQ), 500)
      .filter(col("neighbor_id") === pinN).collect().head.getDouble(2)
    assert(gotRows.head.getDouble(2) == pinSim,
      "re-rank sim is not the exact rounded-4 cosine")
    // the s04 contract: full candidate coverage == the exact ranking
    val n = e.count().toInt
    val nl = Similarity.autoNlist(n.toLong)
    val full = VectorIndex.queryRerank(spark, st, e, probes,
      k = 3, rerank = n, nprobe = nl)
    val exact = Similarity.cosineTopK(e, probes, 3)
    assert(full.collect().map(_.toSeq).toSet ==
      exact.collect().map(_.toSeq).toSet,
      "full-coverage re-rank diverged from the exact ranking")
    // the fetch must prune: the corpus scan carries the In(vec_id)
    // pushed filter — reading the whole corpus would defeat the tier.
    // The fetch executes EAGERLY since the r15 re-rank fold, so audit
    // the captured executions, not the returned (local) frame's plan.
    val plans = capturedPlans {
      VectorIndex.queryRerank(spark, st, e, probes, k = 3).collect()
    }
    assert(plans.exists(_.contains("PushedFilters: [In(vec_id")),
      "vec_id filter not pushed into the corpus fetch")
  }

  test("tombstones: a deleted id vanishes from every read path, " +
    "update cannot resurrect it, replayed deletes are harmless") {
    val e = Tables.embeddings(spark, sf0001)
    val st = store("vidx-del")
    VectorIndex.init(e, st, coarseIters = 2)
    val probes = e.filter(col("vec_id") < 5)
    val before = VectorIndex.query(spark, st, probes, k = 3).collect()
    val victim = before.head.getLong(1)
    VectorIndex.delete(spark, st, Seq(victim))
    val after = VectorIndex.query(spark, st, probes, k = 500).collect()
    assert(!after.exists(_.getLong(1) == victim),
      s"tombstoned id $victim still served by query")
    assert(VectorIndex.reconstruct(spark, st, Seq(victim)).count() == 0,
      "tombstoned id still reconstructable")
    val div = VectorIndex.diversifiedQuery(spark, st, probes,
      k = 4, poolSize = 12, lambda = 0.7).collect()
    assert(!div.exists(_.getLong(1) == victim),
      "tombstoned id still served by diversifiedQuery")
    // resurrect attempt via update: the id is known (tombstoned) and
    // must be skipped
    val n0 = spark.read.parquet(s"$st/codes").count()
    VectorIndex.update(e.filter(col("vec_id") === victim), st)
    assert(spark.read.parquet(s"$st/codes").count() == n0,
      "update re-coded a tombstoned id")
    // at-least-once replay of the delete: facts append, answers stable
    VectorIndex.delete(spark, st, Seq(victim))
    val replay = VectorIndex.query(spark, st, probes, k = 500).collect()
    assert(replay.map(_.toSeq).toSet == after.map(_.toSeq).toSet,
      "replayed delete changed the answer")
    // loud failure modes
    val ex = intercept[IllegalArgumentException] {
      VectorIndex.delete(spark, st, Seq.empty)
    }
    assert(ex.getMessage.contains("at least one"))
  }

  test("compact: queries unchanged, dead + duplicate rows physically " +
    "dropped, file count bounded") {
    val e = Tables.embeddings(spark, sf0001)
    val st = store("vidx-compact")
    VectorIndex.init(e, st, coarseIters = 2)
    val initCodes = spark.read.parquet(s"$st/codes")
      .collect().map(_.toSeq).toSet
    // accrete physics: tombstone one served id, then fake N small
    // append files by re-appending the same code rows (what replayed
    // drains used to do before the id gate — compact must still fold
    // legacy duplicates)
    val probes = e.filter(col("vec_id") < 5)
    val victim = VectorIndex.query(spark, st, probes, k = 3)
      .collect().head.getLong(1)
    VectorIndex.delete(spark, st, Seq(victim))
    val codes = spark.read.parquet(s"$st/codes")
    for (_ <- 1 to 3)
      codes.write.mode("append").parquet(s"$st/codes")
    val before = VectorIndex.query(spark, st, probes, k = 10)
      .collect().map(_.toSeq).toSet
    val rep = VectorIndex.compact(spark, st)
    assert(rep.codeRowsAfter < rep.codeRowsBefore,
      s"compaction dropped nothing: $rep")
    assert(rep.filesAfter < rep.filesBefore, s"files not merged: $rep")
    val after = VectorIndex.query(spark, st, probes, k = 10)
      .collect().map(_.toSeq).toSet
    assert(after == before, "compaction changed query results")
    // store == rebuild-without-deleted: the physical rows are exactly
    // the init codes minus the tombstoned id's
    val physical = spark.read.parquet(s"$st/codes")
      .collect().map(_.toSeq).toSet
    assert(physical ==
      initCodes.filterNot(_.head.asInstanceOf[Long] == victim),
      "compacted store != init codes minus the deleted id")
  }

  test("streaming maintenance: drains == batch updates, delta-only " +
    "second drain, no-op re-drain appends nothing, empty source dir " +
    "is a no-op") {
    val e = Tables.embeddings(spark, sf0001)
    val prefix = e.filter(col("vec_id") < 400)
    val delta = e.filter(col("vec_id") >= 400)

    // batch reference: init on the prefix (frozen model), one batch
    // update with the delta
    val stBatch = store("vidx-sbatch")
    VectorIndex.init(prefix, stBatch, coarseIters = 2)
    VectorIndex.update(delta, stBatch)

    // streaming: same init, then file-source drains — the checkpoint
    // is the delta tracker
    val stStream = store("vidx-sstream")
    VectorIndex.init(prefix, stStream, coarseIters = 2)
    val dir = tmpDir("vidx-src")
    val ckpt = tmpDir("vidx-ckpt")

    // the NORMAL initial state: the watched dir exists but holds no
    // parquet yet — a drain must be a no-op, not a schema-read crash
    val n0 = graft.streaming.StreamingVectorIndex.maintainStream(
      spark, dir, stStream, ckpt)
    assert(n0 == 400, s"empty-dir drain must be a no-op, got $n0")

    prefix.write.mode("overwrite").parquet(s"$dir/batch1")
    // flatten: the file source watches one directory
    def stage(sub: String): Unit = {
      val d = new java.io.File(s"$dir/$sub")
      d.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(dir, s"${sub}_${f.getName}"))
      }
      d.listFiles().foreach(_.delete()); d.delete()
    }
    stage("batch1")
    val n1 = graft.streaming.StreamingVectorIndex.maintainStream(
      spark, dir, stStream, ckpt)
    assert(n1 == 400, s"bootstrap drain indexed $n1")
    val c1 = spark.read.parquet(s"$stStream/codes").count()

    delta.write.mode("overwrite").parquet(s"$dir/batch2")
    stage("batch2")
    val n2 = graft.streaming.StreamingVectorIndex.maintainStream(
      spark, dir, stStream, ckpt)
    assert(n2 == 500, s"delta drain should reach 500 vectors, got $n2")
    val c2 = spark.read.parquet(s"$stStream/codes").count()
    assert(c2 > c1, "delta drain must append")

    // drain == batch: the two stores' distinct code sets are equal
    val gotCodes = spark.read.parquet(s"$stStream/codes").distinct()
      .collect().map(_.toSeq).toSet
    val expCodes = spark.read.parquet(s"$stBatch/codes").distinct()
      .collect().map(_.toSeq).toSet
    assert(gotCodes == expCodes, "stream-grown codes != batch-grown")

    // and the ranking agrees with the batch-grown store
    val probes = e.filter(col("vec_id") < 5)
    val got = VectorIndex.query(spark, stStream, probes, k = 3)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val exp = VectorIndex.query(spark, stBatch, probes, k = 3)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(got == exp)

    // no-op re-drain: nothing new in the checkpoint -> no appends
    val n3 = graft.streaming.StreamingVectorIndex.maintainStream(
      spark, dir, stStream, ckpt)
    assert(n3 == 500)
    assert(spark.read.parquet(s"$stStream/codes").count() == c2,
      "a no-op re-drain must append nothing")

    // the drift stats ride update() on both growth paths, so the
    // stats-fed report agrees between the drained and batch stores;
    // and the fold is batch-split-INDEPENDENT (decimal sums are
    // associative): a store grown in two half-deltas reports
    // identically to the one-batch store
    val rBatch = VectorIndex.driftReportFromStats(spark, stBatch)
      .collect()(0).toSeq
    assert(VectorIndex.driftReportFromStats(spark, stStream)
      .collect()(0).toSeq == rBatch,
      "stats-fed drift report diverged across growth paths")
    val stSplit = store("vidx-ssplit")
    VectorIndex.init(prefix, stSplit, coarseIters = 2)
    VectorIndex.update(delta.filter(col("vec_id") < 450), stSplit)
    VectorIndex.update(delta.filter(col("vec_id") >= 450), stSplit)
    assert(VectorIndex.driftReportFromStats(spark, stSplit)
      .collect()(0).toSeq == rBatch,
      "batch split changed the folded drift report")
  }

  test("diversifiedQuery == mmrRerank over the store pool + PQ " +
    "reconstructions, and reconstruct is exact on zero-residual cells") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf0001)
    val st = store("vidx-mmr")
    VectorIndex.init(e, st, coarseIters = 2)
    val probes = e.filter(col("vec_id") < 5)
    // composition pin: hand-build the same pool and rerank
    val pool0 = VectorIndex.query(spark, st, probes, k = 12)
      .select(col("query_id"), col("neighbor_id").as("vec_id"),
        col("approx_ip").as("rel"))
    val ids = pool0.select("vec_id").distinct()
      .collect().map(_.getLong(0)).toSeq
    val pool = pool0
      .join(VectorIndex.reconstruct(spark, st, ids), Seq("vec_id"))
      .select(col("query_id"), col("vec_id"), col("emb"), col("rel"))
    val want = Similarity.mmrRerank(pool, 4, 0.7)
      .collect().map(_.toSeq).toSet
    val got = VectorIndex.diversifiedQuery(spark, st, probes, k = 4,
      poolSize = 12, lambda = 0.7).collect().map(_.toSeq).toSet
    assert(got == want, "diversifiedQuery diverged from the composition")
    // reconstruction sanity: a residual-codebook SEED vector whose
    // cells are its own exact residual slices reconstructs to within
    // quantization error of itself (and exactly when its residual IS
    // a stored cell) — here just pin the shape + determinism
    val rec = VectorIndex.reconstruct(spark, st, Seq(ids.head))
      .collect()
    assert(rec.length == 1 &&
      rec.head.getSeq[Double](1).length == 64)
    val rec2 = VectorIndex.reconstruct(spark, st, Seq(ids.head))
      .collect()
    assert(rec.head.toSeq == rec2.head.toSeq, "reconstruct nondeterministic")
  }

  test("diversifiedQueryRerank: the greedy runs over the ORIGINALS of " +
    "the store-nominated pool with exact relevance; tombstoned ids " +
    "never enter the pool") {
    val e = Tables.embeddings(spark, sf0001)
    val st = store("vidx-divrerank")
    VectorIndex.init(e, st, coarseIters = 2)
    val probes = e.filter(col("vec_id") < 5)
    // composition pin: nominate via the store ranking, join the
    // original vectors, recompute exact rounded-4 relevance, rerank
    val cands = VectorIndex.query(spark, st, probes, k = 12)
      .select(col("query_id"), col("neighbor_id").as("vec_id"))
    val originals = e.select(col("vec_id").cast("long").as("vec_id"),
      col("embedding").cast("array<double>").as("emb"))
    val q = originals.select(col("vec_id").as("query_id"),
      col("emb").as("q_emb")).filter(col("query_id") < 5)
    val pool = cands.join(originals, "vec_id").join(q, "query_id")
      .select(col("query_id"), col("vec_id"), col("emb"),
        round(graft.ext.Similarity.cosine(col("emb"), col("q_emb")), 4)
          .as("rel"))
    val want = Similarity.mmrRerank(pool, 4, 0.7)
      .collect().map(_.toSeq).toSet
    val got = VectorIndex.diversifiedQueryRerank(spark, st, e, probes,
      k = 4, poolSize = 12, lambda = 0.7).collect().map(_.toSeq).toSet
    assert(got == want,
      "diversifiedQueryRerank diverged from the composition")
    // the exact-tail contract vs s19: same nomination, but selection
    // can differ when reconstruction error reorders the trade — both
    // must pick from the SAME nominated candidate set
    val nominated = cands.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got.foreach { row =>
      assert(nominated.contains(
        (row.head.asInstanceOf[Long], row(1).asInstanceOf[Long])),
        s"selection outside the nominated pool: $row")
    }
    // a tombstoned id leaves the pool (and thus the selection)
    val victim = got.head(1).asInstanceOf[Long]
    VectorIndex.delete(spark, st, Seq(victim))
    val after = VectorIndex.diversifiedQueryRerank(spark, st, e,
      probes, k = 4, poolSize = 12, lambda = 0.7)
      .collect().map(_.getLong(1)).toSet
    assert(!after.contains(victim),
      "tombstoned id still selected by the exact-tail retriever")
  }

  test("drift advisory: self-drift is exactly zero, a shifted corpus " +
    "trips, a same-distribution 2x growth does not, pre-baseline " +
    "stores fail loudly and rebuild") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf0001)
    val st = store("vidx-drift")
    VectorIndex.init(e, st, coarseIters = 2)
    // serving the training corpus itself: every drift component is
    // EXACTLY its identity value (decimal sums are order-free exact)
    val self = VectorIndex.driftReport(spark, st, e).collect()(0)
    assert(self.getAs[Double]("mean_shift") == 0.0 &&
      self.getAs[Double]("axis_shift") == 0.0 &&
      self.getAs[Double]("norm_ratio") == 1.0 &&
      self.getAs[Double]("n_ratio") == 1.0 &&
      !self.getAs[Boolean]("stale"),
      s"self-drift not identity: $self")
    // a planted translation (dim-0 of even ids) must trip the advisory
    val shifted = e.select(col("vec_id"),
      transform(col("embedding").cast("array<double>"),
        (x, i) => when(i === 0 && col("vec_id") % 2 === 0,
          x + lit(0.05)).otherwise(x)).as("embedding"))
    val drift = VectorIndex.driftReport(spark, st, shifted).collect()(0)
    assert(drift.getAs[Double]("mean_shift") > 0.01 &&
      drift.getAs[Boolean]("stale"),
      s"planted drift did not trip the advisory: $drift")
    assert(VectorIndex.reindexAdvised(spark, st, shifted),
      "reindexAdvised disagreed with the report")
    // same-distribution growth: the corpus unioned with itself under
    // fresh ids doubles every decimal sum AND the count, so means and
    // avg norm are BIT-identical — growth alone is not drift
    val doubled = e.unionByName(
      e.select((col("vec_id") + lit(1000000L)).as("vec_id"),
        col("embedding"), col("label")))
    val grown = VectorIndex.driftReport(spark, st, doubled).collect()(0)
    assert(grown.getAs[Double]("n_ratio") == 2.0 &&
      grown.getAs[Double]("mean_shift") == 0.0 &&
      grown.getAs[Double]("norm_ratio") == 1.0 &&
      !grown.getAs[Boolean]("stale"),
      s"same-distribution growth misread as drift: $grown")
    // a store built before drift baselines existed: driftReport fails
    // loudly, and initIfStale treats it as stale (rebuilds the baseline)
    val (bp, bf) = (new org.apache.hadoop.fs.Path(s"$st/baseline"),
      new org.apache.hadoop.fs.Path(s"$st/baseline")
        .getFileSystem(spark.sparkContext.hadoopConfiguration))
    bf.delete(bp, true)
    val ex = intercept[IllegalArgumentException] {
      VectorIndex.driftReport(spark, st, e)
    }
    assert(ex.getMessage.contains("predates drift baselines"))
    assert(VectorIndex.initIfStale(e, st, coarseIters = 2),
      "a pre-baseline store must read as stale")
    assert(!VectorIndex.driftReport(spark, st, e).collect()(0)
      .getAs[Boolean]("stale"))
  }

  test("stats-fed drift report == corpus-scan report BIT FOR BIT " +
    "(init and after updates), replays and duplicate stats rows fold, " +
    "no corpus scan in the executed plan, pre-stats stores fail " +
    "loudly and read as stale") {
    val e = Tables.embeddings(spark, sf0001)
    val base = e.filter(col("vec_id").cast("long") % 4 =!= 3)
    val delta = e.filter(col("vec_id").cast("long") % 4 === 3)
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          (x, i) => when(i === 0, x + lit(0.05)).otherwise(x))
          .as("embedding"))
    val st = store("vidx-driftstats")
    VectorIndex.init(base, st, coarseIters = 2)
    // identity: right after init the folded stats ARE the init corpus
    val s0 = VectorIndex.driftReportFromStats(spark, st).collect()(0)
    val c0 = VectorIndex.driftReport(spark, st, base).collect()(0)
    assert(s0.toSeq == c0.toSeq,
      s"stats-fed != corpus-scan after init: $s0 vs $c0")
    assert(!s0.getAs[Boolean]("stale"), "self-serving store read stale")
    // after an admitted delta: stats fold == scan of base ∪ delta
    VectorIndex.update(delta, st)
    val served = base.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      .unionByName(delta)
    val s1 = VectorIndex.driftReportFromStats(spark, st).collect()(0)
    val c1 = VectorIndex.driftReport(spark, st, served).collect()(0)
    assert(s1.toSeq == c1.toSeq,
      s"stats-fed != corpus-scan after update: $s1 vs $c1")
    // the planted dim-0 shift on the 25% delta moves the mean by
    // ~0.0125 > tolMean — the advisory trips THROUGH the stats path
    assert(s1.getAs[Double]("mean_shift") > 0.01 &&
      s1.getAs[Boolean]("stale"),
      s"planted delta drift did not trip the stats-fed advisory: $s1")
    assert(VectorIndex.reindexAdvisedFromStats(spark, st),
      "reindexAdvisedFromStats disagreed with the report")
    // the production property: the report never scans a corpus table
    val p = VectorIndex.driftReportFromStats(spark, st)
      .queryExecution.executedPlan.toString
    assert(!p.contains("embeddings.parquet") &&
      !p.contains("documents.parquet"),
      s"stats-fed report scanned a corpus table:\n$p")
    // a replayed update admits nothing — and writes no stats
    val nRows = spark.read.parquet(s"$st/driftstats").count()
    VectorIndex.update(delta, st)
    assert(spark.read.parquet(s"$st/driftstats").count() == nRows,
      "replayed update appended drift stats")
    // an at-least-once stats WRITER replay (byte-identical rows under
    // the same content-derived batch key) folds at read
    spark.read.parquet(s"$st/driftstats")
      .filter(col("batch_key") =!= "init")
      .write.mode("append").parquet(s"$st/driftstats")
    val s2 = VectorIndex.driftReportFromStats(spark, st).collect()(0)
    assert(s2.toSeq == s1.toSeq,
      "duplicate stats rows changed the report (distinct fold broken)")
    // a store that predates drift stats: loud failure, and
    // initIfStale reads it as stale (rebuilds the stats)
    val (dp, df) = (new org.apache.hadoop.fs.Path(s"$st/driftstats"),
      new org.apache.hadoop.fs.Path(s"$st/driftstats")
        .getFileSystem(spark.sparkContext.hadoopConfiguration))
    df.delete(dp, true)
    val ex = intercept[IllegalArgumentException] {
      VectorIndex.driftReportFromStats(spark, st)
    }
    assert(ex.getMessage.contains("predates drift stats"))
    assert(VectorIndex.initIfStale(base, st, coarseIters = 2),
      "a pre-driftstats store must read as stale")
    assert(VectorIndex.driftReportFromStats(spark, st).collect()(0)
      .toSeq == s0.toSeq, "rebuilt stats diverged from the first init")
  }

  test("reconciling delete: negative stats keep the stats-fed report " +
    "== the survivors' corpus-scan report BIT FOR BIT; replays " +
    "subtract nothing; coverage and dim guards fail loudly") {
    val e = Tables.embeddings(spark, sf0001)
    val st = store("vidx-recdel")
    VectorIndex.init(e, st, coarseIters = 2)
    val victims = Seq(0L, 7L, 42L)
    VectorIndex.delete(spark, st, victims, e)
    val survivors = e.filter(!col("vec_id").isin(victims: _*))
    val s1 = VectorIndex.driftReportFromStats(spark, st).collect()(0)
    val c1 = VectorIndex.driftReport(spark, st, survivors).collect()(0)
    assert(s1.toSeq == c1.toSeq,
      s"reconciled stats != survivors' corpus scan: $s1 vs $c1")
    // replay: the ids are tombstoned now, so nothing subtracts twice
    val nRows = spark.read.parquet(s"$st/driftstats").count()
    VectorIndex.delete(spark, st, victims, e)
    assert(spark.read.parquet(s"$st/driftstats").count() == nRows,
      "replayed reconciling delete appended stats")
    assert(VectorIndex.driftReportFromStats(spark, st).collect()(0)
      .toSeq == s1.toSeq, "replayed delete changed the report")
    // partial replay: one already-deleted id + one new id subtracts
    // ONLY the new id's rows
    VectorIndex.delete(spark, st, Seq(42L, 99L), e)
    val s2 = VectorIndex.driftReportFromStats(spark, st).collect()(0)
    val c2 = VectorIndex.driftReport(spark, st,
      e.filter(!col("vec_id").isin(0L, 7L, 42L, 99L))).collect()(0)
    assert(s2.toSeq == c2.toSeq,
      "partial-replay reconciliation diverged from the survivors")
    // a frame missing one of the ids to delete must fail loudly, and
    // leave neither stats nor tombstones behind
    val before = spark.read.parquet(s"$st/driftstats").count()
    val exCov = intercept[IllegalArgumentException] {
      VectorIndex.delete(spark, st, Seq(11L),
        e.filter(col("vec_id") =!= 11L))
    }
    assert(exCov.getMessage.contains("missing from the supplied"))
    assert(spark.read.parquet(s"$st/driftstats").count() == before,
      "failed delete left negative stats behind")
    assert(VectorIndex.query(spark, st,
      e.filter(col("vec_id") === 11L), k = 1).collect().nonEmpty,
      "failed delete tombstoned the id anyway")
    // wrong-dimension vectors refused (they would subtract garbage)
    import spark.implicits._
    val exDim = intercept[IllegalArgumentException] {
      VectorIndex.delete(spark, st, Seq(12L),
        Seq((12L, Seq(1.0, 2.0))).toDF("vec_id", "embedding"))
    }
    assert(exDim.getMessage.contains("-dim"))
  }

  test("fingerprint is partition-order-independent on huge-magnitude " +
    "content (the long-sum discipline): no spurious rebuild") {
    import spark.implicits._
    // weighted terms ~ 2e14 per row: a double sum across 50 rows
    // exceeds 2^53 (integer-valued doubles stop summing exactly) and
    // its value depends on partition visit order — per-row long casts
    // summed as longs cannot. Magnitudes stay below the PCA moment
    // grid's own fixed-point range (the baseline write must succeed).
    val big = (0 until 50).map { k =>
      (k.toLong, Seq.tabulate(64)(i => 1e5 + k * 0.3 + i * 0.01))
    }.toDF("vec_id", "embedding")
    val st = store("vidx-fp")
    VectorIndex.init(big.repartition(3), st, coarseIters = 2)
    for (parts <- Seq(1, 7, 13))
      assert(!VectorIndex.initIfStale(big.repartition(parts), st,
        coarseIters = 2),
        s"fingerprint changed under repartition($parts) — " +
          "the content sum is partition-order-dependent")
  }

  test("reconcileDriftStats repairs a divergent-retry double count; " +
    "unreconciledTombstones tracks vectors-free deletes and resets " +
    "after a reconcile") {
    val e = Tables.embeddings(spark, sf0001)
    val base = e.filter(col("vec_id").cast("long") % 4 =!= 3)
    val delta = e.filter(col("vec_id").cast("long") % 4 === 3)
    val st = store("vidx-reconcile")
    VectorIndex.init(base, st, coarseIters = 2)
    VectorIndex.update(delta, st)
    assert(VectorIndex.unreconciledTombstones(spark, st) == 0L)
    val served = base.unionByName(delta)
    // the documented hole: a crashed update retried with a DIFFERENT
    // key re-admits overlapping stats — simulate by re-appending the
    // delta's stats rows under a mutated batch key (fold cannot drop
    // them: the key differs)
    val dup = spark.read.parquet(s"$st/driftstats")
      .filter(col("batch_key").startsWith("b"))
      .withColumn("batch_key", concat(col("batch_key"), lit("_retry")))
    dup.write.mode("append").parquet(s"$st/driftstats")
    val bad = VectorIndex.driftReportFromStats(spark, st).collect()(0)
    val truth = VectorIndex.driftReport(spark, st, served).collect()(0)
    assert(bad.toSeq != truth.toSeq,
      "the planted double count should diverge (else the test is vacuous)")
    VectorIndex.reconcileDriftStats(spark, st, served)
    val fixed = VectorIndex.driftReportFromStats(spark, st).collect()(0)
    assert(fixed.toSeq == truth.toSeq,
      s"reconciled stats != corpus-scan report: $fixed vs $truth")
    // vectors-free deletes leave the stats counting the appended
    // corpus — the caveat counter must say how many
    VectorIndex.delete(spark, st, Seq(1L, 2L, 5L))
    assert(VectorIndex.unreconciledTombstones(spark, st) == 3L,
      "vectors-free deletes not counted as unreconciled")
    // a reconciling delete subtracts its own rows: no NEW unreconciled
    VectorIndex.delete(spark, st, Seq(6L, 9L), e)
    assert(VectorIndex.unreconciledTombstones(spark, st) == 3L,
      "reconciling delete wrongly counted as unreconciled")
    // a full reconcile on the survivors accounts for everything
    val survivors = served.filter(
      !col("vec_id").isin(1L, 2L, 5L, 6L, 9L))
    VectorIndex.reconcileDriftStats(spark, st, survivors)
    assert(VectorIndex.unreconciledTombstones(spark, st) == 0L,
      "reconcile did not reset the tombstone bookkeeping")
    assert(VectorIndex.driftReportFromStats(spark, st).collect()(0)
      .toSeq == VectorIndex.driftReport(spark, st, survivors)
      .collect()(0).toSeq,
      "post-reconcile stats-fed report != survivors' corpus scan")
  }

  test("atomic rebuild: readers serve the OLD model at every point " +
    "before the swap, the swap is all-or-nothing, a crash between its " +
    "renames recovers, tombstones clear") {
    val e = Tables.embeddings(spark, sf0001)
    val probes = e.filter(col("vec_id") < 5)
    val st = store("vidx-rebuild")
    VectorIndex.init(e.filter(col("vec_id") < 300), st, coarseIters = 2)
    VectorIndex.delete(spark, st, Seq(7L))
    val oldAnswer = VectorIndex.query(spark, st, probes, k = 3)
      .collect().map(_.toSeq).toSeq
    // the beforeSwap hook runs after the FULL retrain, before the
    // publish: the store must still serve the old model there
    var served: Seq[Seq[Any]] = null
    VectorIndex.rebuild(e, st, 0, 8, 16, 64, 1, 2, () => {
      served = VectorIndex.query(spark, st, probes, k = 3)
        .collect().map(_.toSeq).toSeq
    })
    assert(served == oldAnswer,
      "a reader mid-rebuild saw something other than the old model")
    // after the swap: the store == a fresh init on the new corpus
    val want = {
      val ref = store("vidx-rebuild-ref")
      VectorIndex.init(e, ref, coarseIters = 2)
      VectorIndex.query(spark, ref, probes, k = 3)
        .collect().map(_.toSeq).toSeq
    }
    assert(VectorIndex.query(spark, st, probes, k = 3)
      .collect().map(_.toSeq).toSeq == want,
      "rebuilt store diverged from a fresh init on the new corpus")
    // tombstones cleared: id 7 serves again (it is in the new corpus)
    assert(VectorIndex.reconstruct(spark, st, Seq(7L)).count() == 1,
      "rebuild did not clear tombstones")
    // crash window: store renamed away, __old survives — the next
    // read restores it (the recoverIfSwapped contract)
    val (p, f) = (new org.apache.hadoop.fs.Path(st),
      new org.apache.hadoop.fs.Path(st)
        .getFileSystem(spark.sparkContext.hadoopConfiguration))
    require(f.rename(p, new org.apache.hadoop.fs.Path(st + "__old")))
    assert(VectorIndex.exists(spark, st),
      "interrupted swap not recovered from __old")
    assert(VectorIndex.query(spark, st, probes, k = 3)
      .collect().map(_.toSeq).toSeq == want,
      "recovered store serves wrong content")
    // rebuilding a missing store is loud (bootstrap is init's job)
    val ex = intercept[IllegalArgumentException] {
      VectorIndex.rebuild(e, tmpDir("vidx-rebuild-none") + "/missing")
    }
    assert(ex.getMessage.contains("to rebuild"))
  }

  test("loud failure modes: query/update/delete/compact on a missing " +
    "store") {
    val e = Tables.embeddings(spark, sf0001)
    val none = tmpDir("vidx-none") + "/missing"
    val qe = intercept[IllegalArgumentException] {
      VectorIndex.query(spark, none, e.limit(1), k = 1)
    }
    assert(qe.getMessage.contains("no vector index store"))
    val ue = intercept[IllegalArgumentException] {
      VectorIndex.update(e.limit(1), none)
    }
    assert(ue.getMessage.contains("no vector index store"))
    val de = intercept[IllegalArgumentException] {
      VectorIndex.delete(spark, none, Seq(0L))
    }
    assert(de.getMessage.contains("no vector index store"))
    val ce = intercept[IllegalArgumentException] {
      VectorIndex.compact(spark, none)
    }
    assert(ce.getMessage.contains("no vector index store"))
  }
}
