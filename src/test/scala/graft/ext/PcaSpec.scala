package graft.ext

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.Exchange

class PcaSpec extends SparkTestBase {

  import spark.implicits._

  /** splitmix-ish deterministic noise in [-0.5, 0.5). */
  private def mixD(s: Long, j: Int): Double = {
    var z = s * 64 + j + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    ((z ^ (z >>> 31)) >>> 11).toDouble / (1L << 53) - 0.5
  }

  /** A corpus with one dominant direction: x_i = t_i·d + ε, where d
    * alternates ±1 over the first 8 dims, t_i spreads over ±2, and
    * the noise is 0.05-scale — variance along d dwarfs everything.
    */
  private def plantedCorpus(n: Int = 120, dim: Int = 16)
      : (Seq[(Long, Array[Double])], Array[Double], Array[Double]) = {
    val dir = Array.tabulate(dim)(j =>
      if (j < 8) (if (j % 2 == 0) 1.0 else -1.0) else 0.0)
    val ts = Array.tabulate(n)(i => (i.toDouble / (n - 1) - 0.5) * 4.0)
    val rows = (0 until n).map { i =>
      (i.toLong, Array.tabulate(dim)(j =>
        ts(i) * dir(j) + 0.05 * mixD(i, j)))
    }
    (rows, dir, ts.map(identity))
  }

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    dot / (na * nb)
  }

  test("power iteration recovers a planted dominant direction") {
    val (rows, dir, ts) = plantedCorpus()
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.pcaModel(df, iters = 4)
    assert(math.abs(cosine(m.v, dir)) > 0.99,
      s"learned direction misaligned: |cos| = ${cosine(m.v, dir)}")
    // projections order like the planted coefficients (up to the
    // canonical sign, constant across the corpus)
    val proj = Pca.pcaScore(df, m).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val s = math.signum(cosine(m.v, dir))
    val ordered = rows.map(_._1).sortBy(id => s * proj(id))
    assert(ordered == rows.map(_._1).sortBy(id => ts(id.toInt)),
      "projection does not order the corpus by the planted coefficient")
  }

  test("sign canon: the lowest-indexed dominant component is positive") {
    val (rows, _, _) = plantedCorpus()
    val m = Pca.pcaModel(rows.toDF("vec_id", "embedding"), iters = 3)
    val j = m.v.indices.find(i => math.abs(m.v(i)) == 1.0)
    assert(j.isDefined, "power iteration must land the pivot on ±1.0")
    assert(m.v(j.get) == 1.0)
    // negating the corpus leaves the covariance — hence the canonical
    // component — identical
    val neg = rows.map { case (id, v) => (id, v.map(-_)) }
      .toDF("vec_id", "embedding")
    val m2 = Pca.pcaModel(neg, iters = 3)
    assert(m2.v.toSeq == m.v.toSeq)
    // +0.0 normalises −0.0 for the boxed comparison
    assert(m2.mu.map(_ + 0.0).toSeq == m.mu.map(-_ + 0.0).toSeq)
  }

  test("model is invariant under repartitioning (decimal sums are order-free)") {
    val e = Tables.embeddings(spark, sf0001)
    val m1 = Pca.pcaModel(e, iters = 2)
    val m2 = Pca.pcaModel(e.repartition(7, col("vec_id")), iters = 2)
    assert(m1.mu.toSeq == m2.mu.toSeq)
    assert(m1.v.toSeq == m2.v.toSeq)
  }

  test("rawMoments partition fold: null/ragged semantics match the " +
    "exploded aggregate, and the plan is one fold + one tiny re-sum") {
    import org.apache.spark.sql.functions.{col, posexplode, slice, lit,
      round => sqlRound, sum => sqlSum}
    // adversarial: null emb (no groups), null elements (group exists,
    // null-skipping sum), ragged lengths (triangle grows per row)
    val df = Seq[(Long, Array[java.lang.Double])](
      (1L, Array[java.lang.Double](1.5, -2.25, 0.5)),
      (2L, Array[java.lang.Double](0.1, null, 3.0)),
      (3L, null),
      (4L, Array[java.lang.Double](2.0))
    ).toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb"))
    val got = Pca.rawMoments(df).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    // the r14 exploded-aggregate reference, inline
    val want = df
      .select(col("emb"), posexplode(col("emb")).as(Seq("i", "a")))
      .select(col("i"), col("a"),
        posexplode(slice(col("emb"), lit(1), col("i") + lit(1)))
          .as(Seq("j", "b")))
      .groupBy(col("i"), col("j"))
      .agg(sqlSum(sqlRound((col("a") * col("b")) * lit(1e6), 0)
        .cast("long")).as("s"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got == want, s"moments diverged:\n  got:  $got\n  want: $want")
    // shape: the corpus pass is a partition fold (no Generate), and
    // the only aggregate input is the partitions*d^2/2 partial rows
    val plans = capturedPlans { Pca.rawMoments(df).collect() }
    assert(plans.exists(_.contains("MapPartitions")),
      "rawMoments lost its partition fold")
    assert(!plans.exists(_.contains("Generate")),
      "rawMoments still explodes the n*d^2/2 product grid")
  }

  test("degenerate constant corpus keeps the all-ones start and projects to 0") {
    val df = (0L until 20L).map(i => (i, Array.fill(6)(3.25)))
      .toDF("vec_id", "embedding")
    val m = Pca.pcaModel(df, iters = 3)
    assert(m.v.toSeq == Seq.fill(6)(1.0))
    val proj = Pca.pcaScore(df, m).collect()
    assert(proj.forall(_.getDouble(1) == 0.0))
    // and no −0.0 escapes (the +0.0 normalisation)
    assert(proj.forall(r =>
      java.lang.Double.doubleToRawLongBits(r.getDouble(1)) == 0L))
  }

  test("deployment scorer: zero-shuffle plan, within float-sum error of the truth twin") {
    val e = Tables.embeddings(spark, sf0001)
    val m = Pca.pcaModel(e, iters = 2)
    val truth = Pca.pcaScore(e, m).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fast = Pca.pcaScoreMap(e, m)
    assert(fast.queryExecution.executedPlan.collect {
      case ex: Exchange => ex }.isEmpty,
      "pcaScoreMap must be a narrow map — no Exchange in its plan")
    val got = fast.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == truth.keySet)
    got.foreach { case (id, p) =>
      assert(math.abs(p - truth(id)) < 1e-9,
        s"vec $id: map scorer $p vs truth ${truth(id)}")
    }
  }

  test("pcaProject is pcaScore over pcaModel (one definition, no drift)") {
    val e = Tables.embeddings(spark, sf0001)
    val viaProject = Pca.pcaProject(e, iters = 2).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    val viaParts = Pca.pcaScore(e, Pca.pcaModel(e, iters = 2)).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(viaProject == viaParts)
  }

  test("training leaves no cached intermediates behind") {
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    val e = Tables.embeddings(spark, sf0001)
    Pca.pcaModel(e, iters = 2)
    // the pqTopK discipline: training releases both its persists
    assert(spark.sparkContext.getPersistentRDDs.size == cachedBefore,
      "pcaModel left cached intermediates behind")
  }

  test("deflation: the two-component projection separates two planted " +
    "orthogonal directions") {
    val dim = 16
    val n = 120
    val d1 = Array.tabulate(dim)(j =>
      if (j < 8) (if (j % 2 == 0) 1.0 else -1.0) else 0.0)
    val d2 = Array.tabulate(dim)(j => if (j >= 8 && j < 12) 1.0 else 0.0)
    val t1 = Array.tabulate(n)(i => (i.toDouble / (n - 1) - 0.5) * 8.0)
    // a 37-step permutation decorrelates t2 from t1
    val t2 = Array.tabulate(n)(i =>
      (((i * 37) % n).toDouble / (n - 1) - 0.5) * 3.0)
    val rows = (0 until n).map { i =>
      (i.toLong, Array.tabulate(dim)(j =>
        t1(i) * d1(j) + t2(i) * d2(j) + 0.03 * mixD(i, j)))
    }
    val proj = Pca.pcaProject2(rows.toDF("vec_id", "embedding"), iters = 6)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    def corr(a: Array[Double], b: Array[Double]): Double = {
      val ma = a.sum / a.length
      val mb = b.sum / b.length
      val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
      val va = a.map(x => (x - ma) * (x - ma)).sum
      val vb = b.map(x => (x - mb) * (x - mb)).sum
      cov / math.sqrt(va * vb)
    }
    val pc1 = Array.tabulate(n)(i => proj(i.toLong)._1)
    val pc2 = Array.tabulate(n)(i => proj(i.toLong)._2)
    assert(math.abs(corr(pc1, t1)) > 0.999,
      s"pc1 must track the dominant coefficient: ${corr(pc1, t1)}")
    assert(math.abs(corr(pc2, t2)) > 0.95,
      s"pc2 must track the second coefficient: ${corr(pc2, t2)}")
    // deflation removed the dominant direction from the second axis
    assert(math.abs(corr(pc2, t1)) < 0.1,
      s"pc2 still carries the dominant direction: ${corr(pc2, t1)}")
    assert(math.abs(corr(pc1, t2)) < 0.1,
      s"pc1 carries the second direction: ${corr(pc1, t2)}")
  }
}
