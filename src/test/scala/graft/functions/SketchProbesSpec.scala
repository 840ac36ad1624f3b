package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The native sketch probes: codegen/interpreted parity, the UDF
  * semantics they replaced (null hash → false, not NULL), and the
  * plan claim (the probe stays inside whole-stage codegen).
  */
class SketchProbesSpec extends SparkTestBase {

  private val k = graft.engine.Sketches.BloomHashes
  private val m = 1 << 16

  private def builtWords(hashes: Seq[Long]): Array[Long] = {
    val w = new Array[Long]((m + 63) >>> 6)
    for (h <- hashes; i <- 0 until k) {
      val pos = graft.engine.Sketches.bloomPos(i, h, m)
      w(pos >>> 6) |= 1L << (pos & 63)
    }
    w
  }

  test("bloom probe: codegen == interpreted == scalar; members always " +
    "hit; null hash probes false, never NULL") {
    import spark.implicits._
    val members = (1L to 200L).map(_ * 7919L)
    val words = builtWords(members)
    val probes: Seq[Option[Long]] =
      members.take(50).map(Some(_)) ++
        (1L to 50L).map(i => Some(i * 104729L + 13L)) ++ Seq(None)
    val df = probes.toDF("h")
      .select(col("h"), SketchProbes
        .bloom_might_contain(col("h"), words, k, m).as("might"))
    val got = df.collect().map(r =>
      (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getBoolean(1)))
    got.foreach { case (h, might) =>
      val want = h.exists(SketchProbes.bloomMight(words, _, k, m))
      assert(might == want, s"probe $h: codegen $might vs scalar $want")
      // interpreted eval path agrees too
      val interp = BloomMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(h.orNull,
          org.apache.spark.sql.types.LongType), words, k, m)
        .eval(null).asInstanceOf[Boolean]
      assert(interp == want, s"probe $h: interpreted $interp vs $want")
    }
    // no false negatives on members; null is false (nullable = false)
    assert(got.filter(_._1.exists(members.contains)).forall(_._2))
    assert(got.find(_._1.isEmpty).exists(_._2 == false))
    assert(!df.schema("might").nullable)
    // the probe must not break whole-stage codegen — over a REAL scan
    // (a local relation constant-folds to LocalTableScan)
    val dir = tmpDir("bloom-probe") + "/h"
    probes.toDF("h").write.parquet(dir)
    val scanned = spark.read.parquet(dir)
      .select(SketchProbes.bloom_might_contain(col("h"), words, k, m)
        .as("might"))
    scanned.collect()
    // the `*(n)` prefix IS the whole-stage-codegen marker in the
    // compact plan string — the projection holding the probe must
    // carry it
    val plan = scanned.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[bloommightcontain""".r
      .findFirstIn(plan).isDefined,
      s"bloom probe fell out of whole-stage codegen:\n$plan")
  }

  test("cms estimate: codegen == interpreted == direct sketch; " +
    "over-estimate only") {
    import spark.implicits._
    val tokens = (1 to 300).map(i => s"tok${i % 40}")
    val cms = tokens.toDF("token")
      .stat.countMinSketch("token", 1e-3, 0.99, 42)
    val sample = (0 until 40).map(i => s"tok$i") ++ Seq("ghost")
    val got = sample.toDF("token")
      .select(col("token"),
        SketchProbes.cms_estimate(col("token"), cms).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = tokens.groupBy(identity).view.mapValues(_.size.toLong)
    sample.foreach { t =>
      assert(got(t) == cms.estimateCount(t),
        s"$t: codegen ${got(t)} vs sketch ${cms.estimateCount(t)}")
      assert(got(t) == SketchProbes.cmsEstimate(cms,
        UTF8String.fromString(t)), s"$t: interpreted parity")
      assert(got(t) >= truth.getOrElse(t, 0L),
        s"$t: CMS under-estimated — impossible by construction")
    }
  }

  test("size gate: a >InlineSketchMaxBytes bloom ships as an explicit " +
    "broadcast handle (small task binary), same answers, still codegen") {
    import spark.implicits._
    import org.apache.spark.sql.GraftColumnBridge
    // 16 MiB of bitmap (2^21 longs) — 4x the inline ceiling; with
    // addReferenceObj this would serialize 16 MiB into EVERY task
    // binary (the DAGScheduler 'broadcasting large task binary'
    // warning the round-8 bench tail carried at 1 MiB)
    val bigM = 1 << 27
    val members = (1L to 500L).map(_ * 7919L)
    val bigWords = {
      val w = new Array[Long]((bigM + 63) >>> 6)
      for (h <- members; i <- 0 until k) {
        val pos = graft.engine.Sketches.bloomPos(i, h, bigM)
        w(pos >>> 6) |= 1L << (pos & 63)
      }
      w
    }
    assert(bigWords.length.toLong * 8 > SketchProbes.InlineSketchMaxBytes)
    val probeCol = SketchProbes
      .bloom_might_contain(col("h"), bigWords, k, bigM)
    // the factory must have picked the broadcast-backed expression…
    assert(GraftColumnBridge.expression(probeCol)
      .isInstanceOf[BloomMightContainBroadcast],
      "factory inlined a sketch above the task-binary ceiling")
    // …and a small sketch must stay inline (no broadcast round-trips
    // for the KB-scale sketches every query builds)
    assert(GraftColumnBridge.expression(SketchProbes
        .bloom_might_contain(col("h"), builtWords(members), k, m))
      .isInstanceOf[BloomMightContain])
    // answers: members all hit, codegen == scalar, null probes false
    val probes: Seq[Option[Long]] = members.take(60).map(Some(_)) ++
      (1L to 60L).map(i => Some(i * 104729L + 13L)) ++ Seq(None)
    val dir = tmpDir("bloom-bcast") + "/h"
    probes.toDF("h").write.parquet(dir)
    val scanned = spark.read.parquet(dir)
      .select(col("h"), probeCol.as("might"))
    val got = scanned.collect().map(r =>
      (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getBoolean(1)))
    got.foreach { case (h, might) =>
      val want = h.exists(SketchProbes.bloomMight(bigWords, _, k, bigM))
      assert(might == want, s"probe $h: broadcast path $might vs $want")
    }
    assert(got.filter(_._1.exists(members.contains)).forall(_._2))
    assert(got.find(_._1.isEmpty).exists(_._2 == false))
    // the broadcast form keeps the whole-stage-codegen contract
    val plan = scanned.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[h#""".r.findFirstIn(plan).isDefined ||
      """\*\(\d+\) Project \[""".r.findFirstIn(plan).isDefined,
      s"broadcast bloom probe fell out of whole-stage codegen:\n$plan")
    // CMS gate: same rule through the cms_estimate factory
    val tokens = (1 to 100).map(i => s"tok${i % 10}")
    val smallCms = tokens.toDF("token")
      .stat.countMinSketch("token", 1e-3, 0.99, 42)
    assert(GraftColumnBridge.expression(
        SketchProbes.cms_estimate(col("token"), smallCms))
      .isInstanceOf[CmsEstimate])
    val bigCms = tokens.toDF("token")
      .stat.countMinSketch("token", 1e-5, 0.99, 42) // ~8 MiB of counters
    assert(bigCms.depth.toLong * bigCms.width * 8 >
      SketchProbes.InlineSketchMaxBytes)
    val bigCol = SketchProbes.cms_estimate(col("token"), bigCms)
    assert(GraftColumnBridge.expression(bigCol)
      .isInstanceOf[CmsEstimateBroadcast])
    val est = Seq("tok1", "ghost").toDF("token")
      .select(col("token"), bigCol.as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("tok1") == bigCms.estimateCount("tok1") &&
      est("ghost") == bigCms.estimateCount("ghost"),
      "broadcast CMS path diverged from the direct sketch")
  }
}
