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
}
