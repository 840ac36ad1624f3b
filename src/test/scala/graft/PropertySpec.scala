package graft

import graft.engine.Exporter
import graft.ext.TextAnalysis
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/** ScalaCheck properties for the pure logic (SURVEY.md §5 item 3):
  * path composition, incremental window arithmetic, hash parameter
  * ranges, rolling-hash determinism.
  */
object PropertySpec extends Properties("graft") {

  private val nameGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)

  property("destPath composes <root>/<session>/<table>, slash-normalized") =
    forAll(nameGen, nameGen, nameGen) { (root, sess, table) =>
      val withSlash = Exporter.destPath(root + "/", sess, table)
      val without = Exporter.destPath(root, sess, table)
      (withSlash == without) :| "trailing slash normalized" &&
        (without == s"$root/$sess/$table") :| "layout" &&
        (!without.contains("//")) :| "no double slash"
    }

  property("incremental windows tile: start_i == end_{i-1}, no gap/overlap") =
    forAll(Gen.listOfN(6, Gen.choose(1000L, 10000000L))) { raw =>
      val bounds = raw.distinct.sorted
      (bounds.size >= 2) ==> {
        val windows = bounds.sliding(2).collect {
          case Seq(a, b) => (a, b)
        }.toSeq
        val tiled = windows.sliding(2).forall {
          case Seq((_, e1), (s2, _)) => e1 == s2
          case _ => true
        }
        val covered = windows.map { case (a, b) => b - a }.sum ==
          bounds.last - bounds.head
        tiled :| "consecutive windows share a bound" &&
          covered :| "windows cover the range exactly once"
      }
    }

  property("rolling hash is deterministic and order-sensitive") =
    forAll(Gen.asciiPrintableStr, Gen.asciiPrintableStr) { (a, b) =>
      val repeat = TextAnalysis.rollingHash(a + b) ==
        TextAnalysis.rollingHash(a + b)
      val orderSensitive = (a + b) == (b + a) ||
        TextAnalysis.rollingHash(a + b) != TextAnalysis.rollingHash(b + a)
      repeat :| "deterministic" && orderSensitive :| "order-sensitive"
    }

  property("minhash parameters are overflow-free universal hashes") = Prop {
    import graft.ext.Hashing._
    As.zip(Bs).forall { case (a, b) =>
      a > 0 && a < P && b >= 0 && b < P &&
        BigInt(a) * (P - 1) + b < (BigInt(1) << 62)
    }
  }

  property("LSH planes are deterministic across calls") =
    forAll(Gen.choose(0, 7), Gen.choose(0, 7)) { (t, b) =>
      val p1 = graft.ext.Similarity.plane(t, b, 64)
      val p2 = graft.ext.Similarity.plane(t, b, 64)
      p1.sameElements(p2)
    }

  property("autoBits: monotone, clamped, occupancy-covering") =
    forAll(Gen.chooseNum(0L, 1L << 50), Gen.chooseNum(0L, 1L << 50)) {
      (a, b) =>
        import graft.ext.Similarity.autoBits
        val (lo, hi) = (math.min(a, b), math.max(a, b))
        val (bl, bh) = (autoBits(lo), autoBits(hi))
        val groups = (hi / 32) + (if (hi % 32 > 0) 1 else 0)
        (bl <= bh) :| s"monotone: $lo->$bl vs $hi->$bh" &&
        (bh >= 6 && bh <= 20) :| s"clamp: $bh" &&
        (bh == 20 || (1L << bh) >= groups) :| s"coverage at $hi"
    }

  property("autoNlist: monotone, floored, occupancy-covering") =
    forAll(Gen.chooseNum(0L, 1L << 50), Gen.chooseNum(0L, 1L << 50)) {
      (a, b) =>
        import graft.ext.Similarity.autoNlist
        val (lo, hi) = (math.min(a, b), math.max(a, b))
        val (nl, nh) = (autoNlist(lo), autoNlist(hi))
        (nl <= nh) :| s"monotone: $lo->$nl vs $hi->$nh" &&
        (nl >= 16) :| s"floor: $nl" &&
        (nh == Int.MaxValue || nh.toLong * 128 >= hi) :|
          s"coverage: $nh clusters for $hi"
    }

  property("lshMix stays in [0, 2^31-1) and is deterministic") =
    forAll(Gen.chooseNum(0L, Long.MaxValue / 8)) { x =>
      import graft.ext.Similarity.lshMix
      val k = lshMix(x)
      (k >= 0 && k < 2147483647L) :| s"range: $k" &&
      (k == lshMix(x)) :| "deterministic"
    }

  property("pHash locality: a single in-place byte edit flips <= 2 bits") =
    forAll(Gen.listOfN(260, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)),
      Gen.choose(0, 259), Gen.chooseNum(Byte.MinValue, Byte.MaxValue)) {
      (bs, pos, nb) =>
        import graft.ext.Multimodal
        val a = bs.map(_.toByte).toArray
        val b = a.clone(); b(pos) = nb.toByte
        val d = java.lang.Long.bitCount(
          Multimodal.pHashStub(a) ^ Multimodal.pHashStub(b))
        // one chunk sum moves -> only the two neighbor comparisons
        // that read it can flip
        (d <= 2) :| s"hamming $d after a 1-byte edit at $pos"
    }

  property("pHash is deterministic and total on any payload") =
    forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bs =>
      import graft.ext.Multimodal
      val p = bs.map(_.toByte).toArray
      Multimodal.pHashStub(p) == Multimodal.pHashStub(p.clone())
    }

  property("semDedup centroid key sees all id bits: a strided id stream " +
    "never collapses to one key") =
    // the regression this guards: (id*m) % 2^16 is a pure function of
    // the LOW bits, so snowflake-style ids (stride 2^22) all got one
    // key and the "pseudo-random" centroid sample became the earliest
    // ids. Mod-an-odd-prime-first keys must spread any stride.
    forAll(Gen.choose(0L, 1L << 60),
      Gen.choose(1L, graft.ext.Similarity.CentroidPrime - 1)) {
      (base, stride) =>
      // THE production key (shared constants/function — editing
      // Similarity's arithmetic cannot silently detach this guard)
      import graft.ext.Similarity.{centroidKey, CentroidPrime}
      // stride coprime to the prime modulus (any stride < p qualifies)
      // => 64 consecutive stream ids map to 64 DISTINCT keys — the
      // multiply-mod-p map is a bijection on residues
      val keys = (0 until 64).map(i => centroidKey(base + i * stride))
        .distinct
      (keys.size == 64) :| s"only ${keys.size}/64 distinct keys at " +
        s"stride $stride" &&
        keys.forall(k => k >= 0L && k < CentroidPrime) :| "key in [0, p)"
    }

  property("resizeStub: exact output size, subset bytes, deterministic") =
    forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)),
      Gen.choose(8, 512), Gen.choose(8, 512)) { (bs, w, h) =>
      import graft.ext.Multimodal
      val payload = bs.map(_.toByte).toArray
      val out = Multimodal.resizeStub(payload, w, h)
      val expected =
        if (payload.isEmpty) 0
        else math.min(payload.length, math.max(1, w * h / 64))
      (out.length == expected) :| s"size ${out.length} != $expected" &&
        out.forall(payload.contains) :| "bytes come from the payload" &&
        out.sameElements(Multimodal.resizeStub(payload, w, h)) :| "deterministic"
    }
}
