package graft.ext

import graft.SparkTestBase

/** The fail-soft contract, under fire: every walk/parser in the
  * crawl and container planes promises None/degraded — never an
  * exception — on hostile bytes. A 100 TB shard WILL contain every
  * mutation; one escaping exception fails a task and poisons its
  * whole partition. Seeded (deterministic) fuzz: pure random inputs,
  * bit-flip mutations of VALID fixtures, and truncations at every
  * prefix length — across all of them the parsers must return,
  * not throw.
  */
class FailSoftFuzzSpec extends SparkTestBase {

  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

  private def fixtures: Seq[(String, Array[Byte])] = Seq(
    "warc" -> Warc.warcArchiveBytes(3L,
      Seq(1L -> "alpha beta".getBytes(Ascii),
        2L -> "1234567".getBytes(Ascii))),
    "warc.gz" -> Warc.gzipPerRecord(Warc.warcArchiveBytes(4L,
      Seq(5L -> "gz fuzz body".getBytes(Ascii)))),
    "png" -> Multimodal.pngBytes(9, 5, 17),
    "html" -> Html.htmlPage(12L, "some doc text here").getBytes(Ascii),
    "sitemap" -> Sitemaps.synthSitemap(7L).getBytes(Ascii),
    "robots" -> Robots.synthRobots(6L).getBytes(Ascii))

  /** Run every parser on one payload; throwing fails the test. */
  private def allParsers(name: String, b: Array[Byte]): Unit = {
    val s = new String(b, Ascii)
    try {
      Warc.parseWarc(b)
      Warc.gunzipMembers(b)
      Warc.memberBounds(b)
      Warc.fetchRecord(b, 0L, b.length.toLong)
      Warc.fetchRecord(b, b.length / 3L, b.length / 2L)
      Multimodal.parsePngMeta(b)
      Multimodal.parseJpegMeta(b)
      Multimodal.parseMp4(b)
      Multimodal.parseMkv(b)
      Multimodal.parseMp3(b)
      Multimodal.parseFlac(b)
      Multimodal.parseOgg(b)
      Html.extractText(s)
      Html.htmlMeta(s)
      Html.attrsOf(s.take(500))
      Sitemaps.parse(s)
      Robots.parse(s, "graftbot")
      Urls.canonicalize(s.take(200))
      ()
    } catch {
      case e: Throwable =>
        fail(s"parser threw on $name (${b.length} B): $e")
    }
  }

  test("pure random bytes: no parser throws") {
    val rnd = new scala.util.Random(0xf00dL)
    for (round <- 0 until 60) {
      val len = rnd.nextInt(600)
      val b = new Array[Byte](len)
      rnd.nextBytes(b)
      allParsers(s"random#$round", b)
    }
  }

  test("bit-flip mutations of valid fixtures: no parser throws") {
    val rnd = new scala.util.Random(0xbeefL)
    for ((name, good) <- fixtures; round <- 0 until 40) {
      val b = good.clone()
      val flips = 1 + rnd.nextInt(4)
      for (_ <- 0 until flips) {
        val at = rnd.nextInt(b.length)
        b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
      }
      allParsers(s"$name-flip#$round", b)
    }
  }

  test("every truncation prefix of every fixture: no parser throws") {
    for ((name, good) <- fixtures) {
      val step = math.max(1, good.length / 120)
      var k = 0
      while (k <= good.length) {
        allParsers(s"$name-trunc@$k", good.take(k))
        k += step
      }
    }
  }

  test("splices: fixture headers grafted onto foreign bodies") {
    val rnd = new scala.util.Random(0xcafeL)
    val fs = fixtures
    for (round <- 0 until 60) {
      val (an, a) = fs(rnd.nextInt(fs.length))
      val (bn, b) = fs(rnd.nextInt(fs.length))
      val cut = rnd.nextInt(math.max(1, a.length))
      allParsers(s"splice#$round($an+$bn)",
        a.take(cut) ++ b.drop(math.min(cut, b.length)))
    }
  }
}
