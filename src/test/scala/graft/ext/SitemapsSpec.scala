package graft.ext

import graft.{SparkTestBase, Tables}

class SitemapsSpec extends SparkTestBase {

  test("urlset walk: entries in order, loc entity-decoded, optional " +
    "fields absent when missing, priority parse degrades") {
    val xml =
      """<?xml version="1.0"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url><loc>https://h.example/a?x=1&amp;y=2</loc>
        |  <lastmod>2024-06-01</lastmod><priority>0.8</priority></url>
        |<url><loc>https://h.example/b</loc>
        |  <priority>not-a-number</priority></url>
        |<url><lastmod>2024-06-02</lastmod></url>
        |<url><loc>https://h.example/c</loc></url>
        |</urlset>""".stripMargin
    val es = Sitemaps.parse(xml).get
    assert(es.length == 3) // the loc-less entry is skipped
    assert(es(0) == Sitemaps.SitemapEntry("url", 0,
      "https://h.example/a?x=1&y=2", Some("2024-06-01"), Some(0.8)))
    assert(es(1) == Sitemaps.SitemapEntry("url", 1,
      "https://h.example/b", None, None)) // junk priority degraded
    assert(es(2).loc == "https://h.example/c" && es(2).ord == 2)
  }

  test("sitemapindex walk + hostile documents fail soft") {
    val idx =
      """<sitemapindex>
        |<sitemap><loc>https://h.example/s1.xml</loc>
        |  <lastmod>2024-01-01</lastmod></sitemap>
        |<sitemap><loc>https://h.example/s2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val es = Sitemaps.parse(idx).get
    assert(es.map(_.kind).distinct == Vector("sitemap"))
    assert(es.map(_.loc) == Vector("https://h.example/s1.xml",
      "https://h.example/s2.xml"))
    assert(Sitemaps.parse("not xml at all").isEmpty)
    assert(Sitemaps.parse("<rss><item/></rss>").isEmpty)
    assert(Sitemaps.parse("<urlset><url><loc>x</loc>").isEmpty,
      "unterminated root accepted")
    assert(Sitemaps.parse(
      "<urlset><url><loc>x</loc></urlset>").isEmpty,
      "unterminated url block accepted")
    assert(Sitemaps.parse("<urlset></urlset>").get.isEmpty)
  }

  test("synth schedule: per-host sitemaps match the closed form; " +
    "index hosts every 5th") {
    val facts = Sitemaps.sitemapFacts(spark,
      Tables.documents(spark, sf0001)).collect()
      .groupBy(_.getLong(0))
    for ((n, rows) <- facts) {
      val kinds = rows.map(_.getString(1)).distinct.toSeq
      if (n % 5 == 0) {
        assert(kinds == Seq("sitemap") && rows.length == 2)
      } else {
        assert(kinds == Seq("url"))
        assert(rows.length == (if (n % 2 == 0) 3 else 2))
        val u1 = rows.find(_.getInt(2) == 1).get
        assert(u1.getString(3) ==
          s"https://example$n.com/Path/$n?a=1&b=2",
          "the &amp; loc did not decode")
        assert(u1.getDouble(5) == s"0.${n % 10}".toDouble)
      }
    }
  }
}
