package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sitemap ingestion [EXT] — the frontier's SEED source (the public
  * sitemaps.org 0.9 protocol): a crawl bootstraps per-host URL lists
  * from `/sitemap.xml`, which is either a `<urlset>` of `<url>`
  * entries (loc + optional lastmod/priority) or a `<sitemapindex>`
  * of child sitemap locations. This is a purpose-built walk of that
  * ONE schema — not a general XML parser: elements are located by
  * open/close tag scan, `<loc>` text is entity-decoded (URLs in XML
  * carry `&amp;`), a missing `</...>` fails the whole document soft
  * (None), an entry without its mandatory `<loc>` is skipped, and an
  * unparsable `<priority>` degrades to absent.
  *
  * Scale notes: one sitemap is KB-scale per host; the walk is a
  * narrow map over a per-host table (tiny next to the corpus). The
  * facts — ordered locs with kind 'url' vs 'sitemap' — are exactly
  * what a frontier merge joins against the robots gate (wa08) and
  * the politeness schedule (wa11).
  */
object Sitemaps {

  /** One entry: kind = "url" (urlset) | "sitemap" (index). */
  final case class SitemapEntry(kind: String, ord: Int, loc: String,
                                lastmod: Option[String],
                                priority: Option[Double])

  /** First `<tag>text</tag>` inside [from, to); None when absent or
    * unterminated.
    */
  private def tagText(s: String, tag: String, from: Int,
                      to: Int): Option[String] = {
    val open = s.indexOf("<" + tag + ">", from)
    if (open < 0 || open >= to) return None
    val cs = open + tag.length + 2
    val close = s.indexOf("</" + tag + ">", cs)
    if (close < 0 || close > to) return None
    Some(s.substring(cs, close).trim)
  }

  /** Parse one sitemap document. None on a structurally broken file
    * (no recognized root, an entry block that never closes).
    */
  def parse(xml: String): Option[Vector[SitemapEntry]] = {
    val (root, childTag, kind) =
      if (xml.contains("<urlset")) ("urlset", "url", "url")
      else if (xml.contains("<sitemapindex"))
        ("sitemapindex", "sitemap", "sitemap")
      else return None
    val rootOpen = xml.indexOf("<" + root)
    val rootEnd = xml.indexOf("</" + root + ">", rootOpen)
    if (rootEnd < 0) return None
    val out = Vector.newBuilder[SitemapEntry]
    var i = rootOpen
    var ord = 0
    var done = false
    while (!done) {
      val open = xml.indexOf("<" + childTag + ">", i)
      if (open < 0 || open >= rootEnd) done = true
      else {
        val close = xml.indexOf("</" + childTag + ">", open)
        if (close < 0 || close > rootEnd) return None // broken block
        tagText(xml, "loc", open, close).filter(_.nonEmpty)
          .foreach { rawLoc =>
            out += SitemapEntry(kind, ord,
              Html.decodeEntities(rawLoc),
              tagText(xml, "lastmod", open, close).filter(_.nonEmpty),
              tagText(xml, "priority", open, close)
                .flatMap(_.toDoubleOption))
            ord += 1
          }
        i = close + childTag.length + 3
      }
    }
    Some(out.result())
  }

  // ---- synthesized fixtures (shared schedule: synth + oracle) ----

  /** Per-host sitemap on the n schedule: every 5th host serves a
    * SITEMAPINDEX (two children, lastmod only); the rest serve a
    * urlset — a priority-1 root, a query-bearing loc whose `&` rides
    * as `&amp;` (the XML-escape round trip the oracle pins), and an
    * extra lastmod-only entry on even n.
    */
  private[graft] def synthSitemap(n: Long): String = {
    val day = f"${n % 28 + 1}%02d"
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    if (n % 5 == 0) {
      sb.append("<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n")
      for (k <- 1 to 2)
        sb.append(s"  <sitemap><loc>https://example$n.com/sitemap$k.xml</loc>" +
          s"<lastmod>2024-03-$day</lastmod></sitemap>\n")
      sb.append("</sitemapindex>\n")
    } else {
      sb.append("<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n")
      sb.append(s"  <url><loc>https://example$n.com/</loc>" +
        s"<lastmod>2024-01-$day</lastmod>" +
        "<priority>1.0</priority></url>\n")
      sb.append(s"  <url><loc>https://example$n.com/Path/$n?a=1&amp;b=2</loc>" +
        s"<priority>0.${n % 10}</priority></url>\n")
      if (n % 2 == 0)
        sb.append(s"  <url><loc>https://example$n.com/extra/$n</loc>" +
          s"<lastmod>2024-02-$day</lastmod></url>\n")
      sb.append("</urlset>\n")
    }
    sb.toString
  }

  /** The wa12 surface: each distinct host (n = doc_id % 50 over the
    * corpus) fetches its synthesized sitemap and walks it — rows
    * `(host_n, kind, ord, loc, lastmod, priority)`.
    */
  def sitemapFacts(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select((col("doc_id").cast("long") % 50).as("n"))
      .distinct()
      .as[Long]
      .flatMap { n =>
        parse(synthSitemap(n)).getOrElse(Vector.empty).map(e =>
          (n, e.kind, e.ord, e.loc, e.lastmod, e.priority))
      }
      .toDF("host_n", "kind", "ord", "loc", "lastmod", "priority")
  }
}
