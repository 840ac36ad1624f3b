package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** URL canonicalization + SURT keys [EXT] — the crawl-side identity
  * the WARC plane (wa01–wa04) dedups and joins on: the same page
  * arrives as `HTTP://WWW.Example.COM:80/a?b=2&a=1#frag` and
  * `http://www.example.com/a?a=1&b=2`, and a 100 TB frontier that
  * treats those as distinct crawls everything twice. Canonical form
  * (each rule deterministic and oracle-replayable):
  *
  *   - scheme lowercased;
  *   - userinfo (`user:pw@`) stripped from the authority;
  *   - host lowercased, one trailing dot stripped; bracketed IPv6
  *     hosts pass through (lowercased) with their port split on the
  *     bracket;
  *   - an explicit default port (80 for http, 443 for https) elides
  *     to absent; other ports keep their integer value;
  *   - empty path → `/` (path case is significant per RFC 3986 and
  *     is kept);
  *   - query parameters sorted bytewise on the full `k=v` token
  *     (duplicates kept, adjacent after the sort); an empty query
  *     (`?` alone or none) → absent;
  *   - fragment dropped.
  *
  * SURT (Sort-friendly URI Reordering Transform — the Wayback/
  * Common Crawl index key): host labels reversed and comma-joined,
  * `)`, then the canonical path and sorted query —
  * `com,example,www)/a?a=1&b=2` — so one prefix range scans a whole
  * domain subtree in a sorted index.
  *
  * Registered domain: a last-two-labels heuristic with a CLOSED
  * multi-level-TLD exception set ([[MultiTlds]] — shared with the
  * oracle). A real pipeline would load the Public Suffix List; the
  * heuristic is the honest in-container stand-in and is documented
  * as such (the operator surface — parse, canonicalize, key — is
  * what scales, and the PSL is a lookup-table swap).
  *
  * Fail-soft: a string with no `scheme://`, an empty host, or a
  * non-numeric port yields no row — a frontier shard with garbage
  * lines keeps flowing.
  *
  * Scale notes: parsing is a narrow per-row walk (no shuffle, no
  * driver data); the SURT key is the ORDER a 100 TB frontier store
  * sorts/ranges on, and the canonical tuple is the dedup groupBy key.
  */
object Urls {

  /** Multi-level TLDs whose registered domain takes three labels —
    * closed set, shared verbatim with the wa05 oracle.
    */
  private[graft] val MultiTlds: Set[String] = Set(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "com.au",
    "com.br", "co.in", "co.nz", "com.sg")

  private val DefaultPorts = Map("http" -> 80, "https" -> 443)

  /** One canonicalized URL (the wa05 row). */
  final case class CanonicalUrl(
      url: String, scheme: String, host: String, port: Option[Int],
      path: String, query: Option[String], surt: String,
      reg_domain: String)

  /** Parse + canonicalize; None on garbage (fail-soft contract). */
  def canonicalize(raw: String): Option[CanonicalUrl] = {
    val sep = raw.indexOf("://")
    if (sep <= 0) return None
    val scheme = raw.substring(0, sep)
    if (!scheme.forall(c => c.isLetterOrDigit || c == '+' || c == '-' ||
      c == '.')) return None
    val rest = raw.substring(sep + 3)
    // authority ends at the first '/', '?', or '#'
    var ae = 0
    while (ae < rest.length && rest.charAt(ae) != '/' &&
      rest.charAt(ae) != '?' && rest.charAt(ae) != '#') ae += 1
    var auth = rest.substring(0, ae)
    val at = auth.lastIndexOf('@')
    if (at >= 0) auth = auth.substring(at + 1) // strip userinfo
    // split host : port (IPv6 brackets respected)
    val (hostRaw, portRaw) =
      if (auth.startsWith("[")) {
        val rb = auth.indexOf(']')
        if (rb < 0) return None
        val h = auth.substring(0, rb + 1)
        val tail = auth.substring(rb + 1)
        if (tail.isEmpty) (h, "")
        else if (tail.startsWith(":")) (h, tail.substring(1))
        else return None
      } else {
        val c = auth.lastIndexOf(':')
        if (c < 0) (auth, "") else (auth.substring(0, c),
          auth.substring(c + 1))
      }
    if (hostRaw.isEmpty) return None
    val schemeC = scheme.toLowerCase
    var host = hostRaw.toLowerCase
    if (host.length > 1 && host.endsWith(".") && !host.endsWith(".."))
      host = host.substring(0, host.length - 1)
    val port: Option[Int] =
      if (portRaw.isEmpty) None
      else portRaw.toIntOption match {
        case None => return None // non-numeric port: garbage
        case Some(p) if p < 0 || p > 65535 => return None
        case Some(p) =>
          if (DefaultPorts.get(schemeC).contains(p)) None else Some(p)
      }
    // path / query / fragment
    val tail = rest.substring(ae)
    val hash = tail.indexOf('#')
    val noFrag = if (hash < 0) tail else tail.substring(0, hash)
    val q = noFrag.indexOf('?')
    val pathRaw = if (q < 0) noFrag else noFrag.substring(0, q)
    val queryRaw = if (q < 0) "" else noFrag.substring(q + 1)
    val path = if (pathRaw.isEmpty) "/" else pathRaw
    val query =
      if (queryRaw.isEmpty) None
      else Some(queryRaw.split("&", -1).sorted.mkString("&"))
    // SURT + registered domain over the dot labels
    val labels = host.split("\\.", -1)
    val surt = labels.reverse.mkString(",") + ")" + path +
      query.map("?" + _).getOrElse("")
    val reg =
      if (labels.length <= 2) host
      else {
        val lastTwo = labels.takeRight(2).mkString(".")
        if (MultiTlds.contains(lastTwo)) labels.takeRight(3).mkString(".")
        else lastTwo
      }
    Some(CanonicalUrl(raw, schemeC, host, port, path, query, surt, reg))
  }

  // ---- synthesized fixtures (shared formulas: synth + oracle) ----

  /** The deterministic messy URL for a doc id — every canonicalization
    * rule exercised on a closed schedule: scheme case (id%2), host
    * shape incl. trailing dot and a co.uk subtree (id%7/id%3),
    * explicit-default vs real vs absent port (id%4), empty vs cased
    * path (id%6), unsorted vs absent query (id%3), fragment (id%2).
    */
  private[graft] def messyUrl(id: Long): String = {
    val scheme = if (id % 2 == 0) "HTTP" else "https"
    val core = s"Example${id % 50}"
    val host =
      if (id % 7 == 0) s"Sub.$core.Co.UK"
      else if (id % 3 == 0) s"WWW.$core.COM."
      else s"$core.COM"
    val port = id % 4 match {
      case 0 => ":80"   // id even → HTTP → elides
      case 1 => ":8080" // kept
      case 3 => ":443"  // id odd → https → elides
      case _ => ""
    }
    val path = if (id % 6 == 0) "" else s"/Path/$id"
    val query = id % 3 match {
      case 0 => ""
      case 1 => s"?b=$id&a=1"
      case _ => s"?z=2&a=$id&m=x"
    }
    val frag = if (id % 2 == 1) s"#sec$id" else ""
    s"$scheme://$host$port$path$query$frag"
  }

  /** Documents → messy URLs `(doc_id, url)` — narrow map. */
  def asUrlRows(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .map(id => (id, messyUrl(id)))
      .toDF("doc_id", "url")
  }

  /** URLs → canonical facts (the wa05 surface): the PARSER runs on
    * the url strings; the oracle re-derives every field from the id
    * schedule — a parse or canonicalization drift mismatches.
    */
  def canonicalFacts(spark: SparkSession, urls: DataFrame): DataFrame = {
    import spark.implicits._
    urls.select(col("doc_id").cast("long"), col("url"))
      .as[(Long, String)]
      .flatMap { case (id, u) =>
        canonicalize(u).map(c => (id, c.url, c.scheme, c.host,
          c.port, c.path, c.query, c.surt, c.reg_domain))
      }
      .toDF("doc_id", "url", "scheme", "host", "port", "path",
        "query", "surt", "reg_domain")
  }
}
