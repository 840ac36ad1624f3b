package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** robots.txt fetch-policy gate [EXT] — the rule every polite crawl
  * evaluates before touching a URL (RFC 9309, the Robots Exclusion
  * Protocol): a 100 TB frontier filters fetch candidates against
  * per-host policy, and the gate must implement the REAL precedence
  * rules or it silently over- or under-crawls. Implemented from the
  * public RFC:
  *
  *   - line syntax `key: value`, keys case-insensitive, `#` comments
  *     stripped, unknown keys ignored;
  *   - GROUPS: consecutive `User-agent` lines share the rules that
  *     follow; a `User-agent` after rules starts a new group;
  *   - group selection: case-insensitive product-token equality,
  *     falling back to `*`; ALL matching groups merge (rule union,
  *     first defined crawl-delay) — and ONLY the selected group
  *     applies (a `*` crawl-delay does not leak onto an agent with
  *     its own group);
  *   - rule patterns anchor at the path start, `*` matches any run,
  *     `$` anchors the end; an empty pattern is a no-op;
  *   - precedence: the matching rule with the MOST OCTETS wins;
  *     tie → Allow; no match → allowed;
  *   - `Sitemap:` lines are global (outside groups).
  *
  * Scale notes: parsed policy is per-HOST — tiny next to the URL
  * corpus. [[robotsFacts]] evaluates in a narrow map with a
  * per-partition parse memo keyed by host (each executor parses each
  * host's policy once); at frontier scale the same shape holds as a
  * broadcast join of the (host, policy) table against the URL
  * corpus — either way the corpus never shuffles for the gate.
  */
object Robots {

  final case class Rule(allow: Boolean, pattern: String)

  /** The policy one agent sees: its merged rules, its crawl-delay,
    * and the file-global sitemaps.
    */
  final case class Policy(rules: Seq[Rule], crawlDelay: Option[Int],
                          sitemaps: Seq[String])

  private final case class Group(agents: Seq[String], rules: Seq[Rule],
                                 delay: Option[Int])

  /** Parse a robots.txt for one agent (RFC 9309 group selection). */
  def parse(txt: String, agent: String): Policy = {
    val groups = Vector.newBuilder[Group]
    var agents = Vector.empty[String]
    var rules = Vector.empty[Rule]
    var delay: Option[Int] = None
    var inAgents = false // consecutive User-agent lines accumulate
    var sawGroup = false
    val sitemaps = Vector.newBuilder[String]
    def flush(): Unit = {
      if (sawGroup) groups += Group(agents, rules, delay)
      agents = Vector.empty; rules = Vector.empty; delay = None
      sawGroup = false
    }
    for (raw <- txt.split("\n", -1)) {
      val line = raw.indexOf('#') match {
        case -1 => raw
        case h  => raw.substring(0, h)
      }
      val c = line.indexOf(':')
      if (c > 0) {
        val key = line.substring(0, c).trim.toLowerCase
        val value = line.substring(c + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgents) flush()
            agents :+= value.toLowerCase
            inAgents = true; sawGroup = true
          case "allow" =>
            inAgents = false
            if (value.nonEmpty) rules :+= Rule(allow = true, value)
          case "disallow" =>
            inAgents = false
            if (value.nonEmpty) rules :+= Rule(allow = false, value)
          case "crawl-delay" =>
            inAgents = false
            if (delay.isEmpty) delay = value.toIntOption
          case "sitemap" =>
            if (value.nonEmpty) sitemaps += value
          case _ => inAgents = false // unknown key: ignored, ends UA run
        }
      }
    }
    flush()
    val all = groups.result()
    val tok = agent.toLowerCase
    val mine = all.filter(_.agents.contains(tok))
    val selected = if (mine.nonEmpty) mine
    else all.filter(_.agents.contains("*"))
    Policy(selected.flatMap(_.rules),
      selected.flatMap(_.delay).headOption, sitemaps.result())
  }

  /** RFC 9309 pattern match against a path PREFIX: anchored at the
    * start, `*` matches any run, a trailing `$` anchors the end.
    */
  private[ext] def pathMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.dropRight(1) else pattern
    val parts = pat.split("\\*", -1)
    if (!path.startsWith(parts.head)) return false
    var pos = parts.head.length
    var i = 1
    while (i < parts.length) {
      val part = parts(i)
      if (i == parts.length - 1 && anchored) {
        // final fragment must sit exactly at the path end
        return path.length - part.length >= pos &&
          path.endsWith(part)
      }
      if (part.isEmpty) {
        // '*' at the end (or doubled): matches the rest
        if (i == parts.length - 1) return !anchored || true
      } else {
        val at = path.indexOf(part, pos)
        if (at < 0) return false
        pos = at + part.length
      }
      i += 1
    }
    if (anchored && parts.length == 1) path.length == pos
    else true
  }

  /** Evaluate a path: (allowed, winning rule pattern). Longest
    * pattern wins; tie → allow; no match → allowed with no rule.
    */
  def decide(policy: Policy, path: String): (Boolean, Option[String]) = {
    val hits = policy.rules.filter(r => pathMatches(r.pattern, path))
    if (hits.isEmpty) (true, None)
    else {
      val best = hits.maxBy(r => (r.pattern.length, r.allow))
      (best.allow, Some(best.pattern))
    }
  }

  // ---- synthesized fixtures (shared schedule: synth + oracle) ----

  private[graft] val Agent = "graftbot"

  /** The per-host policy on the n = host-number schedule: n%3==0 hosts
    * block `/Path/` for graftbot but re-allow ids ending in 0 via a
    * wildcard+anchor rule (longest-match exercise); n%3==1 hosts have
    * an EMPTY Disallow (a no-op rule); n%3==2 hosts have no graftbot
    * group at all, so `*` — with its crawl-delay — is selected.
    */
  private[graft] def synthRobots(n: Long): String = {
    val sb = new StringBuilder
    sb.append(s"# synth robots $n\n")
    if (n % 3 == 0) {
      sb.append(s"User-agent: $Agent\n")
      sb.append("Disallow: /Path/\n")
      sb.append("Allow: /Path/*0$\n")
    } else if (n % 3 == 1) {
      sb.append(s"User-agent: $Agent\n")
      sb.append("Disallow:\n") // empty = nothing disallowed
    }
    sb.append("User-agent: *\n")
    sb.append("Disallow: /private/\n")
    sb.append(s"Crawl-delay: ${n % 7 + 1}\n")
    sb.append(s"Sitemap: https://example$n.com/sitemap.xml\n")
    sb.toString
  }

  /** Politeness fetch schedule (wa11): the dispatch order a crawl
    * frontier derives from the policy verdicts — allowed URLs only,
    * sequenced PER HOST in deterministic (doc_id) order, each slot's
    * earliest start = `slot × crawl-delay` (default 1 s when the
    * selected group declares none). The window partitions by host —
    * politeness is inherently per-host sequential, so the partition
    * IS the unit of order; a mega-host's partition is long because
    * its fetch queue is long, not because the plan is wrong (and its
    * wall-clock is bounded by the delay×queue product, not by Spark).
    */
  def fetchSchedule(spark: SparkSession, urls: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val facts = robotsFacts(spark, urls)
    val w = Window.partitionBy(col("host")).orderBy(col("doc_id"))
    facts.filter(col("allowed"))
      .withColumn("fetch_seq",
        row_number().over(w).cast("int"))
      .withColumn("eta_sec",
        ((col("fetch_seq") - 1).cast("long") *
          coalesce(col("crawl_delay").cast("long"), lit(1L)))
          .as("eta_sec"))
      .select(col("doc_id"), col("host"), col("path"),
        col("fetch_seq"), col("eta_sec"))
  }

  /** URLs → the fetch-policy verdicts (the wa08 surface): canonical
    * host/path via [[Urls.canonicalize]], the host's robots parsed
    * once per partition (memo), each path decided under the RFC
    * precedence. Narrow map, no shuffle.
    */
  def robotsFacts(spark: SparkSession, urls: DataFrame): DataFrame = {
    import spark.implicits._
    urls.select(col("doc_id").cast("long"), col("url"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = scala.collection.mutable.Map.empty[Long, Policy]
        it.flatMap { case (id, u) =>
          Urls.canonicalize(u).flatMap { c =>
            "example(\\d+)".r.findFirstMatchIn(c.host)
              .map(_.group(1).toLong).map { n =>
                val policy = memo.getOrElseUpdate(n,
                  parse(synthRobots(n), Agent))
                val (ok, rule) = decide(policy, c.path)
                (id, c.host, c.path, ok, rule.orNull,
                  policy.crawlDelay, policy.sitemaps.headOption.orNull)
              }
          }
        }
      }
      .toDF("doc_id", "host", "path", "allowed", "matched_rule",
        "crawl_delay", "sitemap")
  }
}
