package graft.ext

import graft.SparkTestBase

class RobotsSpec extends SparkTestBase {

  private def pm(p: String, s: String) = Robots.pathMatches(p, s)

  test("pattern matching: prefix anchor, * runs, $ end anchor, " +
    "combinations, non-matches") {
    assert(pm("/foo", "/foo"))
    assert(pm("/foo", "/foobar")) // prefix semantics
    assert(pm("/foo", "/foo/bar"))
    assert(!pm("/foo", "/bar/foo")) // anchored at start
    assert(pm("/*.php", "/index.php"))
    assert(pm("/*.php", "/a/b.php?x=1")) // match need not reach the end
    assert(!pm("/*.php", "/index.html"))
    assert(pm("/*.php$", "/index.php"))
    assert(!pm("/*.php$", "/index.php?x=1")) // $ anchors the end
    assert(pm("/fish*.php$", "/fishheads/catfish.php"))
    assert(!pm("/fish*.php$", "/fishheads/catfish.php3"))
    assert(pm("/a*b*c", "/aXbYc and more"))
    assert(!pm("/a*b*c", "/acb"))
    assert(pm("/p$", "/p"))
    assert(!pm("/p$", "/pq"))
    assert(pm("/p*$", "/p-anything"))
    assert(pm("/a**b", "/aXXb")) // doubled * = single *
    assert(!pm("$", "/x")) // bare $ matches only the empty path
  }

  test("parsing + group selection: comments, key case, agent token " +
    "case, multi-agent groups, same-agent merge, * fallback, delay " +
    "isolation, junk tolerated") {
    val txt =
      """# a comment line
        |USER-AGENT: GraftBot   # inline comment
        |User-agent: otherbot
        |DisAllow: /shared/
        |
        |User-agent: graftbot
        |Allow: /shared/ok/
        |Crawl-Delay: 5
        |
        |User-agent: *
        |Disallow: /everything/
        |Crawl-delay: 9
        |Sitemap: https://h.example/s.xml
        |not a directive at all
        |Badkey: ignored
        |Crawl-delay: notanumber
        |""".stripMargin
    val p = Robots.parse(txt, "GRAFTBOT")
    // both graftbot groups merge: 2 rules, the delay from the second
    assert(p.rules == Seq(Robots.Rule(false, "/shared/"),
      Robots.Rule(true, "/shared/ok/")))
    assert(p.crawlDelay.contains(5))
    assert(p.sitemaps == Seq("https://h.example/s.xml"))
    // unknown agent falls to * — and only then sees *'s delay
    val star = Robots.parse(txt, "nobody")
    assert(star.rules == Seq(Robots.Rule(false, "/everything/")))
    assert(star.crawlDelay.contains(9))
    // no groups at all → empty policy, everything allowed
    val none = Robots.parse("# only comments\n", "graftbot")
    assert(none.rules.isEmpty && Robots.decide(none, "/x")._1)
  }

  test("decision precedence: longest octet count wins, tie goes to " +
    "allow, empty patterns are no-ops, no match allows") {
    val p = Robots.Policy(Seq(
      Robots.Rule(false, "/p/"),
      Robots.Rule(true, "/p/public/"),
      Robots.Rule(false, "/q/"),
      Robots.Rule(true, "/q/")), None, Nil)
    assert(Robots.decide(p, "/p/secret") == ((false, Some("/p/"))))
    assert(Robots.decide(p, "/p/public/x")
      == ((true, Some("/p/public/"))))
    assert(Robots.decide(p, "/q/x") == ((true, Some("/q/")))) // tie
    assert(Robots.decide(p, "/elsewhere") == ((true, None)))
    // the empty Disallow never became a rule
    val e = Robots.parse("User-agent: a\nDisallow:\n", "a")
    assert(e.rules.isEmpty)
  }

  test("politeness schedule: per-host sequencing in doc_id order, " +
    "eta = slot x delay with the 1s default, disallowed urls " +
    "never scheduled") {
    import spark.implicits._
    val urls = (0L until 120L).map(id => (id, Urls.messyUrl(id)))
      .toDF("doc_id", "url")
    val sched = Robots.fetchSchedule(spark, urls).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(3),
        r.getLong(4)))
    // disallowed ids are absent
    val blocked = (0L until 120L).filter(id =>
      !(id % 6 == 0 || (id % 50) % 3 != 0 || id % 10 == 0)).toSet
    assert(sched.map(_._1).toSet.intersect(blocked).isEmpty)
    // per host: seq counts 1..k in doc_id order; eta arithmetic holds
    for ((host, rows) <- sched.groupBy(_._2)) {
      val byId = rows.sortBy(_._1)
      assert(byId.map(_._3).toSeq == (1 to byId.length),
        s"$host sequence broken")
      val n = byId.head._1 % 50
      val delay = if (n % 3 == 2) n % 7 + 1 else 1L
      for ((id, _, seq, eta) <- byId)
        assert(eta == (seq - 1) * delay, s"$host/$id eta")
    }
  }

  test("synth schedule end-to-end: verdicts match the closed form " +
    "across 300 ids, wildcard re-allow beats the shorter block") {
    import spark.implicits._
    val urls = (0L until 300L).map(id => (id, Urls.messyUrl(id)))
      .toDF("doc_id", "url")
    val facts = Robots.robotsFacts(spark, urls).collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(3), Option(r.getString(4)),
          Option(r.get(5)).map(_.asInstanceOf[Int]))).toMap
    assert(facts.size == 300)
    for (id <- 0L until 300L) {
      val n = id % 50
      val (allowed, rule, delay) = facts(id)
      val expAllowed = id % 6 == 0 || n % 3 != 0 || id % 10 == 0
      assert(allowed == expAllowed, s"id $id verdict")
      val expRule =
        if (id % 6 != 0 && n % 3 == 0)
          Some(if (id % 10 == 0) "/Path/*0$" else "/Path/")
        else None
      assert(rule == expRule, s"id $id rule")
      val expDelay = if (n % 3 == 2) Some((n % 7 + 1).toInt) else None
      assert(delay == expDelay, s"id $id delay")
    }
  }
}
