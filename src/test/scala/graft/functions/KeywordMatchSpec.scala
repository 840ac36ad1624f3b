package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The Aho–Corasick matcher: parity with naive per-pattern
  * containment (the oracle's definition), fail-link suffix matches,
  * codegen/interpreted agreement, the broadcast form, and the plan
  * claim (the walk stays inside whole-stage codegen).
  */
class KeywordMatchSpec extends SparkTestBase {

  private def naive(patterns: Seq[String], text: String): Seq[String] =
    patterns.distinct.sorted.filter(text.contains)

  test("automaton == naive containment on randomized small-alphabet " +
    "corpora (fail-link stress: patterns are each other's affixes)") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc"
    def randStr(n: Int): String =
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    for (round <- 1 to 50) {
      val patterns = (1 to 1 + rnd.nextInt(6))
        .map(_ => randStr(1 + rnd.nextInt(4))).distinct
      val ac = AhoCorasick(patterns)
      for (_ <- 1 to 20) {
        val text = randStr(rnd.nextInt(30))
        assert(ac.matchedPatterns(text) == naive(patterns, text),
          s"round $round: patterns=$patterns text='$text'")
      }
    }
  }

  test("hand cases: suffix-overlap via fail links, match at every " +
    "position, empty text, pattern set is dedup'd + sorted") {
    // 'abc' forces the walk through states whose fail chain owns
    // 'bc' and 'c' — output closure must surface all three
    val ac = AhoCorasick(Seq("abc", "bc", "c", "zz"))
    assert(ac.matchedPatterns("xabcx") == Seq("abc", "bc", "c"))
    assert(ac.matchedPatterns("bc") == Seq("bc", "c"))
    assert(ac.matchedPatterns("zz") == Seq("zz"))
    assert(ac.matchedPatterns("") == Nil)
    assert(ac.matchedPatterns("ab") == Nil) // prefix alone is no match
    // overlapping occurrences of the same pattern are one SET entry
    assert(AhoCorasick(Seq("aa")).matchedPatterns("aaa") == Seq("aa"))
    // duplicate patterns collapse; output order is lexicographic
    assert(AhoCorasick(Seq("b", "a", "b")).patterns.toSeq == Seq("a", "b"))
    // phrase matching crosses token boundaries
    val ph = AhoCorasick(Seq("fast merge", "merge batch"))
    assert(ph.matchedPatterns("a fast merge batch b") ==
      Seq("fast merge", "merge batch"))
  }

  test("expression: codegen == interpreted == automaton; null text " +
    "matches nothing (empty, never NULL); WSCG survives a real scan") {
    import spark.implicits._
    val patterns = Seq("abc", "bc", "zz", "ca")
    val ac = AhoCorasick(patterns)
    val texts: Seq[Option[String]] = Seq(Some("xabca"), Some("zzz"),
      Some("no hits"), Some(""), None, Some("bcabc"))
    val dir = tmpDir("kw-match") + "/t"
    texts.toDF("text").write.parquet(dir)
    val scanned = spark.read.parquet(dir)
      .select(col("text"),
        KeywordMatch.keyword_matches(col("text"), patterns).as("tags"))
    val got = scanned.collect()
      .map(r => Option(r.getString(0)) -> r.getSeq[String](1)).toMap
    for ((t, tags) <- got) {
      val want = t.map(naive(patterns, _)).getOrElse(Nil)
      assert(tags == want, s"text=$t")
      // interpreted eval agrees
      val interp = KeywordMatch.matches(ac,
        t.map(org.apache.spark.unsafe.types.UTF8String.fromString).orNull)
      assert(interp.toSeq[org.apache.spark.unsafe.types.UTF8String](
        org.apache.spark.sql.types.StringType).map(_.toString) == want)
    }
    assert(!scanned.schema("tags").nullable)
    val plan = scanned.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[text""".r.findFirstIn(plan).isDefined
      && plan.contains("keywordmatches"),
      s"keyword walk fell out of whole-stage codegen:\n$plan")
  }

  test("broadcast form: identical results, picked automatically above " +
    "the size gate") {
    import spark.implicits._
    val patterns = Seq("abc", "bc", "zz")
    val ac = AhoCorasick(patterns)
    val bc = spark.sparkContext.broadcast(ac)
    val texts = Seq("xabca", "zz top", "none").toDF("text")
    import org.apache.spark.sql.GraftColumnBridge
    val viaBc = texts.select(GraftColumnBridge.column(
      KeywordMatchesBroadcast(
        GraftColumnBridge.expression(col("text")), bc)).as("tags"))
      .collect().map(_.getSeq[String](0).toList).toList
    val viaInline = texts.select(
      KeywordMatch.keyword_matches(col("text"), patterns).as("tags"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(viaBc == viaInline)
  }

  test("keywordTags operator: verdict columns, empty-tag docs keep " +
    "empty string, partition invariance") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the fast merge batch runs"),
      (2L, "nothing to see"),
      (3L, "spark table scan")).toDF("doc_id", "text")
    val patterns = Seq("fast merge", "merge batch", "able", "spark")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.ext.TextAnalysis.keywordTags(df, patterns).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
          r.getBoolean(3))).toList.sortBy(_._1)
    val got = run(docs)
    assert(got == List(
      (1L, "fast merge,merge batch", 2, true),
      (2L, "", 0, false),
      (3L, "able,spark", 2, true))) // 'able' inside 'table'
    assert(got == run(docs.repartition(5)), "partition invariance")
  }
}
