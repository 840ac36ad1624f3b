package graft.ext

import graft.{SparkTestBase, Tables}

class HtmlSpec extends SparkTestBase {

  private def ext(s: String): String = Html.extractText(s)

  test("structural extraction: tags strip, block boundaries fold to " +
    "newlines, inline tags run together, script/style/comment/" +
    "noscript content never leaks, DOCTYPE dropped") {
    assert(ext("<p>hello</p><p>world</p>") == "hello\nworld")
    assert(ext("<b>bo</b><i>ld</i> run") == "bold run")
    assert(ext("<div>a<span>b</span>c</div>") == "abc")
    assert(ext("<!DOCTYPE html><html><body>x</body></html>") == "x")
    assert(ext("a<script>var x = '<p>no</p>';</script>b") == "a\nb")
    assert(ext("a<style>p { color: red; }</style>b") == "a\nb")
    assert(ext("a<noscript><p>enable js</p></noscript>b") == "a\nb")
    assert(ext("a<!-- <p>ghost</p> &amp; -->b") == "ab")
    assert(ext("<ul><li>one</li><li>two</li></ul>") == "one\ntwo")
    assert(ext("line<br>break<br/>again") == "line\nbreak\nagain")
    assert(ext("<table><tr><td>a</td><td>b</td></tr></table>")
      == "a\nb")
    // case-insensitive: tags and close tags
    assert(ext("A<SCRIPT>junk</ScRiPt>B<P>c</P>") == "A\nB\nc")
    // self-closed script has no content to skip
    assert(ext("a<script src=\"x.js\"/>b") == "a\nb")
  }

  test("entities: named set and numeric forms decode, unknown and " +
    "malformed stay literal, NBSP survives whitespace folding") {
    assert(ext("a &amp; b &lt;c&gt; &quot;d&quot; &apos;e&apos;")
      == "a & b <c> \"d\" 'e'")
    assert(ext("x&nbsp;y") == "x y")
    assert(ext("&copy; &mdash; &hellip;") == "© — …")
    assert(ext("&#65;&#x42;&#X43;") == "ABC")
    assert(ext("&#x1F600;") == new String(Character.toChars(0x1f600)))
    assert(ext("&bogus; stays") == "&bogus; stays")
    assert(ext("& alone") == "& alone")
    assert(ext("&#; &#x; &#xZZ; &#999999999;")
      == "&#; &#x; &#xZZ; &#999999999;")
    assert(ext("&#0; &#xD800;") == "&#0; &#xD800;") // NUL + surrogate
    // entity inside an attribute is part of the dropped tag
    assert(ext("<a href=\"?a=1&amp;b=2\">t</a>") == "t")
  }

  test("whitespace folding: space/tab runs collapse, lines trim, " +
    "empties drop, CR forms normalize; NBSP is not collapsible") {
    assert(ext("  a   b\t\tc  ") == "a b c")
    assert(ext("a\r\nb\rc\nd") == "a\nb\nc\nd")
    assert(ext("<p>  </p><p>x</p><p></p>") == "x")
    assert(ext("a   b") == "a   b")
    assert(ext("") == "")
    assert(ext("   \n \t \n ") == "")
    assert(ext("plain text, no markup") == "plain text, no markup")
  }

  test("hostile markup fails soft: quoted '>' in attributes, " +
    "unterminated tag/comment/script, stray '<', nested same-name " +
    "skip, close-tag lookalikes") {
    assert(ext("<p title=\"a > b\">kept</p>") == "kept")
    assert(ext("<p title='a > b'>kept</p>") == "kept")
    assert(ext("before<p unterminated") == "before")
    assert(ext("before<!-- never closed <p>x") == "before")
    assert(ext("before<script>var x = 1;") == "before")
    // a '<' that never forms a tag drops the rest (strict, never junk)
    assert(ext("a < b") == "a")
    // </scriptx> is NOT a close tag — the real close ends the skip
    assert(ext("a<script>x</scriptx></script>b") == "a\nb")
    // attribute quote never closes → tag never ends → rest dropped
    assert(ext("a<p title=\"open>kept?") == "a")
  }

  test("synthesized page: extraction is the closed formula (chrome + " +
    "paragraph slices), escape round-trips hostile text, corpus-wide " +
    "facts match per doc") {
    import spark.implicits._
    // hand-traced page for a known doc
    val page = Html.htmlPage(42L, "alpha beta gamma delta")
    assert(ext(page) ==
      "Doc 42\nhome | doc 42\nDoc 42\nalpha beta\ngamma delta\n" +
        "© corpus 42 — \"graft\"")
    // odd token count: first paragraph takes the extra token
    assert(ext(Html.htmlPage(7L, "a b c")).contains("a b\nc"))
    // single token: second paragraph vanishes (no empty line)
    val one = ext(Html.htmlPage(3L, "solo"))
    assert(one == "Doc 3\nhome | doc 3\nDoc 3\nsolo\n" +
      "© corpus 3 — \"graft\"")
    // text with HTML-active characters survives the escape round-trip
    val spicy = "a<b>&amp;</b> c&nbsp;d e<f g"
    val got = ext(Html.htmlPage(9L, spicy))
    val (p1, p2) = Html.paragraphsOf(spicy)
    assert(got.contains(p1 + "\n" + p2),
      s"escape round-trip mangled: $got")
    // corpus-wide: every doc's extraction matches the formula
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").as[(Long, String)].collect()
    val facts = Html.extractFacts(spark,
      Html.asHtmlPages(spark, Tables.documents(spark, sf0001)))
      .as[(Long, String, Int)].collect().map(r => r._1 -> r).toMap
    for ((id, text) <- docs) {
      val (p1, p2) = Html.paragraphsOf(text)
      val lines = Seq(s"Doc $id", s"home | doc $id", s"Doc $id",
        p1, p2, s"© corpus ${id % 100} — \"graft\"").filter(_.nonEmpty)
      val (_, got, n) = facts(id)
      assert(got == lines.mkString("\n"), s"doc $id text drift")
      assert(n == lines.length, s"doc $id n_lines drift")
    }
  }
}
