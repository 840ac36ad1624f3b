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

  test("attribute parsing: quoted/bare/valueless values, entity " +
    "decode inside attributes, first occurrence wins, junk tolerated") {
    val a = Html.attrsOf(
      "meta name=\"robots\" content='noindex, follow' data-x=bare flag")
    assert(a("name") == "robots")
    assert(a("content") == "noindex, follow")
    assert(a("data-x") == "bare")
    assert(a("flag") == "")
    assert(Html.attrsOf("a href=\"?x=1&amp;y=2\"")("href") == "?x=1&y=2")
    assert(Html.attrsOf("p a=1 a=2")("a") == "1") // first wins
    assert(Html.attrsOf("img src = \"spaced.png\"")("src")
      == "spaced.png")
    assert(Html.attrsOf("br/").isEmpty)
    assert(Html.attrsOf("p title=\"unclosed")("title") == "unclosed")
  }

  test("head metadata: title/lang/charset/robots/canonical/" +
    "description read first-wins, scan stops at body, noindex " +
    "derived, http-equiv charset param, malformed degrades") {
    val m = Html.htmlMeta(Html.htmlPage(18L, "alpha beta"))
    assert(m.title.contains("Doc 18"))
    assert(m.lang.contains("en"))
    assert(m.charset.contains("utf-8"))
    assert(m.robots_meta.contains("noindex, follow") && m.noindex)
    assert(m.canonical.contains("http://corpus.example/doc/18"))
    assert(m.description.contains("synthetic doc 18 & friends"))
    val m2 = Html.htmlMeta(Html.htmlPage(22L, "x")) // 22%11=0, 22%9!=0
    assert(m2.lang.contains("de") && !m2.noindex &&
      m2.robots_meta.isEmpty)
    // http-equiv charset form; body content never scanned as meta
    val he = Html.htmlMeta(
      "<html><head><meta http-equiv=\"Content-Type\" " +
        "content=\"text/html; charset=ISO-8859-1\"/></head>" +
        "<body><meta name=\"robots\" content=\"noindex\"/>" +
        "<title>late</title></body></html>")
    assert(he.charset.contains("iso-8859-1"))
    assert(he.robots_meta.isEmpty && he.title.isEmpty && !he.noindex)
    // title entities + whitespace fold to one line; nofollow alone
    // is not noindex
    val t = Html.htmlMeta("<title>A &amp;\n  B</title>" +
      "<meta name=robots content=nofollow>")
    assert(t.title.contains("A & B"))
    assert(t.robots_meta.contains("nofollow") && !t.noindex)
    // malformed: unclosed title, empty doc
    assert(Html.htmlMeta("<title>never closed").title.isEmpty)
    assert(Html.htmlMeta("") == Html.HtmlMeta(None, None, None, None,
      noindex = false, None, None))
  }

  test("charset parameter + charset-aware HTTP decode: declared " +
    "latin-1 payloads decode correctly, bad charsets fall back") {
    assert(Html.charsetParamOf("text/html; charset=ISO-8859-1")
      .contains("iso-8859-1"))
    assert(Html.charsetParamOf("text/html; charset=\"UTF-8\"")
      .contains("utf-8"))
    assert(Html.charsetParamOf("text/plain").isEmpty)
    assert(Html.charsetParamOf("text/html; charset=").isEmpty)
    import spark.implicits._
    // a latin-1 payload: é is 0xE9, invalid as UTF-8
    val body = "café".getBytes(
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val block = Warc.httpBlockOf(body, ok = true,
      "text/plain; charset=iso-8859-1")
    val badBlock = Warc.httpBlockOf(body, ok = true,
      "text/plain; charset=no-such-charset")
    val arch = Warc.WarcArchive(0L,
      Warc.warcArchiveBytesBlocks(0L, Seq(1L -> block, 2L -> badBlock)))
    val texts = Warc.httpTexts(spark, Seq(arch).toDF())
      .collect().map(r => (r.getString(1), r.getString(4))).toMap
    assert(texts("http://corpus.example/doc/1") == "café",
      "declared latin-1 payload did not decode via its charset param")
    // unknown charset falls back to UTF-8 (replacement char, no throw)
    assert(texts("http://corpus.example/doc/2").startsWith("caf"))
  }

  test("block scoring: link attribution, density thresholds, block " +
    "segmentation == extractText lines, malformed anchors tolerated") {
    val html = "<p>short</p>" + // < 10 chars → dropped
      "<p>a perfectly normal content paragraph</p>" + // kept
      "<div><a href='/'>all of this text is a link span</a></div>" +
      "<div><a href='/x'>half link</a> and half plain text</div>" +
      "<p>entity &amp; inside <a href='/y'>link &lt;x&gt;</a></p>"
    val bs = Html.blockFacts(html)
    assert(bs.map(_.text) == Html.extractText(html).split("\n").toSeq,
      "block segmentation drifted from extractText lines")
    assert(bs(0).text == "short" && !bs(0).kept) // too short
    assert(bs(1).kept && bs(1).link_chars == 0)
    assert(bs(2).link_chars == bs(2).n_chars && !bs(2).kept) // pure link
    assert(bs(2).link_density == 1.0)
    // half link: "half link" = 9 of "half link and half plain text"
    assert(bs(3).link_chars == 9)
    assert(bs(3).kept == (9.0 / bs(3).n_chars <= 0.4))
    // entities: "&" outside is plain, "link <x>" decoded inside <a>
    assert(bs(4).link_chars == "link <x>".length)
    // the collapsed space between link and non-link spans is non-link
    val spaced = Html.blockFacts(
      "<p>plain   <a href='/'>linky</a>   tail</p>")
    assert(spaced.head.text == "plain linky tail")
    assert(spaced.head.link_chars == 5)
    // stray </a> never drives the depth negative
    val stray = Html.blockFacts("<p></a>no link here</p>")
    assert(stray.head.link_chars == 0)
    // nested anchors count once per char
    val nested = Html.blockFacts(
      "<p><a href='/'><a href='/2'>in</a>out</a></p>")
    assert(nested.head.link_chars >= 2)
    // the synth page: nav + title + h1 drop, paragraphs survive —
    // main-content extraction does its actual job on the fixture
    val page = Html.blockFacts(Html.htmlPage(33L, "w1 w2 w3 w4 " +
      "w5 w6 w7 w8 w9 w10 w11 w12"))
    assert(!page(0).kept && !page(1).kept && !page(2).kept,
      "chrome survived the density gate")
    assert(page(3).kept && page(4).kept, "content dropped")
    assert(page(1).link_chars == 8 + 2) // nav: 8 + digits(33)
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
