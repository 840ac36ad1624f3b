package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HTML → text extraction [EXT] — the step between the WARC payload
  * plane (wa01–wa03) and the text plane (x-family): crawl payloads
  * are HTML, and every downstream gate (tokens, quality, dedup)
  * wants the rendered TEXT. This is the C4/CCNet-shaped structural
  * extractor: drop what never renders (comments, `script`/`style`
  * element content, markup declarations), fold block-level element
  * boundaries to newlines, strip remaining tags, decode character
  * entities, and normalize whitespace — deterministic and structural
  * by design (content-quality heuristics live in the x-family, where
  * they are scored, not hidden inside extraction).
  *
  * Exact semantics (the contract the wa04 oracle replays):
  *   1. `<!--…-->` comments are removed (unterminated → rest of the
  *      document is dropped — fail-soft, never garbage).
  *   2. `<script>`/`<style>` elements are removed WITH their content
  *      (case-insensitive, attribute-tolerant, self-closed forms keep
  *      nothing to skip; unterminated → rest dropped).
  *   3. Every other tag is stripped; tags in [[BlockTags]] (and the
  *      void `br`/`hr`) emit a newline in their place. Attribute
  *      values may contain `>` inside quotes — the tag-end scan is
  *      quote-aware.
  *   4. Entities decode: the named core set ([[Entities]]) plus
  *      numeric `&#NNN;` / `&#xHH;` for valid non-zero, non-surrogate
  *      code points; anything unknown or malformed stays literal.
  *   5. Whitespace: CRLF/CR → LF; per line, runs of space/tab
  *      collapse to one space and the line is trimmed (NBSP is NOT
  *      collapsible — HTML semantics); empty lines drop; lines join
  *      with a single `\n`.
  *
  * Scale notes: extraction is a single-pass character walk inside a
  * narrow map over the page column — no shuffle, no driver data, no
  * regex backtracking. At 100 TB the pass is embarrassingly parallel
  * and reads each payload byte exactly once (the `script`/`style`
  * skip scans forward without re-visiting).
  *
  * Synthesized fixtures ([[htmlPage]]) wrap each document's text in a
  * fixed template — title, nav with an entity, heading, the text
  * split into two paragraphs at the token midpoint, an entity-bearing
  * footer, plus style/script/comment junk that must NOT leak — so the
  * extracted string is a closed formula over the document row and the
  * wa04 oracle compares the FULL extracted text hash-exactly.
  */
object Html {

  /** Elements whose boundaries fold to line breaks (HTML's standard
    * block-level set plus table rows/cells and the void separators).
    */
  private[ext] val BlockTags: Set[String] = Set(
    "address", "article", "aside", "blockquote", "body", "caption",
    "dd", "details", "dialog", "div", "dl", "dt", "fieldset",
    "figcaption", "figure", "footer", "form", "h1", "h2", "h3", "h4",
    "h5", "h6", "head", "header", "hgroup", "html", "li", "main",
    "nav", "ol", "p", "pre", "section", "summary", "table", "tbody",
    "td", "tfoot", "th", "thead", "title", "tr", "ul", "br", "hr",
    "script", "style", "noscript", "template")

  /** Elements removed with their content. */
  private[ext] val SkipContent: Set[String] =
    Set("script", "style", "noscript", "template")

  /** Named entities decoded; unknown names stay literal. */
  private[ext] val Entities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "copy" -> "©",
    "reg" -> "®", "mdash" -> "—", "ndash" -> "–",
    "hellip" -> "…", "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”", "middot" -> "·",
    "deg" -> "°", "plusmn" -> "±", "times" -> "×",
    "divide" -> "÷", "laquo" -> "«", "raquo" -> "»")

  /** Index AFTER the `>` closing the tag that starts at `from`
    * (`html(from) == '<'`), skipping quoted attribute values; -1 when
    * the tag never closes.
    */
  private def tagEnd(s: String, from: Int): Int = {
    var i = from + 1
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '"' || c == '\'') {
        i += 1
        while (i < n && s.charAt(i) != c) i += 1
        if (i >= n) return -1
        i += 1
      } else if (c == '>') return i + 1
      else i += 1
    }
    -1
  }

  /** First case-insensitive occurrence of `</name` at/after `from`
    * that is a real close-tag boundary (followed by `>`, whitespace,
    * or `/`); -1 when absent.
    */
  private def closeTagAt(s: String, name: String, from: Int): Int = {
    val needle = "</" + name
    val k = needle.length
    var i = from
    val limit = s.length - k
    while (i <= limit) {
      if (s.regionMatches(true, i, needle, 0, k)) {
        val after = i + k
        if (after >= s.length) return -1
        val c = s.charAt(after)
        if (c == '>' || c == '/' || c == ' ' || c == '\t' ||
          c == '\n' || c == '\r') return i
      }
      i += 1
    }
    -1
  }

  /** Decode the entity starting at `s(i) == '&'`: (decoded, chars
    * consumed). Unknown/malformed → the literal `&` and 1.
    */
  private def entityAt(s: String, i: Int): (String, Int) = {
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi == i + 1 || semi - i > 12) return ("&", 1)
    val body = s.substring(i + 1, semi)
    if (body.charAt(0) == '#') {
      val num = body.substring(1)
      val cp =
        try {
          if (num.isEmpty) -1
          else if (num.charAt(0) == 'x' || num.charAt(0) == 'X')
            Integer.parseInt(num.substring(1), 16)
          else Integer.parseInt(num)
        } catch { case _: NumberFormatException => -1 }
      if (cp > 0 && cp <= 0x10ffff && !(cp >= 0xd800 && cp <= 0xdfff))
        (new String(Character.toChars(cp)), semi - i + 1)
      else ("&", 1)
    } else Entities.get(body.toLowerCase) match {
      case Some(d) => (d, semi - i + 1)
      case None    => ("&", 1)
    }
  }

  /** The raw structural pass: tags/comments/skip-content removed,
    * block boundaries → `\n`, entities decoded. Whitespace untouched
    * (that is [[normalizeWs]]'s job).
    */
  private[ext] def rawExtract(html: String): String = {
    val n = html.length
    val out = new java.lang.StringBuilder(math.min(n, 1 << 16))
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else {
          val e = tagEnd(html, i)
          if (e < 0) i = n // unterminated tag: drop the rest
          else {
            var j = i + 1
            val closing = j < n && html.charAt(j) == '/'
            if (closing) j += 1
            val ns = j
            while (j < e - 1 && html.charAt(j).isLetterOrDigit) j += 1
            val name = html.substring(ns, j).toLowerCase
            if (BlockTags.contains(name)) out.append('\n')
            val selfClosed = e - 2 >= i && html.charAt(e - 2) == '/'
            if (!closing && !selfClosed && SkipContent.contains(name)) {
              val close = closeTagAt(html, name, e)
              if (close < 0) i = n
              else {
                val ce = tagEnd(html, close)
                i = if (ce < 0) n else ce
              }
            } else i = e
          }
        }
      } else if (c == '&') {
        val (dec, adv) = entityAt(html, i)
        out.append(dec)
        i += adv
      } else {
        out.append(c)
        i += 1
      }
    }
    out.toString
  }

  /** Line-fold: CR forms → LF; per line collapse space/tab runs to
    * one space and trim; drop empties; join with `\n`.
    */
  private[ext] def normalizeWs(raw: String): String = {
    val out = new java.lang.StringBuilder(raw.length)
    var lineStart = out.length
    var pendingSpace = false
    var i = 0
    val n = raw.length
    def endLine(): Unit = {
      if (out.length > lineStart) { // non-empty line: commit + break
        out.append('\n')
        lineStart = out.length
      }
      pendingSpace = false
    }
    while (i < n) {
      raw.charAt(i) match {
        case '\r' =>
          if (i + 1 < n && raw.charAt(i + 1) == '\n') i += 1
          endLine()
        case '\n' => endLine()
        case ' ' | '\t' =>
          if (out.length > lineStart) pendingSpace = true
        case c =>
          if (pendingSpace) { out.append(' '); pendingSpace = false }
          out.append(c)
      }
      i += 1
    }
    if (out.length > 0 && out.charAt(out.length - 1) == '\n')
      out.setLength(out.length - 1)
    out.toString
  }

  /** The extractor: structural pass, then whitespace fold. */
  def extractText(html: String): String = normalizeWs(rawExtract(html))

  // ---- main-content block scoring (wa13) -------------------------

  /** Link-density block classification thresholds (jusText/Arc90
    * shape, shared with the wa13 oracle): a block survives when it
    * has at least [[MinBlockChars]] characters and at most
    * [[MaxLinkDensity]] of them inside `<a>` spans. Chrome is short
    * or link-dense; content is long and link-sparse.
    */
  private[graft] val MinBlockChars = 10
  private[graft] val MaxLinkDensity = 0.4

  /** One scored block: the collapsed line, its char counts, and the
    * keep verdict.
    */
  final case class BlockFact(block_idx: Int, text: String,
                             n_chars: Int, link_chars: Int,
                             link_density: Double, kept: Boolean)

  /** Block facts with LINK ATTRIBUTION: the same walk and the same
    * block segmentation as [[extractText]] (a block IS an extracted
    * line — comments/script/style dropped, block tags break, entities
    * decode, whitespace folds), but every emitted character carries
    * whether it sits inside an `<a>` element, and each surviving
    * block reports chars / link-chars / link density and the
    * keep verdict. `extractText == blocks.map(_.text).mkString("\n")`
    * by construction (spec-pinned). A collapsed whitespace run
    * counts as link only when EVERY character it replaces sat inside
    * the anchor (so a pure-link block scores density exactly 1.0,
    * and a boundary space between spans stays non-link).
    */
  def blockFacts(html: String): Vector[BlockFact] = {
    // the rawExtract walk, emitting (char, inLink) pairs
    val n = html.length
    val chars = new java.lang.StringBuilder(math.min(n, 1 << 16))
    val link = new java.lang.StringBuilder(math.min(n, 1 << 16))
    var linkDepth = 0
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else {
          val e = tagEnd(html, i)
          if (e < 0) i = n
          else {
            var j = i + 1
            val closing = j < n && html.charAt(j) == '/'
            if (closing) j += 1
            val ns = j
            while (j < e - 1 && html.charAt(j).isLetterOrDigit) j += 1
            val name = html.substring(ns, j).toLowerCase
            val selfClosed = e - 2 >= i && html.charAt(e - 2) == '/'
            if (name == "a" && !selfClosed) {
              if (closing) linkDepth = math.max(0, linkDepth - 1)
              else linkDepth += 1
            }
            if (BlockTags.contains(name)) { chars.append('\n'); link.append('0') }
            if (!closing && !selfClosed && SkipContent.contains(name)) {
              val close = closeTagAt(html, name, e)
              if (close < 0) i = n
              else {
                val ce = tagEnd(html, close)
                i = if (ce < 0) n else ce
              }
            } else i = e
          }
        }
      } else if (c == '&') {
        val (dec, adv) = entityAt(html, i)
        chars.append(dec)
        var k = 0
        while (k < dec.length) {
          link.append(if (linkDepth > 0) '1' else '0'); k += 1
        }
        i += adv
      } else {
        chars.append(c)
        link.append(if (linkDepth > 0) '1' else '0')
        i += 1
      }
    }
    // lockstep whitespace fold: same rules as normalizeWs, the mask
    // following the text (collapsed whitespace is non-link)
    val raw = chars.toString
    val mask = link.toString
    val out = Vector.newBuilder[BlockFact]
    val line = new java.lang.StringBuilder
    var lineLinks = 0
    var pendingSpace = false
    var pendingLink = false
    var idx = 0
    def flush(): Unit = {
      if (line.length > 0) {
        val t = line.toString
        val nc = t.length
        val lc = lineLinks
        // the engine-portable grid: HALF_UP at 6 decimals, -0.0
        // normalized (the oracle rounds the same double the same way)
        val d = BigDecimal(lc.toDouble / nc)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        out += BlockFact(idx, t, nc, lc, d + 0.0,
          nc >= MinBlockChars && d <= MaxLinkDensity)
        idx += 1
      }
      line.setLength(0); lineLinks = 0; pendingSpace = false
    }
    var p = 0
    val rn = raw.length
    while (p < rn) {
      raw.charAt(p) match {
        case '\r' =>
          if (p + 1 < rn && raw.charAt(p + 1) == '\n') p += 1
          flush()
        case '\n' => flush()
        case ' ' | '\t' =>
          if (line.length > 0) {
            val isLink = mask.charAt(p) == '1'
            // the folded space is link only when EVERY whitespace
            // char it replaces sat inside the anchor
            pendingLink = if (pendingSpace) pendingLink && isLink
            else isLink
            pendingSpace = true
          }
        case c =>
          if (pendingSpace) {
            line.append(' ')
            if (pendingLink) lineLinks += 1
            pendingSpace = false
          }
          line.append(c)
          if (mask.charAt(p) == '1') lineLinks += 1
      }
      p += 1
    }
    flush()
    out.result()
  }

  /** Pages → scored blocks (the wa13 surface) — narrow map. */
  def blockFactsDf(spark: SparkSession, pages: DataFrame): DataFrame = {
    import spark.implicits._
    pages.select(col("doc_id").cast("long"), col("html"))
      .as[(Long, String)]
      .flatMap { case (id, h) =>
        blockFacts(h).map(b => (id, b.block_idx, b.text, b.n_chars,
          b.link_chars, b.link_density, b.kept))
      }
      .toDF("doc_id", "block_idx", "text", "n_chars", "link_chars",
        "link_density", "kept")
  }

  // ---- head metadata (wa09) --------------------------------------

  /** Decode entities in a plain string (attribute values, title
    * text) — the same table/numeric rules as the extractor.
    */
  private[ext] def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val (dec, adv) = entityAt(s, i)
        out.append(dec)
        i += adv
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Attribute map of a tag's source (between `<` and `>`): lowercase
    * names, quoted or bare values, entity-decoded; a valueless
    * attribute maps to "". First occurrence wins.
    */
  private[ext] def attrsOf(tag: String): Map[String, String] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val n = tag.length
    var i = 0
    while (i < n && !tag.charAt(i).isWhitespace) i += 1 // skip name
    while (i < n) {
      while (i < n && (tag.charAt(i).isWhitespace ||
        tag.charAt(i) == '/')) i += 1
      if (i < n) {
        val ns = i
        while (i < n && tag.charAt(i) != '=' &&
          !tag.charAt(i).isWhitespace && tag.charAt(i) != '/') i += 1
        val name = tag.substring(ns, i).toLowerCase
        var j = i
        while (j < n && tag.charAt(j).isWhitespace) j += 1
        if (j < n && tag.charAt(j) == '=') {
          j += 1
          while (j < n && tag.charAt(j).isWhitespace) j += 1
          val value =
            if (j < n && (tag.charAt(j) == '"' || tag.charAt(j) == '\'')) {
              val q = tag.charAt(j)
              val vs = j + 1
              var k = vs
              while (k < n && tag.charAt(k) != q) k += 1
              j = if (k < n) k + 1 else n
              tag.substring(vs, math.min(k, n))
            } else {
              val vs = j
              while (j < n && !tag.charAt(j).isWhitespace &&
                tag.charAt(j) != '/') j += 1
              tag.substring(vs, j)
            }
          if (name.nonEmpty && !m.contains(name))
            m.update(name, decodeEntities(value))
          i = j
        } else {
          if (name.nonEmpty && !m.contains(name)) m.update(name, "")
          i = if (j > i) j else i
        }
      }
    }
    m.toMap
  }

  /** Head metadata (the wa09 facts): everything first-wins, scan
    * stops at `<body` — these are the pre-index fields.
    */
  final case class HtmlMeta(
      title: Option[String], lang: Option[String],
      charset: Option[String], robots_meta: Option[String],
      noindex: Boolean, canonical: Option[String],
      description: Option[String])

  /** Scan the document head for metadata: `<title>` text (entity-
    * decoded, whitespace-folded to one line), `<html lang>`,
    * `<meta charset>` / `http-equiv=content-type`'s charset param,
    * `<meta name=robots>` (with the derived noindex bit),
    * `<link rel=canonical>`, `<meta name=description>`. Malformed
    * markup degrades to absent fields, never an exception.
    */
  def htmlMeta(html: String): HtmlMeta = {
    var title: Option[String] = None
    var lang: Option[String] = None
    var charset: Option[String] = None
    var robots: Option[String] = None
    var canonical: Option[String] = None
    var description: Option[String] = None
    val n = html.length
    var i = 0
    var stop = false
    while (i < n && !stop) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else {
          val e = tagEnd(html, i)
          if (e < 0) i = n
          else {
            var j = i + 1
            val closing = j < n && html.charAt(j) == '/'
            if (closing) j += 1
            val ns = j
            while (j < e - 1 && html.charAt(j).isLetterOrDigit) j += 1
            val name = html.substring(ns, j).toLowerCase
            val src = html.substring(i + 1, e - 1)
            name match {
              case "body" if !closing => stop = true
              case "html" if !closing && lang.isEmpty =>
                lang = attrsOf(src).get("lang").filter(_.nonEmpty)
              case "title" if !closing && title.isEmpty =>
                val close = closeTagAt(html, "title", e)
                if (close >= 0) {
                  title = Some(normalizeWs(decodeEntities(
                    html.substring(e, close))).replace('\n', ' '))
                  val ce = tagEnd(html, close)
                  i = if (ce < 0) n else ce
                }
              case "meta" if !closing =>
                val a = attrsOf(src)
                a.get("charset").filter(_.nonEmpty).foreach { cs =>
                  if (charset.isEmpty) charset = Some(cs.toLowerCase)
                }
                (a.get("http-equiv").map(_.toLowerCase),
                  a.get("content")) match {
                  case (Some("content-type"), Some(ct))
                    if charset.isEmpty =>
                    charset = charsetParamOf(ct)
                  case _ =>
                }
                (a.get("name").map(_.toLowerCase), a.get("content")) match {
                  case (Some("robots"), Some(v)) if robots.isEmpty =>
                    robots = Some(v)
                  case (Some("description"), Some(v))
                    if description.isEmpty => description = Some(v)
                  case _ =>
                }
              case "link" if !closing && canonical.isEmpty =>
                val a = attrsOf(src)
                if (a.get("rel").exists(_.equalsIgnoreCase("canonical")))
                  canonical = a.get("href").filter(_.nonEmpty)
              case "script" | "style" if !closing &&
                !(e - 2 >= i && html.charAt(e - 2) == '/') =>
                val close = closeTagAt(html, name, e)
                if (close < 0) i = n
                else {
                  val ce = tagEnd(html, close)
                  i = if (ce < 0) n else ce
                }
              case _ =>
            }
            if (i < e) i = e // tags that did not jump themselves
          }
        }
      } else i += 1
    }
    val noindex = robots.exists(_.toLowerCase.split(",")
      .map(_.trim).contains("noindex"))
    HtmlMeta(title, lang, charset, robots, noindex, canonical,
      description)
  }

  /** The `charset=` parameter of a Content-Type value, lowercased. */
  private[ext] def charsetParamOf(ct: String): Option[String] = {
    ct.split(";").iterator.map(_.trim).collectFirst {
      case p if p.toLowerCase.startsWith("charset=") =>
        p.substring("charset=".length).trim
          .stripPrefix("\"").stripSuffix("\"").toLowerCase
    }.filter(_.nonEmpty)
  }

  // ---- synthesized fixtures (shared template: synth + oracle) ----

  private def esc(t: String): String =
    t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Token-midpoint paragraph split — `(take ⌈n/2⌉, drop ⌈n/2⌉)`;
    * single-space joins reproduce the text exactly (the oracle slices
    * `string_split` the same way).
    */
  private[ext] def paragraphsOf(text: String): (String, String) = {
    val toks = text.split(" ", -1)
    val k = (toks.length + 1) / 2
    (toks.take(k).mkString(" "), toks.drop(k).mkString(" "))
  }

  /** The synthesized page: fixed boilerplate that must NOT leak
    * (style/script/comment), entity-bearing chrome that MUST decode,
    * and the document text escaped into two paragraphs.
    */
  private[graft] def htmlPage(id: Long, text: String): String = {
    val (p1, p2) = paragraphsOf(text)
    val lang = if (id % 11 == 0) "de" else "en"
    val robotsMeta =
      if (id % 9 == 0) "<meta name=\"robots\" content=\"noindex, follow\"/>\n"
      else ""
    s"""<!DOCTYPE html>
       |<html lang="$lang">
       |<head>
       |<meta charset="utf-8"/>
       |<title>Doc $id</title>
       |${robotsMeta}<link rel="canonical" href="http://corpus.example/doc/$id"/>
       |<meta name="description" content="synthetic doc $id &amp; friends"/>
       |<style type="text/css">body { margin: 0; } /* <junk> & more */</style>
       |<script>if (1 < 2 && 3 > 2) { console.log("<b>skip &amp; me</b>"); }</script>
       |</head>
       |<body>
       |<!-- synthetic page for doc $id: <div> & entities inside a comment -->
       |<nav><a href="/">home</a> | <a href="/doc/$id">doc&nbsp;$id</a></nav>
       |<h1>Doc $id</h1>
       |<p>${esc(p1)}</p>
       |<p>${esc(p2)}</p>
       |<footer>&copy; corpus ${id % 100} &mdash; &quot;graft&quot;</footer>
       |</body>
       |</html>
       |""".stripMargin
  }

  /** Documents → synthesized pages `(doc_id, html)` — narrow map. */
  def asHtmlPages(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, t) => (id, htmlPage(id, t)) }
      .toDF("doc_id", "html")
  }

  /** Pages → head-metadata facts (the wa09 surface) — narrow map. */
  def metaFacts(spark: SparkSession, pages: DataFrame): DataFrame = {
    import spark.implicits._
    pages.select(col("doc_id").cast("long"), col("html"))
      .as[(Long, String)]
      .map { case (id, h) =>
        val m = htmlMeta(h)
        (id, m.title.orNull, m.lang.orNull, m.charset.orNull,
          m.robots_meta.orNull, m.noindex, m.canonical.orNull,
          m.description.orNull)
      }
      .toDF("doc_id", "title", "lang", "charset", "robots_meta",
        "noindex", "canonical", "description")
  }

  /** Pages → extracted text facts `(doc_id, text, n_lines)` — the
    * wa04 surface. Narrow map; n_lines counts the folded lines (0
    * for a page that extracts to nothing).
    */
  def extractFacts(spark: SparkSession, pages: DataFrame): DataFrame = {
    import spark.implicits._
    pages.select(col("doc_id").cast("long"), col("html"))
      .as[(Long, String)]
      .map { case (id, h) =>
        val t = extractText(h)
        val lines = if (t.isEmpty) 0
        else 1 + t.count(_ == '\n')
        (id, t, lines)
      }
      .toDF("doc_id", "text", "n_lines")
  }
}
