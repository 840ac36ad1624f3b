package graft.ext

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class WarcSpec extends SparkTestBase {

  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

  private def archiveOf(texts: (Long, String)*): Array[Byte] =
    Warc.warcArchiveBytes(7L,
      texts.map { case (id, t) => (id, t.getBytes(Ascii)) })

  test("WARC walk: synthesized multi-record archive round-trips fact " +
    "for fact, offsets tile the archive exactly, HTTP split reads " +
    "status/content-type/payload, WARC/1.0 accepted") {
    val texts = Seq(3L -> "alpha beta gamma", 5L -> "1234567",
      9L -> "words words") // 7 bytes → n%7==0 → 404
    val payload = archiveOf(texts: _*)
    val rs = Warc.parseWarc(payload).get
    assert(rs.length == 4)
    // record 0: the warcinfo envelope — constants by construction
    val info = rs(0).facts
    assert(info.rec_index == 0 && info.rec_offset == 0L)
    assert(info.warc_type == "warcinfo" &&
      info.target_uri.isEmpty && info.http_status.isEmpty)
    assert(info.rec_bytes == Warc.InfoRecBytes.toLong)
    assert(info.content_length == Warc.InfoBlock.length.toLong &&
      info.payload_bytes == Warc.InfoBlock.length.toLong)
    assert(info.record_id == Warc.recordIdOf(7L) &&
      info.warc_date == Warc.dateOf(7L))
    // responses: facts + the size contract the wa01 oracle replays
    for (((id, t), i) <- texts.sortBy(_._1).zipWithIndex) {
      val r = rs(i + 1).facts
      val n = t.length
      val statusLen = if (n % 7 == 0) Warc.Status404.length
        else Warc.Status200.length
      val clen = Warc.HttpBlockFixed + statusLen +
        n.toString.length + n
      assert(r.warc_type == "response" && r.rec_index == i + 1)
      assert(r.target_uri.contains(Warc.UriPrefix + id))
      assert(r.record_id == Warc.recordIdOf(id) &&
        r.warc_date == Warc.dateOf(id))
      assert(r.content_length == clen.toLong)
      assert(r.rec_bytes == (Warc.RespHdrFixed + id.toString.length +
        clen.toString.length + clen + 4).toLong)
      assert(r.http_status.contains(if (n % 7 == 0) 404 else 200))
      assert(r.http_content_type.contains(Warc.HttpTextCt))
      assert(r.payload_bytes == n.toLong)
      // the payload slice is the original text, byte for byte
      val p = rs(i + 1)
      assert(new String(payload, p.payOff, p.payLen, Ascii) == t)
    }
    // offsets tile: each record starts where the previous ended, and
    // the last ends at the archive end
    rs.sliding(2).foreach { case Seq(a, b) =>
      assert(a.facts.rec_offset + a.facts.rec_bytes == b.facts.rec_offset)
    }
    val last = rs.last.facts
    assert(last.rec_offset + last.rec_bytes == payload.length.toLong)
    // WARC/1.0 is accepted too
    val v10 = new String(payload, Ascii).replaceFirst("WARC/1\\.1",
      "WARC/1.0").getBytes(Ascii)
    assert(Warc.parseWarc(v10).get.length == 4)
  }

  test("WARC walk fails soft on hostile framing: bad magic, truncated " +
    "header, missing/bad/overflowing Content-Length, missing record " +
    "separator, malformed field, broken HTTP block, boundary CRLF") {
    val good = archiveOf(1L -> "hello world warc")
    def mutate(find: String, repl: String): Array[Byte] =
      new String(good, Ascii).replaceFirst(
        java.util.regex.Pattern.quote(find),
        java.util.regex.Matcher.quoteReplacement(repl)).getBytes(Ascii)
    assert(Warc.parseWarc(Array.emptyByteArray).isEmpty)
    assert(Warc.parseWarc("plain text no warc".getBytes(Ascii)).isEmpty)
    assert(Warc.parseWarc(mutate("WARC/1.1", "WARC/2.0")).isEmpty,
      "unknown version accepted")
    assert(Warc.parseWarc(good.take(40)).isEmpty,
      "truncated header did not fail soft")
    assert(Warc.parseWarc(mutate("Content-Length: ", "Content-Size: "))
      .isEmpty, "missing Content-Length accepted")
    assert(Warc.parseWarc(mutate("Content-Length: 41",
      "Content-Length: 4x")).isEmpty, "non-numeric length accepted")
    assert(Warc.parseWarc(mutate("Content-Length: 41",
      "Content-Length: 9999999")).isEmpty,
      "over-running length did not fail soft")
    assert(Warc.parseWarc(mutate("Content-Length: 41",
      s"Content-Length: ${Long.MaxValue - 10}")).isEmpty,
      "near-Long.MaxValue length overflowed past the bound check")
    assert(Warc.parseWarc(mutate("WARC-Type: warcinfo",
      "WARC-Type warcinfo")).isEmpty, "colon-less field accepted")
    assert(Warc.parseWarc(good.dropRight(2)).isEmpty,
      "missing record separator accepted")
    // a record claiming application/http whose block is not HTTP
    val badHttp = mutate("HTTP/1.1 200 OK", "NTTP/1.1 200 OK")
    assert(Warc.parseWarc(badHttp).isEmpty, "non-HTTP block accepted")
    val badCode = mutate("HTTP/1.1 200 OK", "HTTP/1.1 2x0 OK")
    assert(Warc.parseWarc(badCode).isEmpty, "bad status code accepted")
    // hostile: an http block with NO blank line before the (shrunken)
    // block end — the split must not read past the block
    val noBlank = mutate("\r\nContent-Type: text/plain", "")
    assert(Warc.parseWarc(noBlank).isEmpty ||
      Warc.parseWarc(noBlank).get.isEmpty)
  }

  test("warc.gz wire format: per-record gzip members inflate to the " +
    "plain archive byte for byte; facts equal the plain walk's; " +
    "corrupt CRC / truncated member / non-gzip bytes fail soft") {
    import spark.implicits._
    val plain = archiveOf(11L -> "gzip me gently", 13L -> "1234567",
      17L -> "third record text")
    val gz = Warc.gzipPerRecord(plain)
    // multi-member: one member per record, magic at offset 0
    assert((gz(0) & 0xff) == 0x1f && (gz(1) & 0xff) == 0x8b)
    assert(Warc.gunzipMembers(gz).map(_.toSeq).contains(plain.toSeq),
      "concatenated members did not inflate to the plain archive")
    // a SINGLE-member gzip of the whole archive inflates too
    val single = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(plain); g.finish(); bos.toByteArray
    }
    assert(Warc.gunzipMembers(single).map(_.toSeq)
      .contains(plain.toSeq))
    // fail-soft triad
    assert(Warc.gunzipMembers(plain).isEmpty, "non-gzip bytes accepted")
    assert(Warc.gunzipMembers(gz.dropRight(9)).isEmpty,
      "truncated member (no trailer) accepted")
    val corrupt = gz.clone()
    corrupt(gz.length / 2) = (corrupt(gz.length / 2) ^ 0x5a).toByte
    assert(Warc.gunzipMembers(corrupt).isEmpty ||
      Warc.gunzipMembers(corrupt).map(_.toSeq).contains(plain.toSeq),
      "CRC corruption neither failed soft nor was inert")
    // distributed: facts through the gz plane == facts over plain,
    // and a rotten gz archive contributes zero rows without failing
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    val plainFacts = Warc.recordFacts(spark,
      Warc.asWarcArchives(spark, docs)).collect().toSet
    val gzFacts = Warc.recordFactsGz(spark,
      Warc.asWarcGzArchives(spark, docs)).collect().toSet
    assert(gzFacts == plainFacts, "gz walk facts drifted from plain")
    val mixed = Seq(Warc.WarcArchive(0L, gz),
      Warc.WarcArchive(1L, gz.dropRight(9)),
      Warc.WarcArchive(2L, "not gzip at all".getBytes(Ascii))).toDF()
    val mixedFacts = Warc.recordFactsGz(spark, mixed).collect()
    assert(mixedFacts.map(_.archive_id).distinct.toSeq == Seq(0L))
    assert(mixedFacts.length == 4)
  }

  test("CDX member walk + random access: bounds tile the compressed " +
    "stream, optional gzip header fields parse, each member fetch " +
    "reproduces its record, hostile members refuse") {
    import spark.implicits._
    val plain = archiveOf(21L -> "alpha beta", 22L -> "1234567",
      23L -> "third text")
    val gz = Warc.gzipPerRecord(plain)
    val bounds = Warc.memberBounds(gz).get
    val recs = Warc.parseWarc(plain).get
    assert(bounds.length == recs.length) // 1 member per record
    // bounds tile: contiguous and end-exact
    assert(bounds.head.offset == 0L)
    bounds.sliding(2).foreach { case Seq(a, b) =>
      assert(a.offset + a.length == b.offset)
    }
    assert(bounds.last.offset + bounds.last.length == gz.length.toLong)
    // each member's random-access fetch == the full walk's record
    for ((r, m) <- recs.zip(bounds)) {
      val got = Warc.fetchRecord(gz, m.offset, m.length)
      assert(got.contains(r.facts.copy(rec_index = 0, rec_offset = 0L)))
    }
    // a member with FNAME + FEXTRA optional fields still walks
    val body = "WARC-ish payload".getBytes(Ascii)
    val deflater = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    deflater.setInput(body); deflater.finish()
    val cbuf = new Array[Byte](1024)
    var clen = 0
    while (!deflater.finished())
      clen += deflater.deflate(cbuf, clen, cbuf.length - clen)
    deflater.end()
    val crc = new java.util.zip.CRC32(); crc.update(body)
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val fancy = Array[Byte](0x1f.toByte, 0x8b.toByte, 8, (4 | 8).toByte,
      0, 0, 0, 0, 0, 0xff.toByte) ++
      Array[Byte](3, 0) ++ Array[Byte](1, 2, 3) ++ // FEXTRA len=3
      "name".getBytes(Ascii) ++ Array[Byte](0) ++ // FNAME, NUL-ended
      cbuf.take(clen) ++ le32(crc.getValue) ++ le32(body.length.toLong)
    assert(Warc.memberBounds(fancy).exists(_.length == 1))
    // hostile: corrupt CRC trailer, truncated trailer, mid-member
    // offset, oversize/negative slices
    val badCrc = gz.clone()
    badCrc(bounds.head.length.toInt - 5) =
      (badCrc(bounds.head.length.toInt - 5) ^ 0x7f).toByte
    assert(Warc.memberBounds(badCrc).isEmpty)
    assert(Warc.memberBounds(gz.dropRight(3)).isEmpty)
    assert(Warc.fetchRecord(gz, 1L, bounds.head.length).isEmpty)
    assert(Warc.fetchRecord(gz, 0L, gz.length + 10L).isEmpty)
    assert(Warc.fetchRecord(gz, -1L, 10L).isEmpty)
    // a whole-archive single member is NOT the 1:1 layout → cdxIndex
    // drops it; per-record archives index fully with fetch_ok true
    val single = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(plain); g.finish(); bos.toByteArray
    }
    val df = Seq(Warc.WarcArchive(0L, gz),
      Warc.WarcArchive(1L, single),
      Warc.WarcArchive(2L, Array[Byte](1, 2, 3))).toDF()
    val idx = Warc.cdxIndex(spark, df).collect()
    assert(idx.map(_.getLong(0)).distinct.toSeq == Seq(0L))
    assert(idx.length == recs.length)
    assert(idx.forall(_.getBoolean(6)), "a fetch_ok bit flipped")
    // SURT keys: responses keyed, warcinfo NULL
    val surts = idx.map(r => Option(r.getString(2))).toSeq
    assert(surts.count(_.isEmpty) == 1)
    assert(surts.flatten.forall(_.startsWith("example,corpus)/doc/")))
  }

  test("crawl pipeline: HTML pages ride gzipped WARC with the id-" +
    "scheduled 404 and text/html content-type; extraction of the " +
    "delivered payload equals extracting the page directly") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    val arch = Warc.asHtmlWarcGzArchives(spark, docs)
    val rows = Warc.httpTextsGz(spark, arch)
      .select("target_uri", "http_status", "http_content_type", "text")
      .as[(String, Int, String, String)].collect()
      .map(r => (r._1.split("/").last.toLong, r._2, r._3, r._4))
    val byId = rows.map(r => r._1 -> r).toMap
    val docRows = docs.as[(Long, String)].collect()
    assert(rows.length == docRows.length)
    for ((id, text) <- docRows) {
      val (_, status, ct, payload) = byId(id)
      assert(status == (if (id % 7 == 0) 404 else 200))
      assert(ct == Warc.HttpHtmlCt)
      assert(payload == Html.htmlPage(id, text),
        s"doc $id payload drifted through the gz WARC plane")
      assert(Html.extractText(payload) ==
        Html.extractText(Html.htmlPage(id, text)))
    }
  }

  test("crawl funnel: stages shrink monotonically, every gate " +
    "matches its independent schedule on the corpus") {
    import spark.implicits._
    val row = graft.queries.WarcQueries
      .defs("wa10_crawl_funnel")(spark, sf0001).collect().head
    val Seq(front, allowed, fetched, indexable, tokOk) =
      (0 until 5).map(row.getLong)
    val ids = Tables.documents(spark, sf0001)
      .select("doc_id").as[Long].collect()
    assert(front == ids.length)
    def robotsOk(id: Long) =
      id % 6 == 0 || (id % 50) % 3 != 0 || id % 10 == 0
    assert(allowed == ids.count(robotsOk))
    assert(fetched == ids.count(id => robotsOk(id) && id % 7 != 0))
    assert(indexable == ids.count(id =>
      robotsOk(id) && id % 7 != 0 && id % 9 != 0))
    assert(front >= allowed && allowed >= fetched &&
      fetched >= indexable && indexable >= tokOk)
    // every gate actually bites on this corpus
    assert(allowed < front && fetched < allowed &&
      indexable < fetched && tokOk > 0)
  }

  test("recordFacts drops unparseable archives, keeps good ones; " +
    "httpTexts round-trips document text exactly (the wa02 gate)") {
    import spark.implicits._
    val good = Warc.warcArchiveBytes(0L,
      Seq(1L -> "good doc text here", 2L -> "1234567")
        .map { case (id, t) => (id, t.getBytes(Ascii)) })
    val bad = "WARC/9.9\r\ngarbage".getBytes(Ascii)
    val archives = Seq(Warc.WarcArchive(0L, good),
      Warc.WarcArchive(1L, bad)).toDF()
    val facts = Warc.recordFacts(spark, archives).collect()
    assert(facts.map(_.archive_id).distinct.toSeq == Seq(0L),
      "rotten archive leaked rows or killed the walk")
    assert(facts.length == 3)
    // httpTexts: both responses surface with status; text exact
    val texts = Warc.httpTexts(spark, archives).collect()
      .map(r => (r.getInt(2), r.getString(4))).toSet
    assert(texts == Set((200, "good doc text here"), (404, "1234567")))
    // end-to-end over the corpus: extraction == the original text for
    // every 200-status doc
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    val arch = Warc.asWarcArchives(spark, docs)
    val ext = Warc.httpTexts(spark, arch)
      .filter(col("http_status") === 200)
      .select(regexp_extract(col("target_uri"), "(\\d+)$", 1)
        .cast("long").as("doc_id"), col("text"))
    val mismatch = ext.as("e")
      .join(docs.as("d"), Seq("doc_id"))
      .filter(col("e.text") =!= col("d.text")).count()
    assert(mismatch == 0, "extracted payload text drifted")
    val n200 = docs.filter(
      octet_length(col("text").cast("binary")) % 7 =!= 0).count()
    assert(ext.count() == n200, "200-status extraction count wrong")
  }
}
