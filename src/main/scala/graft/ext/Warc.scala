package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500 / WARC/1.1) record-walk ingestion [EXT] — the
  * Common Crawl front door of the corpus plane: web-scale training
  * pipelines START from WARC archives, and everything downstream
  * (dedup, quality gates, text analysis) assumes someone parsed the
  * crawl. This module is that parser, in the m07–m11 container-walk
  * discipline: archives are opaque `binary` columns, the walk reads
  * record-level FACTS (type, target URI, date, offsets, the HTTP
  * status/content-type split) without interpreting payloads, hostile
  * or truncated framing fails soft, and payload text is extracted
  * only for the records a pushed predicate keeps.
  *
  * Layout parsed (the public spec, not any tool's quirks): a WARC
  * file is a concatenation of records, each
  *
  *   `WARC/1.1 CRLF` — version line (1.0 and 1.1 accepted)
  *   `Name: value CRLF` ... — named fields; `WARC-Type`,
  *     `WARC-Record-ID`, `WARC-Date`, `Content-Length` mandatory
  *   `CRLF` — end of header
  *   content block — exactly `Content-Length` bytes
  *   `CRLF CRLF` — record separator
  *
  * For records whose `Content-Type` is `application/http` the block
  * is split once more: `HTTP/1.x <code> <reason> CRLF`, HTTP headers,
  * `CRLF CRLF`, payload — surfacing the status code, the HTTP
  * content-type, and the true payload byte count (the pre-fetch
  * facts a 100 TB crawl pass filters on before touching text).
  *
  * Fail-soft contract (spec-pinned): a malformed archive — bad magic,
  * truncated header, missing/non-numeric/over-running Content-Length,
  * a missing record separator, an HTTP block that does not parse —
  * yields NO rows rather than an exception or partial garbage; a
  * crawl shard with one rotten archive keeps flowing.
  *
  * Scale notes: the walk is a narrow `mapPartitions` over binary
  * rows — embarrassingly parallel, no shuffle, no driver data. At
  * 100 TB, archives arrive as one blob per WARC file (or per range
  * split); facts are thin columns that aggregate/filter without
  * re-reading payload bytes, and [[httpTexts]] materializes text only
  * for the rows its caller's predicate keeps. Synthesized fixtures
  * ([[asWarcArchives]]) make every fact and every offset a closed
  * formula over the document text length, so the whole walk —
  * including the record-offset arithmetic — replays in SQL
  * (oracle-checked, wa01/wa02).
  */
object Warc {

  private val BatchSize = 64
  private val Crlf = "\r\n"
  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII
  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  /** One archive (≙ one .warc file): an opaque binary payload. */
  final case class WarcArchive(archive_id: Long, payload: Array[Byte])

  /** Record-level facts, one row per record (the wa01 schema). */
  final case class WarcRecordFacts(
      archive_id: Long, rec_index: Int, rec_offset: Long,
      rec_bytes: Long, warc_type: String, record_id: String,
      target_uri: Option[String], warc_date: String,
      content_length: Long, http_status: Option[Int],
      http_content_type: Option[String], payload_bytes: Long)

  /** A parsed record plus the payload slice coordinates (internal —
    * [[httpTexts]] re-slices the archive without copying per-fact).
    */
  private[ext] final case class Parsed(facts: WarcRecordFacts,
                                       payOff: Int, payLen: Int)

  // ---- synthesized fixtures (shared constants: writer + oracle) ----

  /** Documents per synthesized archive — multi-record walks by
    * construction (the last archive may be partial).
    */
  private[graft] val DocsPerArchive = 4L
  private[graft] val UriPrefix = "http://corpus.example/doc/"
  private[graft] val InfoBlock =
    "software: graft-synth\r\nformat: WARC/1.1\r\n"
  private[graft] val HttpTextCt = "text/plain"
  private[graft] val WarcHttpCt = "application/http;msgtype=response"
  private[graft] val WarcInfoCt = "application/warc-fields"
  private[graft] val Status200 = "HTTP/1.1 200 OK"
  private[graft] val Status404 = "HTTP/1.1 404 Not Found"

  /** Fixed-width record id — every record-id is the same length, so
    * record sizes depend only on digits(doc_id) and digits(clen).
    */
  private[graft] def recordIdOf(id: Long): String =
    f"<urn:uuid:00000000-0000-0000-0000-$id%012d>"

  /** Fixed-width (20-char) UTC date derived from the id. */
  private[graft] def dateOf(id: Long): String =
    f"2024-01-01T${id % 24}%02d:${id * 3 % 60}%02d:${id * 7 % 60}%02dZ"

  /** An HTTP response block with explicit status + content-type. */
  private[graft] def httpBlockOf(body: Array[Byte], ok: Boolean,
                                 ct: String): Array[Byte] = {
    val status = if (ok) Status200 else Status404
    (s"$status${Crlf}Content-Type: $ct${Crlf}" +
      s"Content-Length: ${body.length}$Crlf$Crlf").getBytes(Ascii) ++ body
  }

  /** The wa01 block: 404 every 7th text byte count (so both
    * status-line lengths exercise), text/plain, the text bytes.
    */
  private[graft] def httpBlock(body: Array[Byte]): Array[Byte] =
    httpBlockOf(body, body.length % 7 != 0, HttpTextCt)

  private def record(warcType: String, id: Long,
                     targetUri: Option[String], contentType: String,
                     block: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.1").append(Crlf)
    sb.append("WARC-Type: ").append(warcType).append(Crlf)
    sb.append("WARC-Record-ID: ").append(recordIdOf(id)).append(Crlf)
    sb.append("WARC-Date: ").append(dateOf(id)).append(Crlf)
    targetUri.foreach(u =>
      sb.append("WARC-Target-URI: ").append(u).append(Crlf))
    sb.append("Content-Type: ").append(contentType).append(Crlf)
    sb.append("Content-Length: ").append(block.length).append(Crlf)
    sb.append(Crlf)
    sb.toString.getBytes(Ascii) ++ block ++ (Crlf + Crlf).getBytes(Ascii)
  }

  /** One archive's bytes: a warcinfo record (facts from the archive
    * id), then one `response` record per member doc ascending, each
    * with a READY http block.
    */
  private[graft] def warcArchiveBytesBlocks(
      aid: Long, members: Seq[(Long, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(record("warcinfo", aid, None, WarcInfoCt,
      InfoBlock.getBytes(Ascii)))
    members.sortBy(_._1).foreach { case (id, block) =>
      out.write(record("response", id, Some(UriPrefix + id), WarcHttpCt,
        block))
    }
    out.toByteArray
  }

  /** The wa01 archive: text/plain blocks with the byte-count 404. */
  private[graft] def warcArchiveBytes(
      aid: Long, members: Seq[(Long, Array[Byte])]): Array[Byte] =
    warcArchiveBytesBlocks(aid,
      members.map { case (id, body) => (id, httpBlock(body)) })

  /** Size-contract constants the wa01 oracle replays — derived by
    * CALLING the writer on probe inputs, so writer and oracle cannot
    * drift (the m07 fixed-arithmetic discipline, by construction):
    *
    *  - [[InfoRecBytes]]: a warcinfo record's total bytes (constant —
    *    record-id and date are fixed-width);
    *  - [[RespHdrFixed]]: a response record's bytes net of
    *    digits(doc_id) + digits(content_length) + content_length + 4;
    *  - [[HttpBlockFixed]]: the HTTP block's bytes net of the status
    *    line, digits(n) and the n payload bytes.
    */
  private[graft] lazy val InfoRecBytes: Int =
    record("warcinfo", 0L, None, WarcInfoCt,
      InfoBlock.getBytes(Ascii)).length

  private[graft] lazy val HttpBlockFixed: Int = {
    val blk = httpBlock(Array.emptyByteArray) // n=0 → 404, digits(0)=1
    blk.length - Status404.length - 1
  }

  private[graft] lazy val RespHdrFixed: Int = {
    val blk = httpBlock(Array.emptyByteArray)
    val total = record("response", 0L, Some(UriPrefix + "0"),
      WarcHttpCt, blk).length
    total - 1 - blk.length.toString.length - blk.length - 4
  }

  /** Documents → synthesized WARC archives, [[DocsPerArchive]] docs
    * each (`archive_id = doc_id / 4`). The one groupBy in the module —
    * fixture synthesis only; the WALK itself never shuffles.
    */
  def asWarcArchives(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .groupByKey(_._1 / DocsPerArchive)
      .mapGroups { (aid, it) =>
        WarcArchive(aid, warcArchiveBytes(aid,
          it.map { case (id, t) => (id, t.getBytes(Utf8)) }.toSeq))
      }.toDF()
  }

  private[graft] val HttpHtmlCt = "text/html"

  /** Documents → gzipped WARC archives whose payloads are the
    * SYNTHESIZED HTML PAGES ([[Html.htmlPage]]) — the wa07 crawl
    * shape: content-type `text/html`, 404 on the id schedule
    * (`doc_id % 7 == 0` — id-closed so the oracle needs no
    * page-length arithmetic).
    */
  def asHtmlWarcGzArchives(spark: SparkSession,
                           docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .groupByKey(_._1 / DocsPerArchive)
      .mapGroups { (aid, it) =>
        val blocks = it.map { case (id, t) =>
          (id, httpBlockOf(Html.htmlPage(id, t).getBytes(Utf8),
            id % 7 != 0, HttpHtmlCt))
        }.toSeq
        WarcArchive(aid,
          gzipPerRecord(warcArchiveBytesBlocks(aid, blocks)))
      }.toDF()
  }

  // ---- the walk --------------------------------------------------

  /** Index of the next CRLF at/after `from`, or -1. */
  private def crlfAt(p: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < p.length) {
      if (p(i) == '\r' && p(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  /** Strict record walk — `None` on ANY framing violation (see the
    * fail-soft contract above). Field names are case-insensitive per
    * the spec; values are single-line (our strictness: no folding).
    */
  private[ext] def parseWarc(p: Array[Byte]): Option[Vector[Parsed]] = {
    val len = p.length
    if (len == 0) return None
    val out = Vector.newBuilder[Parsed]
    var off = 0
    var idx = 0
    while (off < len) {
      val start = off
      // version line
      val vEnd = crlfAt(p, off)
      if (vEnd < 0) return None
      val version = new String(p, off, vEnd - off, Ascii)
      if (version != "WARC/1.1" && version != "WARC/1.0") return None
      off = vEnd + 2
      // named fields until the blank line
      val fields = scala.collection.mutable.Map.empty[String, String]
      var blank = false
      while (!blank) {
        val e = crlfAt(p, off)
        if (e < 0) return None
        if (e == off) { blank = true; off += 2 }
        else {
          val line = new String(p, off, e - off, Ascii)
          val c = line.indexOf(':')
          if (c <= 0 || c + 1 >= line.length) return None
          fields.update(line.substring(0, c).toLowerCase,
            line.substring(c + 1).trim)
          off = e + 2
        }
      }
      val warcType = fields.getOrElse("warc-type", return None)
      val recordId = fields.getOrElse("warc-record-id", return None)
      val warcDate = fields.getOrElse("warc-date", return None)
      val clen = fields.get("content-length")
        .flatMap(_.toLongOption).getOrElse(return None)
      // bounds in Long BEFORE any Int math — a hostile length must
      // not overflow its way past the check (clen ≤ len first, so the
      // addition below cannot wrap)
      if (clen < 0 || clen > len.toLong ||
        off.toLong + clen + 4 > len.toLong) return None
      val blockStart = off
      val blockEnd = (off + clen).toInt
      if (p(blockEnd) != '\r' || p(blockEnd + 1) != '\n' ||
        p(blockEnd + 2) != '\r' || p(blockEnd + 3) != '\n') return None
      off = blockEnd + 4
      // the HTTP split for application/http blocks
      val ct = fields.get("content-type")
      val isHttp = ct.exists(_.toLowerCase.startsWith("application/http"))
      val (status, httpCt, payOff, payLen) =
        if (!isHttp) (None, None, blockStart, clen.toInt)
        else {
          val sEnd = crlfAt(p, blockStart)
          if (sEnd < 0 || sEnd + 2 > blockEnd) return None
          val sLine = new String(p, blockStart, sEnd - blockStart, Ascii)
          val parts = sLine.split(" ")
          if (parts.length < 2 || !parts(0).startsWith("HTTP/1."))
            return None
          val code = parts(1).toIntOption.getOrElse(return None)
          if (code < 100 || code > 999) return None
          var ho = sEnd + 2
          var hCt: Option[String] = None
          var hBlank = -1
          while (hBlank < 0) {
            val e = crlfAt(p, ho)
            // every header CRLF (incl. the blank line's) must sit
            // fully inside the block — a CRLF straddling the block
            // boundary must not yield a negative payload length
            if (e < 0 || e + 2 > blockEnd) return None
            if (e == ho) hBlank = ho + 2
            else {
              val line = new String(p, ho, e - ho, Ascii)
              val c = line.indexOf(':')
              if (c <= 0) return None
              if (line.substring(0, c).equalsIgnoreCase("Content-Type"))
                hCt = Some(line.substring(c + 1).trim)
              ho = e + 2
            }
          }
          (Some(code), hCt, hBlank, blockEnd - hBlank)
        }
      out += Parsed(WarcRecordFacts(0L, idx, start.toLong,
        (blockEnd + 4 - start).toLong, warcType, recordId,
        fields.get("warc-target-uri"), warcDate, clen, status, httpCt,
        payLen.toLong), payOff, payLen)
      idx += 1
    }
    Some(out.result())
  }

  /** One facts row per record of every parseable archive — the wa01
    * surface. Unparseable archives yield no rows (fail-soft; count
    * them upstream with a `parseWarc(...).isEmpty` health probe if a
    * crawl shard needs accounting).
    */
  def recordFacts(spark: SparkSession,
                  archives: DataFrame): Dataset[WarcRecordFacts] = {
    import spark.implicits._
    archives.as[WarcArchive].mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.flatMap { a =>
          parseWarc(a.payload).getOrElse(Vector.empty)
            .map(r => r.facts.copy(archive_id = a.archive_id))
        }
      }
    }
  }

  /** Compress an archive the Common Crawl way: one gzip MEMBER per
    * record, members concatenated (ISO 28500 annex; the layout that
    * lets a range reader inflate a single record from an offset
    * index). Synth-side twin of [[gunzipMembers]].
    */
  private[graft] def gzipPerRecord(archive: Array[Byte]): Array[Byte] = {
    val recs = parseWarc(archive).getOrElse(
      throw new IllegalArgumentException("not a parseable WARC archive"))
    val out = new java.io.ByteArrayOutputStream()
    for (r <- recs) {
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(archive, r.facts.rec_offset.toInt,
        r.facts.rec_bytes.toInt)
      gz.finish()
    }
    out.toByteArray
  }

  /** Inflate a concatenated-member gzip stream to its full plaintext —
    * `GZIPInputStream` handles member concatenation natively, so this
    * reads both per-record-member archives (the CC convention) and
    * single-member ones. None for non-gzip or corrupt bytes (CRC
    * mismatches, truncated members — fail-soft like every walk).
    */
  private[ext] def gunzipMembers(p: Array[Byte]): Option[Array[Byte]] =
    if (p.length < 2 || (p(0) & 0xff) != 0x1f || (p(1) & 0xff) != 0x8b)
      None
    else
      try {
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(p))
        try Some(in.readAllBytes()) finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }

  /** Documents → `.warc.gz` archives (the wire format Common Crawl
    * actually ships): [[asWarcArchives]]' bytes re-compressed one
    * gzip member per record.
    */
  def asWarcGzArchives(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    asWarcArchives(spark, docs).as[WarcArchive].mapPartitions { it =>
      it.map(a => WarcArchive(a.archive_id, gzipPerRecord(a.payload)))
    }.toDF()
  }

  /** Record facts of GZIPPED archives — the wa03 surface: inflate
    * (real `GZIPInputStream`, multi-member), then the SAME walk, so
    * the facts — including every offset, which lives in the
    * DECOMPRESSED stream per the WARC spec — equal [[recordFacts]]
    * over the plain archive byte for byte (the wa03 oracle IS wa01's).
    * Non-gzip or corrupt members yield no rows (fail-soft).
    */
  def recordFactsGz(spark: SparkSession,
                    archives: DataFrame): Dataset[WarcRecordFacts] = {
    import spark.implicits._
    archives.as[WarcArchive].mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.flatMap { a =>
          gunzipMembers(a.payload).flatMap(parseWarc)
            .getOrElse(Vector.empty)
            .map(r => r.facts.copy(archive_id = a.archive_id))
        }
      }
    }
  }

  // ---- CDX index + random access (wa06) --------------------------

  /** One gzip member's coordinates in the COMPRESSED stream. */
  private[ext] final case class GzMember(offset: Long, length: Long)

  /** Walk the member boundaries of a concatenated-member gzip stream
    * (RFC 1952, reader-side — the writer is NOT trusted): per member,
    * parse the header (magic, CM=8, the FEXTRA/FNAME/FCOMMENT/FHCRC
    * optional fields), inflate the deflate body with a raw
    * `Inflater(nowrap)` to learn the exact compressed span, and
    * verify the CRC32 + ISIZE trailer against the inflated bytes.
    * None on any violation — a corrupt member invalidates the whole
    * stream's coordinates (fail-soft).
    */
  private[ext] def memberBounds(gz: Array[Byte]): Option[Vector[GzMember]] = {
    val out = Vector.newBuilder[GzMember]
    var off = 0
    val n = gz.length
    if (n == 0) return None
    def u8(i: Int): Int = gz(i) & 0xff
    while (off < n) {
      val start = off
      // fixed header: magic, CM, FLG, MTIME(4), XFL, OS
      if (off + 10 > n || u8(off) != 0x1f || u8(off + 1) != 0x8b ||
        u8(off + 2) != 8) return None
      val flg = u8(off + 3)
      off += 10
      if ((flg & 4) != 0) { // FEXTRA: 2-byte LE length + payload
        if (off + 2 > n) return None
        val xlen = u8(off) | (u8(off + 1) << 8)
        off += 2 + xlen
        if (off > n) return None
      }
      var skipZ = (if ((flg & 8) != 0) 1 else 0) + // FNAME
        (if ((flg & 16) != 0) 1 else 0) // FCOMMENT
      while (skipZ > 0) {
        while (off < n && gz(off) != 0) off += 1
        if (off >= n) return None
        off += 1
        skipZ -= 1
      }
      if ((flg & 2) != 0) { // FHCRC
        off += 2
        if (off > n) return None
      }
      // deflate body: raw inflate to find the exact compressed span
      val inf = new java.util.zip.Inflater(true)
      try {
        inf.setInput(gz, off, n - off)
        val buf = new Array[Byte](8192)
        var isize = 0L
        val crc32 = new java.util.zip.CRC32()
        while (!inf.finished()) {
          val k =
            try inf.inflate(buf)
            catch { case _: java.util.zip.DataFormatException =>
              return None }
          if (k == 0 && !inf.finished()) return None // truncated body
          crc32.update(buf, 0, k)
          isize += k
        }
        val consumed = inf.getBytesRead.toInt
        val tOff = off + consumed
        if (tOff + 8 > n) return None // truncated trailer
        def u32(i: Int): Long =
          (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong |
            ((u8(i + 3) & 0xffL) << 24)
        if (u32(tOff) != crc32.getValue) return None // CRC mismatch
        if (u32(tOff + 4) != (isize & 0xffffffffL)) return None
        off = tOff + 8
        out += GzMember(start.toLong, (off - start).toLong)
      } finally inf.end()
    }
    Some(out.result())
  }

  /** Random access: inflate ONE member sliced at `(offset, length)`
    * of a `.warc.gz` and parse it as a single WARC record — the
    * fetch a CDX row points a range reader at. None when the slice
    * is not one clean member holding exactly one record.
    */
  def fetchRecord(gz: Array[Byte], offset: Long,
                  length: Long): Option[WarcRecordFacts] = {
    if (offset < 0 || length <= 0 ||
      offset + length > gz.length) return None
    val slice = java.util.Arrays.copyOfRange(
      gz, offset.toInt, (offset + length).toInt)
    for {
      bounds <- memberBounds(slice)
      if bounds.length == 1
      plain <- gunzipMembers(slice)
      recs <- parseWarc(plain)
      if recs.length == 1
    } yield recs.head.facts
  }

  /** The CDX index (wa06): one row per record of every gzipped
    * archive with its SURT lookup key, the record coordinates, and
    * `fetch_ok` — TRUE iff the member-sliced random-access fetch
    * ([[fetchRecord]]) reproduces the record the full walk saw, so
    * the whole range-read contract sits behind the oracle gate (any
    * fetch failure flips the bit and mismatches). Archives whose
    * member count differs from their record count (not the
    * one-member-per-record layout) drop whole — the index would lie.
    */
  def cdxIndex(spark: SparkSession, gzArchives: DataFrame): DataFrame = {
    import spark.implicits._
    gzArchives.as[WarcArchive].mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.flatMap { a =>
          val rows = for {
            bounds <- memberBounds(a.payload)
            plain <- gunzipMembers(a.payload)
            recs <- parseWarc(plain)
            if recs.length == bounds.length
          } yield recs.zip(bounds).map { case (r, m) =>
            // a single-record parse sees index 0 at offset 0 — the
            // fetch must match everything else bit for bit
            val fetched = fetchRecord(a.payload, m.offset, m.length)
            val ok = fetched.contains(
              r.facts.copy(rec_index = 0, rec_offset = 0L))
            val surt = r.facts.target_uri
              .flatMap(Urls.canonicalize(_).map(_.surt))
            (a.archive_id, r.facts.rec_index, surt,
              r.facts.target_uri, r.facts.rec_offset,
              r.facts.rec_bytes, ok)
          }
          rows.getOrElse(Vector.empty)
        }
      }
    }.toDF("archive_id", "rec_index", "surt_key", "target_uri",
      "rec_offset", "rec_bytes", "fetch_ok")
  }

  /** Payload TEXT of `application/http` records — the hand-off into
    * the text plane (wa02): one row per HTTP record with its URI,
    * status, HTTP content-type, and the payload decoded as UTF-8.
    * Filter on status/content-type BEFORE a downstream gate touches
    * `text`; facts-only passes should read [[recordFacts]] instead
    * (this one materializes payload strings).
    */
  def httpTexts(spark: SparkSession, archives: DataFrame): DataFrame =
    httpTextsImpl(spark, archives, (b: Array[Byte]) => Some(b))

  /** [[httpTexts]] over GZIPPED archives — inflate (multi-member),
    * then the same extraction; corrupt archives yield no rows.
    */
  def httpTextsGz(spark: SparkSession, archives: DataFrame): DataFrame =
    httpTextsImpl(spark, archives, gunzipMembers)

  /** The decode charset for an HTTP Content-Type: its `charset=`
    * parameter when present and resolvable, else UTF-8 (the modern
    * default; a misdeclared charset falls back rather than throwing —
    * one hostile header must not kill the shard).
    */
  private[ext] def charsetFor(ct: Option[String])
      : java.nio.charset.Charset =
    ct.flatMap(Html.charsetParamOf).flatMap { name =>
      try Some(java.nio.charset.Charset.forName(name))
      catch { case scala.util.control.NonFatal(_) => None }
    }.getOrElse(Utf8)

  private def httpTextsImpl(
      spark: SparkSession, archives: DataFrame,
      unwrap: Array[Byte] => Option[Array[Byte]]): DataFrame = {
    import spark.implicits._
    archives.as[WarcArchive].mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.flatMap { a =>
          unwrap(a.payload).toSeq.flatMap { plain =>
            parseWarc(plain).getOrElse(Vector.empty).collect {
              case Parsed(f, po, pl) if f.http_status.nonEmpty =>
                (a.archive_id, f.target_uri.orNull, f.http_status.get,
                  f.http_content_type.orNull,
                  new String(plain, po, pl,
                    charsetFor(f.http_content_type)))
            }
          }
        }
      }
    }.toDF("archive_id", "target_uri", "http_status",
      "http_content_type", "text")
  }
}
