package graft.sources

import java.io.{ByteArrayInputStream, InputStream}
import java.util.zip.GZIPInputStream

import graft.functions.TextOps
import graft.functions.expressions.TextExprs.md5Lower64
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC/WET crawl-container ingest — the format a real 100 TB web
  * pipeline STARTS from (Common-Crawl-style archives), extending
  * [[BinarySource]]'s magic-byte + fence discipline to the container:
  * record-boundary walk over the WARC framing, per-file gzip handling
  * (a `.warc.gz` is a sequence of gzip members; Java's GZIPInputStream
  * walks concatenated members), truncated-record FENCING (a record
  * whose content ends early, a header block cut by EOF, or a gzip
  * stream that dies mid-member yields the records parsed SO FAR and
  * drops the partial one — never a crash, never a half-record), and
  * HTTP-envelope splitting for `response` records (status + headers
  * off, payload surfaced).
  *
  * Trust discipline: the DECLARED Content-Type — WARC's or the HTTP
  * envelope's — is metadata from an arbitrary web server and LIES.
  * Routing is by payload magic bytes ([[BinarySource.sniffMime]]):
  * [[media]] takes records whose BYTES are a known media type no
  * matter what the header claims (the declared type rides along in
  * its meta as evidence), [[documents]] takes `conversion` (WET)
  * records plus non-media `response` payloads in the exact
  * corpus-table shape; the declared types stay on the [[records]]
  * frame for audits.
  *
  * Scale shape: `binaryFile` plans one row per archive and packs
  * archives into tasks by size — the standard one-task-per-WARC
  * parallelism (WARC is not splittable mid-stream without an external
  * index; crawl archives are written ~1 GB each for exactly this
  * reason). Record parsing is a per-file JVM kernel inside the task
  * (the codec convention, Multimodal scaladoc); archives above
  * `spark.sql.sources.binaryFile.maxLength` must be sharded upstream.
  */
object WarcSource {

  /** One parsed record. `body` is the payload AFTER the HTTP envelope
    * for `response` records (the envelope's Content-Type surfaced as
    * `http_content_type`), with TRANSPORT/CONTENT codings undone
    * best-effort — chunked framing removed, gzip/deflate content
    * coding inflated (bomb-capped), brotli decoded through the
    * in-house RFC 7932 decoder (since r17). A Content-Encoding that
    * could NOT be undone (a dying stream; the bomb cap; an unknown
    * token) keeps the RAW bytes and surfaces
    * the coding in `content_coding` (null when the body is plain or
    * was successfully decoded) — the magic route + NUL fence govern
    * what the raw bytes become, and [[quarantine]] counts the
    * still-coded leftovers as `<coding>_fenced` so the coverage loss
    * is a NUMBER, not a footnote. Raw block content otherwise.
    */
  final case class Record(
      file: String, record_ix: Int, warc_type: String,
      target_uri: Option[String], warc_content_type: Option[String],
      http_content_type: Option[String], n_bytes: Long,
      body: Array[Byte], content_coding: Option[String])

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && b(0) == 0x1f.toByte && b(1) == 0x8b.toByte

  private def isZstd(b: Array[Byte]): Boolean =
    b.length >= 4 && b(0) == 0x28.toByte && b(1) == 0xb5.toByte &&
      b(2) == 0x2f.toByte && b(3) == 0xfd.toByte

  /** An archive's byte stream, compression detected by magic (not
    * extension) — the ONE opener the batch reader and the streaming
    * ingest ([[graft.streaming.Streams.warcDocuments]]) share. Gzip
    * via the JDK (GZIPInputStream walks concatenated members); zstd —
    * newer crawl tooling's `.warc.zst` — via the zstd-jni stream Spark
    * already ships for shuffle/parquet compression (frame-concatenated
    * archives walk the same way; a frame dying mid-stream raises
    * IOException, which [[parseStream]] fences exactly like a dying
    * gzip member).
    */
  private[graft] def openArchive(bytes: Array[Byte]): InputStream =
    if (isGzip(bytes)) new GZIPInputStream(new ByteArrayInputStream(bytes))
    else if (isZstd(bytes))
      new com.github.luben.zstd.ZstdInputStream(
        new ByteArrayInputStream(bytes))
    else new ByteArrayInputStream(bytes)

  /** Buffered byte-stream reader: CRLF header lines + exact-count
    * content reads, both EOF-tolerant (the caller fences).
    */
  private final class RecReader(in: InputStream) {
    private val buf = new java.io.BufferedInputStream(in, 1 << 16)

    /** True once a header line exceeded the 1 MB cap: the rest of
      * that physical line is still in-stream, so continuing to parse
      * would mis-frame unattributable bytes as fresh header lines —
      * the caller must FENCE, exactly like a truncation.
      */
    var overflowed: Boolean = false

    /** The next line without its CRLF; None at EOF. Header lines are
      * ASCII by the WARC spec — bytes map 1:1 via ISO-8859-1.
      */
    def readLine(): Option[String] = {
      val sb = new java.lang.StringBuilder
      var c = buf.read()
      if (c < 0) return None
      while (c >= 0 && c != '\n' && sb.length < (1 << 20)) {
        sb.append(c.toChar); c = buf.read()
      }
      if (c >= 0 && c != '\n') overflowed = true
      val s = sb.toString
      Some(if (s.endsWith("\r")) s.substring(0, s.length - 1) else s)
    }

    /** Up to n bytes — fewer only at EOF (the truncation signal). */
    def readN(n: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(
        math.min(n, 1L << 20).toInt.max(16))
      var remaining = n
      val chunk = new Array[Byte](1 << 16)
      var eof = false
      while (remaining > 0 && !eof) {
        val r = buf.read(chunk, 0,
          math.min(remaining, chunk.length.toLong).toInt)
        if (r < 0) eof = true
        else { out.write(chunk, 0, r); remaining -= r }
      }
      out.toByteArray
    }
  }

  private def startsWithAscii(b: Array[Byte], s: String): Boolean =
    b.length >= s.length && s.indices.forall(i => b(i) == s.charAt(i).toByte)

  private def indexOfDoubleCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' &&
          b(i + 2) == '\r' && b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** Decompressed-body cap: a crawl response that inflates past this
    * is a decompression bomb, not a page — keep the RAW bytes (the
    * NUL fence downstream quarantines them).
    */
  private val BodyInflateCap = 64 * 1024 * 1024

  /** Un-frame an HTTP/1.1 chunked body: hex-size lines, chunk bytes,
    * CRLF separators, a 0-size terminator (trailers ignored). None on
    * malformed framing — the caller keeps the raw bytes (best effort;
    * a half-dechunked body would be WORSE than the framed one).
    */
  private def unchunk(body: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(body.length)
    var p = 0
    while (true) {
      // hex size up to ';' (chunk extensions) or CR
      var q = p
      var size = 0L
      var digits = 0
      while (q < body.length && Character.digit(body(q) & 0xff, 16) >= 0 &&
          digits < 8) {
        size = size * 16 + Character.digit(body(q) & 0xff, 16)
        q += 1; digits += 1
      }
      if (digits == 0) return None
      while (q < body.length && body(q) != '\r') q += 1 // extensions
      if (q + 1 >= body.length || body(q + 1) != '\n') return None
      q += 2
      if (size == 0) return Some(out.toByteArray) // terminator (skip trailers)
      if (q + size > body.length) return None // truncated chunk
      out.write(body, q.toInt, size.toInt)
      p = (q + size).toInt
      // chunk data is followed by CRLF
      if (p + 1 >= body.length || body(p) != '\r' || body(p + 1) != '\n')
        return None
      p += 2
    }
    None // unreachable
  }

  /** Inflate a Content-Encoding-compressed body (gzip by magic;
    * deflate in both the zlib-wrapped and raw forms real servers
    * send), bomb-capped. None → keep the raw bytes.
    */
  private def inflateBody(body: Array[Byte], coding: String): Option[Array[Byte]] = {
    def drain(in: java.io.InputStream): Option[Array[Byte]] =
      try {
        val out = new java.io.ByteArrayOutputStream(body.length * 3 + 64)
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n >= 0) {
          out.write(buf, 0, n)
          if (out.size() > BodyInflateCap) return None
          n = in.read(buf)
        }
        Some(out.toByteArray)
      } catch {
        case _: java.io.IOException => None
      } finally scala.util.Try(in.close())
    coding match {
      case "gzip" | "x-gzip" if isGzip(body) =>
        drain(new GZIPInputStream(new ByteArrayInputStream(body)))
      case "deflate" =>
        // zlib-wrapped first (the spec form), raw-deflate fallback
        // (what many servers actually send)
        drain(new java.util.zip.InflaterInputStream(
          new ByteArrayInputStream(body))).orElse(
          drain(new java.util.zip.InflaterInputStream(
            new ByteArrayInputStream(body),
            new java.util.zip.Inflater(true))))
      case "zstd" if isZstd(body) =>
        // zstd-jni ships on every Spark classpath (shuffle/parquet
        // codecs) — newer CDNs serve Content-Encoding: zstd
        drain(new com.github.luben.zstd.ZstdInputStream(
          new ByteArrayInputStream(body)))
      case "br" =>
        // RFC 7932 through the in-house decoder ([[graft.multimodal
        // .Brotli]], parity-pinned against libbrotli) — since r17 a
        // br-preferring CDN's pages are INGESTED, not fenced; None
        // (dying stream / bomb cap) keeps the raw bytes and still
        // bills br_fenced
        graft.multimodal.Brotli.decode(body, BodyInflateCap)
      case _ => None // unknown codings: raw bytes stay, the coding
                     // surfaces as content_coding and the quarantine
                     // face bills it as <coding>_fenced
    }
  }

  private def toRecord(file: String, ix: Int,
                       hdrs: Map[String, String],
                       content: Array[Byte]): Record = {
    val wtype = hdrs.getOrElse("warc-type", "unknown")
    val uri = hdrs.get("warc-target-uri")
    val wct = hdrs.get("content-type")
    if (wtype == "response" && startsWithAscii(content, "HTTP/")) {
      val sep = indexOfDoubleCrlf(content)
      if (sep >= 0) {
        // obs-fold (LWS continuation) unfolds to one space BEFORE the
        // line split — the same folding rule the WARC header loop
        // applies; without it a folded `Content-Type: text/html;\r\n
        //  charset=…` loses its charset parameter and the page decodes
        // as UTF-8 mojibake with a clean-looking charset_used
        val head = new String(content, 0, sep, "ISO-8859-1")
          .replaceAll("\r\n[ \t]+", " ")
        def header(name: String): Option[String] = head.linesIterator
          .find(_.toLowerCase(java.util.Locale.ROOT).startsWith(name + ":"))
          .map(_.split(":", 2)(1).trim)
        val httpCt = header("content-type")
        var body =
          java.util.Arrays.copyOfRange(content, sep + 4, content.length)
        // TRANSPORT framing first: a raw-capture chunked body carries
        // hex size lines interleaved with the payload — ingesting it
        // framed poisons the text with chunk-size noise. Then CONTENT
        // coding: a gzip/deflate-coded page would otherwise route to
        // media by magic and its text would be lost. Both best-effort:
        // malformed framing / a dying stream / the bomb cap keep the
        // RAW bytes (the magic route + NUL fence still govern those).
        if (header("transfer-encoding")
            .exists(_.toLowerCase(java.util.Locale.ROOT).contains("chunked")))
          unchunk(body).foreach(body = _)
        var stillCoded: Option[String] = None
        header("content-encoding")
          .map(_.trim.toLowerCase(java.util.Locale.ROOT)) match {
          case Some(ce) if ce != "identity" && ce.nonEmpty =>
            inflateBody(body, ce) match {
              case Some(b2) => body = b2
              case None => stillCoded = Some(ce) // br/dying stream/unknown
            }
          case _ => ()
        }
        Record(file, ix, wtype, uri, wct, httpCt, body.length.toLong,
          body, stillCoded)
      } else Record(file, ix, wtype, uri, wct, None,
        content.length.toLong, content, None)
    } else Record(file, ix, wtype, uri, wct, None,
      content.length.toLong, content, None)
  }

  /** Walk one archive's record stream LAZILY — one record
    * materialized at a time (a 1 GB .warc.gz decompresses to several
    * GB; holding every body at once on top of the raw binaryFile row
    * would size executor heap to the whole archive instead of one
    * record). Fencing, stated precisely: a malformed version line, a
    * header block cut by EOF, an over-cap header line (the remainder
    * of that physical line would mis-frame as fresh headers), an
    * unparsable/negative Content-Length, a content read that comes up
    * short, or an IO error from a dying gzip member all TERMINATE the
    * walk — records before the fence are returned, the partial one is
    * dropped (WARC has no resync marker; bytes after a framing error
    * are unattributable).
    */
  private[graft] def parseStream(file: String,
                                 in: InputStream): Iterator[Record] =
    new scala.collection.AbstractIterator[Record] {
      private val r = new RecReader(in)
      private var ix = 0
      private var fenced = false
      private var pending: Record = null

      private def advance(): Unit = {
        try {
          var line = r.readLine()
          while (pending == null && !fenced && line.isDefined) {
            if (r.overflowed) { fenced = true; return }
            val l = line.get
            if (l.isEmpty) line = r.readLine() // inter-record padding
            else if (!l.startsWith("WARC/")) fenced = true
            else {
              val hdrs = scala.collection.mutable.Map.empty[String, String]
              var lastKey: String = null // for folded continuations
              var h = r.readLine()
              while (!r.overflowed && h.exists(_.nonEmpty)) {
                val s = h.get
                if (s.charAt(0) == ' ' || s.charAt(0) == '\t') {
                  // WARC header LWS folding: a line starting with
                  // SP/HT CONTINUES the previous header's value (a
                  // continuation containing ':' must not mint a fresh
                  // key). An orphan continuation (no preceding header)
                  // has nothing to attach to and is dropped.
                  if (lastKey != null)
                    hdrs(lastKey) = hdrs(lastKey) + " " + s.trim
                } else {
                  val i = s.indexOf(':')
                  if (i > 0) {
                    lastKey = s.substring(0, i).trim
                      .toLowerCase(java.util.Locale.ROOT)
                    hdrs(lastKey) = s.substring(i + 1).trim
                  } else lastKey = null // malformed line: not foldable
                }
                h = r.readLine()
              }
              if (r.overflowed || h.isEmpty) fenced = true // cut headers
              else hdrs.get("content-length")
                .flatMap(x => scala.util.Try(x.toLong).toOption) match {
                case Some(n) if n >= 0 =>
                  val content = r.readN(n)
                  if (content.length < n) fenced = true // truncated
                  else {
                    pending = toRecord(file, ix, hdrs.toMap, content)
                    ix += 1
                  }
                case _ => fenced = true // absent/unparsable length
              }
            }
          }
        } catch {
          case _: java.io.IOException => fenced = true // gzip death
        }
      }

      override def hasNext: Boolean = {
        if (pending == null && !fenced) advance()
        pending != null
      }
      override def next(): Record = {
        if (!hasNext) throw new NoSuchElementException("fenced WARC walk")
        val out = pending; pending = null; out
      }
    }

  /** All records of every archive under `dir` (recursive; optional
    * glob, e.g. `*.warc.gz`): one frame row per WARC record, HTTP
    * envelopes split. Gzip is detected by magic, not extension.
    */
  def records(spark: SparkSession, dir: String,
              glob: Option[String] = None): DataFrame = {
    val r0 = spark.read.format("binaryFile")
    val r1 = glob.fold(r0)(g => r0.option("pathGlobFilter", g))
    val bin = r1.option("recursiveFileLookup", "true").load(dir)
      .select(col("path"), col("content"))
    import spark.implicits._
    bin.as[(String, Array[Byte])].flatMap { case (path, bytes) =>
      scala.util.Try(parseStream(path, openArchive(bytes)))
        .getOrElse(Iterator.empty) // unreadable archive: fence whole file
    }.toDF()
  }

  /** The declared charset label (the HTTP `charset=` parameter, any
    * case/quoting) extracted from a Content-Type string column; ""
    * when absent — which [[graft.functions.expressions.CharsetDecode]]
    * resolves by SNIFFING the payload (UTF-8 when the evidence holds,
    * windows-1252 otherwise — the WHATWG unlabeled default).
    */
  private def charsetLabel(ct: Column): Column =
    regexp_extract(coalesce(ct, lit("")),
      "(?i)charset\\s*=\\s*\"?'?\\s*([A-Za-z0-9_\\-]+)", 1)

  /** The in-document charset declaration: `<meta charset="…">` or the
    * http-equiv Content-Type form, scanned in the first KiB of the
    * payload (the HTML5 pre-scan convention — real crawls declare the
    * charset in markup far more often than in the HTTP header). The
    * meta tag itself is ASCII, so it reads identically through the
    * validation-free UTF-8 cast whatever the page's actual encoding.
    *
    * Two SPECIFIC shapes, not "charset= anywhere near <meta": a bare
    * `charset=` scan would also match the WORD charset inside an
    * unrelated attribute value (`<meta name="description"
    * content="how to set charset=shift_jis">` must not re-decode the
    * page) — so the label is taken only from the modern
    * first-attribute form `<meta charset=…` or from a tag that
    * declares `http-equiv` before its `charset=` parameter. A
    * charset attribute buried behind other attributes is missed —
    * the fail-safe direction (utf-8 fallback), stated.
    */
  private def metaCharsetLabel(body: Column): Column = {
    val prefix = lower(substring(body, 1, 1024).cast("string"))
    val direct = regexp_extract(prefix,
      "<meta\\s+charset\\s*=\\s*[\"']?\\s*([a-z0-9_\\-]+)", 1)
    val httpEquiv = regexp_extract(prefix,
      "<meta[^>]{0,100}http-equiv[^>]{0,200}?charset\\s*=\\s*[\"']?\\s*([a-z0-9_\\-]+)",
      1)
    when(direct =!= "", direct).otherwise(httpEquiv)
  }

  /** Payload is plausibly TEXT: no NUL byte anywhere. Every charset
    * the decode allowlist carries is NUL-free on real text (UTF-16 is
    * deliberately outside it), while compressed/encrypted/media bytes
    * that slipped past the magic table hit a 0x00 within a few bytes
    * with overwhelming probability — the fence that keeps unsniffable
    * binary from becoming a mojibake "document".
    */
  private def plausiblyText(body: Column): Column =
    !contains(body, lit(Array[Byte](0)))

  /** Extracted PDF text is plausibly REAL text, not glyph-id
    * mojibake: the density of replacement chars (U+FFFD — unmapped
    * CMap codes, invalid UTF-8 byte runs) plus C0 controls other than
    * TAB/LF/CR stays under 5% of the first 4 KiB. Subset-embedded
    * fonts WITHOUT a /ToUnicode CMap — common in real crawls —
    * extract as glyph-id bytes whose UTF-8 decode is dense in exactly
    * these characters (2-byte glyph ids put roughly half the output
    * below 0x20), while genuinely recovered text (simple fonts, or
    * Type0 through the CMap pass) carries essentially none. Empty
    * text passes (a scanned-image PDF is a no-text document, not a
    * corrupted one).
    */
  private def printableText(text: Column): Column = {
    val sample = substring(text, 1, 4096)
    val bad = regexp_count(sample,
      lit("[\\uFFFD\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"))
    length(sample) === 0 || bad * lit(20) < length(sample)
  }

  /** The documents-table face: `conversion` (WET) records plus
    * `response` payloads that are plausibly text — NOT a known media/
    * container type by magic bytes ([[BinarySource.sniffMime]]'s
    * real-web table: images, PDF, gzip/zstd, MP3 — a media payload
    * behind a lying `text/html` header routes to [[media]], not
    * here), and NUL-free for BOTH record types (a WET record carrying
    * binary fences exactly like the identical response payload;
    * unrecognized binary is [[quarantine]]d, not
    * ingested as text; PLUS the served-compressed-file arm: a gzip/
    * zstd ENTITY (sitemap.xml.gz, robots.txt.gz, `.zst` dumps —
    * distinct from transport codings, which the record walk already
    * undid) decompresses ONCE behind a Generate barrier and its
    * inner bytes pass the SAME gates — text-by-sniff + the NUL
    * fence, so a `.tar.gz` or a gz-wrapped PNG stays a media blob; the declared types stay available on the
    * [[records]] frame for audits — this face keeps exactly the
    * corpus-table shape). Columns match what
    * [[graft.pipeline.CorpusPrep.run]] ingests: doc_id (md5-64 of
    * file + record index — deterministic, collision-free across
    * re-crawls of one URI), url, text (decoded with the DECLARED
    * charset when it is on the allowlist —
    * [[graft.functions.expressions.CharsetDecode]]: a latin-1 page's
    * 0xE9 becomes 'é', not U+FFFD — and SNIFFED otherwise: a payload
    * that validates as UTF-8 decodes as UTF-8, anything else as
    * windows-1252, the WHATWG default for unlabeled content (r14 —
    * the dominant unlabeled-legacy case stops mangling); always with
    * REPLACEMENT semantics so one bad byte can never fail the job),
    * charset_used (the canonical name actually decoded with — the
    * audit evidence), lang (n-gram heuristic), source (archive file
    * name), n_chars.
    *
    * The `records` overloads let a pipeline consuming BOTH faces
    * parse each archive once (materialize or cache `records(...)`
    * and pass it to each — caller-owned lifecycle, the repo's
    * multi-consumer convention).
    */
  def documents(spark: SparkSession, dir: String,
                glob: Option[String]): DataFrame =
    documents(records(spark, dir, glob))
  def documents(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir, None)

  /** The shared corpus-shape TAIL (documents + pdfDocuments — one
    * definition of the contract corpusPrep composes against): input
    * carries (doc_id, url, text, charset_used, source [, ts]); the
    * tail adds lang + n_chars and pins the column order.
    */
  private def corpusShape(selected: DataFrame, hasTs: Boolean): DataFrame =
    selected
      // langId returns struct<lang, confidence>; the corpus table's
      // lang is the plain code string
      .withColumn("lang", TextOps.langId(col("text")).getField("lang"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select((Seq("doc_id", "url", "text", "lang", "source", "n_chars",
        "charset_used") ++
        (if (hasTs) Seq("ts") else Nil)).map(col): _*)

  def documents(records: DataFrame): DataFrame =
    documents(records, honorNoindex = false)

  def documents(records: DataFrame, honorNoindex: Boolean): DataFrame = {
    // a `ts` column on the records frame passes through 1:1 — the
    // streaming ingest ([[graft.streaming.Streams.warcDocuments]])
    // carries each archive's file mtime as the docs' event time
    val extra = if (records.columns.contains("ts")) Seq(col("ts")) else Nil
    // conversion (WET) records may declare a charset on the WARC
    // Content-Type; responses declare it on the HTTP envelope's.
    // Transport wins over markup (the HTML5 precedence); the in-body
    // <meta charset> pre-scan fills in when the header is silent —
    // the dominant real-crawl case
    val headerLabel = charsetLabel(
      coalesce(col("http_content_type"), col("warc_content_type")))
    // the NUL fence applies to conversion (WET) records too: a WET
    // payload is SUPPOSED to be extracted text, but crawl tooling
    // occasionally writes binary into conversion records, and the
    // identical bytes in a response record would quarantine — one
    // fence, both record types (the r13 asymmetry)
    // ONE SCAN, ONE GENERATE — the 100 TB shape: each record maps to
    // an array of candidate text payloads and a single explode emits
    // them, so the crawl is parsed once however many content classes
    // it carries. The arms:
    //   - plausibly-text bodies (HTML/WET): the body itself, as one
    //     null-named element — doc_id/url stay the r12 definitions;
    //   - served .gz/.zst ENTITIES (sitemap.xml.gz, .zst dumps —
    //     distinct from the transport codings the record walk
    //     already undid): DecompressedMembers decompresses ONCE
    //     (bounded; truncation yields nothing) and yields either the
    //     inner blob or, when the inner bytes are a tar, its members
    //     (the .tar.gz dataset case);
    //   - direct .tar bodies: TarMembers (checksum-validated walk);
    //   - direct .7z bodies: SevenZMembers (commons-compress walk,
    //     repo caps/fences — the last mainstream archive format).
    // Every emitted element then passes the SAME gates — media sniff
    // + the NUL fence — so a gz-wrapped PNG or a tarball of images
    // contributes nothing; members get name-hashed doc_ids and a
    // #member url fragment. All heavy evaluation (decompress, tar
    // walk) lives INSIDE the array expression behind the Generate,
    // evaluated once per record (the pdfDocuments barrier rationale).
    val T = graft.functions.expressions.TextExprs
    val nullName = lit(null).cast("string")
    val selfOnly = array(struct(nullName.as("name"), col("body").as("data")))
    // the body's mime is PROJECTED ONCE and every branch reads the
    // column — sniffMime is a ~40-branch CASE over binary substrings
    // and the when-chain would otherwise re-evaluate it per predicate
    val sniffed = records.withColumn("body_mime",
      BinarySource.sniffMime(col("body")))
    val members =
      when(col("warc_type") === "conversion" ||
        (col("warc_type") === "response" &&
          col("body_mime") === "application/octet-stream"),
        selfOnly)
      .when(col("warc_type") === "response" &&
        col("body_mime").isin(BinarySource.MimeGzip, BinarySource.MimeZstd,
          BinarySource.MimeBzip2, BinarySource.MimeXz),
        T.decompressedMembers(col("body")))
      .when(col("warc_type") === "response" &&
        col("body_mime") === BinarySource.MimeTar,
        T.tarMembers(col("body")))
      .when(col("warc_type") === "response" &&
        col("body_mime") === BinarySource.MimeSevenZ,
        T.sevenZMembers(col("body")))
    // posexplode: the ordinal disambiguates REPEATED member names
    // (tar append semantics legitimately carry two "data.txt"s —
    // their doc_ids must differ or downstream dedup/upsert silently
    // merges two texts)
    val exploded = sniffed
      .select(Seq(
        col("file"), col("record_ix"),
        col("target_uri"),
        posexplode(members).as(Seq("m_pos", "m")),
        headerLabel.as("hdr_label"),
        col("warc_type"), // the noindex gate distinguishes response
                          // self-bodies from WET conversions; dropped
                          // by corpusShape's named-column select
        regexp_extract(col("file"), "([^/]+)$", 1).as("source")) ++
        extra: _*)
      // gates: a null-named element IS the record's own body, whose
      // mime its arm already gated — re-sniffing would both waste a
      // 40-branch CASE per row and WRONGLY apply the media gate to
      // conversion (WET) records, whose extracted text may open with
      // a short printable magic ("BM…"/"P6…" prose must not vanish).
      // Decompressed blobs (name "") and tar members sniff their OWN
      // bytes; everything passes the NUL fence
      .filter(plausiblyText(col("m.data")) &&
        (col("m.name").isNull ||
          BinarySource.sniffMime(col("m.data")) ===
            "application/octet-stream"))
    // charset: direct bodies keep the declared-header precedence
    // (header, else the in-body meta scan, else the sniff); archive
    // members and decompressed blobs use their OWN bytes' evidence
    // ONLY — an envelope's "application/gzip; charset=…" says
    // nothing about the text inside it
    val isSelf = col("m.name").isNull
    val mLabel = when(isSelf && col("hdr_label") =!= "", col("hdr_label"))
      .otherwise(metaCharsetLabel(col("m.data")))
    val named = col("m.name").isNotNull && col("m.name") =!= ""
    val docId = when(!named,
        md5Lower64(concat_ws("#", col("file"), col("record_ix"))))
      .otherwise(md5Lower64(concat_ws("#", col("file"),
        col("record_ix"), col("m_pos"), col("m.name"))))
    val urlCol = when(!named, col("target_uri"))
      .otherwise(concat_ws("#", col("target_uri"), col("m.name")))
    // `honorNoindex`: the robots-noindex verdict INLINE, off the same
    // decoded string the pageMeta face reads — the noindex evidence
    // lives in the SAME record as the body, so no cross-record state,
    // no snapshot artifact (which would go stale the moment a page
    // flips its noindex between fetches), and no stream-stream join
    // is ever needed; the gate applies exactly to the rows the
    // pageMeta face covers (response own-bodies — WET conversions
    // and archive members carry no page markup authority), so the
    // drop set equals the batch pageMeta anti-join's doc for doc
    // (spec-pinned). The per-batch drop count is published as the
    // `graft_noindex` observed metric — the streaming billing
    // surface; batch reads WarcStats.noindexDropped instead.
    //
    // Cost shape (review-caught): the text is DECODED ONCE — the
    // explode(array(…)) Generate barrier materializes it, the
    // noindex flag reads the MATERIALIZED column (filters cannot
    // push below a Generate, and the flag references the generated
    // attribute, never re-running charsetDecode), and the final
    // projection reuses the same column. The gate adds one HtmlMeta
    // scan per own-body page, zero extra decodes.
    if (!honorNoindex)
      corpusShape(exploded
        .select(Seq(
          docId.as("doc_id"), urlCol.as("url"),
          T.charsetDecode(col("m.data"), mLabel).as("text"),
          T.charsetResolve(col("m.data"), mLabel).as("charset_used"),
          col("source")) ++ extra.map(_ => col("ts")): _*),
        extra.nonEmpty)
    else {
      val withText = exploded
        .select(Seq(
          docId.as("doc_id"), urlCol.as("url"),
          col("m.name").isNull.as("_graft_self"),
          col("warc_type"),
          explode(array(T.charsetDecode(col("m.data"), mLabel)))
            .as("text"),
          T.charsetResolve(col("m.data"), mLabel).as("charset_used"),
          col("source")) ++ extra.map(_ => col("ts")): _*)
      corpusShape(withText
        .withColumn("_graft_noindex",
          when(col("_graft_self") && col("warc_type") === "response",
            coalesce(T.htmlMeta(col("text")).getField("noindex"),
              lit(false)))
            .otherwise(lit(false)))
        .observe("graft_noindex",
          sum(col("_graft_noindex").cast("long")).as("noindexDropped"))
        .filter(!col("_graft_noindex"))
        .drop("_graft_noindex", "_graft_self", "warc_type"),
        extra.nonEmpty)
    }
  }

  /** The PAGE-METADATA face: per HTML/text `response` page the four
    * crawl-metadata fields ([[graft.functions.HtmlMeta]] through the
    * [[graft.functions.expressions.HtmlMetaExtract]] expression) —
    * title, meta description, canonical URL (the URL-dedup key when
    * the site declares one — it beats syntactic normalization) and
    * the robots-noindex verdict (pages a retrieval corpus honoring
    * robots semantics must drop). Gated exactly like the documents
    * face's own-body arm (plausibly-text, no known media magic, no
    * leftover content coding) and decoded with the SAME charset
    * precedence (declared header label, else the in-body meta
    * pre-scan, else the sniff), so the metadata is read off the same
    * string the corpus text would be. doc_id matches [[documents]]'
    * definition — joining the two faces per page is a plain id join.
    * Pure Column ops: the streaming mirror
    * ([[graft.streaming.Streams.warcPageMeta]]) inherits verbatim; a
    * `ts` column passes through.
    */
  def pageMeta(spark: SparkSession, dir: String,
               glob: Option[String] = None): DataFrame =
    pageMeta(records(spark, dir, glob))

  def pageMeta(records: DataFrame): DataFrame = {
    val extra = if (records.columns.contains("ts")) Seq(col("ts")) else Nil
    val T = graft.functions.expressions.TextExprs
    val hdrLabel = charsetLabel(
      coalesce(col("http_content_type"), col("warc_content_type")))
    val label = when(hdrLabel =!= "", hdrLabel)
      .otherwise(metaCharsetLabel(col("body")))
    // the Generate barrier pins ONE extraction per record (the
    // pdfDocuments rationale — a filter over an aliased struct field
    // pushes below the projection and re-runs the scan per column)
    // gate = the documents face's own-body arm VERBATIM (no extra
    // content_coding term: a mislabeled Content-Encoding over an
    // identity text body ingests as a document, and the honorNoindex
    // anti-join relies on this face covering every such page — the
    // NUL fence already keeps genuinely still-coded bytes out of both)
    corpusMetaShape(records
      .filter(col("warc_type") === "response" &&
        BinarySource.sniffMime(col("body")) === "application/octet-stream" &&
        plausiblyText(col("body")))
      .select(Seq(
        md5Lower64(concat_ws("#", col("file"), col("record_ix")))
          .as("doc_id"),
        col("target_uri").as("url"),
        explode(array(T.htmlMeta(T.charsetDecode(col("body"), label))))
          .as("m"),
        regexp_extract(col("file"), "([^/]+)$", 1).as("source")) ++
        extra: _*), extra.nonEmpty)
  }

  private def corpusMetaShape(selected: DataFrame,
                              hasTs: Boolean): DataFrame =
    selected.select((Seq(col("doc_id"), col("url"),
      col("m.title").as("title"),
      col("m.description").as("description"),
      col("m.canonical").as("canonical"),
      col("m.noindex").as("noindex"),
      col("source")) ++
      (if (hasTs) Seq(col("ts")) else Nil)): _*)

  /** The CRAWL-FRONTIER face: per-URL rows out of every sitemap the
    * crawl served — `<urlset>` pages and `<sitemapindex>` files
    * ([[graft.functions.Sitemap]]; entries from an index are flagged
    * `from_index` — the scheduler fetches those, it does not crawl
    * them). Both serving shapes real sites use: a plain-text
    * `sitemap.xml` response and the ubiquitous compressed
    * `sitemap.xml.gz`/`.zst` entity (ONE decompression behind the
    * same member Generate the documents face uses). Non-sitemap text
    * sheds no rows (the root-element sniff gates before any entry
    * scan). Pure Column ops — the streaming mirror
    * ([[graft.streaming.Streams.warcSitemapUrls]]) inherits
    * verbatim; `ts` passes through.
    */
  def sitemapUrls(spark: SparkSession, dir: String,
                  glob: Option[String] = None): DataFrame =
    sitemapUrls(records(spark, dir, glob))

  def sitemapUrls(records: DataFrame): DataFrame = {
    val extra = if (records.columns.contains("ts")) Seq(col("ts")) else Nil
    val T = graft.functions.expressions.TextExprs
    val nullName = lit(null).cast("string")
    val selfOnly = array(struct(nullName.as("name"), col("body").as("data")))
    val sniffed = records.withColumn("body_mime",
      BinarySource.sniffMime(col("body")))
    val members =
      when(col("warc_type") === "response" &&
        col("content_coding").isNull &&
        col("body_mime") === "application/octet-stream", selfOnly)
      .when(col("warc_type") === "response" &&
        col("body_mime").isin(BinarySource.MimeGzip, BinarySource.MimeZstd),
        T.decompressedMembers(col("body")))
    val exploded = sniffed
      .select(Seq(
        col("file"), col("record_ix"), col("target_uri"),
        posexplode(members).as(Seq("m_pos", "m")),
        regexp_extract(col("file"), "([^/]+)$", 1).as("source")) ++
        extra: _*)
      .filter(plausiblyText(col("m.data")))
    // member doc_ids mix position + name (the documents-face
    // convention): a .tar.gz carrying TWO sitemap members in one
    // response must yield two distinct doc_ids, not colliding
    // (doc_id, ord) keys downstream dedup would silently merge
    val named = col("m.name").isNotNull && col("m.name") =!= ""
    exploded
      .select(Seq(
        when(!named,
          md5Lower64(concat_ws("#", col("file"), col("record_ix"))))
          .otherwise(md5Lower64(concat_ws("#", col("file"),
            col("record_ix"), col("m_pos"), col("m.name"))))
          .as("doc_id"),
        when(!named, col("target_uri"))
          .otherwise(concat_ws("#", col("target_uri"), col("m.name")))
          .as("url"),
        posexplode(
          T.sitemapEntries(T.charsetDecode(col("m.data"), lit(""))))
          .as(Seq("ord", "e")),
        col("source")) ++ extra: _*)
      .select(Seq(col("doc_id"), col("url"), col("ord").cast("long"),
        col("e.loc").as("loc"), col("e.lastmod").as("lastmod"),
        col("e.from_index").as("from_index"), col("source")) ++
        extra.map(_ => col("ts")): _*)
  }

  /** The FRONTIER-PLAN face: discover → canonicalize → police as ONE
    * codegen'd plan — what the refresh scheduler actually consumes.
    * [[sitemapUrls]] explodes every served sitemap to per-URL rows,
    * [[graft.functions.UrlOps.urlNormalize]] canonicalizes each
    * discovered URL (tracking params dropped, real params kept —
    * fetch keys, not listed strings), and the
    * [[graft.functions.expressions.RobotsAllowed]] expression issues
    * the RFC 9309 verdict per normalized path (query INCLUDED — the
    * RFC matches rules against the path+query, so a `$`-anchored
    * Disallow is defeated by a trailing query exactly as at fetch
    * time). No typed `Dataset.map` anywhere: the whole face is
    * column ops, so the streaming mirror
    * ([[graft.streaming.Streams.warcFrontierPlan]]) inherits
    * verbatim and the plan carries no serde boundary (pinned by
    * spec). Two policy shapes:
    *   - a single `robotsTxt` literal (one host's crawl, the common
    *     per-site job) — the expression parses it once per task;
    *   - a `policies` frame (host, robots_txt), broadcast-joined on
    *     the normalized host — the multi-host form; a host with no
    *     policy row is allowed (robots is opt-out), and the
    *     expression's last-policy parse cache amortizes repeated
    *     hosts within a partition.
    */
  def frontierPlan(records: DataFrame, robotsTxt: String,
                   agent: String): DataFrame =
    frontierVerdict(frontierNorm(sitemapUrls(records)),
      lit(robotsTxt), agent)

  def frontierPlan(records: DataFrame, policies: DataFrame,
                   agent: String): DataFrame = {
    // stream-static-legal: the policies side is a static broadcast
    val p = broadcast(policies
      .select(col("host").as("p_host"), col("robots_txt")))
    frontierVerdict(
      frontierNorm(sitemapUrls(records))
        .join(p, col("host") === col("p_host"), "left")
        .drop("p_host"),
      col("robots_txt"), agent).drop("robots_txt")
  }

  private def frontierNorm(su: DataFrame): DataFrame = {
    val extra = if (su.columns.contains("ts")) Seq(col("ts")) else Nil
    val u = graft.functions.UrlOps.urlNormalize(col("loc"))
    // struct-then-getField collapses under SimplifyExtractValueOps —
    // each projected field is its own expression, nothing evaluated
    // twice (the q84 device)
    su.select(Seq(col("doc_id"), col("url"), col("ord"), col("loc"),
      col("lastmod"), col("from_index"),
      u.getField("url_norm").as("url_norm"),
      u.getField("host").as("host"),
      u.getField("n_tracking").as("n_tracking"),
      col("source")) ++ extra: _*)
  }

  private def frontierVerdict(withNorm: DataFrame, robots: Column,
                              agent: String): DataFrame = {
    val T = graft.functions.expressions.TextExprs
    // null policy (no row for the host) → null verdict → allowed:
    // robots is opt-out. crawl_delay is the politeness RATE the
    // scheduler owes this agent (NULL when the policy declares none
    // or the host has no policy) — the other half of the verdict: a
    // frontier plan that says WHETHER to fetch but not HOW FAST is
    // half a plan
    withNorm
      .withColumn("allowed",
        coalesce(
          T.robotsAllowed(robots, lit(agent),
            regexp_replace(col("url_norm"), "^[a-z]+://[^/]+", "")),
          lit(true)))
      .withColumn("crawl_delay",
        T.robotsCrawlDelay(robots, lit(agent)))
  }

  /** The PDF-text face: `response` payloads whose magic is %PDF-,
    * their show-text extracted ([[graft.functions.expressions
    * .PdfExtractText]] — Flate streams, BT…ET operators, the escape
    * grammar, and the /ToUnicode CMap pass that recovers real text
    * from subset-embedded glyph-id fonts) into the SAME corpus shape
    * as [[documents]] — the PDF analogue of the markup-strip stage
    * (q76 handles HTML; PDFs otherwise rot in the media face as
    * opaque blobs, and real crawl pipelines mine exactly this text).
    * Encrypted PDFs yield NO row here (their "text" would be
    * ciphertext — the NUL-fence rationale) and land in [[quarantine]]
    * as `pdf_encrypted`; extractions that FAIL the printability gate
    * ([[printableText]] — glyph-id fonts without a usable ToUnicode
    * CMap decode as replacement/control-dense mojibake) also yield no
    * row here and quarantine as `pdf_glyph_mojibake`, so systematic
    * garbage never enters the corpus shape the dedup/search/stats
    * faces consume. `charset_used` reports utf-8 (extraction decodes
    * the string bytes itself). A `ts` column passes through for the
    * streaming mirror, like the other faces.
    */
  def pdfDocuments(spark: SparkSession, dir: String,
                   glob: Option[String] = None): DataFrame =
    pdfDocuments(records(spark, dir, glob))

  def pdfDocuments(records: DataFrame): DataFrame = {
    val extra = if (records.columns.contains("ts")) Seq(col("ts")) else Nil
    // the extraction runs ONCE per record, guaranteed by a Generate
    // barrier: a plain `.filter(text.isNotNull)` over the aliased
    // column gets pushed below the projection by Catalyst (alias
    // substitution), re-running the full parse+inflate per surviving
    // row — measured as 2 pdfextracttext nodes in the optimized plan.
    // Filters do NOT push below a Generate, so explode(array(…))
    // (one row in, one row out) pins the evaluation while keeping the
    // face pure Column ops (streaming-legal, unlike a cache)
    corpusShape(records
      .filter(col("warc_type") === "response" &&
        BinarySource.sniffMime(col("body")) === BinarySource.MimePdf)
      .select(Seq(
        md5Lower64(concat_ws("#", col("file"), col("record_ix")))
          .as("doc_id"),
        col("target_uri").as("url"),
        explode(array(graft.functions.expressions.TextExprs
          .pdfExtractText(col("body")))).as("text"),
        lit("utf-8").as("charset_used"),
        regexp_extract(col("file"), "([^/]+)$", 1).as("source")) ++
        extra: _*)
      // encrypted: no row; mojibake: no row (both quarantine instead)
      .filter(col("text").isNotNull && printableText(col("text"))),
      extra.nonEmpty)
  }

  /** The OFFICE/BOOK-document text face: `response` payloads whose
    * magic is ZIP (DOCX, XLSX, ODT and EPUB all present as ZIP on
    * the wire) or RTF (the `{\rtf` prologue — ASCII, so without
    * this route it would pass the NUL fence and ingest as
    * control-word soup), their text extracted ([[graft.functions
    * .expressions.OfficeExtractText]] — the ZIP dialects dispatched
    * by each container's own grammar, then the RTF group/control-
    * word scan)
    * into the SAME corpus shape as [[documents]]/[[pdfDocuments]].
    * Most ZIPs are NEITHER (plain archives, JARs) — those yield NULL
    * from the extraction and simply produce no row here, staying
    * opaque blobs in [[media]]; that asymmetry with the PDF face's
    * quarantine arms is deliberate: an unextractable PDF is a
    * refused DOCUMENT (noteworthy evidence), an unextractable ZIP is
    * just an archive. Extractions still pass the [[printableText]]
    * gate (a malformed part that decodes to control-dense noise must
    * not enter the corpus). `charset_used` reports utf-8 (OOXML parts
    * are UTF-8 XML by spec). A `ts` column passes through for the
    * streaming mirror, like the other faces.
    */
  def officeDocuments(spark: SparkSession, dir: String,
                      glob: Option[String] = None): DataFrame =
    officeDocuments(records(spark, dir, glob))

  def officeDocuments(records: DataFrame): DataFrame = {
    val extra = if (records.columns.contains("ts")) Seq(col("ts")) else Nil
    // explode(array(…)) = the Generate barrier pinning ONE extraction
    // per record (the pdfDocuments rationale — a plain filter over the
    // aliased column pushes below the projection and re-runs the
    // whole ZIP walk + inflate per surviving row)
    corpusShape(records
      .filter(col("warc_type") === "response" &&
        BinarySource.sniffMime(col("body"))
          .isin(BinarySource.MimeZip, BinarySource.MimeRtf,
            BinarySource.MimeOle))
      .select(Seq(
        md5Lower64(concat_ws("#", col("file"), col("record_ix")))
          .as("doc_id"),
        col("target_uri").as("url"),
        explode(array(graft.functions.expressions.TextExprs
          .officeExtractText(col("body")))).as("text"),
        lit("utf-8").as("charset_used"),
        regexp_extract(col("file"), "([^/]+)$", 1).as("source")) ++
        extra: _*)
      .filter(col("text").isNotNull && printableText(col("text"))),
      extra.nonEmpty)
  }

  /** The audit face for what the text faces refused: `response`
    * payloads that are neither sniffable media (no known magic) nor
    * plausibly text (a NUL byte present) — truncated downloads,
    * encrypted blobs, exotic containers — plus `conversion` (WET)
    * records carrying the same NUL-bearing binary (the [[documents]]
    * fence applies to both record types; what it refuses lands here,
    * not nowhere), PLUS the PDFs [[pdfDocuments]] refused — encrypted
    * documents (`pdf_encrypted`: extraction would emit ciphertext)
    * and extractions failing the printability gate
    * (`pdf_glyph_mojibake`: subset-font glyph ids with no usable
    * ToUnicode CMap). At crawl scale this is a systematic influx;
    * quarantining it HERE (with the declared type as evidence) is
    * what keeps the corpus clean without the downstream quality gates
    * paying to re-discover each blob.
    */
  def quarantine(spark: SparkSession, dir: String,
                 glob: Option[String] = None): DataFrame =
    quarantine(records(spark, dir, glob))

  private def quarantineEvidence = Seq(
    md5Lower64(concat_ws("#", col("file"), col("record_ix")))
      .as("doc_id"),
    col("target_uri").as("url"),
    col("http_content_type").as("declared_mime"),
    col("n_bytes"),
    regexp_extract(col("file"), "([^/]+)$", 1).as("source"))

  /** Still-content-coded leftovers (a dying stream; hostile or
    * bomb-sized brotli — HEALTHY br decodes since r17): the record
    * walk could not undo the coding, the bytes have no known magic
    * to route on, and they are not text — the precise reason
    * (`br_fenced`, `gzip_fenced`, …) wins over the generic nul_bytes
    * so the per-coding coverage loss is a dashboardable NUMBER. A
    * still-coded body whose bytes DO carry a magic (a zstd entity
    * mislabeled as Content-Encoding) keeps its media/decompress
    * route and is not quarantined here. Public as its own face so
    * [[graft.pipeline.CorpusPrep.runFromWarc]] can bill it without
    * paying [[quarantine]]'s PDF-extraction arm.
    */
  def codingFenced(records: DataFrame): DataFrame = records
    .filter(col("warc_type") === "response" &&
      col("content_coding").isNotNull &&
      BinarySource.sniffMime(col("body")) === "application/octet-stream" &&
      !plausiblyText(col("body")))
    .select(quarantineEvidence :+
      concat(regexp_replace(col("content_coding"), "[^a-z0-9]+", "_"),
        lit("_fenced")).as("reason"): _*)

  def quarantine(records: DataFrame): DataFrame = {
    def evidence = quarantineEvidence
    val codingArm = codingFenced(records)
    val nulArm = records
      .filter((col("warc_type") === "conversion" ||
        (col("warc_type") === "response" &&
          col("content_coding").isNull &&
          BinarySource.sniffMime(col("body")) === "application/octet-stream")) &&
        !plausiblyText(col("body")))
      .select(evidence :+ lit("nul_bytes").as("reason"): _*)
    // what the pdf face refused, with the refusal reason as evidence.
    // The explode(array(…)) Generate barrier pins ONE extraction per
    // record (the pdfDocuments rationale — filters cannot push below
    // a Generate and re-run the parse per surviving row)
    val pdfArm = records
      .filter(col("warc_type") === "response" &&
        BinarySource.sniffMime(col("body")) === BinarySource.MimePdf)
      .select(evidence :+
        explode(array(graft.functions.expressions.TextExprs
          .pdfExtractText(col("body")))).as("pdf_text"): _*)
      .withColumn("reason",
        when(col("pdf_text").isNull, lit("pdf_encrypted"))
          .when(!printableText(col("pdf_text")),
            lit("pdf_glyph_mojibake")))
      .filter(col("reason").isNotNull)
      .drop("pdf_text")
    codingArm.unionByName(nulArm).unionByName(pdfArm)
  }

  /** The MediaRow face: `response` payloads whose magic bytes are a
    * known media type (regardless of the declared Content-Type — the
    * lying-header case), in [[BinarySource.read]]'s shape; the
    * declared type rides along inside meta as evidence.
    */
  def media(spark: SparkSession, dir: String,
            glob: Option[String]): DataFrame =
    media(records(spark, dir, glob))
  def media(spark: SparkSession, dir: String): DataFrame =
    media(spark, dir, None)

  def media(records: DataFrame): DataFrame = {
    // a `ts` column passes through 1:1, like the documents face — the
    // streaming mirror ([[graft.streaming.Streams.warcMedia]]) carries
    // each archive's file mtime as the media rows' event time
    val extra = if (records.columns.contains("ts")) Seq(col("ts")) else Nil
    records
      .filter(col("warc_type") === "response" &&
        BinarySource.sniffMime(col("body")) =!= "application/octet-stream")
      .select(Seq(
        concat_ws("#", col("file"), col("record_ix")).as("path"),
        md5Lower64(concat_ws("#", col("file"), col("record_ix")))
          .as("doc_id"),
        col("body").as("payload"),
        struct(
          BinarySource.sniffMime(col("body")).as("mime"),
          col("n_bytes").cast("bigint").as("n_bytes"),
          xxhash64(col("body")).as("checksum"),
          col("http_content_type").as("declared_mime"),
          col("target_uri").as("url")).as("meta")) ++ extra: _*)
  }

  /** The media face with image-metadata PII scrubbed — [[media]]
    * rows whose payloads pass through [[graft.multimodal.Exif.strip]]
    * (JPEG APP1/APP13/COM, PNG eXIf+text chunks, WebP EXIF/XMP
    * chunks, standalone-TIFF GPS/DateTime zeroing; containers the
    * scrub does not govern pass through byte-identical) plus TWO
    * billing columns: `scrubbed` (bytes changed — `sum(scrubbed)` is
    * the per-crawl privacy-scrub count) and `fenced` (a GOVERNED
    * container whose grammar broke: its `payload` is NULL, because
    * the bytes may carry intact EXIF ahead of the breakage and a
    * privacy-governed store must not keep what it could not scrub —
    * the review-caught hole where malformed-but-governed media
    * shipped PII byte-identical). `meta` keeps the ORIGINAL
    * payload's checksum/size as intake evidence (the audit trail
    * points at what was fetched, the payload carries what may be
    * stored). One
    * strip per row, pinned behind the explode(array(…)) Generate
    * barrier; pure Column ops, so the streaming mirror
    * ([[graft.streaming.Streams.warcMediaScrubbed]]) inherits
    * verbatim.
    */
  def mediaScrubbed(records: DataFrame): DataFrame = {
    val m = media(records)
    val extra = if (m.columns.contains("ts")) Seq(col("ts")) else Nil
    m.select(Seq(col("path"), col("doc_id"), col("meta"),
      explode(array(graft.functions.expressions.TextExprs
        .exifScrub(col("payload")))).as("s")) ++ extra: _*)
      .select(Seq(col("path"), col("doc_id"),
        col("s.payload").as("payload"),
        col("s.scrubbed").as("scrubbed"),
        col("s.fenced").as("fenced"),
        col("meta")) ++ extra.map(_ => col("ts")): _*)
  }
}
