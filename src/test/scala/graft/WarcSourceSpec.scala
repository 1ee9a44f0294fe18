package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.WarcSource

/** WarcSource: record-boundary walk, gzip-member handling, HTTP
  * envelope splitting, truncation fencing, lying-Content-Type routing
  * — over fixture archives built byte-for-byte in the spec.
  */
class WarcSourceSpec extends SparkSpec {

  private def bytes(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  /** One framed WARC record: version line, headers (+ the mandatory
    * Content-Length), blank line, content, trailing CRLF CRLF.
    */
  private def rec(headers: Seq[(String, String)],
                  content: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    (headers :+ ("Content-Length" -> content.length.toString))
      .foreach { case (k, v) => sb.append(s"$k: $v\r\n") }
    sb.append("\r\n")
    bytes(sb.toString) ++ content ++ bytes("\r\n\r\n")
  }

  private def httpWrap(ct: String, body: Array[Byte]): Array[Byte] =
    bytes(s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\nServer: t\r\n\r\n") ++ body

  private val htmlBody =
    bytes("<html><body>warc ingest parity test page one</body></html>")
  // REAL PPM bytes behind a LYING text/html header: 2x2 raster
  private val ppmBody =
    bytes("P6\n2 2\n255\n") ++ Array.tabulate[Byte](12)(i => (i * 7).toByte)
  private val wetText =
    "warc conversion record plain text for the corpus pipeline"

  private def infoRec = rec(
    Seq("WARC-Type" -> "warcinfo",
      "Content-Type" -> "application/warc-fields"),
    bytes("software: graft-spec\r\n"))
  private def htmlRec = rec(
    Seq("WARC-Type" -> "response",
      "WARC-Target-URI" -> "http://a.example/one",
      "Content-Type" -> "application/http; msgtype=response"),
    httpWrap("text/html", htmlBody))
  private def lyingRec = rec(
    Seq("WARC-Type" -> "response",
      "WARC-Target-URI" -> "http://a.example/lying",
      "Content-Type" -> "application/http; msgtype=response"),
    httpWrap("text/html", ppmBody))
  private def wetRec = rec(
    Seq("WARC-Type" -> "conversion",
      "WARC-Target-URI" -> "http://a.example/one",
      "Content-Type" -> "text/plain"),
    bytes(wetText))

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bo)
    g.write(b); g.close()
    bo.toByteArray
  }

  private def writeDir(): String = {
    val dir = Files.createTempDirectory("graft-warc").toString
    Files.write(Paths.get(dir, "plain.warc"),
      infoRec ++ htmlRec ++ lyingRec ++ wetRec)
    // the Common-Crawl layout: one gzip MEMBER per record, members
    // concatenated into one .warc.gz
    Files.write(Paths.get(dir, "members.warc.gz"),
      gz(rec(Seq("WARC-Type" -> "conversion",
        "WARC-Target-URI" -> "http://b.example/two"),
        bytes("gz member record alpha"))) ++
        gz(rec(Seq("WARC-Type" -> "conversion",
          "WARC-Target-URI" -> "http://b.example/three"),
          bytes("gz member record beta"))))
    // truncated FINAL record: Content-Length promises more bytes than
    // the file holds — the earlier record must survive, the partial
    // one must be dropped, and nothing may crash
    val good = rec(Seq("WARC-Type" -> "conversion",
      "WARC-Target-URI" -> "http://c.example/kept"),
      bytes("record before the truncation point"))
    val partial = bytes("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "WARC-Target-URI: http://c.example/cut\r\nContent-Length: 5000\r\n" +
      "\r\nonly a few bytes")
    Files.write(Paths.get(dir, "truncated.warc"), good ++ partial)
    // framing garbage mid-file: records after the fence are
    // unattributable and must not be guessed at
    Files.write(Paths.get(dir, "garbage.warc"),
      rec(Seq("WARC-Type" -> "conversion",
        "WARC-Target-URI" -> "http://d.example/first"),
        bytes("pre garbage record")) ++
        bytes("NOT-A-WARC-HEADER\r\njunk\r\n") ++ wetRec)
    // NON-UTF-8 text payload (the latin-1 page every real crawl has):
    // 0xE9 = 'é' in ISO-8859-1, an invalid UTF-8 continuation byte
    Files.write(Paths.get(dir, "latin1.warc"),
      rec(Seq("WARC-Type" -> "conversion",
        "WARC-Target-URI" -> "http://e.example/latin"),
        bytes("caf") ++ Array(0xE9.toByte) ++ bytes(" latin one page")))
    dir
  }

  test("record walk: envelope split, gzip members, truncation + garbage fences") {
    val dir = writeDir()
    val recs = WarcSource.records(spark, dir).cache()

    val plain = recs.filter(col("file").endsWith("plain.warc"))
      .orderBy(col("record_ix")).collect()
    assert(plain.map(_.getAs[String]("warc_type")).toSeq ==
      Seq("warcinfo", "response", "response", "conversion"))
    // the HTTP envelope is OFF the body and its Content-Type surfaced
    val html = plain(1)
    assert(html.getAs[String]("http_content_type") == "text/html")
    assert(html.getAs[Array[Byte]]("body").toSeq == htmlBody.toSeq,
      "response body must be the payload after the HTTP header block")
    assert(html.getAs[String]("target_uri") == "http://a.example/one")

    // both gzip members parse (concatenated-member walk)
    val gzRecs = recs.filter(col("file").endsWith("members.warc.gz"))
    assert(gzRecs.count() == 2)

    // truncation fence: the promised-5000-byte record is dropped,
    // its predecessor kept
    val trunc = recs.filter(col("file").endsWith("truncated.warc")).collect()
    assert(trunc.length == 1 &&
      trunc(0).getAs[String]("target_uri") == "http://c.example/kept")

    // garbage fence: nothing after the framing error is guessed at
    val garb = recs.filter(col("file").endsWith("garbage.warc")).collect()
    assert(garb.length == 1 &&
      garb(0).getAs[String]("target_uri") == "http://d.example/first")
    recs.unpersist()
  }

  test("routing: documents get text records, media gets magic-sniffed payloads (lying Content-Type)") {
    val dir = writeDir()
    val docs = WarcSource.documents(spark, dir).cache()
    val urls = docs.select("url").collect().map(_.getString(0)).toSet
    // HTML response + all WET conversions — but NOT the lying record
    // (its bytes are an image, whatever its header says) and not the
    // warcinfo block
    assert(urls.contains("http://a.example/one"))
    assert(!urls.contains("http://a.example/lying"),
      "media bytes behind a lying text/html header must not become text")
    assert(docs.filter(col("text").contains("conversion record plain")).count() == 1)
    assert(docs.select("doc_id").distinct().count() == docs.count())
    assert(docs.filter(col("n_chars") <= 0).count() == 0)
    docs.unpersist()

    val media = WarcSource.media(spark, dir).collect()
    assert(media.length == 1)
    val m = media(0).getAs[org.apache.spark.sql.Row]("meta")
    assert(m.getAs[String]("mime") == graft.multimodal.Multimodal.MimePpm,
      "routing must follow the magic bytes")
    assert(m.getAs[String]("declared_mime") == "text/html",
      "the lying declared type rides along as evidence")
  }

  /** A fresh dir of REAL-WEB payload fixtures: JPEG/PNG/gzip magic
    * responses behind lying text headers, an unrecognized NUL-bearing
    * blob, a charset-declared latin-1 page, and a folded header.
    */
  private def writeWebDir(): String = {
    val dir = Files.createTempDirectory("graft-warc-web").toString
    val jpegBody = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte,
      0xE0.toByte) ++ bytes("JFIFx") ++ Array.tabulate[Byte](64)(_.toByte)
    val pngBody = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n',
      0x1A.toByte, '\n') ++ Array.tabulate[Byte](32)(i => (i * 3).toByte)
    val gzipBody = gz(bytes("compressed payload served raw"))
    // no known magic AND NUL bytes: the quarantine case
    val nulBody = bytes("BLOB") ++ Array[Byte](0, 1, 2, 0, 9) ++
      Array.tabulate[Byte](32)(i => (i * 5).toByte)
    val latinBody = bytes("déjà vu page") // ISO-8859-1: é/à one byte each
    def resp(uri: String, ct: String, body: Array[Byte]) =
      rec(Seq("WARC-Type" -> "response", "WARC-Target-URI" -> uri,
        "Content-Type" -> "application/http; msgtype=response"),
        httpWrap(ct, body))
    Files.write(Paths.get(dir, "web.warc"),
      resp("http://w.example/jpeg", "text/html", jpegBody) ++
        resp("http://w.example/png", "text/plain", pngBody) ++
        resp("http://w.example/gzip", "text/html", gzipBody) ++
        resp("http://w.example/blob", "text/html", nulBody) ++
        resp("http://w.example/latin",
          "text/html; charset=ISO-8859-1", latinBody) ++
        resp("http://w.example/plainutf",
          "text/html; charset=UTF-8", bytes("plain ascii page")))
    // folded header: the Content-Type value continues on an LWS line
    // whose content contains ':' — must EXTEND the value, not mint a
    // bogus header key
    val folded = bytes("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://w.example/folded\r\n" +
      "Content-Type: application/http;\r\n msgtype=response; note=a:b\r\n")
    val foldedBody = httpWrap("text/html", bytes("folded header page"))
    Files.write(Paths.get(dir, "folded.warc"),
      folded ++ bytes(s"Content-Length: ${foldedBody.length}\r\n\r\n") ++
        foldedBody ++ bytes("\r\n\r\n"))
    // obs-folded HTTP envelope: the charset parameter arrives on an
    // LWS continuation line INSIDE the HTTP header block
    val hfBody = bytes("HTTP/1.1 200 OK\r\nContent-Type: text/html;\r\n" +
      " charset=ISO-8859-1\r\nServer: t\r\n\r\n") ++ bytes("fold é page")
    Files.write(Paths.get(dir, "httpfold.warc"),
      rec(Seq("WARC-Type" -> "response",
        "WARC-Target-URI" -> "http://w.example/httpfold",
        "Content-Type" -> "application/http; msgtype=response"), hfBody))
    // in-body <meta charset> with a silent HTTP header (the dominant
    // real-crawl declaration channel): 0x92 is ’ in windows-1252
    Files.write(Paths.get(dir, "meta.warc"),
      resp("http://w.example/metacs", "text/html",
        bytes("<html><head><meta charset=\"windows-1252\"></head>" +
          "<body>it") ++ Array(0x92.toByte) ++ bytes("s meta</body>")) ++
        // transport wins over markup: header latin-1 beats meta utf-8
        resp("http://w.example/precedence",
          "text/html; charset=ISO-8859-1",
          bytes("<meta charset=\"utf-8\">caf") ++ Array(0xE9.toByte)) ++
        // the WORD charset inside an unrelated meta attribute value
        // must NOT re-decode the page (review finding)
        resp("http://w.example/metaword", "text/html",
          bytes("<meta name=\"description\" content=\"how to set " +
            "charset=shift_jis in html\"><body>plain page</body>")))
    // weak-prefix TEXT payloads that must STAY text (review finding:
    // short printable magics misroute prose): pages starting with the
    // strings "ID3 ", "GIF8 " and "%PDF " are documents, while a real
    // ID3v2 header (version 4, sync-safe size) routes to audio
    Files.write(Paths.get(dir, "prefixes.warc"),
      resp("http://w.example/id3text", "text/plain",
        bytes("ID3 tags are metadata containers for audio files")) ++
        resp("http://w.example/gif8text", "text/plain",
          bytes("GIF8 is how both gif magics begin, in prose")) ++
        resp("http://w.example/pdftext", "text/plain",
          bytes("%PDF files start with a version marker")) ++
        resp("http://w.example/realid3", "text/html",
          Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 2, 1) ++
            Array.tabulate[Byte](64)(i => (i * 7).toByte)))
    dir
  }

  test("real-web routing: media magics to media, NUL blobs to quarantine, text stays text") {
    val dir = writeWebDir()
    val recs = WarcSource.records(spark, dir).cache()
    val docs = WarcSource.documents(recs).cache()
    val urls = docs.select("url").collect().map(_.getString(0)).toSet
    assert(!urls.contains("http://w.example/jpeg"),
      "a crawled JPEG must not become a mojibake text document")
    assert(!urls.contains("http://w.example/png"))
    // a gzip payload's RAW bytes must never ingest as text — but its
    // DECOMPRESSED text now does (the served-.gz arm, r14): the row
    // carries the inner document, not compressed mojibake
    assert(docs.filter(col("url") === "http://w.example/gzip" &&
      col("text") === "compressed payload served raw").count() == 1,
      "a served .gz of text must ingest its INNER text")
    assert(!urls.contains("http://w.example/blob"),
      "unrecognized NUL-bearing binary must be quarantined, not ingested")
    assert(urls.contains("http://w.example/latin"))
    assert(urls.contains("http://w.example/plainutf"))
    assert(urls.contains("http://w.example/folded"),
      "a folded WARC header must still frame the record")
    // weak printable prefixes must not misroute prose out of the corpus
    assert(urls.contains("http://w.example/id3text"),
      "a page STARTING 'ID3 ' is text, not an MP3")
    assert(urls.contains("http://w.example/gif8text"))
    assert(urls.contains("http://w.example/pdftext"))
    assert(!urls.contains("http://w.example/realid3"),
      "a real ID3v2 header is media")

    val media = WarcSource.media(recs)
      .select(col("meta.url"), col("meta.mime"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(media("http://w.example/jpeg") == graft.sources.BinarySource.MimeJpeg)
    assert(media("http://w.example/png") == graft.multimodal.Multimodal.MimePng)
    assert(media("http://w.example/gzip") == graft.sources.BinarySource.MimeGzip)
    assert(media("http://w.example/realid3") ==
      graft.sources.BinarySource.MimeMp3)
    val declared = WarcSource.media(recs)
      .filter(col("meta.url") === "http://w.example/jpeg")
      .select("meta.declared_mime").collect()(0).getString(0)
    assert(declared == "text/html",
      "the lying declared type must ride along as evidence")

    val quar = WarcSource.quarantine(recs).collect()
    assert(quar.map(_.getAs[String]("url")).toSeq ==
      Seq("http://w.example/blob"))
    assert(quar(0).getAs[String]("reason") == "nul_bytes")
    recs.unpersist(); docs.unpersist()
  }

  test("charset-aware decode: declared latin-1 decodes é, not U+FFFD; charset_used surfaced") {
    val dir = writeWebDir()
    val docs = WarcSource.documents(spark, dir).cache()
    val latin = docs.filter(col("url") === "http://w.example/latin")
      .select("text", "charset_used").collect()(0)
    assert(latin.getString(0) == "déjà vu page",
      s"declared latin-1 must decode 0xE9 to é, got: ${latin.getString(0)}")
    assert(latin.getString(1) == "iso-8859-1")
    val utf = docs.filter(col("url") === "http://w.example/plainutf")
      .select("charset_used").collect()(0).getString(0)
    assert(utf == "utf-8")
    // no declared charset → utf-8 fallback (the pre-charset behavior)
    val folded = docs.filter(col("url") === "http://w.example/folded")
      .select("charset_used").collect()(0).getString(0)
    assert(folded == "utf-8")
    // a charset declared on an obs-folded HTTP Content-Type line is
    // unfolded and honored (review finding: the r13 folding fix must
    // cover the HTTP envelope, not just WARC headers)
    val hf = docs.filter(col("url") === "http://w.example/httpfold")
      .select("text", "charset_used").collect()(0)
    assert(hf.getString(0) == "fold é page",
      s"folded-envelope charset must decode é, got: ${hf.getString(0)}")
    assert(hf.getString(1) == "iso-8859-1")
    // in-body <meta charset> fills in when the header is silent
    val meta = docs.filter(col("url") === "http://w.example/metacs")
      .select("text", "charset_used").collect()(0)
    assert(meta.getString(0).contains("it’s meta"),
      s"meta-declared windows-1252 must decode ’, got: ${meta.getString(0)}")
    assert(meta.getString(1) == "windows-1252")
    // transport beats markup (HTML5 precedence)
    val prec = docs.filter(col("url") === "http://w.example/precedence")
      .select("text", "charset_used").collect()(0)
    assert(prec.getString(0).endsWith("café"), prec.getString(0))
    assert(prec.getString(1) == "iso-8859-1")
    // 'charset=' mentioned inside a meta description is NOT a
    // declaration — the page stays utf-8
    val mw = docs.filter(col("url") === "http://w.example/metaword")
      .select("charset_used").collect()(0).getString(0)
    assert(mw == "utf-8",
      "a charset mention in prose must not re-decode the page")
    docs.unpersist()
  }

  test("zstd archives: frame members walk like gzip members; truncation fences") {
    val dir = Files.createTempDirectory("graft-warc-zstd").toString
    def zst(b: Array[Byte]): Array[Byte] =
      com.github.luben.zstd.Zstd.compress(b, 3)
    val recA = rec(Seq("WARC-Type" -> "conversion",
      "WARC-Target-URI" -> "http://z.example/a"),
      bytes("zstd member record alpha"))
    val recB = rec(Seq("WARC-Type" -> "conversion",
      "WARC-Target-URI" -> "http://z.example/b"),
      bytes("zstd member record beta"))
    Files.write(Paths.get(dir, "members.warc.zst"), zst(recA) ++ zst(recB))
    // truncated second frame: first member's records survive, the
    // dying frame fences — parity with the gzip contract
    val cut = zst(recB)
    Files.write(Paths.get(dir, "trunc.warc.zst"),
      zst(recA) ++ java.util.Arrays.copyOf(cut, cut.length - 8))
    val recs = WarcSource.records(spark, dir).cache()
    assert(recs.filter(col("file").endsWith("members.warc.zst")).count() == 2,
      "both concatenated zstd frames must parse")
    val trunc = recs.filter(col("file").endsWith("trunc.warc.zst")).collect()
    assert(trunc.length == 1 &&
      trunc(0).getAs[String]("target_uri") == "http://z.example/a",
      "a dying zstd frame must fence, keeping prior records")
    recs.unpersist()
  }

  test("unlabeled non-UTF-8 text SNIFFS to windows-1252, never a crash; an over-cap header line fences") {
    val dir = writeDir()
    // a header line past the 1 MB cap: its remainder would mis-frame
    // as fresh header lines — the whole walk must fence, dropping the
    // well-formed record that follows (unattributable bytes)
    Files.write(Paths.get(dir, "overflow.warc"),
      bytes("WARC/1.0\r\nX-Big: " + "a" * ((1 << 20) + 64) + "\r\n") ++
        wetRec)
    val docs = WarcSource.documents(spark, dir).cache()
    val latin = docs.filter(col("url") === "http://e.example/latin")
      .select("text", "charset_used").collect()
    assert(latin.length == 1, "the latin-1 record must survive as text")
    // this record declares NO charset and its 0xE9 is invalid UTF-8:
    // the WHATWG unlabeled sniff decodes windows-1252 — 'é', not
    // U+FFFD (the r13 behavior) — and the evidence column says so
    assert(latin(0).getString(0).contains("café"),
      "unlabeled legacy bytes must sniff to windows-1252, not mangle")
    assert(latin(0).getString(0).contains("latin one page"))
    assert(latin(0).getString(1) == "windows-1252",
      "charset_used must report what the decode actually used")
    assert(WarcSource.records(spark, dir)
      .filter(col("file").endsWith("overflow.warc")).count() == 0,
      "an over-cap header line must fence the whole walk")
    docs.unpersist()
  }

  test("streaming ingest: landed archives become a documents stream, composing with corpusPrep") {
    val dir = writeDir()
    val stream = graft.streaming.Streams.warcDocuments(spark, dir)
    assert(stream.isStreaming)
    // docs carry the archive mtime as event time (what downstream
    // watermarks declare on), and the SAME routing/fencing as batch
    val q = stream.writeStream.format("memory")
      .queryName("warc_docs_stream").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("warc_docs_stream")
      val batch = WarcSource.documents(spark, dir)
      assert(got.count() == batch.count(),
        "streaming ingest must yield exactly the batch face's docs")
      assert(got.filter(col("ts").isNull).count() == 0)
      assert(got.filter(col("url") === "http://a.example/lying").count() == 0,
        "lying-Content-Type routing must hold in the stream too")
    } finally q.stop()

    // composed: crawl stream -> the corpusPrep stage chain (exact
    // dedup watermarking on the carried ts) -> sharded rows
    val cfg = graft.pipeline.CorpusPrep.Config(
      langRates = Map.empty, defaultRate = 1.0, nShards = 4)
    val prepped = graft.streaming.Streams.corpusPrep(
      graft.streaming.Streams.warcDocuments(spark, dir), cfg)
    val q2 = prepped.writeStream.format("memory")
      .queryName("warc_corpus_stream").outputMode("append").start()
    try {
      q2.processAllAvailable()
      val rows = spark.table("warc_corpus_stream")
      assert(rows.count() > 0, "the crawl must reach the corpus stage")
      assert(rows.columns.contains("shard"))
    } finally q2.stop()
  }

  test("HTTP transport/content codings undone: chunked framing, gzip/deflate bodies, raw fallback") {
    val dir = Files.createTempDirectory("graft-warc-codings").toString
    def respRaw(uri: String, headers: String, body: Array[Byte]) =
      rec(Seq("WARC-Type" -> "response", "WARC-Target-URI" -> uri,
        "Content-Type" -> "application/http; msgtype=response"),
        bytes(s"HTTP/1.1 200 OK\r\n$headers\r\n") ++ body)
    val text = "a page delivered through http codings must ingest clean"
    // chunked: two chunks with an extension on the first
    val chunked = bytes("10;ext=1\r\n") ++ bytes(text.take(16)) ++
      bytes("\r\n") ++
      bytes(f"${text.length - 16}%x\r\n") ++ bytes(text.drop(16)) ++
      bytes("\r\n0\r\n\r\n")
    // gzip content coding
    val gzBody = gz(bytes(text))
    // deflate, RAW form (what many servers actually send)
    val rawDeflate = {
      val d = new java.util.zip.Deflater(-1, true)
      d.setInput(bytes(text)); d.finish()
      val bo = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) bo.write(buf, 0, d.deflate(buf))
      d.end(); bo.toByteArray
    }
    // chunked + gzip combined (transport framing outside, coding inside)
    val both = {
      val inner = gzBody
      bytes(f"${inner.length}%x\r\n") ++ inner ++ bytes("\r\n0\r\n\r\n")
    }
    // malformed chunk framing: hex line lies past the buffer
    val badChunk = bytes("ffff\r\nonly a few bytes")
    Files.write(Paths.get(dir, "codings.warc"),
      respRaw("http://c.example/chunked",
        "Content-Type: text/plain\r\nTransfer-Encoding: chunked\r\n",
        chunked) ++
        respRaw("http://c.example/gzip",
          "Content-Type: text/plain\r\nContent-Encoding: gzip\r\n", gzBody) ++
        respRaw("http://c.example/deflate",
          "Content-Type: text/plain\r\nContent-Encoding: deflate\r\n",
          rawDeflate) ++
        respRaw("http://c.example/both",
          "Content-Type: text/plain\r\nTransfer-Encoding: chunked\r\n" +
            "Content-Encoding: gzip\r\n", both) ++
        respRaw("http://c.example/badchunk",
          "Content-Type: text/plain\r\nTransfer-Encoding: chunked\r\n",
          badChunk))
    val docs = WarcSource.documents(spark, dir).cache()
    val byUrl = docs.collect()
      .map(r => r.getAs[String]("url") -> r.getAs[String]("text")).toMap
    assert(byUrl("http://c.example/chunked") == text,
      "chunk framing must be removed, not ingested as text noise")
    assert(byUrl("http://c.example/gzip") == text,
      "a gzip content coding must inflate to the page text, not route to media")
    assert(byUrl("http://c.example/deflate") == text,
      "raw-deflate content coding must inflate")
    assert(byUrl("http://c.example/both") == text,
      "transport framing then content coding, in that order")
    // malformed framing keeps the RAW bytes best-effort (still text here)
    assert(byUrl("http://c.example/badchunk").contains("only a few bytes"))
    docs.unpersist()
  }

  test("content codings: healthy br DECODES (r17) and zstd inflates; dying br bills br_fenced (not nul_bytes)") {
    val dir = Files.createTempDirectory("graft-warc-br").toString
    def respRaw(uri: String, headers: String, body: Array[Byte]) =
      rec(Seq("WARC-Type" -> "response", "WARC-Target-URI" -> uri,
        "Content-Type" -> "application/http; msgtype=response"),
      bytes(s"HTTP/1.1 200 OK\r\n$headers\r\n") ++ body)
    val text = "a page served under a modern content coding"
    // hostile "brotli" bytes: binary with NULs that no decoder can
    // undo — the billed-loss arm keeps working after the r17 decoder
    val brGarbage = Array.tabulate[Byte](256)(i =>
      if (i % 5 == 0) 0 else ((i * 11) % 251).toByte)
    // a HEALTHY br page: a conformant stream (the fixture encoder is
    // libbrotlidec-verified) — must now ingest as text, not bill
    val brText = "a brotli page the r17 decoder ingests instead of fencing"
    val brBody = graft.multimodal.Brotli.encodeFixed(
      brText.getBytes("UTF-8"), split = true)
    val zstdBody = com.github.luben.zstd.Zstd.compress(bytes(text))
    Files.write(Paths.get(dir, "br.warc"),
      respRaw("http://b.example/page.br",
        "Content-Type: text/html\r\nContent-Encoding: br\r\n", brGarbage) ++
        respRaw("http://b.example/good.br",
          "Content-Type: text/plain\r\nContent-Encoding: br\r\n", brBody) ++
        respRaw("http://b.example/page.zst",
          "Content-Type: text/plain\r\nContent-Encoding: zstd\r\n",
          zstdBody) ++
        respRaw("http://b.example/plain",
          "Content-Type: text/plain\r\n", bytes(text)))
    val recs = WarcSource.records(spark, dir).cache()
    // the records frame carries the evidence column: ONLY the dying
    // stream stays coded — healthy br and zstd both decode
    assert(recs.filter(col("content_coding") === "br").count() == 1)
    assert(recs.filter(col("content_coding").isNotNull).count() == 1,
      "healthy br + zstd must inflate; plain bodies carry null")
    val docs = WarcSource.documents(recs).collect()
      .map(r => r.getAs[String]("url") -> r.getAs[String]("text")).toMap
    assert(docs("http://b.example/page.zst") == text)
    assert(docs("http://b.example/good.br") == brText,
      "a healthy br page must ingest as text since r17")
    assert(!docs.contains("http://b.example/page.br"),
      "still-coded bytes must not ingest as text")
    // the billing: exactly one br_fenced row (the dying stream), NOT
    // double-counted as nul_bytes, and NOT the healthy page
    val quar = WarcSource.quarantine(recs).collect()
    val reasons = quar.map(r =>
      r.getAs[String]("url") -> r.getAs[String]("reason")).toMap
    assert(reasons("http://b.example/page.br") == "br_fenced")
    assert(!reasons.contains("http://b.example/good.br"))
    assert(quar.count(_.getAs[String]("url") ==
      "http://b.example/page.br") == 1, "one reason per record")
    assert(WarcSource.codingFenced(recs).count() == 1)
    recs.unpersist()
    // a br-coded IMAGE: content coding is undone BEFORE magic
    // routing, so the decoded bytes must route to the media face
    // like any plain-served image (CDNs br-compress aggressively,
    // including already-compressed media)
    val png = graft.multimodal.Png.encode(graft.multimodal.Netpbm
      .Image(8, 8, 255, Array.fill[Byte](192)(55)))
    Files.write(Paths.get(dir, "brimg.warc"),
      respRaw("http://b.example/img.png",
        "Content-Type: image/png\r\nContent-Encoding: br\r\n",
        graft.multimodal.Brotli.encodeFixed(png, split = false)))
    val recs2 = WarcSource.records(spark, dir)
    val media = WarcSource.media(recs2).collect()
      .filter(_.getAs[org.apache.spark.sql.Row]("meta")
        .getAs[String]("url") == "http://b.example/img.png")
    assert(media.length == 1 &&
      media(0).getAs[org.apache.spark.sql.Row]("meta")
        .getAs[String]("mime") == "image/png",
      "a br-coded image must decode and route to media by magic")
    assert(media(0).getAs[Array[Byte]]("payload").toSeq == png.toSeq,
      "the media payload must be the DECODED image bytes")
    // streaming parity: the br decode lives in the shared record
    // parser, so the continuous intake must ingest the healthy page
    // and fence the dying one exactly like batch
    val stream = graft.streaming.Streams.warcDocuments(spark, dir)
    val sq = stream.writeStream.format("memory")
      .queryName("warc_br_stream").outputMode("append").start()
    try {
      sq.processAllAvailable()
      val got = spark.table("warc_br_stream")
      assert(got.filter(col("text") === brText).count() == 1,
        "streaming must ingest the healthy br page")
      assert(got.filter(col("url") === "http://b.example/page.br")
        .count() == 0, "streaming must fence the dying br stream")
    } finally sq.stop()
  }

  test("NUL fence covers conversion (WET) records: binary WET payload quarantines, not ingests") {
    val dir = Files.createTempDirectory("graft-warc-wetnul").toString
    // a WET record whose payload is binary (NUL bytes) — crawl tooling
    // does occasionally write this; the identical bytes in a response
    // record have always quarantined, and the fence must be symmetric
    val nulBody = bytes("looks textual until") ++
      Array[Byte](0, 1, 2, 0) ++ bytes("binary tail")
    Files.write(Paths.get(dir, "wet.warc"),
      rec(Seq("WARC-Type" -> "conversion",
        "WARC-Target-URI" -> "http://n.example/binwet",
        "Content-Type" -> "text/plain"), nulBody) ++
        rec(Seq("WARC-Type" -> "conversion",
          "WARC-Target-URI" -> "http://n.example/okwet",
          "Content-Type" -> "text/plain"),
          bytes("a clean wet record that must still ingest")) ++
        // extracted WET text legitimately OPENS with a short printable
        // magic ("BM…"/"P6…" prose) — conversion records get only the
        // NUL fence, never the media-sniff gate (review regression)
        rec(Seq("WARC-Type" -> "conversion",
          "WARC-Target-URI" -> "http://n.example/bmwet",
          "Content-Type" -> "text/plain"),
          bytes("BMW recalls several models this quarter")))
    val recs = WarcSource.records(spark, dir).cache()
    val docUrls = WarcSource.documents(recs)
      .select("url").collect().map(_.getString(0)).toSet
    assert(docUrls ==
      Set("http://n.example/okwet", "http://n.example/bmwet"),
      "a NUL-bearing WET payload must not become a mojibake document, " +
        "and WET prose opening 'BM' must not vanish")
    val quar = WarcSource.quarantine(recs).collect()
    assert(quar.map(_.getAs[String]("url")).toSeq ==
      Seq("http://n.example/binwet"),
      "what the documents fence refuses must land in quarantine, not nowhere")
    assert(quar(0).getAs[String]("reason") == "nul_bytes")
    recs.unpersist()
  }

  test("pdfDocuments: crawled PDFs yield corpus text; encrypted PDFs yield no row") {
    val dir = Files.createTempDirectory("graft-warc-pdf").toString
    def resp(uri: String, body: Array[Byte]) =
      rec(Seq("WARC-Type" -> "response", "WARC-Target-URI" -> uri,
        "Content-Type" -> "application/http; msgtype=response"),
        httpWrap("application/pdf", body))
    val pdf = graft.multimodal.PdfText.write(
      "a crawled pdf paragraph about data pipelines")
    val encd = ("%PDF-1.4\ntrailer << /Encrypt 9 0 R >>\n%%EOF")
      .getBytes("ISO-8859-1")
    // the subset-font pair: glyph ids WITH a /ToUnicode CMap recover
    // real text; the SAME document without it is mojibake and must
    // fence to quarantine, never into the corpus
    val glyphOk = graft.multimodal.PdfText.writeGlyph(
      "subset font text recovered through the cmap", withToUnicode = true)
    val glyphMoji = graft.multimodal.PdfText.writeGlyph(
      "glyph ids with no tounicode are mojibake", withToUnicode = false)
    Files.write(Paths.get(dir, "pdfs.warc"),
      resp("http://p.example/doc", pdf) ++
        resp("http://p.example/locked", encd) ++
        resp("http://p.example/cmap", glyphOk) ++
        resp("http://p.example/glyphs", glyphMoji))
    val recs = WarcSource.records(spark, dir).cache()
    // PDFs route to media (never mojibake documents)…
    assert(WarcSource.documents(recs)
      .filter(col("url").startsWith("http://p.example")).count() == 0)
    assert(WarcSource.media(recs)
      .filter(col("meta.mime") === "application/pdf").count() == 4)
    // …and the pdf face extracts the text into the corpus shape
    val docs = WarcSource.pdfDocuments(recs).collect()
    assert(docs.length == 2,
      "encrypted + mojibake PDFs must yield no corpus row")
    val byUrl = docs.map(r => r.getAs[String]("url") -> r).toMap
    val d = byUrl("http://p.example/doc")
    assert(d.getAs[String]("text") ==
      "a crawled pdf paragraph about data pipelines")
    assert(d.getAs[Long]("n_chars") == 44L)
    assert(byUrl("http://p.example/cmap").getAs[String]("text") ==
      "subset font text recovered through the cmap",
      "a subset-font PDF WITH ToUnicode must extract its real text")
    // the refusals are audited, with reasons
    val quar = WarcSource.quarantine(recs).collect()
      .map(r => r.getAs[String]("url") -> r.getAs[String]("reason")).toMap
    assert(quar("http://p.example/locked") == "pdf_encrypted")
    assert(quar("http://p.example/glyphs") == "pdf_glyph_mojibake",
      "glyph-id mojibake must land in quarantine, not the corpus")
    assert(!quar.contains("http://p.example/doc"))
    assert(!quar.contains("http://p.example/cmap"))
    recs.unpersist()

    // the continuous mirror: same rows, archive mtime as ts
    val stream = graft.streaming.Streams.warcPdfDocuments(spark, dir)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory")
      .queryName("warc_pdf_stream").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("warc_pdf_stream")
      assert(got.count() == 2,
        "the streaming mirror must apply the same fences as batch")
      assert(got.filter(col("text") ===
        "a crawled pdf paragraph about data pipelines").count() == 1)
      assert(got.filter(col("text") ===
        "subset font text recovered through the cmap").count() == 1)
      assert(got.filter(col("ts").isNull).count() == 0)
    } finally q.stop()
  }

  test("officeDocuments: crawled DOCX yields corpus text; plain ZIP archives stay opaque media") {
    val dir = Files.createTempDirectory("graft-warc-docx").toString
    def resp(uri: String, ct: String, body: Array[Byte]) =
      rec(Seq("WARC-Type" -> "response", "WARC-Target-URI" -> uri,
        "Content-Type" -> "application/http; msgtype=response"),
        httpWrap(ct, body))
    val docx = graft.multimodal.Docx.write(
      "a crawled office document about quarterly results")
    val plainZip = graft.multimodal.Zip.write(Seq(
      ("backup/readme.txt", "just an archive, not a document"
        .getBytes("UTF-8"), true)))
    // a corrupt docx: document.xml bytes flipped → extraction None
    val corrupt = docx.clone()
    val main = graft.multimodal.Zip.entries(docx).get
      .find(_.name == "word/document.xml").get
    corrupt(main.offset.toInt + 30 + 17 + 2) =
      (corrupt(main.offset.toInt + 30 + 17 + 2) ^ 0x11).toByte
    val epub = graft.multimodal.Epub.write(
      "a crawled public domain book chapter")
    Files.write(Paths.get(dir, "office.warc"),
      resp("http://o.example/report.docx",
        "application/vnd.openxmlformats-officedocument" +
          ".wordprocessingml.document", docx) ++
        // the lying-header case: served as octet-stream, bytes decide
        resp("http://o.example/nameless", "application/octet-stream",
          plainZip) ++
        resp("http://o.example/damaged.docx", "application/zip", corrupt) ++
        resp("http://o.example/book.epub", "application/epub+zip", epub) ++
        // RTF is ASCII: served even as text/plain it must route here
        // by its prologue, never into documents as control-word soup
        resp("http://o.example/legacy.rtf", "text/plain",
          graft.multimodal.RtfText.write("a legacy rtf memo")) ++
        resp("http://o.example/memo.odt",
          "application/vnd.oasis.opendocument.text",
          graft.multimodal.Odt.write("an opendocument memo")) ++
        resp("http://o.example/table.xlsx",
          "application/vnd.openxmlformats-officedocument" +
            ".spreadsheetml.sheet",
          graft.multimodal.Xlsx.write("year\trevenue\n2024\tsteady")) ++
        resp("http://o.example/legacy.doc", "application/msword",
          graft.multimodal.DocText.write("a legacy word ninety seven file")) ++
        resp("http://o.example/table.xls", "application/vnd.ms-excel",
          graft.multimodal.XlsText.write("year\tcost\n1999\tlegacy")) ++
        resp("http://o.example/deck.ppt", "application/vnd.ms-powerpoint",
          graft.multimodal.PptText.write("slide one\nslide two")))
    val recs = WarcSource.records(spark, dir).cache()
    // ZIPs/RTF route to media (never the raw-text corpus) …
    assert(WarcSource.documents(recs)
      .filter(col("url").startsWith("http://o.example")).count() == 0)
    assert(WarcSource.media(recs)
      .filter(col("meta.mime") === "application/zip").count() == 6)
    assert(WarcSource.media(recs)
      .filter(col("meta.mime") === "application/rtf").count() == 1)
    // … and only the REAL documents yield corpus text
    val docs = WarcSource.officeDocuments(recs).collect()
    assert(docs.length == 8,
      "plain archives and corrupt members must yield no corpus row")
    assert(docs.map(_.getAs[String]("text"))
      .contains("a legacy word ninety seven file"),
      "the OLE2 .doc arm rides the same face")
    assert(docs.map(_.getAs[String]("text"))
      .contains("year\tcost\n1999\tlegacy"),
      "the BIFF8 .xls arm rides the same face, TSV-shaped")
    assert(docs.map(_.getAs[String]("text"))
      .contains("slide one\nslide two"),
      "the .ppt arm rides the same face")
    assert(docs.map(_.getAs[String]("text"))
      .contains("year\trevenue\n2024\tsteady"),
      "the XLSX arm rides the same face, TSV-shaped")
    assert(docs.map(_.getAs[String]("text"))
      .contains("an opendocument memo"), "the ODT arm rides the same face")
    assert(docs.map(_.getAs[String]("text"))
      .contains("a legacy rtf memo"), "the RTF arm rides the same face")
    val byUrl = docs.map(r => r.getAs[String]("url") -> r).toMap
    val rep = byUrl("http://o.example/report.docx")
    assert(rep.getAs[String]("text") ==
      "a crawled office document about quarterly results")
    assert(rep.getAs[Long]("n_chars") == 49L)
    assert(byUrl("http://o.example/book.epub").getAs[String]("text") ==
      "a crawled public domain book chapter",
      "the EPUB arm rides the same face")
    recs.unpersist()

    // the continuous mirror: same rows, archive mtime as ts
    val stream = graft.streaming.Streams.warcOfficeDocuments(spark, dir)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory")
      .queryName("warc_office_stream").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("warc_office_stream")
      assert(got.count() == 8,
        "the streaming mirror must apply the same fences as batch")
      assert(got.filter(col("ts").isNull).count() == 0)
    } finally q.stop()
  }

  test("served .gz/.zst files: inner text joins documents, binary-inside stays a media blob, truncation fences") {
    val dir = Files.createTempDirectory("graft-warc-gz").toString
    def resp(uri: String, ct: String, body: Array[Byte]) =
      rec(Seq("WARC-Type" -> "response", "WARC-Target-URI" -> uri,
        "Content-Type" -> "application/http; msgtype=response"),
        httpWrap(ct, body))
    def gzip(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close(); bo.toByteArray
    }
    def zstd(b: Array[Byte]): Array[Byte] =
      com.github.luben.zstd.Zstd.compress(b)
    val sitemap = "<urlset><url><loc>https://g.example/page</loc>" +
      "</url></urlset>"
    val png = graft.multimodal.Png.encode(
      graft.multimodal.Netpbm.Image(2, 2, 255, new Array[Byte](12)))
    val full = gzip(sitemap.getBytes("UTF-8"))
    val truncated = java.util.Arrays.copyOfRange(full, 0, full.length - 6)
    // a dataset tarball: two text members, one PNG member (skipped),
    // one GNU-longname member — and the same tar served as .tar.gz
    val longName = "corpus/very/deep/path/that/overflows/the/ustar/" +
      "hundred/byte/name/field/by/quite/a/comfortable/margin/doc3.txt"
    val tar = graft.multimodal.Tar.write(Seq(
      ("corpus/doc1.txt", "tar member one text".getBytes("UTF-8")),
      ("corpus/img.png", png),
      ("corpus/doc2.txt", "tar member two text".getBytes("UTF-8")),
      (longName, "long-named member text".getBytes("UTF-8"))),
      longNameFor = Some(3))
    Files.write(Paths.get(dir, "gz.warc"),
      resp("http://g.example/sitemap.xml.gz", "application/gzip", full) ++
        resp("http://g.example/dump.zst", "application/zstd",
          zstd("a zstd served text dump".getBytes("UTF-8"))) ++
        resp("http://g.example/img.png.gz", "application/gzip",
          gzip(png)) ++
        resp("http://g.example/cut.gz", "application/gzip", truncated) ++
        resp("http://g.example/data.tar", "application/x-tar", tar) ++
        resp("http://g.example/data.tar.gz", "application/gzip",
          gzip(tar)) ++
        resp("http://g.example/notes.bz2", "application/x-bzip2", {
          val bo = new java.io.ByteArrayOutputStream()
          val z = new org.apache.commons.compress.compressors.bzip2
            .BZip2CompressorOutputStream(bo)
          z.write("bzip2 served text notes".getBytes("UTF-8")); z.close()
          bo.toByteArray
        }) ++
        resp("http://g.example/corpus.xz", "application/x-xz", {
          val bo = new java.io.ByteArrayOutputStream()
          val z = new org.apache.commons.compress.compressors.xz
            .XZCompressorOutputStream(bo)
          z.write("xz served text corpus".getBytes("UTF-8")); z.close()
          bo.toByteArray
        }) ++
        // a 7z dataset archive: text members surface like tar's, the
        // binary member stays out
        resp("http://g.example/data.7z", "application/x-7z-compressed",
          graft.multimodal.SevenZ.write(Seq(
            ("corpus/s1.txt", "sevenz member one text".getBytes("UTF-8")),
            ("corpus/pic.png", png),
            ("corpus/s2.txt", "sevenz member two text".getBytes("UTF-8"))))))
    val recs = WarcSource.records(spark, dir).cache()
    val docs = WarcSource.documents(recs).collect()
      .map(r => r.getAs[String]("url") -> r.getAs[String]("text")).toMap
    assert(docs.size == 12, s"got ${docs.keySet}")
    assert(docs("http://g.example/notes.bz2") == "bzip2 served text notes")
    assert(docs("http://g.example/corpus.xz") == "xz served text corpus")
    assert(docs("http://g.example/sitemap.xml.gz") == sitemap)
    assert(docs("http://g.example/dump.zst") == "a zstd served text dump")
    // tar members: one row PER TEXT member, #member-fragment urls,
    // the PNG member contributes nothing; .tar and .tar.gz agree
    assert(docs("http://g.example/data.tar#corpus/doc1.txt") ==
      "tar member one text")
    assert(docs("http://g.example/data.tar#corpus/doc2.txt") ==
      "tar member two text")
    assert(docs("http://g.example/data.tar#" + longName) ==
      "long-named member text", "the GNU longname must resolve")
    assert(docs("http://g.example/data.tar.gz#corpus/doc1.txt") ==
      "tar member one text")
    assert(!docs.keys.exists(_.contains("img.png")),
      "a tarball's binary members must contribute nothing")
    // 7z members ride the same member contract
    assert(docs("http://g.example/data.7z#corpus/s1.txt") ==
      "sevenz member one text")
    assert(docs("http://g.example/data.7z#corpus/s2.txt") ==
      "sevenz member two text")
    assert(!docs.keys.exists(_.contains("pic.png")),
      "a 7z archive's binary members must contribute nothing")
    // the gz-wrapped PNG and the truncated stream: media blobs only
    assert(WarcSource.media(recs)
      .filter(col("meta.mime") === "application/gzip").count() == 4)
    assert(WarcSource.media(recs)
      .filter(col("meta.mime") === "application/x-tar").count() == 1)
    assert(WarcSource.media(recs)
      .filter(col("meta.mime") === "application/x-7z-compressed")
      .count() == 1)
    recs.unpersist()
  }

  test("streaming quarantine: warcQuarantine mirrors the batch audit face row for row") {
    val dir = writeWebDir()
    val stream = graft.streaming.Streams.warcQuarantine(spark, dir)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory")
      .queryName("warc_quar_stream").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("warc_quar_stream").cache()
      val batch = WarcSource.quarantine(spark, dir).cache()
      assert(got.count() == batch.count(),
        "the streaming audit face must yield exactly the batch rows")
      assert(got.select("doc_id", "reason")
        .except(batch.select("doc_id", "reason")).count() == 0)
      got.unpersist(); batch.unpersist()
    } finally q.stop()
  }

  test("streaming media ingest: warcMedia mirrors the batch media face row for row") {
    val dir = writeWebDir()
    val stream = graft.streaming.Streams.warcMedia(spark, dir)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory")
      .queryName("warc_media_stream").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("warc_media_stream").cache()
      val batch = WarcSource.media(spark, dir).cache()
      assert(got.count() == batch.count(),
        "streaming media must yield exactly the batch face's rows")
      assert(got.select("doc_id").except(batch.select("doc_id")).count() == 0)
      assert(got.filter(col("ts").isNull).count() == 0,
        "media rows must carry the archive mtime as event time")
      assert(got.filter(col("meta.mime") ===
        graft.sources.BinarySource.MimeJpeg).count() == 1,
        "magic routing must hold in the stream too")
      got.unpersist(); batch.unpersist()
    } finally q.stop()
  }

  test("CorpusPrep runs end-to-end from a WARC directory") {
    val dir = writeDir()
    val out = Files.createTempDirectory("graft-warc-corpus").toString + "/corpus"
    val cfg = graft.pipeline.CorpusPrep.Config(
      langRates = Map.empty, defaultRate = 1.0, nShards = 4)
    val stats = graft.pipeline.CorpusPrep.run(
      WarcSource.documents(spark, dir), out, cfg)
    assert(stats.afterSample > 0, s"$stats")
    val outDf = spark.read.parquet(out)
    assert(outDf.filter(col("text").contains("warc ingest parity")).count() >= 1,
      "the crawled HTML page must reach the corpus")
  }

  test("pageMeta face: title/description/canonical/noindex per HTML page, charset-aware; non-pages excluded; streaming mirror") {
    val dir = Files.createTempDirectory("graft-warc-meta").toString
    def resp(uri: String, ct: String, body: Array[Byte]) =
      rec(Seq("WARC-Type" -> "response", "WARC-Target-URI" -> uri,
        "Content-Type" -> "application/http; msgtype=response"),
        httpWrap(ct, body))
    val page = graft.functions.HtmlMeta.write(
      title = "Caf\u00e9 Chronicle", description = "daily caf\u00e9 news",
      canonical = "https://m.example/canonical-page",
      noindex = false, body = "page body text")
    val noidx = graft.functions.HtmlMeta.write(
      title = "Hidden", description = "not for retrieval",
      canonical = "https://m.example/hidden",
      noindex = true, body = "hidden body")
    // latin-1 declared page: the title's accent must decode through
    // the SAME charset path the corpus text takes
    val latinPage = page.getBytes("ISO-8859-1")
    Files.write(Paths.get(dir, "meta.warc"),
      resp("http://m.example/a", "text/html; charset=ISO-8859-1",
        latinPage) ++
        resp("http://m.example/b", "text/html",
          noidx.getBytes("UTF-8")) ++
        // a bare page with NO metadata: one row, all-null fields
        resp("http://m.example/bare", "text/html",
          "<html><body>plain</body></html>".getBytes("UTF-8")) ++
        // non-pages must contribute nothing: media by magic, a PDF
        resp("http://m.example/img", "text/html",
          bytes("P6\n2 2\n255\n") ++ new Array[Byte](12)) ++
        resp("http://m.example/doc.pdf", "application/pdf",
          graft.multimodal.PdfText.write("pdf text")) ++
        // server misconfig: Content-Encoding: gzip over an IDENTITY
        // text body — the coding cannot be undone (content_coding
        // set) but the bytes are a plain page; documents ingests it,
        // so pageMeta must cover it too (the honorNoindex anti-join
        // relies on the two faces gating identically)
        rec(Seq("WARC-Type" -> "response",
          "WARC-Target-URI" -> "http://m.example/misconfig",
          "Content-Type" -> "application/http; msgtype=response"),
          bytes("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
            "Content-Encoding: gzip\r\n\r\n") ++
            graft.functions.HtmlMeta.write("Misconfigured", "d",
              "https://m.example/mc", noindex = true,
              body = "identity body behind a lying coding")
              .getBytes("UTF-8")))
    val recs = WarcSource.records(spark, dir).cache()
    val rows = WarcSource.pageMeta(recs).collect()
      .map(r => r.getAs[String]("url") -> r).toMap
    assert(rows.size == 4, s"got ${rows.keySet}")
    assert(rows("http://m.example/misconfig").getAs[Boolean]("noindex"),
      "a mislabeled-coding identity page must reach pageMeta " +
        "(documents ingests it, so the noindex policy must see it)")
    val a = rows("http://m.example/a")
    assert(a.getAs[String]("title") == "Caf\u00e9 Chronicle",
      "declared latin-1 must decode before the scan")
    assert(a.getAs[String]("canonical") ==
      "https://m.example/canonical-page")
    assert(!a.getAs[Boolean]("noindex"))
    assert(rows("http://m.example/b").getAs[Boolean]("noindex"))
    val bare = rows("http://m.example/bare")
    assert(bare.getAs[String]("title") == null &&
      bare.getAs[String]("canonical") == null)
    // doc_id parity with the documents face: per-page joins are id joins
    val docIds = WarcSource.documents(recs)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(rows.values.forall(r => docIds.contains(
      r.getAs[Long]("doc_id"))),
      "pageMeta doc_ids must match the documents face definition")
    recs.unpersist()
    // the continuous mirror: same rows, archive mtime as ts
    val stream = graft.streaming.Streams.warcPageMeta(spark, dir)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory")
      .queryName("warc_meta_stream").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("warc_meta_stream")
      assert(got.count() == 4)
      assert(got.filter(col("ts").isNull).count() == 0)
      assert(got.filter(col("noindex")).count() == 2)
    } finally q.stop()
  }

  test("sitemapUrls face: urlset + index + .gz entity parse to per-URL rows; non-sitemaps shed nothing; streaming mirror") {
    val dir = Files.createTempDirectory("graft-warc-sitemap").toString
    def resp(uri: String, ct: String, body: Array[Byte]) =
      rec(Seq("WARC-Type" -> "response", "WARC-Target-URI" -> uri,
        "Content-Type" -> "application/http; msgtype=response"),
        httpWrap(ct, body))
    val urlset = graft.functions.Sitemap.write(Seq(
      ("https://f.example/a?x=1&y=2", Some("2024-01-02")),
      ("https://f.example/b", None)))
    val index = graft.functions.Sitemap.write(Seq(
      ("https://f.example/sitemap-news.xml.gz", Some("2024-02-03"))),
      asIndex = true)
    Files.write(Paths.get(dir, "frontier.warc"),
      resp("http://f.example/sitemap.xml", "application/xml",
        urlset.getBytes("UTF-8")) ++
        resp("http://f.example/sitemap.xml.gz", "application/gzip",
          gz(urlset.getBytes("UTF-8"))) ++
        resp("http://f.example/sitemap_index.xml", "text/xml",
          index.getBytes("UTF-8")) ++
        // prose and plain pages shed no frontier rows
        resp("http://f.example/page", "text/html",
          "<html><body>the urlset element is from sitemaps</body></html>"
            .getBytes("UTF-8")) ++
        // TWO sitemap members in ONE served .tar.gz: member rows must
        // carry DISTINCT doc_ids (the documents-face convention) or
        // downstream dedup silently merges the frontiers
        resp("http://f.example/maps.tar.gz", "application/gzip",
          gz(graft.multimodal.Tar.write(Seq(
            ("maps/a.xml", graft.functions.Sitemap.write(Seq(
              ("https://f.example/m1", None))).getBytes("UTF-8")),
            ("maps/b.xml", graft.functions.Sitemap.write(Seq(
              ("https://f.example/m2", None))).getBytes("UTF-8")))))))
    val recs = WarcSource.records(spark, dir).cache()
    val rows = WarcSource.sitemapUrls(recs).collect()
    assert(rows.length == 7, s"got ${rows.length}")
    val tarRows = rows.filter(_.getAs[String]("url").contains("maps.tar.gz"))
    assert(tarRows.length == 2 &&
      tarRows.map(_.getAs[Long]("doc_id")).distinct.length == 2,
      "sitemap members of one archive must carry distinct doc_ids")
    assert(tarRows.map(_.getAs[String]("url")).toSet ==
      Set("http://f.example/maps.tar.gz#maps/a.xml",
        "http://f.example/maps.tar.gz#maps/b.xml"))
    val byUrl = rows.groupBy(_.getAs[String]("url"))
    val plain = byUrl("http://f.example/sitemap.xml")
      .sortBy(_.getAs[Long]("ord"))
    assert(plain.map(_.getAs[String]("loc")).toSeq ==
      Seq("https://f.example/a?x=1&y=2", "https://f.example/b"),
      "entity-escaped locs must decode, order preserved")
    assert(plain(0).getAs[String]("lastmod") == "2024-01-02" &&
      plain(1).getAs[String]("lastmod") == null)
    assert(byUrl("http://f.example/sitemap.xml.gz")
      .map(_.getAs[String]("loc")).toSet ==
      plain.map(_.getAs[String]("loc")).toSet,
      "the .gz entity must parse identically")
    val idx = byUrl("http://f.example/sitemap_index.xml")
    assert(idx.length == 1 && idx(0).getAs[Boolean]("from_index"),
      "index entries carry the from_index flag")
    assert(rows.forall(r => !r.getAs[String]("url").endsWith("/page")))
    assert(rows.forall(r => r.getAs[Boolean]("from_index") ==
      r.getAs[String]("url").contains("index")))
    recs.unpersist()
    // the continuous mirror
    val stream = graft.streaming.Streams.warcSitemapUrls(spark, dir)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory")
      .queryName("warc_sitemap_stream").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("warc_sitemap_stream")
      assert(got.count() == 7)
      assert(got.filter(col("ts").isNull).count() == 0)
    } finally q.stop()
  }

  test("frontierPlan face: discover → canonicalize → police, column-native (no serde boundary), per-host policies, streaming mirror") {
    import graft.functions.expressions.{RobotsAllowed, SitemapEntries}
    import org.apache.spark.sql.catalyst.plans.logical.{DeserializeToObject, SerializeFromObject}
    val dir = Files.createTempDirectory("graft-warc-frontier").toString
    def resp(uri: String, ct: String, body: Array[Byte]) =
      rec(Seq("WARC-Type" -> "response", "WARC-Target-URI" -> uri,
        "Content-Type" -> "application/http; msgtype=response"),
        httpWrap(ct, body))
    val policy =
      """User-agent: graftbot
        |Disallow: /private/
        |Allow: /private/public/
        |Disallow: /*.tmp$
        |Crawl-delay: 1.5
        |
        |User-agent: *
        |Disallow: /
        |""".stripMargin
    val sm = graft.functions.Sitemap.write(Seq(
      // messy-on-purpose: case, www, default port, tracking params —
      // the verdict must run on the NORMALIZED fetch key
      ("https://WWW.F.example:443/private/page?utm_src=a&x=1", None),
      ("https://f.example/private/public/x", None),
      ("https://f.example/cache/f.tmp", None),
      // dropping the tracking param REINSTATES the $ anchor: the
      // listed URL would defeat it, the fetched one does not
      ("https://f.example/cache/g.tmp?utm_z=9", None),
      ("https://g.example/open/page", None),
      // PATHLESS site root (review-caught): RFC 9309 reads "" as "/"
      ("https://site2.example?utm_only=1", None)))
    Files.write(Paths.get(dir, "frontier.warc"),
      resp("http://f.example/sitemap.xml", "application/xml",
        sm.getBytes("UTF-8")))
    val recs = WarcSource.records(spark, dir)
    val fp = WarcSource.frontierPlan(recs, policy, "GraftBot/2.1")
    val rows = fp.collect()
    assert(rows.length == 6)
    val byNorm = rows.map(r => r.getAs[String]("url_norm") ->
      r.getAs[Boolean]("allowed")).toMap
    assert(byNorm == Map(
      "https://f.example/private/page?x=1" -> false,
      "https://f.example/private/public/x" -> true,
      "https://f.example/cache/f.tmp" -> false,
      "https://f.example/cache/g.tmp" -> false,
      "https://g.example/open/page" -> true,
      // graftbot's group has no rule matching "/" -> allowed here;
      // the per-host arm below pins the DENY direction
      // the pathless root canonicalizes WITH the slash since r17
      // (advice fix: the site root must not escape URL-level dedup)
      "https://site2.example/" -> true), s"got $byNorm")
    assert(rows.find(_.getAs[String]("url_norm").endsWith("?x=1"))
      .get.getAs[Long]("n_tracking") == 1L)
    // the politeness RATE rides the plan: graftbot's group declares
    // Crawl-delay 1.5 under the single policy
    assert(rows.forall(r => r.getAs[Double]("crawl_delay") == 1.5),
      "crawl_delay must surface per frontier row")
    assert(rows.forall { r =>
      val n = r.getAs[String]("url_norm")
      r.getAs[String]("host") ==
        (if (n.contains("g.example")) "g.example"
         else if (n.contains("site2.example")) "site2.example"
         else "f.example")
    }, "www./port/case must normalize off the host")
    // the r15 verdict's ask: NO serde boundary in the registered
    // face — the verdict arm is a Catalyst expression, not a typed
    // Dataset.map. The shared archive SOURCE necessarily crosses
    // object space once per FILE (the WARC container parse every
    // face rides); the pin is that the frontier face adds ZERO serde
    // nodes beyond that source
    val lp = fp.queryExecution.optimizedPlan
    def serde(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.collect { case d: DeserializeToObject => d }.size +
        p.collect { case s: SerializeFromObject => s }.size
    assert(serde(lp) == serde(recs.queryExecution.optimizedPlan),
      "frontierPlan must add no object serde beyond the archive source")
    def countExpr(pf: PartialFunction[
        org.apache.spark.sql.catalyst.expressions.Expression, Unit]): Int =
      lp.collect { case p => p.expressions }.flatten
        .map(_.collect(pf).size).sum
    assert(countExpr({ case _: SitemapEntries => () }) == 1,
      "one sitemap extraction per record (the Generate pin)")
    assert(countExpr({ case _: RobotsAllowed => () }) == 1,
      "one robots verdict per URL row")
    // per-host policies: f.example polices, g.example (no row) is
    // allowed — robots is opt-out; site2.example carries DENY-ALL,
    // and its only URL is PATHLESS: the empty fetch path must read
    // as "/" and DENY (the review-caught compliance hole)
    val policies = spark.createDataFrame(Seq(
      ("f.example", policy),
      ("site2.example", "User-agent: *\nDisallow: /\n")))
      .toDF("host", "robots_txt")
    val perHost = WarcSource.frontierPlan(recs, policies, "GraftBot/2.1")
    val phByNorm = perHost.collect().map(r =>
      r.getAs[String]("url_norm") -> r.getAs[Boolean]("allowed")).toMap
    assert(phByNorm == byNorm + ("https://site2.example/" -> false),
      "pathless site root under deny-all must DENY; the rest match " +
        s"the single-policy verdicts: $phByNorm")
    // per-host crawl_delay: f.example's policy declares 1.5; the
    // deny-all and no-policy hosts declare none -> NULL
    perHost.collect().foreach { r =>
      val host = r.getAs[String]("host")
      if (host == "f.example")
        assert(r.getAs[Double]("crawl_delay") == 1.5, r.toString)
      else assert(r.isNullAt(r.fieldIndex("crawl_delay")), r.toString)
    }
    assert(perHost.columns.toSeq == fp.columns.toSeq,
      "both overloads present the same face shape")
    // the continuous mirror inherits verbatim (pure column ops)
    val stream = graft.streaming.Streams.warcFrontierPlan(
      spark, dir, policy, "GraftBot/2.1")
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory")
      .queryName("warc_frontier_stream").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("warc_frontier_stream")
      assert(got.count() == 6)
      assert(got.collect().map(r => r.getAs[String]("url_norm") ->
        r.getAs[Boolean]("allowed")).toMap == byNorm,
        "batch == stream on the frontier face")
      assert(got.filter(col("ts").isNull).count() == 0)
    } finally q.stop()
  }

  test("mediaScrubbed face: EXIF PII strips across containers, ungoverned media pass byte-identical, scrubbed flag bills, streaming mirror") {
    import graft.multimodal.{Exif, Jpeg, Netpbm, Png}
    val dir = Files.createTempDirectory("graft-warc-mediascrub").toString
    def resp(uri: String, ct: String, body: Array[Byte]) =
      rec(Seq("WARC-Type" -> "response", "WARC-Target-URI" -> uri,
        "Content-Type" -> "application/http; msgtype=response"),
        httpWrap(ct, body))
    val img = Netpbm.Image(8, 8, 255, Array.fill[Byte](192)(77))
    val jpegTagged = Exif.write(Jpeg.encode(img), 6,
      Some((37.0, -122.0)), Some("cam"), Some("2024:01:01 00:00:00"))
    val pngTagged = Exif.writePng(Png.encode(img), 3, Some((1.0, 2.0)),
      Some("pcam"), None)
    val cleanJpeg = Jpeg.encode(img) // nothing to scrub — bills false
    val gif = graft.multimodal.Gif.encode(img) // ungoverned container
    // GOVERNED but malformed (review-caught hole): JPEG magic with an
    // intact EXIF block cut mid-grammar — the scrub cannot run, so
    // the store must NOT keep the bytes (payload nulls, fenced bills)
    val brokenJpeg = java.util.Arrays.copyOfRange(jpegTagged, 0, 40)
    Files.write(Paths.get(dir, "m.warc"),
      resp("http://m.example/a.jpg", "image/jpeg", jpegTagged) ++
        resp("http://m.example/b.png", "image/png", pngTagged) ++
        resp("http://m.example/c.jpg", "image/jpeg", cleanJpeg) ++
        resp("http://m.example/d.gif", "image/gif", gif) ++
        resp("http://m.example/e.jpg", "image/jpeg", brokenJpeg))
    val recs = WarcSource.records(spark, dir)
    val rows = WarcSource.mediaScrubbed(recs).collect()
    assert(rows.length == 5)
    val byUrl = rows.map(r => r.getAs[org.apache.spark.sql.Row]("meta")
      .getAs[String]("url") -> r).toMap
    val scrubbedJpeg = byUrl("http://m.example/a.jpg")
    assert(scrubbedJpeg.getAs[Boolean]("scrubbed"))
    assert(Exif.parse(scrubbedJpeg.getAs[Array[Byte]]("payload")).isEmpty,
      "stored payload must carry no EXIF")
    assert(byUrl("http://m.example/b.png").getAs[Boolean]("scrubbed"))
    assert(Exif.parse(
      byUrl("http://m.example/b.png").getAs[Array[Byte]]("payload")).isEmpty)
    assert(!byUrl("http://m.example/c.jpg").getAs[Boolean]("scrubbed"),
      "an already-clean JPEG must bill nothing")
    assert(byUrl("http://m.example/c.jpg").getAs[Array[Byte]]("payload")
      .toSeq == cleanJpeg.toSeq)
    assert(!byUrl("http://m.example/d.gif").getAs[Boolean]("scrubbed"),
      "an ungoverned container passes through")
    assert(byUrl("http://m.example/d.gif").getAs[Array[Byte]]("payload")
      .toSeq == gif.toSeq)
    assert(!byUrl("http://m.example/d.gif").getAs[Boolean]("fenced"))
    val broken = byUrl("http://m.example/e.jpg")
    assert(broken.getAs[Boolean]("fenced") &&
      !broken.getAs[Boolean]("scrubbed"),
      "governed-but-malformed must bill as fenced")
    assert(broken.getAs[Array[Byte]]("payload") == null,
      "a payload the scrub could not govern must not be stored")
    assert(rows.count(_.getAs[Boolean]("fenced")) == 1)
    // meta stays the ORIGINAL fetch's evidence: checksum of the
    // tagged bytes, not the scrubbed ones
    assert(scrubbedJpeg.getAs[org.apache.spark.sql.Row]("meta")
      .getAs[Long]("n_bytes") == jpegTagged.length.toLong)
    // one strip per row in the optimized plan (the Generate pin)
    val lp = WarcSource.mediaScrubbed(recs).queryExecution.optimizedPlan
    val nStrip = lp.collect { case p => p.expressions }.flatten
      .map(_.collect {
        case _: graft.functions.expressions.ExifScrub => () }.size).sum
    assert(nStrip == 1, s"expected ONE ExifScrub node, got $nStrip")
    // streaming mirror
    val stream = graft.streaming.Streams.warcMediaScrubbed(spark, dir)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory")
      .queryName("warc_mediascrub_stream").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("warc_mediascrub_stream").collect()
      assert(got.length == 5)
      assert(got.count(_.getAs[Boolean]("scrubbed")) == 2,
        "streaming bills the same two scrubs")
      assert(got.count(_.getAs[Boolean]("fenced")) == 1,
        "streaming bills the same fence")
      assert(got.forall(r => r.getAs[java.sql.Timestamp]("ts") != null))
    } finally q.stop()
  }

  test("honorNoindex streaming: inline gate == batch pageMeta anti-join, noindex flip mid-stream honored per fetch, graft_noindex metric bills drops") {
    val dir = Files.createTempDirectory("graft-warc-noindex").toString
    def resp(uri: String, ct: String, body: Array[Byte]) =
      rec(Seq("WARC-Type" -> "response", "WARC-Target-URI" -> uri,
        "Content-Type" -> "application/http; msgtype=response"),
        httpWrap(ct, body))
    def page(noindex: Boolean, text: String) =
      graft.functions.HtmlMeta.write("T", "D", "/c",
        noindex = noindex, body = text).getBytes("UTF-8")
    // archive 1: A declares noindex, B does not; a WET conversion
    // whose text CONTAINS noindex markup (no page authority — must
    // survive); a gzip-SERVED page with noindex (sniffs gzip, so the
    // pageMeta face never covers it — the anti-join keeps it, the
    // inline gate must too)
    Files.write(Paths.get(dir, "a1.warc"),
      resp("http://n.example/A", "text/html",
        page(noindex = true, "page A first fetch")) ++
        resp("http://n.example/B", "text/html",
          page(noindex = false, "page B stays")) ++
        rec(Seq("WARC-Type" -> "conversion",
          "WARC-Target-URI" -> "http://n.example/wet",
          "Content-Type" -> "text/plain"),
          page(noindex = true, "wet body")) ++
        resp("http://n.example/gz", "application/gzip",
          gz(page(noindex = true, "gz-served page"))))
    // archive 2: A FLIPS to indexable (per-fetch authority — the
    // batch anti-join keys doc_ids, so only archive 1's A drops);
    // C is fresh noindex
    Files.write(Paths.get(dir, "a2.warc"),
      resp("http://n.example/A", "text/html",
        page(noindex = false, "page A second fetch")) ++
        resp("http://n.example/C", "text/html",
          page(noindex = true, "page C is noindex")))
    val recs = WarcSource.records(spark, dir)
    // the batch reference: runFromWarc's device — anti-join against
    // the pageMeta face's noindex ids
    val noindexIds = WarcSource.pageMeta(recs).filter(col("noindex"))
      .select(col("doc_id"))
    val batchGated = WarcSource.documents(recs)
      .join(noindexIds, Seq("doc_id"), "left_anti")
    val wantIds = batchGated.collect().map(_.getAs[Long]("doc_id")).sorted
    val wantTexts = batchGated.collect()
      .map(_.getAs[String]("text")).sorted
    assert(wantTexts.exists(_.contains("page A second fetch")) &&
      !wantTexts.exists(_ == "page A first fetch"),
      "the flip must be honored per fetch")
    assert(wantTexts.exists(_.contains("wet body")),
      "WET text has no page authority")
    assert(wantTexts.exists(_.contains("gz-served page")),
      "gz-served pages are outside the pageMeta face")
    // the inline gate must reproduce the anti-join doc for doc
    val inlineGated = WarcSource.documents(recs, honorNoindex = true)
    assert(inlineGated.collect().map(_.getAs[Long]("doc_id")).sorted
      .toSeq == wantIds.toSeq,
      "inline gate != batch anti-join")
    val droppedN = WarcSource.documents(recs).count() - wantIds.length
    assert(droppedN == 2L, s"fixture drifted: $droppedN") // A@a1 + C@a2
    // streaming mirror + the observed billing metric
    val stream = graft.streaming.Streams.warcDocuments(
      spark, dir, honorNoindex = true)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory")
      .queryName("warc_noindex_stream").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("warc_noindex_stream")
      assert(got.collect().map(_.getAs[Long]("doc_id")).sorted.toSeq ==
        wantIds.toSeq, "streaming != batch under honorNoindex")
      val billed = q.recentProgress
        .flatMap(p => Option(p.observedMetrics.get("graft_noindex")))
        .map(_.getAs[Long]("noindexDropped")).sum
      assert(billed == droppedN,
        s"graft_noindex billed $billed, dropped $droppedN")
    } finally q.stop()
  }

  test("plan shape: pdf/office/pageMeta extractions survive optimization as ONE node each (filters stay above the Generate)") {
    import graft.functions.expressions.{HtmlMetaExtract, OfficeExtractText, PdfExtractText}
    val dir = Files.createTempDirectory("graft-warc-planshape").toString
    def resp(uri: String, ct: String, body: Array[Byte]) =
      rec(Seq("WARC-Type" -> "response", "WARC-Target-URI" -> uri,
        "Content-Type" -> "application/http; msgtype=response"),
        httpWrap(ct, body))
    Files.write(Paths.get(dir, "one.warc"),
      resp("http://s.example/d.pdf", "application/pdf",
        graft.multimodal.PdfText.write("plan shape pdf")) ++
        resp("http://s.example/d.docx", "application/zip",
          graft.multimodal.Docx.write("plan shape docx")) ++
        resp("http://s.example/p", "text/html",
          graft.functions.HtmlMeta.write("T", "D", "/c",
            noindex = false, body = "b").getBytes("UTF-8")))
    val recs = WarcSource.records(spark, dir)
    def countExpr(df: org.apache.spark.sql.DataFrame,
                  pf: PartialFunction[
                    org.apache.spark.sql.catalyst.expressions.Expression,
                    Unit]): Int =
      df.queryExecution.optimizedPlan
        .collect { case p => p.expressions }.flatten
        .map(_.collect(pf).size).sum
    assert(countExpr(WarcSource.pdfDocuments(recs),
      { case _: PdfExtractText => () }) == 1,
      "a filter pushed below the Generate re-runs the PDF parse per row")
    assert(countExpr(WarcSource.officeDocuments(recs),
      { case _: OfficeExtractText => () }) == 1,
      "a filter pushed below the Generate re-runs the office walk per row")
    assert(countExpr(WarcSource.pageMeta(recs),
      { case _: HtmlMetaExtract => () }) == 1,
      "field accesses after the Generate must not replicate the scan")
  }
}
