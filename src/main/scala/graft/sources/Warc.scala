package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

/** Pure-JVM WARC reader/writer (ISO 28500 / the public WARC 1.0 spec —
  * the container format Common Crawl ships, and the WET "conversion"
  * record layout is exactly what a pretraining ingest reads). Uncompressed
  * records only; a gzip member (the per-record compression CC uses at
  * rest) fails loudly rather than half-parsing.
  *
  * Grammar enforced strictly, in the codec family's fail-loudly
  * discipline (see Pdf/Docx/Png): version line `WARC/1.0` CRLF, CRLF
  * header lines `Name: value` until an empty line, exactly
  * `Content-Length` payload bytes, then the mandatory `\r\n\r\n` record
  * terminator. Any deviation — truncation, missing terminator, a header
  * without a colon, a length that overruns the buffer — throws with the
  * byte offset, never returns a partial record set.
  */
object Warc {

  private val Crlf = "\r\n"

  /** One WARC record; `payload` is the raw content block. */
  case class Record(
      warcType: String,
      recordId: String,
      targetUri: String, // empty when absent (e.g. warcinfo)
      date: String,
      payload: Array[Byte])

  def encode(records: Seq[Record]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      val hdr = new StringBuilder()
      hdr ++= "WARC/1.0" ++= Crlf
      hdr ++= s"WARC-Type: ${r.warcType}" ++= Crlf
      hdr ++= s"WARC-Record-ID: ${r.recordId}" ++= Crlf
      hdr ++= s"WARC-Date: ${r.date}" ++= Crlf
      if (r.targetUri.nonEmpty) hdr ++= s"WARC-Target-URI: ${r.targetUri}" ++= Crlf
      hdr ++= s"Content-Length: ${r.payload.length}" ++= Crlf
      hdr ++= Crlf
      out.write(hdr.toString.getBytes(UTF_8))
      out.write(r.payload)
      out.write((Crlf + Crlf).getBytes(UTF_8))
    }
    out.toByteArray
  }

  def decode(bytes: Array[Byte]): Vector[Record] = {
    require(bytes != null && bytes.nonEmpty, "WARC: empty input")
    require(!(bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b),
      "WARC: gzip member — compressed WARC not supported, decompress upstream")
    val records = Vector.newBuilder[Record]
    var pos = 0
    def readLine(): String = {
      val start = pos
      while (pos + 1 < bytes.length && !(bytes(pos) == '\r' && bytes(pos + 1) == '\n')) pos += 1
      require(pos + 1 < bytes.length, s"WARC: unterminated line at offset $start")
      val s = new String(bytes, start, pos - start, UTF_8)
      pos += 2
      s
    }
    while (pos < bytes.length) {
      val at = pos
      val version = readLine()
      require(version == "WARC/1.0", s"WARC: bad version line '$version' at offset $at")
      var headers = Map.empty[String, String]
      var line = readLine()
      while (line.nonEmpty) {
        val i = line.indexOf(':')
        // a field-name is token chars only (ISO 28500) — a space before
        // the first colon means the colon we found belongs to the VALUE
        // (e.g. a timestamp) and the real separator is missing
        require(i > 0 && !line.substring(0, i).exists(c => c == ' ' || c == '\t'),
          s"WARC: malformed header '$line' at offset $at")
        val name = line.substring(0, i).trim
        // a duplicated field name is the same corruption class as a
        // malformed header — reject rather than silently last-win
        require(!headers.contains(name),
          s"WARC: duplicate header '$name' in record at offset $at")
        headers += (name -> line.substring(i + 1).trim)
        line = readLine()
      }
      // parse as Long first: a >2 GiB declared length must fail the
      // bounds check loudly, not wrap negative through toInt. The
      // buffer-size bound comes BEFORE the sum so a length near
      // Long.MaxValue cannot overflow pos + len + 4 and sneak past
      // (Arrays.copyOfRange would then zero-pad gigabytes from thin air)
      val lenRaw = headers.getOrElse("Content-Length",
        sys.error(s"WARC: record at offset $at has no Content-Length"))
      val lenL =
        try lenRaw.toLong
        catch { case _: NumberFormatException => sys.error(
          s"WARC: non-numeric Content-Length '$lenRaw' in record at offset $at") }
      require(lenL >= 0 && lenL <= bytes.length &&
        pos.toLong + lenL + 4 <= bytes.length,
        s"WARC: payload of $lenL bytes overruns buffer at offset $pos")
      val len = lenL.toInt
      val payload = java.util.Arrays.copyOfRange(bytes, pos, pos + len)
      pos += len
      require(bytes(pos) == '\r' && bytes(pos + 1) == '\n' &&
        bytes(pos + 2) == '\r' && bytes(pos + 3) == '\n',
        s"WARC: missing record terminator at offset $pos")
      pos += 4
      records += Record(
        headers.getOrElse("WARC-Type", sys.error(s"WARC: record at $at has no WARC-Type")),
        headers.getOrElse("WARC-Record-ID", ""),
        headers.getOrElse("WARC-Target-URI", ""),
        headers.getOrElse("WARC-Date", ""),
        payload)
    }
    records.result()
  }

  // ---- HTTP response payloads (the Common Crawl response-record shape) ----

  private val Iso = java.nio.charset.StandardCharsets.ISO_8859_1

  /** Wrap a body as the HTTP/1.1 response a crawler stored on the wire
    * (RFC 9112): status line + headers + CRLFCRLF + framed body.
    * `framing`: 0 = identity + Content-Length; 1 = Transfer-Encoding
    * chunked (hex size lines, 500-byte chunks, zero-terminator); 2 =
    * Content-Encoding gzip + Content-Length; 3 = chunked OVER gzip —
    * the four wire shapes a WET conversion must unwrap. */
  private[graft] def httpWrap(body: Array[Byte], framing: Int): Array[Byte] = {
    require(framing >= 0 && framing <= 3, s"httpWrap: unknown framing $framing")
    val encoded =
      if (framing == 2 || framing == 3) {
        val bos = new java.io.ByteArrayOutputStream()
        val gz = new java.util.zip.GZIPOutputStream(bos)
        gz.write(body); gz.close()
        bos.toByteArray
      } else body
    val chunked = framing == 1 || framing == 3
    val framed =
      if (!chunked) encoded
      else {
        val out = new java.io.ByteArrayOutputStream()
        encoded.grouped(500).foreach { c =>
          out.write(s"${c.length.toHexString}\r\n".getBytes(Iso))
          out.write(c); out.write("\r\n".getBytes(Iso))
        }
        out.write("0\r\n\r\n".getBytes(Iso))
        out.toByteArray
      }
    val hdr = new StringBuilder("HTTP/1.1 200 OK\r\n")
      .append("Content-Type: text/html; charset=utf-8\r\n")
    if (framing == 2 || framing == 3) hdr.append("Content-Encoding: gzip\r\n")
    if (chunked) hdr.append("Transfer-Encoding: chunked\r\n")
    else hdr.append(s"Content-Length: ${framed.length}\r\n")
    hdr.append("\r\n")
    hdr.toString.getBytes(Iso) ++ framed
  }

  /** Unwrap an HTTP response payload to its entity body: parse the
    * status line + headers, de-chunk if `Transfer-Encoding: chunked`,
    * gunzip/inflate if `Content-Encoding` says so. A payload that does
    * not start with `HTTP/` passes through unchanged (metadata /
    * resource / legacy raw records); a MALFORMED HTTP response (no
    * header terminator, bad chunk framing, unknown encodings) throws
    * loudly — silently treating headers as text would poison a corpus. */
  private[graft] def httpBody(payload: Array[Byte]): Array[Byte] = {
    if (payload.length < 5 ||
        new String(payload, 0, 5, Iso) != "HTTP/") return payload
    var sep = -1
    var i = 0
    while (sep < 0 && i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n') sep = i
      i += 1
    }
    require(sep >= 0, "HTTP: response without header terminator")
    val headerSeq = new String(payload, 0, sep, Iso).split("\r\n").drop(1)
      .map { l =>
        val c = l.indexOf(':')
        require(c > 0, s"HTTP: malformed header line '$l'")
        l.substring(0, c).trim.toLowerCase -> l.substring(c + 1).trim
      }.toSeq
    // duplicated FRAMING headers are the classic smuggling/corruption
    // shape — reject those, same discipline as the WARC header parser
    // above. Non-framing repeats (Set-Cookie, Via, ...) are legal and
    // ubiquitous on the real wire (RFC 9110 §5.3) — pass them through.
    val framing = Set("transfer-encoding", "content-length", "content-encoding")
    val dups = headerSeq.groupBy(_._1)
      .filter { case (k, vs) => framing(k) && vs.length > 1 }.keys
    require(dups.isEmpty, s"HTTP: duplicate framing header(s) ${dups.mkString(", ")}")
    val headers = headerSeq.toMap
    var body = java.util.Arrays.copyOfRange(payload, sep + 4, payload.length)
    // only the chunked transfer coding exists in practice; anything else
    // (or a compound list) would leave transfer-coded bytes in the body —
    // throw rather than hand compressed framing to the corpus
    val te = headers.get("transfer-encoding").map(_.trim.toLowerCase)
    require(te.forall(t => t == "chunked" || t == "identity"),
      s"HTTP: unsupported Transfer-Encoding '${te.get}'")
    if (te.contains("chunked")) {
      val out = new java.io.ByteArrayOutputStream()
      var p = 0
      var done = false
      while (!done) {
        var e = p
        while (e + 1 < body.length && !(body(e) == '\r' && body(e + 1) == '\n')) e += 1
        require(e + 1 < body.length, "HTTP: chunk size line without CRLF")
        val sizeLine = new String(body, p, e - p, Iso)
        val semi = sizeLine.indexOf(';') // chunk extensions are ignored
        val size = Integer.parseInt(
          (if (semi >= 0) sizeLine.substring(0, semi) else sizeLine).trim, 16)
        p = e + 2
        if (size == 0) done = true // trailers, if any, are discarded
        else {
          require(p + size + 2 <= body.length, "HTTP: chunk overruns payload")
          out.write(body, p, size)
          require(body(p + size) == '\r' && body(p + size + 1) == '\n',
            "HTTP: chunk data without CRLF terminator")
          p = p + size + 2
        }
      }
      body = out.toByteArray
    } else headers.get("content-length").foreach { cl =>
      val n = cl.toInt
      require(n <= body.length, "HTTP: Content-Length overruns payload")
      body = java.util.Arrays.copyOfRange(body, 0, n)
    }
    headers.get("content-encoding").map(_.toLowerCase) match {
      case None | Some("identity") => body
      case Some("gzip") | Some("x-gzip") =>
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(body))
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      case Some(other) =>
        throw new IllegalArgumentException(s"HTTP: unsupported Content-Encoding '$other'")
    }
  }
}
