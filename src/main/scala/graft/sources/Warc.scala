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
}
