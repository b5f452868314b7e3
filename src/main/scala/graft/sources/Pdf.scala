package graft.sources

import java.nio.charset.StandardCharsets.ISO_8859_1

/** Real PDF text codec for the uncompressed-stream subset, pure JVM.
  *
  * The reference walks PDF pages with PyMuPDF and concatenates page text
  * in order (app.py:123-132). This codec reproduces that contract from
  * raw bytes: the writer emits standards-shaped PDFs (header, catalog →
  * page tree → per-page uncompressed content streams with BT/Tj/ET text
  * operators, byte-exact xref table, trailer); the reader walks the
  * object graph the way a conformant viewer does — trailer /Root →
  * catalog /Pages → /Kids in declared order → each page's /Contents —
  * and tokenizes the content stream's text-showing operators (Tj and TJ,
  * with full PDF string-escape handling: \\( \\) \\\\ \\n octal codes,
  * line continuations).
  *
  * Content streams may be stored raw or filtered. Supported filters
  * (ISO 32000 §7.4): `/FlateDecode` (zlib — the filter virtually every
  * real-world PDF applies; same inflate discipline as the PNG codec's
  * IDAT path), `/LZWDecode` (TIFF-convention LZW: 9→12-bit codes packed
  * MSB-first, 256 clear / 257 EOD, `/EarlyChange` honored — common in
  * pre-2000 PDFs and some generators), the ASCII transport filters
  * `/ASCIIHexDecode` and `/ASCII85Decode` standalone, and 2-element
  * chains of an ASCII transport filter followed by a compression filter
  * (`[/ASCII85Decode /FlateDecode]` et al — the classic 7-bit-safe
  * shape). Flate/LZW streams may additionally declare `/DecodeParms`
  * with a `/Predictor` (§7.4.4.4): 1 (none), 2 (TIFF horizontal
  * differencing), and 10-15 (PNG row filters — delegated to the SAME
  * per-row unfilter the PNG codec uses, since the PDF spec defines them
  * as exactly PNG's filters) are all decoded, at 8 bits per component.
  * The PDF 1.5+ packing is supported too: `/Type /ObjStm` object
  * streams are expanded into the object map (member bodies located via
  * the /N pair header and /First), and the writer can emit the full
  * modern shape — objects in an ObjStm plus a binary `/Type /XRef`
  * cross-reference STREAM (`/W [ 1 4 2 ]` rows, PNG-Up predictor) in
  * place of the classic xref table (§7.5.7-§7.5.8).
  *
  * Scope beyond that is declared LOUDLY, not silently: any other /Filter
  * (DCTDecode, JBIG2, RunLength, crypt filters), chain shape, predictor
  * value, or BitsPerComponent, a non-flat /DecodeParms, a malformed
  * ObjStm header, a missing page tree, or an unbalanced string throws —
  * at lake scale a half-extracted PDF is corpus poison (same contract
  * as the WAV and DOCX codecs). PDF bytes are treated as Latin-1 so
  * byte offsets equal char offsets (the corpus payloads are ASCII;
  * compressed stream bytes round trip 0-255 exactly under Latin-1). */
object Pdf {

  private[graft] def isPdf(bytes: Array[Byte]): Boolean =
    bytes.length >= 5 && new String(bytes, 0, 5, ISO_8859_1) == "%PDF-"

  private def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '('  => sb.append("\\(")
      case ')'  => sb.append("\\)")
      case c    => sb.append(c)
    }
    sb.toString
  }

  /** One PDF, one page per element of `pages`. Object layout: 1 catalog,
    * 2 page tree, 3 font, then (page, contents) object pairs. The xref
    * offsets are computed from the actual emitted bytes — a conformant
    * reader can resolve every object through the table. With
    * `compress = true` each content stream is written
    * `/Filter /FlateDecode` (the real-world shape; /Length is the
    * COMPRESSED byte count, per spec). `predictor` additionally wraps the
    * stream bytes before deflate — 2 (TIFF) or 10-15 (PNG row filters,
    * rows of `columns` bytes cycling all five filter types) — and
    * declares matching `/DecodeParms`, the second-most-common real-world
    * Flate shape after plain. `filterChain` picks the stream encoding:
    * a single compression filter (`FlateDecode` default, or `LZWDecode`)
    * optionally preceded by one ASCII transport filter (`ASCIIHexDecode`
    * / `ASCII85Decode`) — written as a `/Filter [ ... ]` array in the
    * decoder's application order, per ISO 32000 §7.4.1. A predictor
    * requires a single-filter chain so the flat /DecodeParms dict
    * unambiguously belongs to the compression filter. */
  private[graft] def encode(pages: Seq[String], compress: Boolean = false,
                            predictor: Int = 1, columns: Int = 16,
                            filterChain: Seq[String] = Seq("FlateDecode")): Array[Byte] = {
    require(filterChain.nonEmpty && Set("FlateDecode", "LZWDecode").contains(filterChain.last),
      s"unsupported filter chain ${filterChain.mkString("[", " ", "]")}: " +
        "must end in FlateDecode or LZWDecode")
    require(filterChain.init.isEmpty ||
      (filterChain.length == 2 &&
        Set("ASCIIHexDecode", "ASCII85Decode").contains(filterChain.head)),
      s"unsupported filter chain ${filterChain.mkString("[", " ", "]")}: " +
        "only a single ASCIIHex/ASCII85 transport prefix is supported")
    require(predictor == 1 || filterChain.length == 1,
      "a predictor requires a single-filter chain (flat /DecodeParms)")
    val sb = new StringBuilder
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    def obj(body: String): Unit = {
      offsets += sb.length
      sb.append(s"${offsets.length} 0 obj\n").append(body).append("\nendobj\n")
    }
    sb.append("%PDF-1.4\n")
    val kids = pages.indices.map(i => s"${4 + 2 * i} 0 R").mkString(" ")
    obj("<< /Type /Catalog /Pages 2 0 R >>")
    obj(s"<< /Type /Pages /Kids [ $kids ] /Count ${pages.length} >>")
    obj("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    pages.zipWithIndex.foreach { case (text, i) =>
      obj(s"<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
        s"/Resources << /Font << /F1 3 0 R >> >> /Contents ${5 + 2 * i} 0 R >>")
      val stream = s"BT /F1 12 Tf 72 720 Td (${escape(text)}) Tj ET"
      if (compress) {
        val raw = stream.getBytes(ISO_8859_1)
        val (payload, parms) = predictor match {
          case 1 => (raw, "")
          case 2 => (tiffPredict(raw, columns),
            s" /DecodeParms << /Predictor 2 /Columns $columns >>")
          case p if p >= 10 && p <= 15 =>
            // rows cycle all five PNG filter types so one decode
            // exercises every unfilter path (the PNG encoder discipline)
            (Png.filterRows(raw, columns, 1, _ % 5),
              s" /DecodeParms << /Predictor $p /Columns $columns >>")
          case p => throw new IllegalArgumentException(
            s"unsupported predictor $p: 1, 2, or 10-15")
        }
        val compressed = filterChain.last match {
          case "FlateDecode" => deflate(payload)
          case "LZWDecode"   => lzwEncode(payload)
        }
        val wrapped = filterChain.init match {
          case Seq()                 => compressed
          case Seq("ASCIIHexDecode") => asciiHexEncode(compressed)
          case Seq("ASCII85Decode")  => ascii85Encode(compressed)
        }
        val filterDecl =
          if (filterChain.length == 1) s"/Filter /${filterChain.head}"
          else filterChain.map("/" + _).mkString("/Filter [ ", " ", " ]")
        // Latin-1 round trips bytes 0-255 exactly, so the binary stream
        // output can ride the same StringBuilder as the text objects
        val comp = new String(wrapped, ISO_8859_1)
        obj(s"<< /Length ${comp.length} $filterDecl$parms >>\n" +
          s"stream\n$comp\nendstream")
      } else {
        require(predictor == 1, "a predictor requires compress = true")
        obj(s"<< /Length ${stream.length} >>\nstream\n$stream\nendstream")
      }
    }
    val xrefOff = sb.length
    sb.append(s"xref\n0 ${offsets.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R >>\n")
    sb.append(s"startxref\n$xrefOff\n%%EOF\n")
    sb.toString.getBytes(ISO_8859_1)
  }

  /** PDF 1.5+ shape (ISO 32000 §7.5.7-§7.5.8): non-stream objects packed
    * into a `/Type /ObjStm` object stream, and the cross-reference TABLE
    * replaced by a `/Type /XRef` cross-reference STREAM — binary
    * `/W [ 1 4 2 ]` rows, PNG-Up predictor-wrapped when `xrefPredictor`
    * (the shape modern generators write; reuses the same §7.4.4.4
    * predictor machinery as content streams). Stream objects may not
    * live inside an ObjStm, so content streams stay top-level
    * (FlateDecode). Object layout: 1 = the ObjStm; embedded in it:
    * 2 catalog, 3 page tree, 4 font, 5..4+P page dicts; top-level
    * 5+P..4+2P content streams; 5+2P = the XRef stream, whose dict
    * carries /Root (there is no `trailer` keyword in this shape). */
  private[graft] def encodeObjStm(pages: Seq[String],
                                  xrefPredictor: Boolean = true): Array[Byte] = {
    val P = pages.length
    require(P > 0, "encodeObjStm: at least one page")
    val embedded: Seq[(Int, String)] =
      Seq(
        2 -> "<< /Type /Catalog /Pages 3 0 R >>",
        3 -> (s"<< /Type /Pages /Kids [ ${(0 until P).map(i => s"${5 + i} 0 R").mkString(" ")} ] " +
          s"/Count $P >>"),
        4 -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>") ++
        (0 until P).map { i =>
          (5 + i) -> (s"<< /Type /Page /Parent 3 0 R /MediaBox [ 0 0 612 792 ] " +
            s"/Resources << /Font << /F1 4 0 R >> >> /Contents ${5 + P + i} 0 R >>")
        }
    val bodies = embedded.map(_._2 + "\n")
    val offs = bodies.scanLeft(0)(_ + _.length).init
    val header = embedded.map(_._1).zip(offs)
      .map { case (id, o) => s"$id $o" }.mkString("", " ", "\n")
    val first = header.length
    val objStmComp = new String(deflate((header + bodies.mkString).getBytes(ISO_8859_1)), ISO_8859_1)

    val sb = new StringBuilder
    val topOffsets = scala.collection.mutable.Map[Int, Int]()
    def obj(id: Int, body: String): Unit = {
      topOffsets(id) = sb.length
      sb.append(s"$id 0 obj\n").append(body).append("\nendobj\n")
    }
    sb.append("%PDF-1.5\n")
    obj(1, s"<< /Type /ObjStm /N ${embedded.length} /First $first " +
      s"/Length ${objStmComp.length} /Filter /FlateDecode >>\nstream\n$objStmComp\nendstream")
    pages.zipWithIndex.foreach { case (text, i) =>
      val stream = s"BT /F1 12 Tf 72 720 Td (${escape(text)}) Tj ET"
      val c = new String(deflate(stream.getBytes(ISO_8859_1)), ISO_8859_1)
      obj(5 + P + i,
        s"<< /Length ${c.length} /Filter /FlateDecode >>\nstream\n$c\nendstream")
    }
    val xrefId = 5 + 2 * P
    val size = xrefId + 1
    val xrefOff = sb.length
    // /W [ 1 4 2 ]: 7-byte rows — type, 4-byte BE field2, 2-byte BE field3
    val rows = new Array[Byte](size * 7)
    def row(id: Int, tpe: Int, f2: Long, f3: Int): Unit = {
      val b = id * 7
      rows(b) = tpe.toByte
      rows(b + 1) = ((f2 >> 24) & 0xFF).toByte; rows(b + 2) = ((f2 >> 16) & 0xFF).toByte
      rows(b + 3) = ((f2 >> 8) & 0xFF).toByte; rows(b + 4) = (f2 & 0xFF).toByte
      rows(b + 5) = ((f3 >> 8) & 0xFF).toByte; rows(b + 6) = (f3 & 0xFF).toByte
    }
    row(0, 0, 0L, 0xFFFF)                       // the free-list head
    row(1, 1, topOffsets(1).toLong, 0)          // the ObjStm itself
    embedded.map(_._1).zipWithIndex.foreach { case (id, j) =>
      row(id, 2, 1L, j)                         // type 2: (objstm 1, index j)
    }
    (0 until P).foreach(i => row(5 + P + i, 1, topOffsets(5 + P + i).toLong, 0))
    row(xrefId, 1, xrefOff.toLong, 0)
    val (xrefData, xrefParms) =
      if (xrefPredictor)
        (Png.filterRows(rows, 7, 1, _ => 2), // PNG Up — predictor 12's classic shape
          " /DecodeParms << /Predictor 12 /Columns 7 >>")
      else (rows, "")
    val xrefComp = new String(deflate(xrefData), ISO_8859_1)
    obj(xrefId, s"<< /Type /XRef /Size $size /W [ 1 4 2 ] /Root 2 0 R " +
      s"/Length ${xrefComp.length} /Filter /FlateDecode$xrefParms >>\nstream\n$xrefComp\nendstream")
    sb.append(s"startxref\n$xrefOff\n%%EOF\n")
    sb.toString.getBytes(ISO_8859_1)
  }

  // --- reader -----------------------------------------------------------

  private val hdrPat = java.util.regex.Pattern.compile("(\\d+)\\s+0\\s+obj\\b")
  private val refPat = java.util.regex.Pattern.compile("(\\d+)\\s+0\\s+R")
  private val lenPat = java.util.regex.Pattern.compile("/Length\\s+(\\d+)")
  // /Filter value: a single name or a (possibly 1-element) array of names
  private val filterPat =
    java.util.regex.Pattern.compile("/Filter\\s*(\\[[^\\]]*\\]|/[A-Za-z0-9]+)")
  private val namePat = java.util.regex.Pattern.compile("/([A-Za-z0-9]+)")

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** zlib inflate with UNKNOWN output size (PDF's /Length is the
    * compressed count — unlike PNG there is no declared raw size). */
  private def inflate(comp: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater
    inf.setInput(comp)
    val out = new java.io.ByteArrayOutputStream(comp.length * 4 + 64)
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val got = inf.inflate(buf)
      require(got > 0 || inf.finished(),
        "corrupt PDF: FlateDecode stream truncated or malformed")
      out.write(buf, 0, got)
    }
    inf.end()
    out.toByteArray
  }

  // --- LZWDecode (ISO 32000 §7.4.4.2: TIFF-convention LZW) --------------

  /** PDF LZW: 9→12-bit codes packed MSB-first; 256 = clear-table, 257 =
    * EOD, first dictionary slot 258. With /EarlyChange 1 (the default)
    * the code width grows one slot early. The encoder emits a leading
    * clear, resets the table when it would overflow slot 4095, and grows
    * its write width one slot LATER than the decoder grows its read
    * width — the decoder's table add for code i happens one code behind
    * the encoder's (the classic TIFF-LZW off-by-one; getting it wrong
    * desynchronizes every code after slot 510). */
  private[graft] def lzwEncode(raw: Array[Byte], earlyChange: Int = 1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    var bitBuf = 0L; var nBits = 0; var width = 9
    def put(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code; nBits += width
      while (nBits >= 8) { out.write(((bitBuf >> (nBits - 8)) & 0xFF).toInt); nBits -= 8 }
    }
    // sequences keyed as (prefixCode << 8 | nextByte) — every table entry
    // is a known prefix plus one byte, so the key space is exact
    val dict = new java.util.HashMap[Integer, Integer](4096)
    var next = 258
    put(256)
    var w = -1
    raw.foreach { b =>
      val k = b & 0xFF
      if (w < 0) w = k
      else {
        val key = (w << 8) | k
        val hit = dict.get(key)
        if (hit != null) w = hit
        else {
          put(w)
          if (next + earlyChange >= 4096) { // table full: clear and restart
            put(256); dict.clear(); next = 258; width = 9
          } else {
            dict.put(key, next); next += 1
            // encoder grows when next EXCEEDS 2^width (one slot after the
            // decoder, whose adds lag one code behind)
            if (next + earlyChange > (1 << width) && width < 12) width += 1
          }
          w = k
        }
      }
    }
    if (w >= 0) put(w)
    put(257)
    if (nBits > 0) out.write(((bitBuf << (8 - nBits)) & 0xFF).toInt) // zero-pad tail
    out.toByteArray
  }

  private[graft] def lzwDecode(data: Array[Byte], earlyChange: Int = 1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 4 + 64)
    val entries = new Array[Array[Byte]](4096)
    var next = 258; var width = 9
    var prev: Array[Byte] = null
    var bitBuf = 0L; var nBits = 0; var i = 0
    var sawEod = false
    def readCode(): Int = {
      while (nBits < width) {
        require(i < data.length, "corrupt PDF: LZW stream ended without EOD")
        bitBuf = (bitBuf << 8) | (data(i) & 0xFF); nBits += 8; i += 1
      }
      val c = ((bitBuf >> (nBits - width)) & ((1L << width) - 1)).toInt
      nBits -= width
      c
    }
    while (!sawEod) {
      val c = readCode()
      if (c == 256) {
        java.util.Arrays.fill(entries.asInstanceOf[Array[AnyRef]], null)
        next = 258; width = 9; prev = null
      } else if (c == 257) sawEod = true
      else {
        val cur: Array[Byte] =
          if (c < 256) Array(c.toByte)
          else if (c == next && prev != null) prev :+ prev(0) // KwKwK
          else {
            require(c >= 258 && c < next && entries(c) != null,
              s"corrupt PDF: LZW code $c references an unassigned table slot")
            entries(c)
          }
        out.write(cur, 0, cur.length)
        if (prev != null && next + earlyChange < 4096) {
          entries(next) = prev :+ cur(0); next += 1
          // decoder grows when next REACHES 2^width — one slot before the
          // encoder (see lzwEncode)
          if (next + earlyChange >= (1 << width) && width < 12) width += 1
        }
        prev = cur
      }
    }
    out.toByteArray
  }

  // --- ASCII transport filters (ISO 32000 §7.4.2, §7.4.3) ---------------

  private[graft] def asciiHexEncode(raw: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder(raw.length * 2 + 1)
    raw.foreach(b => sb.append(f"${b & 0xFF}%02X"))
    sb.append('>')
    sb.toString.getBytes(ISO_8859_1)
  }

  private[graft] def asciiHexDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 8)
    var hi = -1
    var done = false
    var i = 0
    while (i < data.length && !done) {
      val c = (data(i) & 0xFF).toChar
      val d =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c == '>') { done = true; -1 }
        else if (c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0) -1
        else throw new IllegalArgumentException(
          s"corrupt PDF: ASCIIHexDecode met non-hex character '$c'")
      if (d >= 0) { if (hi < 0) hi = d else { out.write(hi * 16 + d); hi = -1 } }
      i += 1
    }
    require(done, "corrupt PDF: ASCIIHexDecode stream without '>' EOD")
    if (hi >= 0) out.write(hi * 16) // odd final digit: low nibble is 0 (spec)
    out.toByteArray
  }

  private[graft] def ascii85Encode(raw: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder(raw.length * 5 / 4 + 8)
    var i = 0
    while (i < raw.length) {
      val n = math.min(4, raw.length - i)
      var group = 0L
      (0 until 4).foreach(j => group = (group << 8) | (if (j < n) raw(i + j) & 0xFF else 0))
      if (n == 4 && group == 0) sb.append('z') // full zero group shorthand
      else {
        val digits = new Array[Char](5)
        var g = group
        (4 to 0 by -1).foreach { j => digits(j) = ('!' + (g % 85)).toChar; g /= 85 }
        (0 until n + 1).foreach(j => sb.append(digits(j))) // partial: n+1 digits
      }
      i += n
    }
    sb.append("~>")
    sb.toString.getBytes(ISO_8859_1)
  }

  private[graft] def ascii85Decode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 4 / 5 + 8)
    val group = new Array[Int](5)
    var n = 0
    var done = false
    var i = 0
    def flush(digits: Int): Unit = {
      require(digits != 1, "corrupt PDF: ASCII85Decode group of a single digit")
      // pad with 'u' (84) to 5 digits, emit digits-1 bytes (spec rule)
      (digits until 5).foreach(group(_) = 84)
      var v = 0L
      group.foreach(d => v = v * 85 + d)
      require(v <= 0xFFFFFFFFL, "corrupt PDF: ASCII85Decode group exceeds 2^32")
      (0 until digits - 1).foreach(j => out.write(((v >> (24 - 8 * j)) & 0xFF).toInt))
      n = 0
    }
    while (i < data.length && !done) {
      val c = (data(i) & 0xFF).toChar
      if (c == 'z') {
        require(n == 0, "corrupt PDF: ASCII85Decode 'z' inside a group")
        (0 until 4).foreach(_ => out.write(0))
      } else if (c == '~') {
        require(i + 1 < data.length && (data(i + 1) & 0xFF).toChar == '>',
          "corrupt PDF: ASCII85Decode '~' without '>' EOD")
        if (n > 0) flush(n)
        done = true
      } else if (c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0) ()
      else if (c >= '!' && c <= 'u') {
        group(n) = c - '!'; n += 1
        if (n == 5) flush(5)
      } else throw new IllegalArgumentException(
        s"corrupt PDF: ASCII85Decode met out-of-range character '$c'")
      i += 1
    }
    require(done, "corrupt PDF: ASCII85Decode stream without '~>' EOD")
    out.toByteArray
  }

  // flat parms dict: /DecodeParms << /Predictor 12 /Columns 24 ... >>
  private val parmsPat =
    java.util.regex.Pattern.compile("/DecodeParms\\s*<<(.*?)>>", java.util.regex.Pattern.DOTALL)

  private def parmInt(parms: String, key: String, default: Int): Int = {
    val m = java.util.regex.Pattern.compile(s"/$key\\s+(\\d+)").matcher(parms)
    if (m.find()) m.group(1).toInt else default
  }

  /** TIFF predictor 2 at 8 bits: horizontal differencing per row (each
    * byte minus its left neighbour `bpp` back; no per-row tag byte). */
  private[graft] def tiffPredict(raw: Array[Byte], rowBytes: Int, bpp: Int = 1): Array[Byte] = {
    require(rowBytes > 0 && bpp > 0, s"bad row geometry: rowBytes=$rowBytes bpp=$bpp")
    val out = raw.clone()
    var rowStart = 0
    while (rowStart < raw.length) {
      val n = math.min(rowBytes, raw.length - rowStart)
      var x = n - 1
      while (x >= bpp) {
        out(rowStart + x) = (raw(rowStart + x) - raw(rowStart + x - bpp)).toByte
        x -= 1
      }
      rowStart += n
    }
    out
  }

  private def tiffUnpredict(data: Array[Byte], rowBytes: Int, bpp: Int): Array[Byte] = {
    require(rowBytes > 0 && bpp > 0, s"bad row geometry: rowBytes=$rowBytes bpp=$bpp")
    val out = data.clone()
    var rowStart = 0
    while (rowStart < data.length) {
      val n = math.min(rowBytes, data.length - rowStart)
      var x = bpp
      while (x < n) {
        out(rowStart + x) = (out(rowStart + x) + out(rowStart + x - bpp)).toByte
        x += 1
      }
      rowStart += n
    }
    out
  }

  /** Undo the /DecodeParms predictor on inflated stream data. Supported
    * (8-bit components only): 1 none, 2 TIFF horizontal differencing,
    * 10-15 PNG row filters via the PNG codec's shared unfilter (the PDF
    * spec defines them as exactly PNG's). Anything else throws loudly. */
  private def applyPredictor(dict: String, data: Array[Byte]): Array[Byte] = {
    val pm = parmsPat.matcher(dict)
    if (!pm.find()) {
      // /DecodeParms present but not a flat dict (e.g. a per-filter parms
      // ARRAY): decoding without it would silently mis-decode — throw
      require(!dict.contains("/DecodeParms"),
        "unsupported PDF: /DecodeParms is not a flat dictionary " +
          "(per-filter parms arrays are not implemented)")
      return data
    }
    val parms = pm.group(1)
    val predictor = parmInt(parms, "Predictor", 1)
    if (predictor == 1) return data
    val colors = parmInt(parms, "Colors", 1)
    val bits = parmInt(parms, "BitsPerComponent", 8)
    val columns = parmInt(parms, "Columns", 1)
    require(bits == 8, s"unsupported PDF: /Predictor with /BitsPerComponent $bits — " +
      "only 8-bit components are implemented")
    require(colors >= 1 && columns >= 1,
      s"corrupt PDF: /DecodeParms /Colors $colors /Columns $columns")
    val rowBytes = columns * colors
    predictor match {
      case 2 => tiffUnpredict(data, rowBytes, colors)
      case p if p >= 10 && p <= 15 => Png.unfilterRows(data, rowBytes, colors)
      case p => throw new IllegalArgumentException(
        s"unsupported PDF: /Predictor $p — only 1 (none), 2 (TIFF), and " +
          "10-15 (PNG row filters) are implemented")
    }
  }

  /** Apply a stream dict's declared /Filter pipeline to its raw data, in
    * declaration order (ISO 32000 §7.4.1: the array lists filters in the
    * order needed to DECODE). Supported shapes: no filter; a single
    * ASCIIHexDecode / ASCII85Decode / FlateDecode / LZWDecode; or a
    * 2-element chain of one ASCII transport filter then one compression
    * filter. /DecodeParms (predictor, LZW /EarlyChange) applies to the
    * compression filter. Anything else throws loudly — a silently
    * half-decoded stream is corpus poison. */
  private def decodeStream(dict: String, raw: String): String = {
    val names = filters(dict)
    if (names.isEmpty) return raw
    val compression = Set("FlateDecode", "LZWDecode")
    val transport = Set("ASCIIHexDecode", "ASCII85Decode")
    val chainOk = names match {
      case Seq(single) => compression(single) || transport(single)
      case Seq(pre, last) => transport(pre) && compression(last)
      case _ => false
    }
    if (!chainOk) throw new IllegalArgumentException(
      s"unsupported PDF: /Filter ${names.mkString("[", " ", "]")} — supported: " +
        "unfiltered, ASCIIHexDecode, ASCII85Decode, FlateDecode, LZWDecode, " +
        "or one ASCII transport filter followed by one compression filter")
    var data = raw.getBytes(ISO_8859_1)
    names.foreach {
      case "ASCIIHexDecode" => data = asciiHexDecode(data)
      case "ASCII85Decode"  => data = ascii85Decode(data)
      case "FlateDecode"    => data = applyPredictor(dict, inflate(data))
      case "LZWDecode"      => data = applyPredictor(dict, lzwDecode(data, lzwEarlyChange(dict)))
    }
    new String(data, ISO_8859_1)
  }

  /** LZW /EarlyChange from /DecodeParms (default 1 per ISO 32000 Table 8). */
  private def lzwEarlyChange(dict: String): Int = {
    val pm = parmsPat.matcher(dict)
    if (pm.find()) parmInt(pm.group(1), "EarlyChange", 1) else 1
  }

  /** Filter names declared on a stream dict (empty when unfiltered). */
  private def filters(dict: String): Seq[String] = {
    val fm = filterPat.matcher(dict)
    if (!fm.find()) Seq.empty
    else {
      val nm = namePat.matcher(fm.group(1))
      val b = Seq.newBuilder[String]
      while (nm.find()) b += nm.group(1)
      b.result()
    }
  }

  /** Split the document into objId → body. Stream data is delimited by
    * the dict's /Length — NOT by scanning for `endstream`/`endobj`
    * keywords, which page text may legitimately contain (the same reason
    * real parsers honor /Length). */
  private def objects(doc: String): Map[Int, String] = {
    val out = Map.newBuilder[Int, String]
    val m = hdrPat.matcher(doc)
    var from = 0
    while (m.find(from)) {
      val id = m.group(1).toInt
      val bodyStart = m.end()
      val sAt = doc.indexOf("stream", bodyStart)
      val eAt = doc.indexOf("endobj", bodyStart)
      require(eAt >= 0, "corrupt PDF: object without endobj")
      val end =
        if (sAt >= 0 && sAt < eAt) {
          val lm = lenPat.matcher(doc.substring(bodyStart, sAt))
          require(lm.find(),
            "unsupported PDF: stream without an inline integer /Length")
          val de = dataStart(doc, sAt) + lm.group(1).toInt
          require(de <= doc.length, "corrupt PDF: stream overruns document")
          val realEnd = doc.indexOf("endobj", de)
          require(realEnd >= 0, "corrupt PDF: stream object without endobj")
          realEnd
        } else eAt
      out += id -> doc.substring(bodyStart, end)
      from = end + "endobj".length
    }
    out.result()
  }

  /** First data byte after the `stream` keyword's single EOL. */
  private def dataStart(s: String, streamKwAt: Int): Int = {
    var i = streamKwAt + "stream".length
    if (i < s.length && s(i) == '\r') i += 1
    if (i < s.length && s(i) == '\n') i += 1
    i
  }

  /** The stream data of an object body, delimited by /Length. */
  private def streamData(body: String): String = {
    val sAt = body.indexOf("stream")
    require(sAt >= 0, "corrupt PDF: contents without stream")
    val lm = lenPat.matcher(body.substring(0, sAt))
    require(lm.find(),
      "unsupported PDF: stream without an inline integer /Length")
    val ds = dataStart(body, sAt)
    val de = ds + lm.group(1).toInt
    require(de <= body.length, "corrupt PDF: stream overruns object")
    body.substring(ds, de)
  }

  private def dictInt(dict: String, key: String): Int = {
    val m = java.util.regex.Pattern.compile(s"/$key\\s+(\\d+)").matcher(dict)
    require(m.find(), s"corrupt PDF: stream dict missing /$key")
    m.group(1).toInt
  }

  private val objStmPat = java.util.regex.Pattern.compile("/Type\\s*/ObjStm\\b")

  /** Expand `/Type /ObjStm` members into the object map (ISO 32000
    * §7.5.7 — the PDF 1.5+ packing PyMuPDF reads transparently,
    * app.py:123-132): the decoded stream begins with N whitespace-
    * separated (objnum, offset) integer pairs, offsets relative to
    * /First; member bodies follow. Stream objects cannot nest inside an
    * ObjStm, so one pass suffices. Malformed headers, out-of-range
    * offsets, and member ids colliding with top-level objects all throw
    * — a silently half-expanded document would lose pages. */
  private def expandObjectStreams(objs: Map[Int, String]): Map[Int, String] = {
    val members = Map.newBuilder[Int, String]
    objs.foreach { case (_, body) =>
      val sAt = body.indexOf("stream")
      val dict = if (sAt >= 0) body.substring(0, sAt) else body
      if (objStmPat.matcher(dict).find()) {
        require(sAt >= 0, "corrupt PDF: ObjStm without stream data")
        val n = dictInt(dict, "N")
        val first = dictInt(dict, "First")
        val data = decodeStream(dict, streamData(body))
        require(first <= data.length, "corrupt PDF: ObjStm /First beyond stream end")
        val header = data.substring(0, first).trim
        val nums = if (header.isEmpty) Array.empty[String] else header.split("\\s+")
        require(nums.length == 2 * n,
          s"corrupt PDF: ObjStm header carries ${nums.length} integers, expected ${2 * n}")
        val pairs = nums.grouped(2).map(a => (a(0).toInt, a(1).toInt)).toArray
        pairs.zipWithIndex.foreach { case ((id, off), j) =>
          val start = first + off
          val end = if (j + 1 < pairs.length) first + pairs(j + 1)._2 else data.length
          require(start <= end && end <= data.length,
            s"corrupt PDF: ObjStm member $id offset out of range")
          members += id -> data.substring(start, end)
        }
      }
    }
    val m = members.result()
    val clash = m.keySet.intersect(objs.keySet)
    require(clash.isEmpty,
      s"corrupt PDF: ObjStm member ids collide with top-level objects: ${clash.take(3)}")
    objs ++ m
  }

  private def ref(body: String, key: String): Int = {
    val at = body.indexOf(key)
    require(at >= 0, s"PDF object missing $key")
    val m = refPat.matcher(body)
    require(m.find(at + key.length), s"PDF: $key is not an indirect reference")
    m.group(1).toInt
  }

  /** Decode one PDF into its pages' text, in page-tree order. */
  private[graft] def decodePages(bytes: Array[Byte]): Seq[String] = {
    require(isPdf(bytes), "not a PDF (missing %PDF- header)")
    val doc = new String(bytes, ISO_8859_1)
    val objs = expandObjectStreams(objects(doc))
    val rootAt = doc.lastIndexOf("/Root")
    require(rootAt >= 0, "corrupt PDF: trailer has no /Root")
    val catalog = objs(ref(doc.substring(rootAt), "/Root"))
    val pagesObj = objs(ref(catalog, "/Pages"))
    val kidsAt = pagesObj.indexOf("/Kids")
    require(kidsAt >= 0, "corrupt PDF: page tree has no /Kids")
    val kidsEnd = pagesObj.indexOf(']', kidsAt)
    require(kidsEnd >= 0, "corrupt PDF: unterminated /Kids array")
    val kidRefs = {
      val m = refPat.matcher(pagesObj.substring(kidsAt, kidsEnd))
      val b = Seq.newBuilder[Int]
      while (m.find()) b += m.group(1).toInt
      b.result()
    }
    require(kidRefs.nonEmpty, "corrupt PDF: empty page tree")
    kidRefs.map { pid =>
      val page = objs.getOrElse(pid,
        throw new IllegalArgumentException(s"corrupt PDF: missing page object $pid"))
      val contents = objs.getOrElse(ref(page, "/Contents"),
        throw new IllegalArgumentException("corrupt PDF: missing contents object"))
      val sAt = contents.indexOf("stream")
      require(sAt >= 0, "corrupt PDF: contents without stream")
      val dict = contents.substring(0, sAt)
      val stream = decodeStream(dict, streamData(contents))
      extractText(stream)
    }
  }

  /** Tokenize a content stream's BT…ET blocks and concatenate the
    * operands of Tj and TJ show ops in stream order. */
  private[graft] def extractText(stream: String): String = {
    val out = new StringBuilder
    var i = 0
    var inText = false
    var lastString: String = null
    while (i < stream.length) {
      val c = stream(i)
      if (c == '(') {
        val (s, next) = parseString(stream, i)
        lastString = s
        i = next
      } else if (stream.startsWith("BT", i) && wordAt(stream, i, 2)) {
        inText = true; lastString = null; i += 2
      } else if (stream.startsWith("ET", i) && wordAt(stream, i, 2)) {
        inText = false; i += 2
      } else if (stream.startsWith("Tj", i) && wordAt(stream, i, 2)) {
        require(lastString != null, "corrupt PDF: Tj without a string operand")
        if (inText) out.append(lastString)
        lastString = null; i += 2
      } else if (stream.startsWith("TJ", i) && wordAt(stream, i, 2)) {
        // array form: strings already concatenated as they were parsed;
        // numeric kerning operands carry no text
        require(lastString != null, "corrupt PDF: TJ without operands")
        if (inText) out.append(lastString)
        lastString = null; i += 2
      } else if (c == '[') {
        // TJ array: gather every string element into one pending operand
        val sb = new StringBuilder
        i += 1
        while (i < stream.length && stream(i) != ']') {
          if (stream(i) == '(') {
            val (s, next) = parseString(stream, i)
            sb.append(s); i = next
          } else i += 1
        }
        require(i < stream.length, "corrupt PDF: unterminated TJ array")
        i += 1
        lastString = sb.toString
      } else i += 1
    }
    out.toString
  }

  /** True if the 2-char operator at `at` is delimiter-bounded (so a
    * string containing "Tj" inside parens was already consumed and a
    * name like /TjX never false-matches). */
  private def wordAt(s: String, at: Int, len: Int): Boolean = {
    def boundary(c: Char) = c == ' ' || c == '\n' || c == '\r' || c == '\t' ||
      c == '(' || c == ')' || c == '[' || c == ']' || c == '/' || c == '<'
    (at == 0 || boundary(s(at - 1))) &&
      (at + len >= s.length || boundary(s(at + len)))
  }

  /** PDF string literal at `at` (must be '('): handles nested balanced
    * parens, the \-escapes, octal codes, and line continuations. Returns
    * (decoded, index-after-closing-paren). */
  private def parseString(s: String, at: Int): (String, Int) = {
    require(s(at) == '(', "internal: parseString off a non-paren")
    val sb = new StringBuilder
    var i = at + 1
    var depth = 1
    while (depth > 0) {
      require(i < s.length, "corrupt PDF: unterminated string literal")
      s(i) match {
        case '\\' =>
          require(i + 1 < s.length, "corrupt PDF: dangling escape")
          s(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case '(' => sb.append('('); i += 2
            case ')' => sb.append(')'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case '\n' => i += 2 // line continuation
            case '\r' =>
              i += 2; if (i < s.length && s(i) == '\n') i += 1
            case d if d >= '0' && d <= '7' =>
              var code = 0; var n = 0; i += 1
              while (n < 3 && i < s.length && s(i) >= '0' && s(i) <= '7') {
                code = code * 8 + (s(i) - '0'); i += 1; n += 1
              }
              sb.append(code.toChar)
            case other => sb.append(other); i += 2 // spec: drop the backslash
          }
        case '(' => depth += 1; sb.append('('); i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) sb.append(')')
          i += 1
        case c => sb.append(c); i += 1
      }
    }
    (sb.toString, i)
  }
}
