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
  * Content streams may be stored raw or `/Filter /FlateDecode` (zlib) —
  * the filter virtually every real-world PDF applies; the reader inflates
  * those transparently (same zlib discipline as the PNG codec's IDAT
  * path). Flate streams may additionally declare `/DecodeParms` with a
  * `/Predictor` (ISO 32000 §7.4.4.4): 1 (none), 2 (TIFF horizontal
  * differencing), and 10-15 (PNG row filters — delegated to the SAME
  * per-row unfilter the PNG codec uses, since the PDF spec defines them
  * as exactly PNG's filters) are all decoded, at 8 bits per component.
  * Scope beyond that is declared LOUDLY, not silently: any other /Filter
  * (DCTDecode, LZW, ASCIIHex, filter chains), predictor value, or
  * BitsPerComponent, a missing page tree, or an unbalanced string throws
  * — at lake scale a half-extracted PDF is corpus poison (same contract
  * as the WAV and DOCX codecs). PDF bytes are treated as Latin-1 so byte
  * offsets equal char offsets (the corpus payloads are ASCII; compressed
  * stream bytes round trip 0-255 exactly under Latin-1). */
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
    * Flate shape after plain. */
  private[graft] def encode(pages: Seq[String], compress: Boolean = false,
                            predictor: Int = 1, columns: Int = 16): Array[Byte] = {
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
        // Latin-1 round trips bytes 0-255 exactly, so the binary deflate
        // output can ride the same StringBuilder as the text objects
        val comp = new String(deflate(payload), ISO_8859_1)
        obj(s"<< /Length ${comp.length} /Filter /FlateDecode$parms >>\n" +
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
    if (!pm.find()) return data
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
    val objs = objects(doc)
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
      val stream = filters(dict) match {
        case Seq() => streamData(contents)
        case Seq("FlateDecode") =>
          val inflated = inflate(streamData(contents).getBytes(ISO_8859_1))
          new String(applyPredictor(dict, inflated), ISO_8859_1)
        case other => throw new IllegalArgumentException(
          s"unsupported PDF: /Filter ${other.mkString("[", " ", "]")} — " +
            "only FlateDecode (and unfiltered) content streams are implemented")
      }
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
