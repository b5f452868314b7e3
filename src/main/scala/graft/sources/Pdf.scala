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
  * Encrypted documents open when the standard security handler grants
  * access with an EMPTY user password (the "encrypted but openable"
  * shape): RC4 revisions 2-3, AESV2/AES-128 (/V 4), and AES-256
  * (/V 5 /R 6, Algorithm 2.B) are all supported, with per-file /U
  * authentication and decrypt-before-filters order (§7.6); a document
  * that genuinely needs a password throws rather than half-decrypting.
  *
  * Scope beyond that is declared LOUDLY, not silently: any other /Filter
  * (DCTDecode, JBIG2, RunLength), chain shape, predictor
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

  /** Literal-string writer for encoded (non-identity) code bytes: specials
    * escaped, codes ≥ 0x80 as OCTAL escapes — the form legacy generators
    * emit for /Differences-remapped high codes (ISO 32000 §7.3.4.2). */
  private def escapeOctal(s: String): String = {
    val sb = new StringBuilder(s.length + 16)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '('  => sb.append("\\(")
      case ')'  => sb.append("\\)")
      case c if c >= 0x80 || c < 0x20 => sb.append(f"\\${c.toInt}%03o")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Simple-font /Encoding shape for [[encode]] (ISO 32000 §9.6.6):
    * `base` picks the named base encoding (None = the font's implicit
    * StandardEncoding); `remapFrom` > 0 remaps every distinct text char
    * to consecutive codes from there via a /Differences array (the
    * legacy-generator form whose decode REQUIRES the tables); `indirect`
    * writes the /Encoding dict as its own numbered object (both forms
    * are legal and both occur in the wild). */
  private[graft] final case class SimpleEncoding(
      base: Option[String] = None,
      remapFrom: Int = 0,
      indirect: Boolean = false)

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
                            filterChain: Seq[String] = Seq("FlateDecode"),
                            encryptRev: Int = 0,
                            hexStrings: Boolean = false,
                            encoding: Option[SimpleEncoding] = None): Array[Byte] = {
    require(Set(0, 2, 3, 4, 6).contains(encryptRev),
      s"unsupported encryption revision $encryptRev " +
        "(0 = none, 2 = RC4-40, 3 = RC4-128, 4 = AESV2/AES-128, 6 = AES-256)")
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
    // deterministic doc /ID + standard-handler parameters (empty user pw)
    val permP = -4 // all permission bits granted
    val id0 = if (encryptRev == 0) Array.empty[Byte]
      else md5(pages.mkString("\u0000").getBytes(ISO_8859_1)).take(16)
    val empty3 = (Array.empty[Byte], Array.empty[Byte], Array.empty[Byte])
    val (encO, encU, fileKey) = encryptRev match {
      case 0 | 6 => empty3
      // R4's O/U/key algorithms are R3's verbatim (ISO 32000 Table 21:
      // /R 4 changes only the crypt-filter layer)
      case r => stdSecurity(if (r == 4) 3 else r, permP, id0)
    }
    val (o6, oe6, u6, ue6, perms6, fileKey6) =
      if (encryptRev == 6) v5Security(permP, id0)
      else (Array.empty[Byte], Array.empty[Byte], Array.empty[Byte],
        Array.empty[Byte], Array.empty[Byte], Array.empty[Byte])
    // encrypt a stream's STORED bytes (outermost, after all filters) with
    // the key of the object about to be written
    def sealStream(payload: Array[Byte]): Array[Byte] =
      encryptRev match {
        case 0 => payload
        case 4 => aesSeal(fileKey, offsets.length + 1, payload)
        case 6 => aesSeal(fileKey6, offsets.length + 1, payload, deriveKey = false)
        case _ => cryptObject(fileKey, offsets.length + 1, payload)
      }
    // Simple-font encoding: per-char CODE assignment + the /Encoding
    // entry carrying it. With remapFrom the distinct chars (first-
    // appearance order) take consecutive /Differences codes — the decode
    // then REQUIRES the Differences walk + glyph-name resolution; without
    // it, codes come from the base table's reverse map, exercising the
    // Appendix D table itself (even ASCII goes name-by-name).
    val (codeOf, diffRuns, encEntry) = encoding match {
      case None => (null: Map[Char, Int], Seq.empty[String], "")
      case Some(SimpleEncoding(base, remapFrom, indirect)) =>
        val table = PdfEncodings.baseTable(base.getOrElse("StandardEncoding"))
        val (codes, diffs) =
          if (remapFrom > 0) {
            val distinct = scala.collection.mutable.LinkedHashSet[Char]()
            pages.foreach(_.foreach(distinct += _))
            require(remapFrom + distinct.size <= 256,
              s"SimpleEncoding: ${distinct.size} distinct chars from code " +
                s"$remapFrom exceeds the byte code space")
            val assigned = distinct.toSeq.zipWithIndex
              .map { case (c, k) => c -> (remapFrom + k) }
            (assigned.toMap,
              assigned.map { case (c, code) =>
                code -> PdfEncodings.unicodeToGlyph.getOrElse(c.toString,
                  f"uni${c.toInt}%04X")
              })
          } else {
            // lowest code per char under the base table
            val rev = table.toSeq
              .map { case (code, name) => PdfEncodings.glyph(name) -> code }
              .filter(_._1.length == 1)
              .groupBy(_._1.charAt(0)).map { case (c, xs) => c -> xs.map(_._2).min }
            pages.foreach(_.foreach(c => require(rev.contains(c),
              f"SimpleEncoding: char U+${c.toInt}%04X not in /${base.getOrElse("StandardEncoding")}")))
            (rev, Seq.empty[(Int, String)])
          }
        // runs of ≤ 6 so real multi-run /Differences parsing is exercised
        val runs = diffs.grouped(6).map(run =>
          s"${run.head._1} " + run.map("/" + _._2).mkString(" ")).toSeq
        val baseDecl = base.map(b => s"/BaseEncoding /$b ").getOrElse("")
        val entry =
          if (diffs.isEmpty && base.isDefined && !indirect) s" /Encoding /${base.get}"
          else if (indirect)
            s" /Encoding ${4 + 2 * pages.length} 0 R" // appended after the pages
          else
            s" /Encoding << $baseDecl/Differences [ ${runs.mkString(" ")} ] >>"
        (codes, runs, entry)
    }
    def coded(text: String): String =
      if (codeOf == null) text else text.map(c => codeOf(c).toChar)
    sb.append("%PDF-1.4\n")
    val kids = pages.indices.map(i => s"${4 + 2 * i} 0 R").mkString(" ")
    obj("<< /Type /Catalog /Pages 2 0 R >>")
    obj(s"<< /Type /Pages /Kids [ $kids ] /Count ${pages.length} >>")
    obj(s"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica$encEntry >>")
    pages.zipWithIndex.foreach { case (text, i) =>
      obj(s"<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
        s"/Resources << /Font << /F1 3 0 R >> >> /Contents ${5 + 2 * i} 0 R >>")
      // hexStrings: the same bytes as a hex-string operand (ISO 32000
      // §7.3.4.3) — the show-string form font-subsetting writers favor
      val bytes = coded(text)
      val stream =
        if (hexStrings)
          "BT /F1 12 Tf 72 720 Td <" +
            bytes.map(c => f"${c.toInt & 0xFF}%02X").mkString + "> Tj ET"
        else if (codeOf != null)
          s"BT /F1 12 Tf 72 720 Td (${escapeOctal(bytes)}) Tj ET"
        else s"BT /F1 12 Tf 72 720 Td (${escape(text)}) Tj ET"
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
        val comp = new String(sealStream(wrapped), ISO_8859_1)
        obj(s"<< /Length ${comp.length} $filterDecl$parms >>\n" +
          s"stream\n$comp\nendstream")
      } else {
        require(predictor == 1, "a predictor requires compress = true")
        val sealed_ = new String(sealStream(stream.getBytes(ISO_8859_1)), ISO_8859_1)
        obj(s"<< /Length ${sealed_.length} >>\nstream\n$sealed_\nendstream")
      }
    }
    if (encoding.exists(_.indirect)) {
      // the indirect /Encoding dict the font object referenced as
      // `${4 + 2P} 0 R` — object order in the body is free; the xref
      // rows below locate it
      val baseDecl = encoding.get.base.map(b => s"/BaseEncoding /$b ").getOrElse("")
      val diffDecl =
        if (diffRuns.isEmpty) "" else s"/Differences [ ${diffRuns.mkString(" ")} ] "
      obj(s"<< /Type /Encoding $baseDecl$diffDecl>>")
    }
    if (encryptRev > 0) {
      // the /Encrypt dict itself (and its O/U strings) is never encrypted
      val core = s"/O ${hexStr(encO)} /U ${hexStr(encU)} /P $permP"
      val body = encryptRev match {
        case 2 => s"<< /Filter /Standard /V 1 /R 2 $core >>"
        case 3 => s"<< /Filter /Standard /V 2 /R 3 /Length 128 $core >>"
        case 4 => "<< /Filter /Standard /V 4 /R 4 /Length 128 " +
          "/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> " +
          s"/StmF /StdCF /StrF /StdCF $core >>"
        case 6 => "<< /Filter /Standard /V 5 /R 6 /Length 256 " +
          "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> " +
          "/StmF /StdCF /StrF /StdCF " +
          s"/O ${hexStr(o6)} /OE ${hexStr(oe6)} /U ${hexStr(u6)} " +
          s"/UE ${hexStr(ue6)} /Perms ${hexStr(perms6)} /P $permP >>"
      }
      obj(body)
    }
    val xrefOff = sb.length
    sb.append(s"xref\n0 ${offsets.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    val encDecl =
      if (encryptRev == 0) ""
      else {
        val idHex = hexStr(id0)
        s" /Encrypt ${offsets.length} 0 R /ID [ $idHex $idHex ]"
      }
    sb.append(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R$encDecl >>\n")
    sb.append(s"startxref\n$xrefOff\n%%EOF\n")
    sb.toString.getBytes(ISO_8859_1)
  }

  /** Composite-font shape (ISO 32000 §9.7 + §9.10.3): a /Type0
    * /Identity-H font whose content streams show 2-byte CIDs as HEX
    * string operands, recoverable only through the font's embedded
    * /ToUnicode CMap — the form every browser-, LaTeX-, or Word-
    * generated PDF with subset fonts takes (the reference reads it via
    * PyMuPDF, app.py:123-132). CIDs are assigned per document in order
    * of first appearance, so the CMap is a deterministic function of the
    * text. The CMap deliberately exercises all three mapping clauses —
    * `bfchar` pairs, incrementing `bfrange`, and array-form `bfrange` —
    * and even pages show via `Tj` while odd pages split the string
    * across a kerned `TJ` array (hex elements). `compressCMap` flates
    * the CMap stream, the shape real generators write. */
  private[graft] def encodeType0(pages: Seq[String],
                                 compressCMap: Boolean = true,
                                 toUnicode: Boolean = true,
                                 vertical: Boolean = false): Array[Byte] = {
    require(pages.nonEmpty, "encodeType0: at least one page")
    // Without /ToUnicode the only readable Type0 shape is the PREDEFINED
    // Identity CMap (ISO 32000 §9.7.5.2): codes ARE the 2-byte CIDs, and
    // a text extractor takes them as UTF-16 code units — the generator
    // therefore writes the text's own code units as CIDs so the round
    // trip is verbatim (surrogate pairs ride as two consecutive codes).
    if (!toUnicode) return encodeType0Identity(pages, vertical)
    // codebook: distinct code points in first-appearance order, CIDs from 1
    val cidOf = scala.collection.mutable.LinkedHashMap[Int, Int]()
    pages.foreach(_.codePoints().forEach { cp =>
      if (!cidOf.contains(cp)) cidOf(cp) = cidOf.size + 1
    })
    require(cidOf.size <= 0xFFFF, "encodeType0: more than 65535 distinct code points")
    def utf16Hex(cp: Int): String =
      Character.toChars(cp).map(c => f"${c.toInt}%04X").mkString
    // CMap clauses: chunk the CID sequence; a chunk whose code points
    // increment by exactly 1 (and stay in the BMP) takes the compact
    // incrementing-bfrange form, a multi-entry chunk the array form,
    // and singleton chunks fall to bfchar — so one staged corpus
    // exercises every clause a real subset-font CMap uses
    val byCid = cidOf.toSeq.map(_.swap).sortBy(_._1) // (cid, cp)
    val bfchars = Seq.newBuilder[String]
    val bfranges = Seq.newBuilder[String]
    byCid.grouped(9).foreach { chunk =>
      val (lo, hi) = (chunk.head._1, chunk.last._1)
      val consecutiveBmp = chunk.head._2 <= 0xFFFF - chunk.length &&
        chunk.zipWithIndex.forall { case ((_, cp), k) => cp == chunk.head._2 + k }
      if (chunk.length == 1)
        bfchars += f"<${chunk.head._1}%04X> <${utf16Hex(chunk.head._2)}>"
      else if (consecutiveBmp)
        bfranges += f"<$lo%04X> <$hi%04X> <${utf16Hex(chunk.head._2)}>"
      else
        bfranges += f"<$lo%04X> <$hi%04X> " +
          chunk.map(c => s"<${utf16Hex(c._2)}>").mkString("[ ", " ", " ]")
    }
    val charClauses = bfchars.result()
    val rangeClauses = bfranges.result()
    val cmap = new StringBuilder()
      .append("/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n")
      .append("/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) /Supplement 0 >> def\n")
      .append("/CMapName /Adobe-Identity-UCS def\n/CMapType 2 def\n")
      .append("1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n")
    if (rangeClauses.nonEmpty)
      cmap.append(s"${rangeClauses.length} beginbfrange\n")
        .append(rangeClauses.mkString("\n")).append("\nendbfrange\n")
    if (charClauses.nonEmpty)
      cmap.append(s"${charClauses.length} beginbfchar\n")
        .append(charClauses.mkString("\n")).append("\nendbfchar\n")
    cmap.append("endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend")
    val sb = new StringBuilder
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    def obj(body: String): Unit = {
      offsets += sb.length
      sb.append(s"${offsets.length} 0 obj\n").append(body).append("\nendobj\n")
    }
    sb.append("%PDF-1.4\n")
    val kids = pages.indices.map(i => s"${6 + 2 * i} 0 R").mkString(" ")
    obj("<< /Type /Catalog /Pages 2 0 R >>")
    obj(s"<< /Type /Pages /Kids [ $kids ] /Count ${pages.length} >>")
    obj("<< /Type /Font /Subtype /Type0 /BaseFont /GraftSubset " +
      "/Encoding /Identity-H /DescendantFonts [ 5 0 R ] /ToUnicode 4 0 R >>")
    val cmapBytes = cmap.toString.getBytes(ISO_8859_1)
    if (compressCMap) {
      val comp = new String(deflate(cmapBytes), ISO_8859_1)
      obj(s"<< /Length ${comp.length} /Filter /FlateDecode >>\nstream\n$comp\nendstream")
    } else
      obj(s"<< /Length ${cmapBytes.length} >>\nstream\n${cmap.toString}\nendstream")
    obj("<< /Type /Font /Subtype /CIDFontType2 /BaseFont /GraftSubset " +
      "/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> >>")
    pages.zipWithIndex.foreach { case (text, i) =>
      obj(s"<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
        s"/Resources << /Font << /F1 3 0 R >> >> /Contents ${7 + 2 * i} 0 R >>")
      val codes = new StringBuilder
      text.codePoints().forEach(cp => codes.append(f"${cidOf(cp)}%04X"))
      val hex = codes.toString
      val stream =
        if (i % 2 == 0 || hex.length < 8)
          s"BT /F1 12 Tf 72 720 Td <$hex> Tj ET"
        else {
          // split on a code boundary: hex chars per code = 4
          val mid = (hex.length / 8) * 4
          s"BT /F1 12 Tf 72 720 Td [ <${hex.substring(0, mid)}> -250 " +
            s"<${hex.substring(mid)}> ] TJ ET"
        }
      obj(s"<< /Length ${stream.length} >>\nstream\n$stream\nendstream")
    }
    val xrefOff = sb.length
    sb.append(s"xref\n0 ${offsets.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R >>\n")
    sb.append(s"startxref\n$xrefOff\n%%EOF\n")
    sb.toString.getBytes(ISO_8859_1)
  }

  /** Type0 with a PREDEFINED Identity CMap and NO /ToUnicode — the
    * second most common conformance gap vs the reference loader path
    * (app.py:123-132): a conformant extractor decodes the 2-byte codes
    * as CIDs = UTF-16 code units directly (ISO 32000 §9.7.5.2 /
    * §9.10.2's fallback ladder). Even pages show via `Tj` hex strings,
    * odd pages split across a kerned `TJ` array, mirroring
    * [[encodeType0]]'s operand coverage. */
  private def encodeType0Identity(pages: Seq[String],
                                  vertical: Boolean): Array[Byte] = {
    val enc = if (vertical) "Identity-V" else "Identity-H"
    val sb = new StringBuilder
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    def obj(body: String): Unit = {
      offsets += sb.length
      sb.append(s"${offsets.length} 0 obj\n").append(body).append("\nendobj\n")
    }
    sb.append("%PDF-1.4\n")
    val kids = pages.indices.map(i => s"${5 + 2 * i} 0 R").mkString(" ")
    obj("<< /Type /Catalog /Pages 2 0 R >>")
    obj(s"<< /Type /Pages /Kids [ $kids ] /Count ${pages.length} >>")
    obj("<< /Type /Font /Subtype /Type0 /BaseFont /GraftSubset " +
      s"/Encoding /$enc /DescendantFonts [ 4 0 R ] >>")
    obj("<< /Type /Font /Subtype /CIDFontType2 /BaseFont /GraftSubset " +
      "/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> >>")
    pages.zipWithIndex.foreach { case (text, i) =>
      obj(s"<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
        s"/Resources << /Font << /F1 3 0 R >> >> /Contents ${6 + 2 * i} 0 R >>")
      val hex = text.map(c => f"${c.toInt}%04X").mkString
      val stream =
        if (i % 2 == 0 || hex.length < 8)
          s"BT /F1 12 Tf 72 720 Td <$hex> Tj ET"
        else {
          val mid = (hex.length / 8) * 4
          s"BT /F1 12 Tf 72 720 Td [ <${hex.substring(0, mid)}> -250 " +
            s"<${hex.substring(mid)}> ] TJ ET"
        }
      obj(s"<< /Length ${stream.length} >>\nstream\n$stream\nendstream")
    }
    val xrefOff = sb.length
    sb.append(s"xref\n0 ${offsets.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R >>\n")
    sb.append(s"startxref\n$xrefOff\n%%EOF\n")
    sb.toString.getBytes(ISO_8859_1)
  }

  /** Pages whose text is split between the page's own content stream
    * and FORM XOBJECTS invoked via `Do` (ISO 32000 §8.10) — the
    * letterhead/stamp/template shape real generators emit constantly,
    * and a text extractor that ignores `Do` silently LOSES that text.
    * Variants: 0 = half direct + half in a self-resourced form; 1 =
    * nested forms (form invokes form); 2 = the form has NO /Resources
    * and inherits the page's (the PDF 1.1 shape still common in the
    * wild); 3 = Flate-compressed form stream plus an Image XObject
    * `Do` on the page (must contribute no text); 4 = variant 0 plus an
    * INLINE IMAGE (`BI…ID…EI`, §8.9.7) whose binary payload contains
    * bytes that read as `(`, `BT` and `Tj` — the tokenizer must skip
    * it wholesale, not parse phantom text out of pixel data. */
  private[graft] def encodeForms(pages: Seq[String], variant: Int): Array[Byte] = {
    require(variant >= 0 && variant <= 4, s"encodeForms: unknown variant $variant")
    val nested = variant == 1
    val inheritRes = variant == 2
    val compressForm = variant == 3
    val withImage = variant == 3
    val withInline = variant == 4
    val perPage = 2 + (if (nested) 2 else 1) + (if (withImage) 1 else 0)
    val sb = new StringBuilder
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    def obj(body: String): Unit = {
      offsets += sb.length
      sb.append(s"${offsets.length} 0 obj\n").append(body).append("\nendobj\n")
    }
    def streamObj(dictCore: String, payload: Array[Byte]): Unit = {
      val s = new String(payload, ISO_8859_1)
      obj(s"<< $dictCore /Length ${s.length} >>\nstream\n$s\nendstream")
    }
    sb.append("%PDF-1.4\n")
    val kids = pages.indices.map(i => s"${4 + i * perPage} 0 R").mkString(" ")
    obj("<< /Type /Catalog /Pages 2 0 R >>")
    obj(s"<< /Type /Pages /Kids [ $kids ] /Count ${pages.length} >>")
    obj("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    pages.zipWithIndex.foreach { case (text, i) =>
      val base = 4 + i * perPage // page, content, form0 [, form1] [, image]
      val form0 = base + 2
      val imageId = base + perPage - 1
      val h = text.length / 2
      val xentries = s"/Fm0 $form0 0 R" +
        (if (withImage) s" /Im0 $imageId 0 R" else "")
      obj(s"<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
        s"/Resources << /Font << /F1 3 0 R >> /XObject << $xentries >> >> " +
        s"/Contents ${base + 1} 0 R >>")
      val imDo = if (withImage) " /Im0 Do" else ""
      // poisoned inline image: the 11 payload bytes "(BT EI x Tj" contain
      // " EI " mid-data AND read as show operators — only the declared
      // /L makes the skip exact (the lenient-scan fallback, which this
      // payload would defeat, is pinned separately in spec)
      val inline = if (withInline)
        " BI /W 4 /H 2 /BPC 8 /CS /G /L 11 ID (BT EI x Tj EI" else ""
      streamObj("", // page content: first half direct, rest via the form
        (s"BT /F1 12 Tf 72 720 Td (${escape(text.substring(0, h))}) Tj ET" +
          s"$inline /Fm0 Do$imDo").getBytes(ISO_8859_1))
      val fontRes = "/Resources << /Font << /F1 3 0 R >> "
      if (nested) {
        val h2 = h + (text.length - h) / 2
        streamObj(s"/Type /XObject /Subtype /Form /BBox [ 0 0 612 792 ] " +
          fontRes + s"/XObject << /Fm1 ${form0 + 1} 0 R >> >> ",
          (s"BT /F1 12 Tf (${escape(text.substring(h, h2))}) Tj ET /Fm1 Do")
            .getBytes(ISO_8859_1))
        streamObj(s"/Type /XObject /Subtype /Form /BBox [ 0 0 612 792 ] " +
          fontRes + ">> ",
          s"BT /F1 12 Tf (${escape(text.substring(h2))}) Tj ET".getBytes(ISO_8859_1))
      } else {
        val res = if (inheritRes) "" else fontRes + ">> "
        val raw = s"BT /F1 12 Tf (${escape(text.substring(h))}) Tj ET"
          .getBytes(ISO_8859_1)
        if (compressForm)
          streamObj(s"/Type /XObject /Subtype /Form /BBox [ 0 0 612 792 ] " +
            res + "/Filter /FlateDecode", deflate(raw))
        else
          streamObj(s"/Type /XObject /Subtype /Form /BBox [ 0 0 612 792 ] " + res, raw)
      }
      if (withImage)
        streamObj("/Type /XObject /Subtype /Image /Width 1 /Height 1 " +
          "/ColorSpace /DeviceGray /BitsPerComponent 8", Array[Byte](0x42))
    }
    val xrefOff = sb.length
    sb.append(s"xref\n0 ${offsets.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R >>\n")
    sb.append(s"startxref\n$xrefOff\n%%EOF\n")
    sb.toString.getBytes(ISO_8859_1)
  }

  /** Structured page trees + split content streams (ISO 32000 §7.7.3):
    * variant 0 = a DEPTH-2 balanced tree (root → /Pages interior nodes
    * of ≤3 kids → leaves), each page self-resourced; 1 = the same tree
    * with /Resources ONLY on the root node — every leaf decodes through
    * §7.7.3.4 INHERITANCE; 2 = a flat tree whose pages carry /Contents
    * ARRAYS (the text split across 1-3 streams, the incremental-editor
    * shape — reading only the first element silently loses text); 3 =
    * nested + inherited + split + FlateDecode-compressed streams. */
  private[graft] def encodePageTree(pages: Seq[String], variant: Int): Array[Byte] = {
    require(variant >= 0 && variant <= 3, s"encodePageTree: unknown variant $variant")
    require(pages.nonEmpty, "encodePageTree: at least one page")
    val nested = variant != 2
    val inheritRes = variant == 1 || variant == 3
    val split = variant >= 2
    val compress = variant == 3
    val fontRes = "/Resources << /Font << /F1 3 0 R >> >> "
    val bodies = scala.collection.mutable.LinkedHashMap[Int, String]()
    var next = 4
    def alloc(): Int = { val id = next; next += 1; id }
    val groups = if (nested) pages.grouped(3).toSeq else Seq(pages)
    val groupIds = if (nested) groups.map(_ => alloc()) else Seq.empty[Int]
    val pageInfo = pages.map { text =>
      val pid = alloc()
      val parts =
        if (!split || text.length < 9) Seq(text)
        else {
          val t = text.length / 3
          Seq(text.substring(0, t), text.substring(t, 2 * t), text.substring(2 * t))
        }
      (pid, parts.map { p =>
        (alloc(), s"BT /F1 12 Tf 72 720 Td (${escape(p)}) Tj ET")
      })
    }
    bodies(1) = "<< /Type /Catalog /Pages 2 0 R >>"
    val rootKids = (if (nested) groupIds else pageInfo.map(_._1))
      .map(id => s"$id 0 R").mkString(" ")
    bodies(2) = s"<< /Type /Pages /Kids [ $rootKids ] /Count ${pages.length} " +
      (if (inheritRes) fontRes else "") + ">>"
    bodies(3) = "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    if (nested) {
      var pi = 0
      groups.zip(groupIds).foreach { case (grp, gid) =>
        val kidIds = pageInfo.slice(pi, pi + grp.length).map(_._1)
        pi += grp.length
        bodies(gid) = s"<< /Type /Pages /Parent 2 0 R " +
          s"/Kids [ ${kidIds.map(id => s"$id 0 R").mkString(" ")} ] /Count ${grp.length} >>"
      }
    }
    pageInfo.zipWithIndex.foreach { case ((pid, contents), i) =>
      val parent = if (nested) groupIds(i / 3) else 2
      val contDecl =
        if (contents.length == 1) s"/Contents ${contents.head._1} 0 R"
        else s"/Contents [ ${contents.map(c => s"${c._1} 0 R").mkString(" ")} ]"
      bodies(pid) = s"<< /Type /Page /Parent $parent 0 R /MediaBox [ 0 0 612 792 ] " +
        (if (inheritRes) "" else fontRes) + s"$contDecl >>"
      contents.foreach { case (cid, streamText) =>
        if (compress) {
          val c = new String(deflate(streamText.getBytes(ISO_8859_1)), ISO_8859_1)
          bodies(cid) =
            s"<< /Length ${c.length} /Filter /FlateDecode >>\nstream\n$c\nendstream"
        } else
          bodies(cid) =
            s"<< /Length ${streamText.length} >>\nstream\n$streamText\nendstream"
      }
    }
    val sb = new StringBuilder
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    sb.append("%PDF-1.4\n")
    (1 until next).foreach { id =>
      offsets += sb.length
      sb.append(s"$id 0 obj\n").append(bodies(id)).append("\nendobj\n")
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
                                  xrefPredictor: Boolean = true,
                                  encryptRev: Int = 0): Array[Byte] = {
    val P = pages.length
    require(P > 0, "encodeObjStm: at least one page")
    require(Set(0, 3, 4).contains(encryptRev),
      s"encodeObjStm: unsupported encryption revision $encryptRev (0, 3 = RC4-128, 4 = AESV2)")
    // standard-handler parameters (empty user password), as in encode():
    // the ObjStm payload and the content streams are each encrypted ONCE
    // with their owning object's key; the xref stream and the /Encrypt
    // dict are never encrypted (ISO 32000 §7.5.8.2, §7.6.2)
    val permP = -4
    val id0 = if (encryptRev == 0) Array.empty[Byte]
      else md5(pages.mkString("\u0000").getBytes(ISO_8859_1)).take(16)
    val (encO, encU, fileKey) =
      if (encryptRev == 0) (Array.empty[Byte], Array.empty[Byte], Array.empty[Byte])
      else stdSecurity(3, permP, id0)
    def seal(oid: Int, payload: Array[Byte]): Array[Byte] = encryptRev match {
      case 0 => payload
      case 3 => cryptObject(fileKey, oid, payload)
      case _ => aesSeal(fileKey, oid, payload)
    }
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
    val objStmComp = new String(
      seal(1, deflate((header + bodies.mkString).getBytes(ISO_8859_1))), ISO_8859_1)

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
      val c = new String(seal(5 + P + i, deflate(stream.getBytes(ISO_8859_1))), ISO_8859_1)
      obj(5 + P + i,
        s"<< /Length ${c.length} /Filter /FlateDecode >>\nstream\n$c\nendstream")
    }
    val encId = if (encryptRev == 0) -1 else 5 + 2 * P
    if (encryptRev != 0) {
      val core = s"/O ${hexStr(encO)} /U ${hexStr(encU)} /P $permP"
      obj(encId, encryptRev match {
        case 3 => s"<< /Filter /Standard /V 2 /R 3 /Length 128 $core >>"
        case _ => "<< /Filter /Standard /V 4 /R 4 /Length 128 " +
          "/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> " +
          s"/StmF /StdCF /StrF /StdCF $core >>"
      })
    }
    val xrefId = 5 + 2 * P + (if (encryptRev == 0) 0 else 1)
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
    if (encryptRev != 0) row(encId, 1, topOffsets(encId).toLong, 0)
    row(xrefId, 1, xrefOff.toLong, 0)
    val (xrefData, xrefParms) =
      if (xrefPredictor)
        (Png.filterRows(rows, 7, 1, _ => 2), // PNG Up — predictor 12's classic shape
          " /DecodeParms << /Predictor 12 /Columns 7 >>")
      else (rows, "")
    val xrefComp = new String(deflate(xrefData), ISO_8859_1)
    // /Encrypt + /ID ride the XRef dict — the trailer region of a
    // cross-reference-stream document; the xref stream is NOT encrypted
    val encDecl =
      if (encryptRev == 0) ""
      else s" /Encrypt $encId 0 R /ID [ ${hexStr(id0)} ${hexStr(id0)} ]"
    obj(xrefId, s"<< /Type /XRef /Size $size /W [ 1 4 2 ] /Root 2 0 R$encDecl " +
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

  // ---- standard security handler (ISO 32000 §7.6.3, RC4 variants) ----------
  /** The 32-byte password pad from the spec (Table 21 / Algorithm 2). */
  private val PwPad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  /** Plain RC4 (public domain stream cipher; ISO 32000 names it for the
    * /V 1-2 handlers). */
  private[graft] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(identity)
    var j = 0
    for (i <- 0 until 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
    }
    val out = new Array[Byte](data.length)
    var i = 0; j = 0
    for (k <- data.indices) {
      i = (i + 1) & 0xff
      j = (j + s(i)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      out(k) = (data(k) ^ s((s(i) + s(j)) & 0xff)).toByte
    }
    out
  }

  private def intLe(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Empty-user-password standard-handler parameters for revision 2
    * (40-bit) or 3 (128-bit): (O, U, fileKey). P is the permissions
    * word; `id0` the first /ID element's raw bytes. Algorithms 2/3/4/5
    * of ISO 32000 §7.6.3 with user password = owner password = "". */
  private[graft] def stdSecurity(rev: Int, p: Int, id0: Array[Byte])
      : (Array[Byte], Array[Byte], Array[Byte]) = {
    require(rev == 2 || rev == 3, s"unsupported standard-handler revision $rev")
    val keyLen = if (rev == 2) 5 else 16
    // Algorithm 3: the /O value (owner pw = user pw = empty → pad both)
    var oKey = md5(PwPad).take(keyLen)
    if (rev == 3) for (_ <- 0 until 50) oKey = md5(oKey).take(keyLen)
    def rc4Rounds(key: Array[Byte], data: Array[Byte]): Array[Byte] =
      if (rev == 2) rc4(key, data)
      else (0 to 19).foldLeft(data) { (d, i) =>
        rc4(key.map(b => (b ^ i).toByte), d)
      }
    val o = rc4Rounds(oKey, PwPad)
    // Algorithm 2: the file encryption key
    var fileKey = md5(PwPad, o, intLe(p), id0).take(keyLen)
    if (rev == 3) for (_ <- 0 until 50) fileKey = md5(fileKey).take(keyLen)
    // Algorithms 4/5: the /U value
    val u =
      if (rev == 2) rc4(fileKey, PwPad)
      else rc4Rounds(fileKey, md5(PwPad, id0)) ++ new Array[Byte](16)
    (o, u, fileKey)
  }

  /** Per-object key (Algorithm 1): MD5(fileKey + objnum[3] + gen[2]
    * [+ "sAlT" for AESV2]), truncated to min(fileKey.len + 5, 16). */
  private def objectKey(fileKey: Array[Byte], objNum: Int, gen: Int,
                        aes: Boolean): Array[Byte] = {
    val salt = if (aes) Array[Byte](0x73, 0x41, 0x6C, 0x54) else Array.empty[Byte]
    md5(fileKey,
      Array((objNum & 0xff).toByte, ((objNum >> 8) & 0xff).toByte,
        ((objNum >> 16) & 0xff).toByte, (gen & 0xff).toByte,
        ((gen >> 8) & 0xff).toByte),
      salt)
      .take(math.min(fileKey.length + 5, 16))
  }

  private[graft] def cryptObject(fileKey: Array[Byte], objNum: Int,
                                 data: Array[Byte]): Array[Byte] =
    rc4(objectKey(fileKey, objNum, 0, aes = false), data) // RC4 is its own inverse

  private def aesCipher(mode: Int, key: Array[Byte], iv: Array[Byte]) = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(mode, new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c
  }

  /** AESV2 stream sealing (ISO 32000 §7.6.2-3): 16-byte IV prefix, then
    * AES-128-CBC over PKCS#5-padded data, per-object salted key. The IV
    * is derived deterministically from the object number — the spec
    * allows any IV (it rides in clear); determinism keeps staged fixture
    * bytes reproducible. */
  private[graft] def aesSeal(fileKey: Array[Byte], objNum: Int,
                             data: Array[Byte], deriveKey: Boolean = true): Array[Byte] = {
    // V5/AESV3 uses the 256-bit file key directly (no per-object
    // derivation — ISO 32000-2 dropped Algorithm 1 for /V 5)
    val key = if (deriveKey) objectKey(fileKey, objNum, 0, aes = true) else fileKey
    val iv = md5(Array("IV".getBytes(ISO_8859_1), intLe(objNum)): _*).take(16)
    val pad = 16 - data.length % 16
    val padded = data ++ Array.fill(pad)(pad.toByte)
    iv ++ aesCipher(javax.crypto.Cipher.ENCRYPT_MODE, key, iv).doFinal(padded)
  }

  private[graft] def aesUnseal(fileKey: Array[Byte], objNum: Int,
                               stored: Array[Byte], deriveKey: Boolean = true): Array[Byte] = {
    require(stored.length >= 32 && stored.length % 16 == 0,
      s"encrypted PDF: AES stream of ${stored.length} bytes is not IV + CBC blocks")
    val key = if (deriveKey) objectKey(fileKey, objNum, 0, aes = true) else fileKey
    val plain = aesCipher(javax.crypto.Cipher.DECRYPT_MODE, key,
      stored.take(16)).doFinal(stored.drop(16))
    val pad = plain.last & 0xff
    require(pad >= 1 && pad <= 16 && plain.length >= pad &&
        plain.takeRight(pad).forall(b => (b & 0xff) == pad),
      "encrypted PDF: bad AES padding (wrong key or corrupt stream)")
    plain.dropRight(pad)
  }

  /** Algorithm 2.B (ISO 32000-2 §7.6.4.3.4): the R6 password hash —
    * SHA-256 seed, then ≥64 rounds of AES-128-CBC over 64 repeats of
    * (pw ‖ K ‖ udata) with a data-dependent SHA-256/384/512 pick,
    * stopping once round ≥ 64 and the last cipher byte ≤ round − 32. */
  private[graft] def hash2b(pw: Array[Byte], salt: Array[Byte],
                            udata: Array[Byte]): Array[Byte] = {
    def sha(n: Int, data: Array[Byte]): Array[Byte] =
      java.security.MessageDigest.getInstance(s"SHA-$n").digest(data)
    var k = sha(256, pw ++ salt ++ udata)
    var i = 0
    var done = false
    var lastE: Byte = 0
    while (!done) {
      val block = pw ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      for (r <- 0 until 64) System.arraycopy(block, 0, k1, r * block.length, block.length)
      val e = aesCipher(javax.crypto.Cipher.ENCRYPT_MODE,
        k.take(16), k.slice(16, 32)).doFinal(k1)
      val mod = e.take(16).foldLeft(0)((a, b) => a + (b & 0xff)) % 3
      k = sha(Seq(256, 384, 512)(mod), e)
      lastE = e.last
      i += 1
      done = i >= 64 && (lastE & 0xff) <= i - 32
    }
    k.take(32)
  }

  /** AES-256 (R6) parameters for the empty user password: returns
    * (O, OE, U, UE, Perms, fileKey). Salts and the file key are
    * deterministic functions of `id0` so fixtures are reproducible —
    * the spec only requires them to be arbitrary. */
  private[graft] def v5Security(p: Int, id0: Array[Byte])
      : (Array[Byte], Array[Byte], Array[Byte], Array[Byte], Array[Byte], Array[Byte]) = {
    def salt(tag: String): Array[Byte] =
      md5(id0, tag.getBytes(ISO_8859_1)).take(8)
    val fileKey = java.security.MessageDigest.getInstance("SHA-256")
      .digest(id0 ++ "filekey".getBytes(ISO_8859_1))
    val zeroIv = new Array[Byte](16)
    val empty = Array.empty[Byte]
    val (uv, uk) = (salt("uv"), salt("uk"))
    val u = hash2b(empty, uv, empty) ++ uv ++ uk
    val ue = aesCipher(javax.crypto.Cipher.ENCRYPT_MODE,
      hash2b(empty, uk, empty), zeroIv).doFinal(fileKey)
    val (ov, ok) = (salt("ov"), salt("ok"))
    val o = hash2b(empty, ov, u) ++ ov ++ ok
    val oe = aesCipher(javax.crypto.Cipher.ENCRYPT_MODE,
      hash2b(empty, ok, u), zeroIv).doFinal(fileKey)
    // /Perms: P (LE) ‖ FF FF FF FF ‖ 'T' (metadata encrypted) ‖ "adb" ‖ 4
    // arbitrary bytes, AES-ECB under the file key
    val permsPlain = intLe(p) ++ Array.fill[Byte](4)(0xFF.toByte) ++
      "Tadb".getBytes(ISO_8859_1) ++ salt("pz").take(4)
    val ecb = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
    ecb.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(fileKey, "AES"))
    (o, oe, u, ue, ecb.doFinal(permsPlain), fileKey)
  }

  private def hexStr(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02X").mkString("<", "", ">")

  private def parseHexOrLiteral(body: String, key: String): Array[Byte] = {
    // a bare indexOf would let "/U" bind to the "/U" prefix of "/UE"
    // (dict key order is arbitrary) — require a non-name char after the key
    var at = body.indexOf(key)
    while (at >= 0 && at + key.length < body.length &&
        body(at + key.length).isLetterOrDigit)
      at = body.indexOf(key, at + 1)
    require(at >= 0, s"encrypted PDF: /Encrypt dict missing $key")
    var i = at + key.length
    // skip whitespace and an optional array opener ('/ID [ <…> <…> ]')
    while (i < body.length && (body(i).isWhitespace || body(i) == '[')) i += 1
    require(i < body.length, s"encrypted PDF: truncated $key value")
    if (body(i) == '<') {
      val end = body.indexOf('>', i)
      require(end > i, s"encrypted PDF: unterminated hex string for $key")
      val hex = body.substring(i + 1, end).replaceAll("\\s", "")
      require(hex.length % 2 == 0, s"encrypted PDF: odd hex string for $key")
      hex.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
    } else if (body(i) == '(') {
      val (s, _) = parseString(body, i)
      s.getBytes(ISO_8859_1)
    } else throw new IllegalArgumentException(
      s"encrypted PDF: $key is neither a hex nor a literal string")
  }

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
  /** `unseal` decrypts a stream's STORED bytes with the owning object's
    * key (identity for unencrypted docs): in an encrypted document the
    * ObjStm payload is encrypted ONCE as that object's stream — its
    * member objects (and their strings) are NOT encrypted individually
    * (ISO 32000 §7.5.7), which is why the members need no further
    * treatment after this expansion. */
  private def expandObjectStreams(objs: Map[Int, String],
                                  unseal: (Int, String) => String): Map[Int, String] = {
    val members = Map.newBuilder[Int, String]
    objs.foreach { case (oid, body) =>
      val sAt = body.indexOf("stream")
      val dict = if (sAt >= 0) body.substring(0, sAt) else body
      if (objStmPat.matcher(dict).find()) {
        require(sAt >= 0, "corrupt PDF: ObjStm without stream data")
        val n = dictInt(dict, "N")
        val first = dictInt(dict, "First")
        val data = decodeStream(dict, unseal(oid, streamData(body)))
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
  /** Locate and authenticate the standard security handler, if any:
    * returns the file key for per-object RC4 decryption. Only the
    * empty-user-password case opens (the "encrypted but openable"
    * shape most tooling meets); a real password, or any non-RC4
    * /Filter//V//R, throws loudly. */
  /** (file key, mode): 0 = RC4 per-object, 1 = AESV2 per-object,
    * 2 = AESV3 direct file key. */
  /** The region where trailer keys (/Encrypt, /ID) may legally live: from
    * the LAST `trailer` keyword to EOF (incremental updates: the last one
    * governs), or — in the xref-stream shape, which has no `trailer`
    * keyword — the cross-reference stream's own dictionary. Searching the
    * whole document instead misdetects an unencrypted file whose
    * uncompressed page text merely contains the literal "/Encrypt". */
  private[graft] def trailerRegion(doc: String): String = {
    val tAt = doc.lastIndexOf("trailer")
    if (tAt >= 0) return doc.substring(tAt)
    val xAt = doc.lastIndexOf("/XRef")
    if (xAt < 0) return doc // degenerate shape: keep the permissive scan
    val dictStart = doc.lastIndexOf("<<", xAt)
    val dictEnd = doc.indexOf("stream", xAt)
    if (dictStart >= 0 && dictEnd > dictStart) doc.substring(dictStart, dictEnd)
    else doc
  }

  private def encryptionKey(doc: String, objs: Map[Int, String])
      : Option[(Array[Byte], Int)] = {
    val trailer = trailerRegion(doc)
    val encAt = trailer.indexOf("/Encrypt")
    if (encAt < 0) return None
    val enc = objs.getOrElse(ref(trailer.substring(encAt), "/Encrypt"),
      throw new IllegalArgumentException("encrypted PDF: missing /Encrypt object"))
    require(enc.contains("/Standard"),
      "encrypted PDF: only the /Standard security handler is supported")
    val v = dictInt(enc, "V")
    val r = dictInt(enc, "R")
    val aesV2 = v == 4 && r == 4
    val aesV3 = v == 5 && r == 6
    require((v == 1 && r == 2) || (v == 2 && r == 3) || aesV2 || aesV3,
      s"encrypted PDF: unsupported /V $v /R $r (RC4 revisions 2-3, AESV2 /V 4, " +
        "AES-256 /V 5 /R 6)")
    require(!aesV2 || enc.contains("/AESV2"),
      "encrypted PDF: /V 4 without an /AESV2 crypt filter is not supported")
    require(!aesV3 || enc.contains("/AESV3"),
      "encrypted PDF: /V 5 without an /AESV3 crypt filter is not supported")
    if (aesV3) {
      // R6: validate against /U = hash(32) | valSalt(8) | keySalt(8),
      // then unwrap the 256-bit file key from /UE (Algorithms 2.A / 8)
      val storedU6 = parseHexOrLiteral(enc, "/U")
      require(storedU6.length == 48,
        s"encrypted PDF: /R 6 /U must be 48 bytes, got ${storedU6.length}")
      val ue = parseHexOrLiteral(enc, "/UE")
      require(ue.length == 32,
        s"encrypted PDF: /R 6 /UE must be 32 bytes, got ${ue.length}")
      val valSalt = storedU6.slice(32, 40)
      val keySalt = storedU6.slice(40, 48)
      val empty = Array.empty[Byte]
      require(java.util.Arrays.equals(
          hash2b(empty, valSalt, empty), storedU6.take(32)),
        "encrypted PDF: password required (empty user password rejected by /U check)")
      val fk = aesCipher(javax.crypto.Cipher.DECRYPT_MODE,
        hash2b(empty, keySalt, empty), new Array[Byte](16)).doFinal(ue)
      return Some((fk, 2))
    }
    val pM = java.util.regex.Pattern.compile("/P\\s+(-?\\d+)").matcher(enc)
    require(pM.find(), "encrypted PDF: /Encrypt dict missing /P")
    val p = pM.group(1).toInt
    val storedU = parseHexOrLiteral(enc, "/U")
    val idAt = trailer.lastIndexOf("/ID")
    require(idAt >= 0, "encrypted PDF: trailer has no /ID (required by the key algorithm)")
    val id0 = parseHexOrLiteral(trailer.substring(idAt), "/ID")
    val (_, expectU, fileKey) = stdSecurity(if (r == 4) 3 else r, p, id0)
    val authentic =
      if (r == 2) java.util.Arrays.equals(storedU, expectU)
      else storedU.length >= 16 && java.util.Arrays.equals(
        storedU.take(16), expectU.take(16))
    require(authentic,
      "encrypted PDF: password required (empty user password rejected by /U check)")
    Some((fileKey, if (aesV2) 1 else 0))
  }

  private[graft] def decodePages(bytes: Array[Byte]): Seq[String] = {
    require(isPdf(bytes), "not a PDF (missing %PDF- header)")
    val doc = new String(bytes, ISO_8859_1)
    val plainObjs = objects(doc)
    val fileKey = encryptionKey(doc, plainObjs)
    // decryption is OUTERMOST: per-object key first, then the declared
    // filter chain (ISO 32000 §7.6.2) — same order for content streams,
    // /ToUnicode CMap streams, and ObjStm payloads (whose members are
    // then already plaintext, §7.5.7)
    def unseal(oid: Int, stored: String): String = fileKey.fold(stored) { case (k, mode) =>
      val raw = stored.getBytes(ISO_8859_1)
      val plain = mode match {
        case 0 => cryptObject(k, oid, raw)
        case 1 => aesUnseal(k, oid, raw)
        case _ => aesUnseal(k, oid, raw, deriveKey = false)
      }
      new String(plain, ISO_8859_1)
    }
    val objs = expandObjectStreams(plainObjs, unseal)
    // /ToUnicode CMaps resolved once per CMap object (fonts are shared
    // across pages; re-parsing per page would be O(pages × cmap))
    val cmapCache = scala.collection.mutable.Map[Int, (Int, Map[Int, String])]()
    val fontCache = scala.collection.mutable.Map[Int, Option[(Int, Map[Int, String])]]()
    /** The font's code → text decode, resolved in the conformant-viewer
      * precedence (ISO 32000 §9.10.2): an embedded /ToUnicode CMap wins;
      * else a Type0's PREDEFINED Identity-H/V CMap decodes 2-byte codes
      * as UTF-16 units (other predefined registries throw — decoding
      * them needs CMap resources we don't ship); else a simple font's
      * /Encoding (name or dict with /BaseEncoding + /Differences) walks
      * the Appendix D tables glyph-name-by-glyph-name; a simple font
      * with NO /Encoding keeps the built-in-font byte passthrough. */
    def fontDecodeOf(fontOid: Int): Option[(Int, Map[Int, String])] =
      fontCache.getOrElseUpdate(fontOid, {
        val font = objs.getOrElse(fontOid,
          throw new IllegalArgumentException(s"corrupt PDF: missing font object $fontOid"))
        val isType0 = type0Pat.matcher(font).find()
        val tAt = font.indexOf("/ToUnicode")
        if (tAt >= 0) {
          val cmapOid = ref(font.substring(tAt), "/ToUnicode")
          Some(cmapCache.getOrElseUpdate(cmapOid, {
            val body = objs.getOrElse(cmapOid,
              throw new IllegalArgumentException("corrupt PDF: missing /ToUnicode object"))
            val sAt = body.indexOf("stream")
            require(sAt >= 0, "corrupt PDF: /ToUnicode without a stream")
            parseToUnicode(
              decodeStream(body.substring(0, sAt), unseal(cmapOid, streamData(body))))
          }))
        } else {
          val eAt = font.indexOf("/Encoding")
          if (eAt < 0) {
            require(!isType0,
              "corrupt PDF: Type0 font without /Encoding or /ToUnicode")
            None
          } else {
            var i = eAt + "/Encoding".length
            while (i < font.length && font(i).isWhitespace) i += 1
            if (i < font.length && font(i) == '/') {
              var j = i + 1
              while (j < font.length && !nameDelim(font(j))) j += 1
              font.substring(i + 1, j) match {
                case "Identity-H" | "Identity-V" =>
                  require(isType0,
                    "corrupt PDF: Identity CMap /Encoding on a non-Type0 font")
                  Some((2, identityCidMap))
                case other if isType0 =>
                  throw new IllegalArgumentException(
                    s"unsupported predefined CMap /$other: only Identity-H/V " +
                      "is decodable without an embedded /ToUnicode")
                case name => Some((1, PdfEncodings.decodeMap(
                  PdfEncodings.baseTable(name), Map.empty)))
              }
            } else {
              require(!isType0, "corrupt PDF: Type0 /Encoding must be a CMap name")
              val dict =
                if (font.startsWith("<<", i)) balancedDict(font, i)
                else {
                  val m = refPat.matcher(font)
                  m.region(i, font.length)
                  require(m.lookingAt(),
                    "corrupt PDF: /Encoding is neither a name, dict, nor reference")
                  val body = objs.getOrElse(m.group(1).toInt,
                    throw new IllegalArgumentException(
                      "corrupt PDF: missing /Encoding object"))
                  val dAt = body.indexOf("<<")
                  require(dAt >= 0, "corrupt PDF: /Encoding object is not a dict")
                  balancedDict(body, dAt)
                }
              val base = {
                val bm = baseEncPat.matcher(dict)
                if (bm.find()) PdfEncodings.baseTable(bm.group(1))
                else PdfEncodings.standard
              }
              Some((1, PdfEncodings.decodeMap(base, parseDifferences(dict))))
            }
          }
        }
      })
    val rootAt = doc.lastIndexOf("/Root")
    require(rootAt >= 0, "corrupt PDF: trailer has no /Root")
    val catalog = objs(ref(doc.substring(rootAt), "/Root"))
    /** Depth-first page-tree walk (ISO 32000 §7.7.3): interior /Pages
      * nodes recurse into their /Kids IN ORDER — real generators emit
      * balanced trees, not flat roots — and /Resources INHERITS down
      * the tree (§7.7.3.4): a leaf without its own /Resources decodes
      * under the nearest ancestor's. Returns (resource owner dict,
      * page dict) per leaf. Degenerate trees (depth > 64, no /Kids,
      * non-Page leaves) throw. */
    def pageLeaves(oid: Int, inherited: String, depth: Int): Seq[(String, String)] = {
      require(depth < 64, "corrupt PDF: page tree deeper than 64 levels (cycle?)")
      val node = objs.getOrElse(oid, throw new IllegalArgumentException(
        s"corrupt PDF: missing page tree node $oid"))
      if (pagesTypePat.matcher(node).find()) {
        val kAt = node.indexOf("/Kids")
        require(kAt >= 0, "corrupt PDF: page tree has no /Kids")
        val kEnd = node.indexOf(']', kAt)
        require(kEnd >= 0, "corrupt PDF: unterminated /Kids array")
        val m = refPat.matcher(node.substring(kAt, kEnd))
        val b = Seq.newBuilder[Int]
        while (m.find()) b += m.group(1).toInt
        val kids = b.result()
        require(kids.nonEmpty, "corrupt PDF: empty page tree")
        val inh = if (node.contains("/Resources")) node else inherited
        kids.flatMap(k => pageLeaves(k, inh, depth + 1))
      } else {
        require(pageTypePat.matcher(node).find(),
          "corrupt PDF: page tree leaf is not /Type /Page")
        Seq((if (node.contains("/Resources")) node else inherited, node))
      }
    }
    /** The page's /Contents: a single stream ref or an ARRAY of refs
      * whose streams concatenate into the page's content (§7.7.3.3 —
      * the split-content shape incremental editors emit; reading only
      * the first element silently loses text). */
    def contentsOf(page: String): Seq[Int] = {
      val cAt = page.indexOf("/Contents")
      require(cAt >= 0, "corrupt PDF: page without /Contents")
      var i = cAt + "/Contents".length
      while (i < page.length && page(i).isWhitespace) i += 1
      if (i < page.length && page(i) == '[') {
        val end = page.indexOf(']', i)
        require(end >= 0, "corrupt PDF: unterminated /Contents array")
        val m = refPat.matcher(page.substring(i, end))
        val b = Seq.newBuilder[Int]
        while (m.find()) b += m.group(1).toInt
        val ids = b.result()
        require(ids.nonEmpty, "corrupt PDF: empty /Contents array")
        ids
      } else Seq(ref(page.substring(cAt), "/Contents"))
    }
    /** Extract the text of one content stream under `owner`'s resources
      * (a page, or a Form XObject carrying its own /Resources). `Do`
      * operators recurse: Form XObjects contribute their own stream's
      * text decoded under their own resources — or, when the form has
      * no /Resources entry, the INVOKER's (the PDF 1.1 inheritance
      * shape still common in the wild); Image XObjects contribute
      * nothing; other subtypes and cycles throw. */
    def ownedText(owner: String, contentOids: Seq[Int], visited: Set[Int]): String = {
      // a /Contents array's streams concatenate into ONE content stream;
      // the division falls on token boundaries (§7.8.2), so a whitespace
      // join preserves the token sequence exactly
      val stream = contentOids.map { contentOid =>
        val contents = objs.getOrElse(contentOid,
          throw new IllegalArgumentException("corrupt PDF: missing contents object"))
        val sAt = contents.indexOf("stream")
        require(sAt >= 0, "corrupt PDF: contents without stream")
        decodeStream(contents.substring(0, sAt), unseal(contentOid, streamData(contents)))
      }.mkString("\n")
      val fonts = fontRefs(owner, objs).map { case (n, oid) => n -> fontDecodeOf(oid) }
      val xobjs = resourceRefs(owner, objs, "/XObject")
      extractText(stream, fonts, name => {
        val oid = xobjs.getOrElse(name, throw new IllegalArgumentException(
          s"corrupt PDF: Do of /$name not in the resources /XObject dict"))
        require(!visited.contains(oid), "corrupt PDF: recursive Form XObject")
        val body = objs.getOrElse(oid, throw new IllegalArgumentException(
          s"corrupt PDF: missing XObject $oid"))
        // subtype / resources checks read only the DICT region — the
        // stream payload could contain those byte sequences by chance
        val bSt = body.indexOf("stream")
        val bDict = if (bSt >= 0) body.substring(0, bSt) else body
        if (imagePat.matcher(bDict).find()) "" // images carry no text
        else {
          require(formPat.matcher(bDict).find(),
            s"corrupt PDF: Do of /$name which is neither Form nor Image")
          val formOwner = if (bDict.contains("/Resources")) body else owner
          ownedText(formOwner, Seq(oid), visited + oid)
        }
      })
    }
    pageLeaves(ref(catalog, "/Pages"), "", 0).map { case (owner, page) =>
      ownedText(owner, contentsOf(page), Set.empty)
    }
  }

  private val imagePat = java.util.regex.Pattern.compile("/Subtype\\s*/Image\\b")
  private val formPat = java.util.regex.Pattern.compile("/Subtype\\s*/Form\\b")
  private val pagesTypePat = java.util.regex.Pattern.compile("/Type\\s*/Pages\\b")
  private val pageTypePat = java.util.regex.Pattern.compile("/Type\\s*/Page\\b")
  private val inlineLenPat = java.util.regex.Pattern.compile("/L\\s+(\\d+)")

  /** The page's (or form's) /Resources <kind> entries as name → object
    * id, kind ∈ {"/Font", "/XObject"}. Both the resources dict and the
    * inner dict may be inline or indirect (ISO 32000 §7.8.3); a page
    * without resources or without that kind simply has none (valid for
    * pages showing no text / invoking no XObjects). */
  private def resourceRefs(page: String, objs: Map[Int, String],
                           kind: String): Map[String, Int] = {
    def resolve(s: String, from: Int): String = {
      var i = from
      while (i < s.length && s(i).isWhitespace) i += 1
      if (s.startsWith("<<", i)) balancedDict(s, i)
      else {
        val m = refPat.matcher(s)
        m.region(i, s.length)
        require(m.lookingAt(), "corrupt PDF: expected a dict or reference")
        objs.getOrElse(m.group(1).toInt,
          throw new IllegalArgumentException("corrupt PDF: missing resources object"))
      }
    }
    val rAt = page.indexOf("/Resources")
    if (rAt < 0) return Map.empty
    val res = resolve(page, rAt + "/Resources".length)
    // the key must end at a delimiter ("/Font" must not match "/FontFile")
    var fAt = res.indexOf(kind)
    while (fAt >= 0 && fAt + kind.length < res.length &&
           !nameDelim(res(fAt + kind.length)) && !res(fAt + kind.length).isWhitespace)
      fAt = res.indexOf(kind, fAt + 1)
    if (fAt < 0) return Map.empty
    val fdict = resolve(res, fAt + kind.length)
    val m = fontEntryPat.matcher(fdict)
    val b = Map.newBuilder[String, Int]
    while (m.find()) b += m.group(1) -> m.group(2).toInt
    b.result()
  }

  private def fontRefs(page: String, objs: Map[Int, String]): Map[String, Int] =
    resourceRefs(page, objs, "/Font")

  private val fontEntryPat =
    java.util.regex.Pattern.compile("/([A-Za-z0-9.+-]+)\\s+(\\d+)\\s+0\\s+R")

  private val type0Pat =
    java.util.regex.Pattern.compile("/Subtype\\s*/Type0\\b")
  private val baseEncPat =
    java.util.regex.Pattern.compile("/BaseEncoding\\s*/([A-Za-z]+)")

  /** Identity CID decode (predefined Identity-H/V, no /ToUnicode):
    * each 2-byte code IS a UTF-16 code unit; surrogate halves pass
    * through individually and re-pair in the output string. Built once
    * per JVM — fonts share it across documents. */
  private lazy val identityCidMap: Map[Int, String] =
    (0 until 0x10000).map(c => c -> c.toChar.toString).toMap

  /** The /Differences array of an encoding dict: `[ code /n1 /n2 code2
    * /n3 … ]` — each integer restarts the code counter, each name takes
    * the next code (ISO 32000 §9.6.6.3). Returns code → glyph name;
    * malformed arrays (no opener, code outside 0-255, name before any
    * code) throw. */
  private[graft] def parseDifferences(dict: String): Map[Int, String] = {
    val dAt = dict.indexOf("/Differences")
    if (dAt < 0) return Map.empty
    val lb = dict.indexOf('[', dAt)
    require(lb >= 0, "corrupt PDF: /Differences without an array")
    val rb = dict.indexOf(']', lb)
    require(rb >= 0, "corrupt PDF: unterminated /Differences array")
    val out = Map.newBuilder[Int, String]
    var code = -1
    var i = lb + 1
    while (i < rb) {
      val c = dict(i)
      if (c.isWhitespace) i += 1
      else if (c == '/') {
        var j = i + 1
        while (j < rb && !nameDelim(dict(j))) j += 1
        require(code >= 0, "corrupt PDF: /Differences name before any code")
        require(code <= 255, s"corrupt PDF: /Differences code $code exceeds a byte")
        out += code -> dict.substring(i + 1, j)
        code += 1
        i = j
      } else if (c.isDigit) {
        var j = i
        while (j < rb && dict(j).isDigit) j += 1
        code = dict.substring(i, j).toInt
        require(code <= 255, s"corrupt PDF: /Differences code $code exceeds a byte")
        i = j
      } else throw new IllegalArgumentException(
        s"corrupt PDF: unexpected '$c' in /Differences array")
    }
    out.result()
  }

  /** The balanced `<< … >>` dict starting at `at` (which must point at
    * `<<`), inclusive. */
  private def balancedDict(s: String, at: Int): String = {
    require(s.startsWith("<<", at), "internal: balancedDict off a non-dict")
    var i = at
    var depth = 0
    while (i < s.length) {
      if (s.startsWith("<<", i)) { depth += 1; i += 2 }
      else if (s.startsWith(">>", i)) {
        depth -= 1; i += 2
        if (depth == 0) return s.substring(at, i)
      } else i += 1
    }
    throw new IllegalArgumentException("corrupt PDF: unterminated dictionary")
  }

  /** Parse a /ToUnicode CMap stream (Adobe CMap syntax as profiled by
    * ISO 32000 §9.10.3): returns (code width in bytes, code → Unicode
    * string). Honors `codespacerange` (1- or 2-byte codes), `bfchar`
    * pairs, and both `bfrange` forms — incrementing destination
    * (`<lo> <hi> <dst>`) and explicit array (`<lo> <hi> [<d>…]`).
    * Malformed CMaps (no codespacerange, mixed widths, wrong-arity
    * clauses, array length ≠ range size) throw — a silently partial
    * CMap would decode pages to garbage. */
  private[graft] def parseToUnicode(cmap: String): (Int, Map[Int, String]) = {
    def bodies(kw: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      var from = 0
      var at = cmap.indexOf("begin" + kw, from)
      while (at >= 0) {
        val end = cmap.indexOf("end" + kw, at)
        require(end >= 0, s"corrupt PDF: unterminated $kw section in /ToUnicode CMap")
        out += cmap.substring(at + ("begin" + kw).length, end)
        from = end + ("end" + kw).length
        at = cmap.indexOf("begin" + kw, from)
      }
      out.result()
    }
    // tokens: <hex>, '[' and ']'
    def tokens(body: String): Seq[String] = {
      val m = cmapTokPat.matcher(body)
      val b = Seq.newBuilder[String]
      while (m.find()) b += m.group()
      b.result()
    }
    def hexVal(tok: String): Long = {
      require(tok.length >= 2 && tok.head == '<' && tok.last == '>',
        s"corrupt PDF: expected a hex token in /ToUnicode CMap, got '$tok'")
      val h = tok.substring(1, tok.length - 1)
      require(h.nonEmpty && h.length % 2 == 0,
        s"corrupt PDF: odd-length hex token <$h> in /ToUnicode CMap")
      java.lang.Long.parseLong(h, 16)
    }
    def hexWidth(tok: String): Int = (tok.length - 2) / 2
    def utf16Of(tok: String): String = {
      val h = tok.substring(1, tok.length - 1)
      require(h.length % 4 == 0,
        s"corrupt PDF: /ToUnicode destination <$h> is not UTF-16BE units")
      val sb = new StringBuilder
      var i = 0
      while (i < h.length) {
        sb.append(Integer.parseInt(h.substring(i, i + 4), 16).toChar)
        i += 4
      }
      sb.toString
    }
    // destination of an incrementing bfrange: the dst value as a
    // big-endian number plus the offset, re-encoded at the same width
    def incremented(dstTok: String, offset: Int): String = {
      val h = dstTok.substring(1, dstTok.length - 1)
      require(h.length % 4 == 0 && h.length <= 12,
        s"corrupt PDF: /ToUnicode bfrange destination <$h> is not 1-3 UTF-16BE units")
      val v = java.lang.Long.parseLong(h, 16) + offset
      val widened = String.format(s"%0${h.length}X", java.lang.Long.valueOf(v))
      require(widened.length == h.length,
        s"corrupt PDF: bfrange destination overflow at <$h> + $offset")
      utf16Of("<" + widened + ">")
    }
    val spaceRanges = bodies("codespacerange").flatMap(tokens)
    require(spaceRanges.nonEmpty && spaceRanges.length % 2 == 0,
      "corrupt PDF: /ToUnicode CMap has no codespacerange")
    val widths = spaceRanges.map(hexWidth).distinct
    require(widths.length == 1 && (widths.head == 1 || widths.head == 2),
      s"corrupt PDF: unsupported /ToUnicode code widths $widths (1 or 2 bytes)")
    val width = widths.head
    val map = Map.newBuilder[Int, String]
    bodies("bfchar").foreach { body =>
      val toks = tokens(body)
      require(toks.length % 2 == 0, "corrupt PDF: bfchar clause is not <src> <dst> pairs")
      toks.grouped(2).foreach { case Seq(src, dst) =>
        require(hexWidth(src) == width,
          s"corrupt PDF: bfchar source $src does not match code width $width")
        map += hexVal(src).toInt -> utf16Of(dst)
      }
    }
    bodies("bfrange").foreach { body =>
      val toks = tokens(body)
      var i = 0
      while (i < toks.length) {
        require(i + 2 < toks.length, "corrupt PDF: truncated bfrange clause")
        val lo = hexVal(toks(i)).toInt
        val hi = hexVal(toks(i + 1)).toInt
        require(hexWidth(toks(i)) == width && hexWidth(toks(i + 1)) == width,
          s"corrupt PDF: bfrange bounds do not match code width $width")
        require(lo <= hi, s"corrupt PDF: inverted bfrange <$lo> > <$hi>")
        if (toks(i + 2) == "[") {
          val close = toks.indexOf("]", i + 3)
          require(close >= 0, "corrupt PDF: unterminated bfrange destination array")
          val dsts = toks.slice(i + 3, close)
          require(dsts.length == hi - lo + 1,
            s"corrupt PDF: bfrange array has ${dsts.length} entries for ${hi - lo + 1} codes")
          dsts.zipWithIndex.foreach { case (d, k) => map += (lo + k) -> utf16Of(d) }
          i = close + 1
        } else {
          val dst = toks(i + 2)
          (lo to hi).foreach(c => map += c -> incremented(dst, c - lo))
          i += 3
        }
      }
    }
    (width, map.result())
  }

  private val cmapTokPat =
    java.util.regex.Pattern.compile("<[0-9A-Fa-f]*>|\\[|\\]")

  /** Tokenize a content stream's BT…ET blocks and concatenate the
    * operands of Tj and TJ show ops in stream order. The no-font form:
    * show strings pass through byte-identically (the simple-font
    * StandardEncoding subset the internal writer emits). */
  private[graft] def extractText(stream: String): String =
    extractText(stream, Map.empty)

  /** Font-aware form: `fonts` maps resource names (from the page's
    * /Resources /Font dict) to their /ToUnicode CMap, if any. The
    * tokenizer tracks the current font through `Tf` and pushes every
    * show string — literal or hex — through the active CMap: codes are
    * consumed at the CMap's declared width (1 or 2 bytes) and mapped to
    * Unicode, the composite-font decode PyMuPDF performs for every
    * browser/LaTeX/Word-generated PDF (reference: app.py:123-132). A
    * show string whose length is not a multiple of the code width, or
    * containing an unmapped code, throws — partial text would silently
    * corrupt the corpus. Fonts without a CMap keep the identity path. */
  private[graft] def extractText(
      stream: String,
      fonts: Map[String, Option[(Int, Map[Int, String])]]): String =
    extractText(stream, fonts, _ => "")

  /** Full form: `resolveForm` is invoked for every `Do` operator with
    * the XObject's resource name and must return the TEXT the invoked
    * object contributes — a Form XObject's recursively-extracted
    * content stream, "" for images (decodePages wires this; the
    * shorter overloads no-op it, which only spec-level raw-stream
    * calls use). `Do` executes OUTSIDE BT/ET — it is a graphics-state
    * operator, so the append is unconditional. */
  private[graft] def extractText(
      stream: String,
      fonts: Map[String, Option[(Int, Map[Int, String])]],
      resolveForm: String => String): String = {
    val out = new StringBuilder
    var i = 0
    var inText = false
    var lastString: String = null
    var lastName: String = null
    var curCmap: Option[(Int, Map[Int, String])] = None
    def mapped(raw: String): String = curCmap match {
      case None => raw
      case Some((w, m)) =>
        require(raw.length % w == 0,
          s"corrupt PDF: show string of ${raw.length} bytes is not a " +
            s"multiple of the /ToUnicode code width $w")
        val sb = new StringBuilder
        var j = 0
        while (j < raw.length) {
          var code = 0
          var k = 0
          while (k < w) { code = (code << 8) | (raw.charAt(j + k) & 0xFF); k += 1 }
          sb.append(m.getOrElse(code, throw new IllegalArgumentException(
            f"corrupt PDF: code 0x$code%04X is not mapped by the active font's encoding")))
          j += w
        }
        sb.toString
    }
    while (i < stream.length) {
      val c = stream(i)
      if (c == '(') {
        val (s, next) = parseString(stream, i)
        lastString = s
        i = next
      } else if (c == '<' && stream.startsWith("<<", i)) {
        i += 2 // inline dict open (BDC/BI property lists): not a string
      } else if (c == '<') {
        val (s, next) = parseHexString(stream, i)
        lastString = s
        i = next
      } else if (c == '/') {
        var j = i + 1
        while (j < stream.length && !nameDelim(stream(j))) j += 1
        lastName = stream.substring(i + 1, j)
        i = j
      } else if (stream.startsWith("BT", i) && wordAt(stream, i, 2)) {
        inText = true; lastString = null; i += 2
      } else if (stream.startsWith("ET", i) && wordAt(stream, i, 2)) {
        inText = false; i += 2
      } else if (stream.startsWith("BI", i) && wordAt(stream, i, 2)) {
        // inline image (ISO 32000 §8.9.7): BI <dict entries> ID <binary>
        // EI — the payload is RAW BYTES that can contain '(', "BT", "Tj"
        // by chance, so it must be skipped, not tokenized. The payload
        // ends at whitespace + "EI" + delimiter/end (the lenient scan
        // every real parser uses, since /L is optional).
        var j = i + 2
        while (j < stream.length && !(stream.startsWith("ID", j) && wordAt(stream, j, 2)))
          j += 1
        require(j < stream.length, "corrupt PDF: inline image without ID")
        // honor /L (the data length, PDF 2.0 §8.9.7) when declared: pixel
        // bytes can contain " EI " by chance, and only the length makes
        // the skip exact — the lenient terminator scan is the fallback
        // for the (still common) /L-less form
        val biDict = stream.substring(i, j)
        val lm = inlineLenPat.matcher(biDict)
        j += 3 // ID + the single whitespace byte that follows it
        if (lm.find()) {
          val dataLen = lm.group(1).toInt
          require(j + dataLen + 3 <= stream.length,
            "corrupt PDF: inline image /L overruns the content stream")
          j += dataLen
          while (j < stream.length && stream(j).isWhitespace) j += 1
          require(stream.startsWith("EI", j) && wordAt(stream, j, 2),
            "corrupt PDF: inline image /L not followed by EI")
          i = j + 2
        } else {
          var end = -1
          while (end < 0 && j + 1 < stream.length) {
            if (stream(j).isWhitespace && stream.startsWith("EI", j + 1) &&
                (j + 3 >= stream.length || nameDelim(stream(j + 3)) ||
                  stream(j + 3).isWhitespace))
              end = j + 3
            else j += 1
          }
          require(end >= 0, "corrupt PDF: inline image without EI")
          i = end
        }
      } else if (stream.startsWith("Do", i) && wordAt(stream, i, 2)) {
        require(lastName != null, "corrupt PDF: Do without an XObject name")
        out.append(resolveForm(lastName))
        lastName = null; i += 2
      } else if (stream.startsWith("Tf", i) && wordAt(stream, i, 2)) {
        // `/Name size Tf`: the name operand selects the font; a name
        // missing from the resources dict keeps the identity decode (the
        // caller may have no resources at all — the legacy single-arg path)
        curCmap = if (lastName == null) None else fonts.getOrElse(lastName, None)
        i += 2
      } else if (stream.startsWith("Tj", i) && wordAt(stream, i, 2)) {
        require(lastString != null, "corrupt PDF: Tj without a string operand")
        if (inText) out.append(mapped(lastString))
        lastString = null; i += 2
      } else if (stream.startsWith("TJ", i) && wordAt(stream, i, 2)) {
        // array form: strings already concatenated as they were parsed;
        // numeric kerning operands carry no text
        require(lastString != null, "corrupt PDF: TJ without operands")
        if (inText) out.append(mapped(lastString))
        lastString = null; i += 2
      } else if (c == '[') {
        // TJ array: gather every string element into one pending operand
        // (literal and hex strings mix freely in real kerned output)
        val sb = new StringBuilder
        i += 1
        while (i < stream.length && stream(i) != ']') {
          if (stream(i) == '(') {
            val (s, next) = parseString(stream, i)
            sb.append(s); i = next
          } else if (stream(i) == '<') {
            val (s, next) = parseHexString(stream, i)
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

  private def nameDelim(c: Char): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '(' || c == ')' ||
      c == '[' || c == ']' || c == '<' || c == '>' || c == '/' || c == '%'

  /** PDF hex string at `at` (must be '<'): hex digit pairs, whitespace
    * ignored, an odd final digit padded with 0 (ISO 32000 §7.3.4.3).
    * Returns (decoded bytes as a Latin-1 string, index after '>'). */
  private def parseHexString(s: String, at: Int): (String, Int) = {
    require(s(at) == '<', "internal: parseHexString off a non-angle")
    val sb = new StringBuilder
    var i = at + 1
    var pending = -1
    while (i < s.length && s(i) != '>') {
      val c = s(i)
      val d = Character.digit(c, 16)
      if (d >= 0) {
        if (pending < 0) pending = d
        else { sb.append(((pending << 4) | d).toChar); pending = -1 }
      } else require(c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f',
        s"corrupt PDF: non-hex character '$c' in hex string")
      i += 1
    }
    require(i < s.length, "corrupt PDF: unterminated hex string")
    if (pending >= 0) sb.append((pending << 4).toChar) // odd digit: pad 0
    (sb.toString, i + 1)
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
