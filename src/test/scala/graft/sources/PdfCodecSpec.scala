package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The PDF subset codec: page round trip through real object-graph bytes,
  * string-escape handling, and the loud-failure contract. */
class PdfCodecSpec extends AnyFunSuite {

  test("round trip: pages survive encode → decode in order") {
    val pages = Seq("first page text", "second page", "third")
    assert(Pdf.decodePages(Pdf.encode(pages)) === pages)
  }

  test("/Encrypt in page TEXT is not misdetected as encryption") {
    // an unencrypted document whose uncompressed content stream contains
    // the literal "/Encrypt" (e.g. a PDF-spec tutorial page): the handler
    // lookup must scan only the trailer dictionary, not the whole byte
    // range — the old whole-document lastIndexOf threw on this valid file
    val pages = Seq("ISO 32000 notes: the trailer /Encrypt key names the handler",
                    "also /ID and /Root live in the trailer")
    assert(Pdf.decodePages(Pdf.encode(pages)) === pages)
    // and the same text inside an ObjStm-packed (xref-stream) document,
    // whose trailer region is the cross-reference stream's own dict
    assert(Pdf.decodePages(Pdf.encodeObjStm(pages)) === pages)
  }

  test("round trip: hex-string show operands (simple font)") {
    val pages = Seq("hex shown text", "page two <with> (delims)", "")
    assert(Pdf.decodePages(Pdf.encode(pages, hexStrings = true)) === pages)
    // full byte range survives: hex strings carry Latin-1 bytes 0-255
    val bytes = (0 to 255).map(_.toChar).mkString
    assert(Pdf.decodePages(Pdf.encode(Seq(bytes), hexStrings = true)) === Seq(bytes))
    // whitespace inside hex strings and an odd trailing digit are legal
    assert(Pdf.extractText("BT <48 65\n6C6C 6F> Tj ET") === "Hello")
    assert(Pdf.extractText("BT <48656C6C6F7> Tj ET") === "Hello" + 0x70.toChar)
  }

  test("round trip: Type0 font with /ToUnicode CMap (2-byte CIDs)") {
    // exercises bfchar + both bfrange forms, Tj and hex-element TJ pages,
    // compressed and raw CMap streams, and non-Latin text a simple font
    // cannot carry — the composite-font shape of every browser/LaTeX/
    // Word-generated PDF (PyMuPDF handles it at app.py:123-132)
    val pages = Seq(
      "abcdefghijklmnopqrstuvwxyz maps through incrementing bfranges",
      "naïve café — déjà vu über alles",
      "中文文本也要通过 CMap 解码",
      "emoji beyond the BMP: 😀🚀 survive as pairs",
      "")
    assert(Pdf.decodePages(Pdf.encodeType0(pages)) === pages)
    assert(Pdf.decodePages(Pdf.encodeType0(pages, compressCMap = false)) === pages)
    // deterministic: same text -> same bytes
    assert(Pdf.encodeType0(pages).toSeq === Pdf.encodeType0(pages).toSeq)
  }

  test("ToUnicode CMap parser: widths, clauses, and loud failures") {
    val good =
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |2 beginbfchar
        |<0001> <0048>
        |<0002> <006600660069>
        |endbfchar
        |2 beginbfrange
        |<0010> <0012> <0061>
        |<0020> <0021> [ <0041> <D83DDE00> ]
        |endbfrange
        |endcmap
        |end""".stripMargin
    val (w, m) = Pdf.parseToUnicode(good)
    assert(w === 2)
    assert(m(1) === "H")
    assert(m(2) === "ffi") // multi-unit ligature destination
    assert(m(0x10) === "a" && m(0x11) === "b" && m(0x12) === "c") // incrementing
    assert(m(0x20) === "A" && m(0x21) === "😀") // array + surrogate pair
    // 1-byte codespace width
    val (w1, m1) = Pdf.parseToUnicode(
      "1 begincodespacerange <00> <FF> endcodespacerange " +
        "1 beginbfchar <41> <0058> endbfchar")
    assert(w1 === 1 && m1(0x41) === "X")
    // loud failures: no codespacerange, mixed widths, arity, array size
    val bads = Seq(
      "1 beginbfchar <0001> <0048> endbfchar", // no codespacerange
      "2 begincodespacerange <00> <FF> <0000> <FFFF> endcodespacerange", // mixed widths
      "1 begincodespacerange <0000> <FFFF> endcodespacerange 1 beginbfchar <0001> endbfchar", // odd pair
      "1 begincodespacerange <0000> <FFFF> endcodespacerange " +
        "1 beginbfrange <0001> <0003> [ <0041> ] endbfrange", // array size mismatch
      "1 begincodespacerange <0000> <FFFF> endcodespacerange " +
        "1 beginbfrange <0005> <0002> <0041> endbfrange", // inverted range
      "1 begincodespacerange <0000> <FFFF>") // unterminated section
    bads.foreach { b =>
      assertThrows[IllegalArgumentException](Pdf.parseToUnicode(b))
    }
  }

  test("mixed fonts on one page: Tf switches the active CMap mid-stream") {
    // /F1 is a 2-byte CID font, /F2 a plain simple font: the same hex
    // string bytes must decode differently under each, and a switch back
    // re-engages the CMap — the real shape of a PDF mixing a subset
    // body font with a standard-14 heading font
    val fonts = Map(
      "F1" -> Some((2, Map(1 -> "α", 2 -> "β"))),
      "F2" -> None)
    val stream = "BT /F1 12 Tf <00010002> Tj /F2 10 Tf (plain) Tj " +
      "/F1 12 Tf <0002> Tj ET"
    assert(Pdf.extractText(stream, fonts) === "αβplainβ")
    // a 1-byte CMap consumes per byte
    val one = Map("F3" -> Some((1, Map(0x41 -> "X", 0x42 -> "Y"))))
    assert(Pdf.extractText("BT /F3 8 Tf <4142> Tj ET", one) === "XY")
    // TJ arrays map through the active CMap too
    assert(Pdf.extractText(
      "BT /F1 12 Tf [ <0001> -200 <0002> ] TJ ET", fonts) === "αβ")
  }

  test("CMap decode failures are loud: bad width multiple, unmapped code") {
    val fonts = Map("F1" -> Some((2, Map(1 -> "a", 2 -> "b"))))
    assert(Pdf.extractText("BT /F1 12 Tf <00010002> Tj ET", fonts) === "ab")
    // literal strings map through the CMap too (strings are byte strings)
    assert(Pdf.extractText(
      "BT /F1 12 Tf (\\000\\001\\000\\002) Tj ET", fonts) === "ab")
    // 3 bytes under a 2-byte code width
    assertThrows[IllegalArgumentException](
      Pdf.extractText("BT /F1 12 Tf <000100> Tj ET", fonts))
    // unmapped code
    assertThrows[IllegalArgumentException](
      Pdf.extractText("BT /F1 12 Tf <0003> Tj ET", fonts))
    // a font NOT in the map keeps the identity path
    assert(Pdf.extractText("BT /F9 12 Tf <4849> Tj ET", fonts) === "HI")
  }

  test("round trip: FlateDecode-compressed content streams") {
    val pages = Seq("first page text", "second page with (parens) and \\ escapes",
      "operators inside strings: BT Tj ET endstream endobj")
    val z = Pdf.encode(pages, compress = true)
    // the compressed file really is filtered, and still round trips
    assert(new String(z, "ISO-8859-1").contains("/Filter /FlateDecode"))
    assert(Pdf.decodePages(z) === pages)
    // long repetitive pages (where deflate actually shrinks) round trip too
    val many = (0 until 100).map(i => ("lorem ipsum " * 40) + s"page $i")
    assert(Pdf.decodePages(Pdf.encode(many, compress = true)) === many)
  }

  test("round trip: PNG-predictor-wrapped FlateDecode streams (10-15)") {
    val pages = Seq("first page text", "second page with (parens) and \\ escapes",
      "operators inside strings: BT Tj ET endstream endobj")
    // every declared PNG predictor value decodes identically (the per-row
    // tag decides; the /Predictor value is a hint) — and the encoder
    // cycles all five row-filter types, so each variant runs them all
    for (p <- 10 to 15) {
      val z = Pdf.encode(pages, compress = true, predictor = p, columns = 24)
      val doc = new String(z, "ISO-8859-1")
      assert(doc.contains("/Filter /FlateDecode"))
      assert(doc.contains(s"/DecodeParms << /Predictor $p /Columns 24 >>"))
      assert(Pdf.decodePages(z) === pages)
    }
    // column widths around the page-text length: 1 (degenerate rows),
    // a non-divisor (short final row), and wider than the stream
    for (cols <- Seq(1, 7, 100, 4096)) {
      val z = Pdf.encode(pages, compress = true, predictor = 12, columns = cols)
      assert(Pdf.decodePages(z) === pages, s"columns=$cols")
    }
    val many = (0 until 100).map(i => ("lorem ipsum " * 40) + s"page $i")
    assert(Pdf.decodePages(Pdf.encode(many, compress = true, predictor = 14)) === many)
  }

  test("round trip: TIFF predictor 2 FlateDecode streams") {
    val pages = Seq("tiff predictor page", "another (one) with \\ escapes")
    for (cols <- Seq(1, 8, 33)) {
      val z = Pdf.encode(pages, compress = true, predictor = 2, columns = cols)
      assert(new String(z, "ISO-8859-1").contains("/Predictor 2"))
      assert(Pdf.decodePages(z) === pages, s"columns=$cols")
    }
  }

  test("unsupported predictor values and component depths fail loudly") {
    val good = Pdf.encode(Seq("page body"), compress = true, predictor = 12, columns = 16)
    // an undeclared predictor value (3-9, >15) must throw with the value
    // named, not silently mis-decode
    val doc = new String(good, "ISO-8859-1")
    val p3 = doc.replace("/Predictor 12", "/Predictor 3").getBytes("ISO-8859-1")
    val e = intercept[IllegalArgumentException] { Pdf.decodePages(p3) }
    assert(e.getMessage.contains("unsupported") && e.getMessage.contains("3"))
    val p16 = doc.replace("/Predictor 12", "/Predictor 16").getBytes("ISO-8859-1")
    intercept[IllegalArgumentException] { Pdf.decodePages(p16) }
    // non-8-bit components are out of scope — loud, with the depth named
    val b4 = doc.replace("/Predictor 12", "/Predictor 12 /BitsPerComponent 4")
      .getBytes("ISO-8859-1")
    val e2 = intercept[IllegalArgumentException] { Pdf.decodePages(b4) }
    assert(e2.getMessage.contains("BitsPerComponent") && e2.getMessage.contains("4"))
    // the encoder refuses undeclared predictor values and predictor-sans-compress
    intercept[IllegalArgumentException] { Pdf.encode(Seq("x"), compress = true, predictor = 5) }
    intercept[IllegalArgumentException] { Pdf.encode(Seq("x"), predictor = 12) }
    // predictor data with a bad row-filter tag is corrupt, not empty
    assert(Pdf.decodePages(good) === Seq("page body")) // sanity: base case green
  }

  test("round trip: delimiters and escapes in page text") {
    val pages = Seq(
      "parens (nested (deep)) balanced",
      "backslash \\ and close ) open ( mixed",
      "operators inside strings: BT Tj ET endstream endobj")
    assert(Pdf.decodePages(Pdf.encode(pages)) === pages)
  }

  test("round trip: single page and many pages keep order") {
    assert(Pdf.decodePages(Pdf.encode(Seq("only"))) === Seq("only"))
    val many = (0 until 200).map(i => s"page $i body")
    assert(Pdf.decodePages(Pdf.encode(many)) === many)
  }

  test("string parser: octal codes, continuations, spec'd escapes") {
    // hand-authored stream fragments through the tokenizer directly
    assert(Pdf.extractText("BT (\\101\\102C) Tj ET") === "ABC")
    assert(Pdf.extractText("BT (ab\\\ncd) Tj ET") === "abcd") // continuation
    assert(Pdf.extractText("BT (a\\tb\\nc) Tj ET") === "a\tb\nc")
    // TJ array form with kerning numbers interleaved
    assert(Pdf.extractText("BT [(He) 20 (llo)] TJ ET") === "Hello")
    // a string shown OUTSIDE BT..ET is not page text
    assert(Pdf.extractText("(skip) Tj BT (keep) Tj ET") === "keep")
  }

  test("corrupt payloads fail loudly") {
    intercept[IllegalArgumentException] {
      Pdf.decodePages("not a pdf at all".getBytes("ISO-8859-1"))
    }
    val good = Pdf.encode(Seq("some genuine page content here"))
    intercept[Exception] { Pdf.decodePages(good.take(good.length / 2)) }
    // filters outside the declared surface must throw with the filter
    // named, not silently return empty text
    val dct = new String(good, "ISO-8859-1")
      .replace("<< /Length", "<< /Filter /DCTDecode /Length")
      .getBytes("ISO-8859-1")
    val e = intercept[IllegalArgumentException] { Pdf.decodePages(dct) }
    assert(e.getMessage.contains("unsupported") && e.getMessage.contains("DCTDecode"))
    // chain in the WRONG order (compression before transport) is unsupported
    val chain = new String(good, "ISO-8859-1")
      .replace("<< /Length", "<< /Filter [ /FlateDecode /ASCIIHexDecode ] /Length")
      .getBytes("ISO-8859-1")
    val e2 = intercept[IllegalArgumentException] { Pdf.decodePages(chain) }
    assert(e2.getMessage.contains("unsupported"))
    // a raw stream MISLABELED as a supported filter is corrupt, not text
    val hexChain = new String(good, "ISO-8859-1")
      .replace("<< /Length", "<< /Filter [ /ASCIIHexDecode /FlateDecode ] /Length")
      .getBytes("ISO-8859-1")
    intercept[Exception] { Pdf.decodePages(hexChain) }
    // a stream LABELED FlateDecode whose bytes aren't zlib is corrupt, not
    // silently empty
    val mislabeled = new String(good, "ISO-8859-1")
      .replace("<< /Length", "<< /Filter /FlateDecode /Length")
      .getBytes("ISO-8859-1")
    intercept[Exception] { Pdf.decodePages(mislabeled) }
    // truncated compressed stream fails the inflate loudly
    val z = Pdf.encode(Seq("a page body that deflate makes binary" * 5), compress = true)
    intercept[Exception] { Pdf.decodePages(z.take(z.length - 40)) }
  }

  // --- round-11 filters: LZWDecode, ASCII transports, chains -------------

  test("LZW: byte-exact vectors pin MSB-first packing and code numbering") {
    // hand-derived from ISO 32000 §7.4.4.2's algorithm (9-bit codes,
    // MSB-first, 256 = clear, 257 = EOD): "AB" emits codes
    // 256,65,66,257 → bits 100000000 001000001 001000010 100000001
    assert(Pdf.lzwEncode("AB".getBytes("ISO-8859-1")).toSeq ===
      Seq(0x80, 0x10, 0x48, 0x50, 0x10).map(_.toByte))
    // the spec's own sample input (decimal bytes 45 45 45 65 45 45 45 66)
    // emits codes 256,45,258,65,258,45,66,257 — the 258s exercise a
    // mid-stream dictionary hit
    val sample = Array[Byte](45, 45, 45, 65, 45, 45, 45, 66)
    val enc = Pdf.lzwEncode(sample)
    assert(enc.toSeq ===
      Seq(0x80, 0x0B, 0x60, 0x44, 0x18, 0x10, 0xB4, 0x85, 0x01).map(_.toByte))
    assert(Pdf.lzwDecode(enc).toSeq === sample.toSeq)
  }

  test("LZW: round trips including KwKwK, width growth, and table reset") {
    def rt(raw: Array[Byte], early: Int = 1): Unit =
      assert(Pdf.lzwDecode(Pdf.lzwEncode(raw, early), early).toSeq === raw.toSeq,
        s"len=${raw.length} early=$early")
    rt(Array.empty[Byte])
    rt(Array[Byte](65))
    rt(Array[Byte](65, 65, 65)) // the KwKwK special case (code == next)
    rt("to be or not to be, that is the question".getBytes("ISO-8859-1"))
    // every byte value round trips (sign handling)
    rt((0 until 256).map(_.toByte).toArray)
    // deterministic pseudo-random bytes over a small alphabet: the
    // dictionary crosses the 511/1023/2047 width boundaries AND the
    // 4095 table reset (≈80 KB input ⇒ thousands of entries)
    var seed = 12345L
    val big = Array.fill(80000) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33) % 7 + 'a').toByte
    }
    rt(big)
    rt(big, early = 0) // EarlyChange 0 shifts every width boundary by one
    // highly compressible input (long runs) hits deep dictionary chains
    rt(("x" * 5000 + "yz" * 2500).getBytes("ISO-8859-1"))
  }

  test("LZW: corrupt streams fail loudly") {
    // truncated mid-stream: no EOD
    val enc = Pdf.lzwEncode("some reasonable content here".getBytes("ISO-8859-1"))
    intercept[IllegalArgumentException] { Pdf.lzwDecode(enc.take(enc.length - 3)) }
    // a code referencing an unassigned slot: craft 9-bit codes
    // 256 (clear), 300 (never assigned) → 100000000 100101100 ...
    val bad = Array(0x80.toByte, 0x4B.toByte, 0x00.toByte)
    intercept[IllegalArgumentException] { Pdf.lzwDecode(bad) }
  }

  test("ASCIIHex: vectors, whitespace, odd digit, and loud failures") {
    val raw = "Hello\u00ff !".getBytes("ISO-8859-1")
    val enc = Pdf.asciiHexEncode(raw)
    assert(new String(enc, "ISO-8859-1") === "48656C6C6FFF2021>")
    assert(Pdf.asciiHexDecode(enc).toSeq === raw.toSeq)
    // whitespace is ignored, lowercase accepted, odd digit pads zero nibble
    assert(Pdf.asciiHexDecode("48 65\n6c\t6C 6f >".getBytes("ISO-8859-1")).toSeq ===
      "Hello".getBytes("ISO-8859-1").toSeq)
    assert(Pdf.asciiHexDecode("417>".getBytes("ISO-8859-1")).toSeq ===
      Seq[Byte](0x41, 0x70))
    // missing EOD and non-hex characters are corrupt, not best-effort
    intercept[IllegalArgumentException] { Pdf.asciiHexDecode("4142".getBytes("ISO-8859-1")) }
    intercept[IllegalArgumentException] { Pdf.asciiHexDecode("4G>".getBytes("ISO-8859-1")) }
  }

  test("ASCII85: vectors, z shorthand, partial groups, and loud failures") {
    // the classic vector: "Man " encodes to 9jqo^ (value 1298230816)
    assert(new String(Pdf.ascii85Encode("Man ".getBytes("ISO-8859-1")), "ISO-8859-1")
      === "9jqo^~>")
    assert(Pdf.ascii85Decode("9jqo^~>".getBytes("ISO-8859-1")).toSeq ===
      "Man ".getBytes("ISO-8859-1").toSeq)
    // an all-zero group is the single character z
    assert(new String(Pdf.ascii85Encode(Array[Byte](0, 0, 0, 0)), "ISO-8859-1") === "z~>")
    assert(Pdf.ascii85Decode("z~>".getBytes("ISO-8859-1")).toSeq === Seq[Byte](0, 0, 0, 0))
    // partial final groups (1-3 bytes) round trip at every length
    for (n <- 0 to 11) {
      val raw = (1 to n).map(i => (i * 37).toByte).toArray
      assert(Pdf.ascii85Decode(Pdf.ascii85Encode(raw)).toSeq === raw.toSeq, s"n=$n")
    }
    // every byte value round trips; whitespace inside groups is ignored
    val all = (0 until 256).map(_.toByte).toArray
    assert(Pdf.ascii85Decode(Pdf.ascii85Encode(all)).toSeq === all.toSeq)
    val spaced = new String(Pdf.ascii85Encode(all), "ISO-8859-1").grouped(10)
      .mkString("\n").getBytes("ISO-8859-1")
    assert(Pdf.ascii85Decode(spaced).toSeq === all.toSeq)
    // corrupt shapes: missing ~>, out-of-range char, z inside a group,
    // single-digit group, and a value past 2^32 (s8W-! is the max+1 shape)
    intercept[IllegalArgumentException] { Pdf.ascii85Decode("9jqo^".getBytes("ISO-8859-1")) }
    intercept[IllegalArgumentException] { Pdf.ascii85Decode("9jv^~>".getBytes("ISO-8859-1")) }
    intercept[IllegalArgumentException] { Pdf.ascii85Decode("9z~>".getBytes("ISO-8859-1")) }
    intercept[IllegalArgumentException] { Pdf.ascii85Decode("9~>".getBytes("ISO-8859-1")) }
    intercept[IllegalArgumentException] { Pdf.ascii85Decode("uuuuu~>".getBytes("ISO-8859-1")) }
  }

  test("round trip: LZWDecode content streams, with and without predictors") {
    val pages = Seq("first page text", "second page with (parens) and \\ escapes",
      "operators inside strings: BT Tj ET endstream endobj")
    val z = Pdf.encode(pages, compress = true, filterChain = Seq("LZWDecode"))
    assert(new String(z, "ISO-8859-1").contains("/Filter /LZWDecode"))
    assert(Pdf.decodePages(z) === pages)
    // predictors compose with LZW exactly as with Flate
    for (p <- Seq(2, 12)) {
      val zp = Pdf.encode(pages, compress = true, predictor = p, columns = 24,
        filterChain = Seq("LZWDecode"))
      assert(new String(zp, "ISO-8859-1").contains(s"/Predictor $p"))
      assert(Pdf.decodePages(zp) === pages, s"predictor=$p")
    }
    val many = (0 until 60).map(i => ("lorem ipsum " * 40) + s"page $i")
    assert(Pdf.decodePages(Pdf.encode(many, compress = true,
      filterChain = Seq("LZWDecode"))) === many)
  }

  test("round trip: ASCII transport chains over both compression filters") {
    val pages = Seq("first page text", "second (with) delimiters \\ inside",
      "binary-ish content: éèê accents")
    for {
      pre <- Seq("ASCIIHexDecode", "ASCII85Decode")
      comp <- Seq("FlateDecode", "LZWDecode")
    } {
      val chain = Seq(pre, comp)
      val z = Pdf.encode(pages, compress = true, filterChain = chain)
      val doc = new String(z, "ISO-8859-1")
      assert(doc.contains(s"/Filter [ /$pre /$comp ]"), chain.toString)
      assert(Pdf.decodePages(z) === pages, chain.toString)
    }
    // the encoder refuses shapes the decoder would reject
    intercept[IllegalArgumentException] {
      Pdf.encode(pages, compress = true, filterChain = Seq("FlateDecode", "ASCIIHexDecode"))
    }
    intercept[IllegalArgumentException] {
      Pdf.encode(pages, compress = true, filterChain = Seq("RunLengthDecode"))
    }
    intercept[IllegalArgumentException] {
      Pdf.encode(pages, compress = true, predictor = 12,
        filterChain = Seq("ASCIIHexDecode", "FlateDecode"))
    }
  }

  test("non-flat /DecodeParms (per-filter arrays) fail loudly") {
    val good = Pdf.encode(Seq("page body"), compress = true)
    val doc = new String(good, "ISO-8859-1")
    val arr = doc.replace("/Filter /FlateDecode",
      "/Filter /FlateDecode /DecodeParms [ null << /Predictor 2 >> ]")
      .getBytes("ISO-8859-1")
    val e = intercept[IllegalArgumentException] { Pdf.decodePages(arr) }
    assert(e.getMessage.contains("DecodeParms"))
  }

  // --- PDF 1.5+: object streams + cross-reference streams ----------------

  test("round trip: ObjStm-packed documents (PDF 1.5 shape)") {
    val pages = Seq("first page text", "second (with) delimiters \\ inside",
      "operators inside strings: BT Tj ET endstream endobj")
    for (pred <- Seq(true, false)) {
      val z = Pdf.encodeObjStm(pages, xrefPredictor = pred)
      val doc = new String(z, "ISO-8859-1")
      assert(doc.startsWith("%PDF-1.5"))
      assert(doc.contains("/Type /ObjStm"))
      assert(doc.contains("/Type /XRef"))
      assert(!doc.contains("trailer")) // the classic table is really gone
      assert(Pdf.decodePages(z) === pages, s"xrefPredictor=$pred")
    }
    assert(Pdf.decodePages(Pdf.encodeObjStm(Seq("only"))) === Seq("only"))
    val many = (0 until 120).map(i => s"page $i body with some text")
    assert(Pdf.decodePages(Pdf.encodeObjStm(many)) === many)
  }

  test("the emitted cross-reference stream is a faithful binary index") {
    // decode the XRef stream independently (inflate + PNG-Up unfilter at
    // 7-byte rows) and check every entry against the actual document:
    // type-1 rows must point at "<id> 0 obj", type-2 rows must name the
    // ObjStm and the member's index within it
    val pages = Seq("alpha", "beta", "gamma")
    val z = Pdf.encodeObjStm(pages, xrefPredictor = true)
    val doc = new String(z, "ISO-8859-1")
    val startAt = doc.lastIndexOf("startxref\n")
    val xrefOff = doc.substring(startAt + 10, doc.indexOf('\n', startAt + 10)).trim.toInt
    val xrefId = 5 + 2 * pages.length
    assert(doc.startsWith(s"$xrefId 0 obj", xrefOff), "startxref points at the XRef stream")
    val dictStart = doc.indexOf("<<", xrefOff)
    val streamKw = doc.indexOf("stream", dictStart)
    val dict = doc.substring(dictStart, streamKw)
    assert(dict.contains("/W [ 1 4 2 ]") && dict.contains("/Root 2 0 R"))
    val size = "/Size (\\d+)".r.findFirstMatchIn(dict).get.group(1).toInt
    val len = "/Length (\\d+)".r.findFirstMatchIn(dict).get.group(1).toInt
    var ds = streamKw + "stream".length
    if (doc(ds) == '\r') ds += 1
    if (doc(ds) == '\n') ds += 1
    val comp = doc.substring(ds, ds + len).getBytes("ISO-8859-1")
    val inf = new java.util.zip.Inflater
    inf.setInput(comp)
    val buf = new Array[Byte](size * 8 * 2 + 64)
    var got = 0
    while (!inf.finished()) got += inf.inflate(buf, got, buf.length - got)
    inf.end()
    val rows = Png.unfilterRows(java.util.Arrays.copyOf(buf, got), 7, 1)
    assert(rows.length === size * 7)
    def be(b: Array[Byte], at: Int, n: Int): Long =
      (0 until n).foldLeft(0L)((acc, i) => (acc << 8) | (b(at + i) & 0xFF))
    for (id <- 0 until size) {
      val t = rows(id * 7) & 0xFF
      val f2 = be(rows, id * 7 + 1, 4)
      val f3 = be(rows, id * 7 + 5, 2).toInt
      if (id == 0) assert(t === 0)
      else if (t == 1) assert(doc.startsWith(s"$id 0 obj", f2.toInt),
        s"xref type-1 entry $id points at '${doc.substring(f2.toInt, f2.toInt + 10)}'")
      else {
        assert(t === 2)
        assert(f2 === 1L, s"member $id names ObjStm ${f2}")
        assert(f3 === id - 2, s"member $id at index $f3") // 2 catalog is member 0
      }
    }
  }

  test("corrupt ObjStm shapes fail loudly") {
    val good = Pdf.encodeObjStm(Seq("page body", "another"))
    val doc = new String(good, "ISO-8859-1")
    // header pair count disagreeing with /N
    val badN = doc.replaceFirst("/Type /ObjStm /N 5", "/Type /ObjStm /N 6")
      .getBytes("ISO-8859-1")
    val e = intercept[IllegalArgumentException] { Pdf.decodePages(badN) }
    assert(e.getMessage.contains("ObjStm"))
    // /First beyond the decoded stream
    val badFirst = doc.replaceFirst("/First (\\d+)", "/First 99999").getBytes("ISO-8859-1")
    intercept[IllegalArgumentException] { Pdf.decodePages(badFirst) }
    // a missing /N is a named loud failure, not a silent skip
    val noN = doc.replaceFirst("/Type /ObjStm /N \\d+", "/Type /ObjStm")
      .getBytes("ISO-8859-1")
    val e2 = intercept[IllegalArgumentException] { Pdf.decodePages(noN) }
    assert(e2.getMessage.contains("/N"))
  }

  test("round trip: RC4-encrypted documents (standard handler R2 and R3)") {
    val pages = Seq("first page text", "second page with (parens) and \\ escapes",
      "operators inside strings: BT Tj ET endstream endobj")
    for (rev <- Seq(2, 3)) {
      // uncompressed + encrypted
      val plain = Pdf.encode(pages, encryptRev = rev)
      val doc = new String(plain, "ISO-8859-1")
      assert(doc.contains("/Filter /Standard") && doc.contains(s"/R $rev"))
      assert(doc.contains("/Encrypt") && doc.contains("/ID"))
      // the stored stream really is ciphertext: the page text must not
      // appear in the raw bytes
      assert(!doc.contains("first page text"))
      assert(Pdf.decodePages(plain) === pages)
      // FlateDecode + encrypted (decrypt-then-inflate order)
      val z = Pdf.encode(pages, compress = true, encryptRev = rev)
      assert(Pdf.decodePages(z) === pages)
    }
  }

  test("round trip: AESV2 (AES-128-CBC) encrypted documents") {
    val pages = Seq("first page text", "second page with (parens) and \\ escapes",
      "operators inside strings: BT Tj ET endstream endobj")
    val bytes = Pdf.encode(pages, compress = true, encryptRev = 4)
    val doc = new String(bytes, "ISO-8859-1")
    assert(doc.contains("/V 4") && doc.contains("/CFM /AESV2"))
    assert(Pdf.decodePages(bytes) === pages)
    // uncompressed leg too (AES layer alone)
    val plain = Pdf.encode(pages, encryptRev = 4)
    assert(!new String(plain, "ISO-8859-1").contains("first page text"))
    assert(Pdf.decodePages(plain) === pages)
    // tampering with ciphertext breaks the CBC padding check loudly
    val sAt = doc.indexOf("stream\n")
    val bad = (doc.substring(0, sAt + 20) +
      (if (doc(sAt + 20) == 'A') 'B' else 'A') + doc.substring(sAt + 21)).getBytes("ISO-8859-1")
    assertThrows[Exception](Pdf.decodePages(bad))
  }

  test("round trip: AES-256 (R6) encrypted documents") {
    val pages = Seq("first page text", "second page with (parens) and \\ escapes",
      "operators inside strings: BT Tj ET endstream endobj")
    val bytes = Pdf.encode(pages, compress = true, encryptRev = 6)
    val doc = new String(bytes, "ISO-8859-1")
    assert(doc.contains("/V 5 /R 6") && doc.contains("/CFM /AESV3"))
    assert(doc.contains("/UE") && doc.contains("/Perms"))
    assert(Pdf.decodePages(bytes) === pages)
    // uncompressed leg: ciphertext only, no plaintext leakage
    val plain = Pdf.encode(pages, encryptRev = 6)
    assert(!new String(plain, "ISO-8859-1").contains("first page text"))
    assert(Pdf.decodePages(plain) === pages)
    // a tampered validation salt fails the empty-password /U check
    val uAt = doc.indexOf("/U <")
    val tam = doc.substring(0, uAt + 4) +
      (if (doc(uAt + 4) == '0') '1' else '0') + doc.substring(uAt + 5)
    val ex = intercept[IllegalArgumentException](
      Pdf.decodePages(tam.getBytes("ISO-8859-1")))
    assert(ex.getMessage.contains("password required"))
  }

  test("R6 dicts with /UE ordered before /U still open (key-prefix bind)") {
    val pages = Seq("order independence")
    val doc = new String(Pdf.encode(pages, encryptRev = 6), "ISO-8859-1")
    // swap the /U and /UE entries: dict key order is arbitrary per spec
    val m = java.util.regex.Pattern.compile("/U (<[0-9A-F]+>) /UE (<[0-9A-F]+>)").matcher(doc)
    assert(m.find(), "expected /U then /UE in the emitted dict")
    val swapped = doc.substring(0, m.start) +
      s"/UE ${m.group(2)} /U ${m.group(1)}" + doc.substring(m.end)
    assert(Pdf.decodePages(swapped.getBytes("ISO-8859-1")) === pages)
  }

  test("hash2b terminates and is input-sensitive (Algorithm 2.B)") {
    val empty = Array.empty[Byte]
    val a = Pdf.hash2b(empty, Array.fill[Byte](8)(1), empty)
    val b = Pdf.hash2b(empty, Array.fill[Byte](8)(1), empty)
    val c = Pdf.hash2b(empty, Array.fill[Byte](8)(2), empty)
    assert(a.length === 32)
    assert(a.toSeq === b.toSeq)
    assert(a.toSeq !== c.toSeq)
    // with a password and udata too
    val d = Pdf.hash2b("pw".getBytes, Array.fill[Byte](8)(1), Array.fill[Byte](48)(3))
    assert(d.length === 32)
    assert(d.toSeq !== a.toSeq)
  }

  test("encryption loud failures: wrong password, AES, ObjStm combo") {
    val pages = Seq("secret")
    val bytes = Pdf.encode(pages, encryptRev = 3)
    val doc = new String(bytes, "ISO-8859-1")
    // corrupt the stored /U → the empty-password authentication fails
    val uAt = doc.indexOf("/U <")
    val tampered = doc.substring(0, uAt + 4) +
      (if (doc(uAt + 4) == '0') '1' else '0') + doc.substring(uAt + 5)
    val ex = intercept[IllegalArgumentException](
      Pdf.decodePages(tampered.getBytes("ISO-8859-1")))
    assert(ex.getMessage.contains("password required"))
    // an AES-era /V 4 declaration is rejected by name, not half-decrypted
    val aes = doc.replace("/V 2 /R 3", "/V 4 /R 4")
    val ex2 = intercept[IllegalArgumentException](
      Pdf.decodePages(aes.getBytes("ISO-8859-1")))
    assert(ex2.getMessage.contains("AES"))
    // unsupported revision at encode time (AES-256 / R6 not implemented)
    assertThrows[IllegalArgumentException](Pdf.encode(pages, encryptRev = 5))
  }

  test("RC4 and key derivation match their public test vectors") {
    // RC4 vector (public, from the original posting): key "Key",
    // plaintext "Plaintext" → BBF316E8D940AF0AD3
    val ct = Pdf.rc4("Key".getBytes("US-ASCII"), "Plaintext".getBytes("US-ASCII"))
    assert(ct.map(b => f"${b & 0xff}%02X").mkString === "BBF316E8D940AF0AD3")
    // RC4 is its own inverse (the property cryptObject relies on)
    assert(new String(Pdf.rc4("Key".getBytes("US-ASCII"), ct), "US-ASCII") === "Plaintext")
    // derivation is deterministic in (rev, P, id)
    val a = Pdf.stdSecurity(3, -4, Array.fill[Byte](16)(7))
    val b = Pdf.stdSecurity(3, -4, Array.fill[Byte](16)(7))
    assert(a._1.toSeq === b._1.toSeq && a._2.toSeq === b._2.toSeq && a._3.toSeq === b._3.toSeq)
    // and sensitive to every input
    val c = Pdf.stdSecurity(3, -4, Array.fill[Byte](16)(8))
    assert(a._3.toSeq !== c._3.toSeq)
  }

  test("round trip: simple font with a named base /Encoding") {
    // bare-name form: every byte decodes through the Appendix D table
    val pages = Seq("plain ascii under winansi", "second page")
    val win = Pdf.SimpleEncoding(base = Some("WinAnsiEncoding"))
    assert(Pdf.decodePages(Pdf.encode(pages, encoding = Some(win))) === pages)
    val mac = Pdf.SimpleEncoding(base = Some("MacRomanEncoding"))
    assert(Pdf.decodePages(Pdf.encode(pages, encoding = Some(mac))) === pages)
    // WinAnsi's non-ASCII block: typographic chars land on 0x80-0x9F codes
    val typo = Seq("café … “quoted” — €10")
    assert(Pdf.decodePages(Pdf.encode(typo, encoding = Some(win))) === typo)
    // StandardEncoding quirk: apostrophe lives at 0xA9 (quotesingle),
    // 0x27 is quoteright — the reverse map must honor the table
    val std = Pdf.SimpleEncoding(base = None)
    val q = Seq("don't ’ ‘")
    assert(Pdf.decodePages(Pdf.encode(q, encoding = Some(std))) === q)
  }

  test("round trip: /Differences remap over every base, octal + hex operands") {
    val pages = Seq("differences remap this text", "and the second page too")
    for (base <- Seq(None, Some("WinAnsiEncoding"), Some("MacRomanEncoding"));
         hex <- Seq(false, true)) {
      val enc = Pdf.SimpleEncoding(base = base, remapFrom = 128)
      val got = Pdf.decodePages(Pdf.encode(pages, encoding = Some(enc), hexStrings = hex))
      assert(got === pages, s"base=$base hex=$hex")
    }
    // the literal-string form writes the high codes as octal escapes
    val doc = new String(Pdf.encode(pages,
      encoding = Some(Pdf.SimpleEncoding(remapFrom = 128))), "ISO-8859-1")
    assert(doc.contains("\\200"), "remapped codes should ride octal escapes")
    assert(doc.contains("/Differences [ 128 /d"))
  }

  test("round trip: indirect /Encoding dict, compressed content") {
    val pages = Seq("indirect encoding object", "page 2")
    val enc = Pdf.SimpleEncoding(base = Some("MacRomanEncoding"),
      remapFrom = 160, indirect = true)
    assert(Pdf.decodePages(Pdf.encode(pages, encoding = Some(enc))) === pages)
    assert(Pdf.decodePages(
      Pdf.encode(pages, compress = true, encoding = Some(enc))) === pages)
    // the dict really is its own object
    val doc = new String(Pdf.encode(pages, encoding = Some(enc)), "ISO-8859-1")
    assert(doc.matches("(?s).*?/Encoding \\d+ 0 R.*"))
  }

  test("simple-font failures stay loud") {
    // unknown base encoding name
    val bad = Pdf.SimpleEncoding(base = Some("PDFDocEncoding"))
    assertThrows[IllegalArgumentException](
      Pdf.encode(Seq("x"), encoding = Some(bad)))
    // a char the base table cannot express (no remap to save it)
    assertThrows[IllegalArgumentException](Pdf.encode(Seq("中文"),
      encoding = Some(Pdf.SimpleEncoding(base = Some("WinAnsiEncoding")))))
    // decoder: a code with no table entry throws, never silently drops —
    // MacRoman leaves 0xC5 (approxequal's slot) unmapped in Appendix D
    val doc = new String(Pdf.encode(Seq("abc"),
      encoding = Some(Pdf.SimpleEncoding(base = Some("MacRomanEncoding")))), "ISO-8859-1")
    val poisoned = doc.replace("(abc)", "(ab\\305)")
    assertThrows[IllegalArgumentException](
      Pdf.decodePages(poisoned.getBytes("ISO-8859-1")))
    // /Differences glyph names fall back to AGL uniXXXX before throwing
    assert(Pdf.parseDifferences("<< /Differences [ 65 /uni4E2D ] >>") ===
      Map(65 -> "uni4E2D"))
    assert(PdfEncodings.glyph("uni4E2D") === "中")
    assertThrows[IllegalArgumentException](PdfEncodings.glyph("notaglyph"))
    // a /Differences name before any code is malformed
    assertThrows[IllegalArgumentException](
      Pdf.parseDifferences("<< /Differences [ /a ] >>"))
  }

  test("round trip: Identity-H/V Type0 WITHOUT /ToUnicode (CID = code)") {
    val pages = Seq(
      "identity cids carry utf-16 units",
      "中文 straight through the predefined cmap",
      "beyond the BMP: 😀 rides as a surrogate pair",
      "")
    assert(Pdf.decodePages(Pdf.encodeType0(pages, toUnicode = false)) === pages)
    assert(Pdf.decodePages(
      Pdf.encodeType0(pages, toUnicode = false, vertical = true)) === pages)
    // the document genuinely has no /ToUnicode
    val doc = new String(Pdf.encodeType0(pages, toUnicode = false), "ISO-8859-1")
    assert(!doc.contains("/ToUnicode"))
    assert(doc.contains("/Encoding /Identity-H"))
    // an unknown predefined CMap registry must throw, not identity-decode
    val alien = doc.replace("/Encoding /Identity-H", "/Encoding /UniJIS-UCS2-H")
    val e = intercept[IllegalArgumentException](
      Pdf.decodePages(alien.getBytes("ISO-8859-1")))
    assert(e.getMessage.contains("UniJIS-UCS2-H"))
  }

  test("round trip: Form XObjects (Do) — direct, nested, inherited resources, compressed + image") {
    val pages = Seq("text split between the page and a form xobject",
      "second page with its own form")
    for (v <- 0 to 4)
      assert(Pdf.decodePages(Pdf.encodeForms(pages, v)) === pages, s"variant $v")
    // the inline-image variant's poisoned payload really is in the bytes:
    // it contains " EI " mid-data (defeats a lenient scan) and reads as
    // show operators, yet contributed no phantom text above — /L wins
    assert(new String(Pdf.encodeForms(pages, 4), "ISO-8859-1")
      .contains("/L 11 ID (BT EI x Tj EI"))
    // the /L-less lenient path still works when the payload is benign
    assert(Pdf.extractText("BT (a) Tj ET BI /W 1 /H 1 ID \u0000ÿ EI BT (b) Tj ET")
      === "ab")
    // /L that overruns the stream, or /L not followed by EI, is corrupt
    assertThrows[IllegalArgumentException](
      Pdf.extractText("BI /W 1 /H 1 /L 99 ID xy EI"))
    assertThrows[IllegalArgumentException](
      Pdf.extractText("BI /W 1 /H 1 /L 1 ID xy EI"))
    // a content stream missing the EI terminator is corrupt, not ignored
    assertThrows[IllegalArgumentException](
      Pdf.extractText("BT (a) Tj ET BI /W 1 /H 1 ID x"))
    // the nested variant really nests (two forms per page) and the
    // image variant really carries an image that contributes no text
    val nested = new String(Pdf.encodeForms(pages, 1), "ISO-8859-1")
    assert(nested.contains("/Fm1"))
    val img = new String(Pdf.encodeForms(pages, 3), "ISO-8859-1")
    assert(img.contains("/Subtype /Image"))
  }

  test("Form XObject failures stay loud") {
    val pages = Seq("cycle test page")
    // self-referencing form: point Fm0's own /XObject entry back at itself
    val doc = new String(Pdf.encodeForms(pages, 1), "ISO-8859-1")
    // form0 (object 6) invokes /Fm1 7 0 R; poison it to invoke itself
    val cyclic = doc.replace("/Fm1 7 0 R", "/Fm1 6 0 R")
    val e = intercept[IllegalArgumentException](
      Pdf.decodePages(cyclic.getBytes("ISO-8859-1")))
    assert(e.getMessage.contains("recursive"))
    // Do of a name missing from the /XObject dict
    val missing = doc.replace("<< /Fm0 6 0 R >>", "<< /FmX 6 0 R >>")
    assertThrows[IllegalArgumentException](
      Pdf.decodePages(missing.getBytes("ISO-8859-1")))
    // a bare Do with no name operand is corrupt
    assertThrows[IllegalArgumentException](Pdf.extractText("BT (x) Tj ET Do"))
  }

  test("round trip: ENCRYPTED object-stream documents (PDF 1.5 + RC4/AESV2)") {
    // the modern encrypted shape: objects packed in an ObjStm whose
    // payload is encrypted once with the ObjStm's key; members are NOT
    // re-encrypted (ISO 32000 §7.5.7); /Encrypt + /ID in the XRef dict
    val pages = Seq("encrypted and packed into an object stream",
      "second page (with) \\ delims")
    assert(Pdf.decodePages(Pdf.encodeObjStm(pages, encryptRev = 3)) === pages)
    assert(Pdf.decodePages(Pdf.encodeObjStm(pages, encryptRev = 4)) === pages)
    // and the unencrypted form still round-trips
    assert(Pdf.decodePages(Pdf.encodeObjStm(pages)) === pages)
    // genuinely encrypted: the page text is not in the clear bytes
    val doc = new String(Pdf.encodeObjStm(pages, encryptRev = 3), "ISO-8859-1")
    assert(!doc.contains("encrypted and packed"))
    assert(doc.contains("/Encrypt"))
    // tampered ObjStm ciphertext must fail loudly, not decode garbage
    val sAt = doc.indexOf("stream\n") + 7
    val poisoned = doc.substring(0, sAt + 4) +
      (doc(sAt + 4) ^ 0x41).toChar + doc.substring(sAt + 5)
    assertThrows[Exception](Pdf.decodePages(poisoned.getBytes("ISO-8859-1")))
  }

  test("round trip: nested page trees, inherited resources, /Contents arrays") {
    val pages = (1 to 7).map(i => s"page $i of a deeper tree with enough text to split")
    for (v <- 0 to 3)
      assert(Pdf.decodePages(Pdf.encodePageTree(pages, v)) === pages, s"variant $v")
    // the nested variant really nests (interior /Pages nodes) and the
    // split variant really carries /Contents arrays
    val nested = new String(Pdf.encodePageTree(pages, 0), "ISO-8859-1")
    assert(nested.contains("/Type /Pages /Parent 2 0 R"))
    val splitDoc = new String(Pdf.encodePageTree(pages, 2), "ISO-8859-1")
    assert(splitDoc.contains("/Contents [ "))
    // the inherited variant's leaves genuinely carry NO /Resources
    val inh = new String(Pdf.encodePageTree(pages, 1), "ISO-8859-1")
    assert(!inh.split("endobj").exists(o =>
      o.contains("/Type /Page ") && o.contains("/Resources")))
    // single page / short text degenerate shapes
    assert(Pdf.decodePages(Pdf.encodePageTree(Seq("tiny"), 3)) === Seq("tiny"))
    // a cyclic page tree throws instead of looping
    val cyclic = nested.replaceFirst("/Kids \\[ 4 0 R 5 0 R 6 0 R \\]", "/Kids [ 2 0 R ]")
    val e = intercept[IllegalArgumentException](
      Pdf.decodePages(cyclic.getBytes("ISO-8859-1")))
    assert(e.getMessage.contains("deeper than"))
  }

  test("encode is deterministic and xref offsets resolve") {
    val pages = Seq("alpha", "beta")
    val a = Pdf.encode(pages)
    assert(a.toSeq === Pdf.encode(pages).toSeq)
    // every xref offset must point at the object it claims
    val doc = new String(a, "ISO-8859-1")
    val xrefAt = doc.indexOf("xref")
    val lines = doc.substring(xrefAt).split("\n").drop(2) // header + free entry
    lines.takeWhile(_.endsWith("n ")).zipWithIndex.foreach { case (l, i) =>
      val off = l.substring(0, 10).toInt
      assert(doc.startsWith(s"${i + 1} 0 obj", off),
        s"xref entry ${i + 1} points at '${doc.substring(off, off + 12)}'")
    }
  }
}
