package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The PDF subset codec: page round trip through real object-graph bytes,
  * string-escape handling, and the loud-failure contract. */
class PdfCodecSpec extends AnyFunSuite {

  test("round trip: pages survive encode → decode in order") {
    val pages = Seq("first page text", "second page", "third")
    assert(Pdf.decodePages(Pdf.encode(pages)) === pages)
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
    // filters other than FlateDecode are out of scope — must throw with
    // the filter named, not silently return empty text
    val lzw = new String(good, "ISO-8859-1")
      .replace("<< /Length", "<< /Filter /LZWDecode /Length")
      .getBytes("ISO-8859-1")
    val e = intercept[IllegalArgumentException] { Pdf.decodePages(lzw) }
    assert(e.getMessage.contains("unsupported") && e.getMessage.contains("LZWDecode"))
    // filter CHAINS are also out of scope
    val chain = new String(good, "ISO-8859-1")
      .replace("<< /Length", "<< /Filter [ /ASCIIHexDecode /FlateDecode ] /Length")
      .getBytes("ISO-8859-1")
    val e2 = intercept[IllegalArgumentException] { Pdf.decodePages(chain) }
    assert(e2.getMessage.contains("unsupported"))
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
