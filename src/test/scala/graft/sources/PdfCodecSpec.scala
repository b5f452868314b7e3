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
