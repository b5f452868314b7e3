package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The DOCX container codec round trip — paragraphs in, identical
  * paragraphs out through real ZIP + WordprocessingML bytes — plus the
  * loud-failure contract for corrupt payloads. */
class DocxCodecSpec extends AnyFunSuite {

  test("round trip: paragraphs survive encode → decode exactly") {
    val paras = Seq(
      "plain words here",
      "",                               // empty paragraph (self-closing w:p)
      "xml specials & < > stay intact",
      "  leading and trailing spaces  ",
      "quotes ' and \" too")
    assert(Docx.decodeParagraphs(Docx.encode(paras)) === paras)
  }

  test("round trip: zero and one paragraph") {
    assert(Docx.decodeParagraphs(Docx.encode(Seq.empty)) === Seq.empty)
    assert(Docx.decodeParagraphs(Docx.encode(Seq("only"))) === Seq("only"))
  }

  test("round trip: many paragraphs keep document order") {
    val paras = (0 until 500).map(i => s"paragraph number $i content")
    assert(Docx.decodeParagraphs(Docx.encode(paras)) === paras)
  }

  test("docx2txt contract: full package text with header, table, footer") {
    val bytes = Docx.encodeFull(
      header = Some("Page Header"),
      richPara = Some(Docx.RichPara(Seq("col1", "col2", "line2"), Seq("\t", "\n"))),
      paragraphs = Seq("body one", "body two"),
      tableCells = Seq("cell A", "cell B"),
      footer = Some("Page Footer"))
    // docx2txt renders "\n\n" before each paragraph (pre-order iter),
    // then strips — so the pieces join with blank lines, headers first,
    // footers last, table cells where the table sits in the body
    assert(Docx.decodeText(bytes) ===
      Seq("Page Header", "col1\tcol2\nline2", "body one", "body two",
        "cell A", "cell B", "Page Footer").mkString("\n\n"))
    // the python-docx paragraph path on the SAME bytes drops the table
    // cells and never sees header/footer parts — the loader-path delta
    // the reference's two extraction paths exhibit (app.py:137-139 vs 172)
    assert(Docx.decodeParagraphs(bytes) ===
      Seq("col1col2line2", "body one", "body two"))
  }

  test("docx2txt contract: parts are optional and order is fixed") {
    // no header/footer/table: just the body paragraphs
    val plain = Docx.encodeFull(None, None, Seq("a", "b"), Seq.empty, None)
    assert(Docx.decodeText(plain) === "a\n\nb")
    // plain encode() packages decode identically through both paths
    val simple = Docx.encode(Seq("x", "y", "z"))
    assert(Docx.decodeText(simple) === "x\n\ny\n\nz")
    assert(Docx.decodeParagraphs(simple) === Seq("x", "y", "z"))
    // empty paragraphs still contribute their paragraph breaks mid-doc
    // (strip removes only the outermost)
    assert(Docx.decodeText(Docx.encode(Seq("a", "", "b"))) === "a\n\n\n\nb")
    // footer-only: document text then footer
    val f = Docx.encodeFull(None, None, Seq("body"), Seq.empty, Some("ft"))
    assert(Docx.decodeText(f) === "body\n\nft")
    // XML specials survive the full path too
    val sp = Docx.encodeFull(Some("h & <t>"), None, Seq("a&b"), Seq("c<d"), None)
    assert(Docx.decodeText(sp) === "h & <t>\n\na&b\n\nc<d")
  }

  test("decodeText fails loudly on corrupt payloads") {
    intercept[IllegalArgumentException] {
      Docx.decodeText("plain".getBytes("UTF-8"))
    }
    val out = new java.io.ByteArrayOutputStream()
    val zip = new java.util.zip.ZipOutputStream(out)
    zip.putNextEntry(new java.util.zip.ZipEntry("word/header1.xml"))
    zip.write("<w:hdr/>".getBytes("UTF-8")); zip.closeEntry(); zip.close()
    // headers present but no word/document.xml: still not a DOCX
    intercept[IllegalArgumentException] { Docx.decodeText(out.toByteArray) }
  }

  test("corrupt payloads fail loudly, never half-extract") {
    // not a zip at all
    intercept[IllegalArgumentException] {
      Docx.decodeParagraphs("just plain text".getBytes("UTF-8"))
    }
    // a real zip without word/document.xml
    val out = new java.io.ByteArrayOutputStream()
    val zip = new java.util.zip.ZipOutputStream(out)
    zip.putNextEntry(new java.util.zip.ZipEntry("other.txt"))
    zip.write("hi".getBytes("UTF-8")); zip.closeEntry(); zip.close()
    intercept[IllegalArgumentException] {
      Docx.decodeParagraphs(out.toByteArray)
    }
    // truncated docx (zip framing broken mid-stream)
    val good = Docx.encode(Seq("some text that makes the package non-trivial"))
    intercept[Exception] {
      Docx.decodeParagraphs(good.take(good.length / 2))
    }
  }

  test("encode is deterministic (content-addressed cache keys hold)") {
    val paras = Seq("alpha beta", "gamma")
    assert(Docx.encode(paras).toSeq === Docx.encode(paras).toSeq)
  }
}
