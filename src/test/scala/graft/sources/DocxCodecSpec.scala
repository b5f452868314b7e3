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
