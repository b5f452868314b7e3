package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Appendix D table spot-checks against the published code points —
  * guards the static data the round-trip specs exercise only for the
  * chars the fixture corpus happens to contain. */
class PdfEncodingsSpec extends AnyFunSuite {

  private def dec(table: Map[Int, String], code: Int): String =
    PdfEncodings.glyph(table(code))

  test("WinAnsi: CP1252 landmarks") {
    assert(dec(PdfEncodings.winAnsi, 0x80) === "€") // Euro
    assert(dec(PdfEncodings.winAnsi, 0x85) === "…") // ellipsis
    assert(dec(PdfEncodings.winAnsi, 0x93) === "“") // left double quote
    assert(dec(PdfEncodings.winAnsi, 0x99) === "™") // trademark
    assert(dec(PdfEncodings.winAnsi, 0xE9) === "é")
    assert(dec(PdfEncodings.winAnsi, 0x27) === "'") // quotesingle, not quoteright
    assert(dec(PdfEncodings.winAnsi, 0x60) === "`") // grave, not quoteleft
    // CP1252 undefined slots must be absent, not silently mapped
    assert(!PdfEncodings.winAnsi.contains(0x81))
    assert(!PdfEncodings.winAnsi.contains(0x9D))
  }

  test("MacRoman: Mac OS Roman landmarks") {
    assert(dec(PdfEncodings.macRoman, 0x8A) === "ä") // adieresis
    assert(dec(PdfEncodings.macRoman, 0xA5) === "•") // bullet
    assert(dec(PdfEncodings.macRoman, 0xD5) === "’") // quoteright
    assert(dec(PdfEncodings.macRoman, 0xCA) === " ") // the Mac nbsp slot
    // the math-symbol slots Appendix D leaves blank stay unmapped
    assert(!PdfEncodings.macRoman.contains(0xC5)) // approxequal's slot
    assert(!PdfEncodings.macRoman.contains(0xB0)) // infinity's slot
  }

  test("Standard: the Adobe quirks") {
    assert(dec(PdfEncodings.standard, 0x27) === "’") // quoteright
    assert(dec(PdfEncodings.standard, 0x60) === "‘") // quoteleft
    assert(dec(PdfEncodings.standard, 0xA9) === "'") // quotesingle lives high
    assert(dec(PdfEncodings.standard, 0xAE) === "ﬁ") // fi ligature
    assert(dec(PdfEncodings.standard, 0xFB) === "ß") // germandbls
    // 0xE9 is Oslash in Standard, NOT Latin-1's eacute
    assert(dec(PdfEncodings.standard, 0xE9) === "Ø")
    // and plain Latin-1 slots like ñ's (0xF1 = ae here) differ from Latin-1
    assert(dec(PdfEncodings.standard, 0xF1) === "æ")
  }

  test("every table name resolves through the AGL subset") {
    for (t <- Seq(PdfEncodings.standard, PdfEncodings.winAnsi, PdfEncodings.macRoman);
         (code, name) <- t)
      assert(PdfEncodings.glyph(name).nonEmpty, s"code $code name $name")
  }

  test("AGL uniXXXX / uXXXXXX fallbacks and failures") {
    assert(PdfEncodings.glyph("uni20AC") === "€")
    assert(PdfEncodings.glyph("u1F600") === new String(Character.toChars(0x1F600)))
    assertThrows[IllegalArgumentException](PdfEncodings.glyph("gXYZ"))
    assertThrows[IllegalArgumentException](PdfEncodings.glyph("uniZZZZ"))
  }
}
