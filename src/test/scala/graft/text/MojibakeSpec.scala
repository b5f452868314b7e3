package graft.text

import org.scalatest.funsuite.AnyFunSuite

class MojibakeSpec extends AnyFunSuite {

  test("single-round mojibake repairs exactly") {
    val clean = "café → naïve — ☃ 文字 Ł"
    val bad = Mojibake.corrupt(clean, 1)
    assert(bad !== clean)
    assert(bad.contains("Ã©")) // the canonical é smell
    assert(Mojibake.repair(bad) === ((clean, 1)))
  }

  test("double mojibake needs and gets two rounds") {
    val clean = "Größe – 10€"
    val bad2 = Mojibake.corrupt(clean, 2)
    assert(Mojibake.repair(bad2) === ((clean, 2)))
    // and the intermediate state repairs in one
    assert(Mojibake.repair(Mojibake.corrupt(clean, 1)) === ((clean, 1)))
  }

  test("plain ASCII is a 0-round fixpoint") {
    val s = "just plain ascii text 123"
    assert(Mojibake.repair(s) === ((s, 0)))
  }

  test("clean accented text never false-positives") {
    // every char IS cp1252-encodable, but the bytes are not valid UTF-8
    val s = "café naïve Größe"
    assert(Mojibake.repair(s) === ((s, 0)))
  }

  test("non-cp1252 content (CJK, symbols) is untouchable, hence stable") {
    val s = "日本語のテキスト ☃"
    assert(Mojibake.repair(s) === ((s, 0)))
  }

  test("sloppy bytes: undefined cp1252 positions round-trip (Ł = C5 81)") {
    val clean = "Łódź"
    val bad = Mojibake.corrupt(clean, 1)
    // 0x81 is undefined in strict cp1252; sloppy maps it to itself
    assert(bad.contains('\u0081'))
    assert(Mojibake.repair(bad) === ((clean, 1)))
  }

  test("corrupt/repair round-trips the whole cp1252-reachable plane") {
    // every 2-byte UTF-8 char whose bytes are cp1252-decodable
    val chars = (0xA0 to 0x2FF).map(_.toChar).mkString
    val bad = Mojibake.corrupt(chars, 1)
    val (fixed, rounds) = Mojibake.repair(bad)
    assert(fixed === chars && rounds === 1)
  }

  test("mixed clean-ASCII + mojibake islands repair in one pass") {
    val clean = "The price is 10€ — naïve café"
    val bad = Mojibake.corrupt(clean, 1)
    assert(Mojibake.repair(bad) === ((clean, 1)))
  }

  test("defensive cap: repair stops at maxRounds") {
    val clean = "é"
    val bad = Mojibake.corrupt(clean, 4)
    assert(Mojibake.repair(bad, maxRounds = 2)._2 === 2)
    assert(Mojibake.repair(bad) === ((clean, 4)))
  }
}
