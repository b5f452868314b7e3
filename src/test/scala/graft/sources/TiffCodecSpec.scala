package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Unit tier for the multi-page TIFF codec (q60t's engine): roundtrips
  * across byte orders and compressions, PackBits properties, and the
  * loud-failure contracts for corrupt or unsupported files. */
class TiffCodecSpec extends AnyFunSuite {

  private val pages: Seq[Array[Byte]] = Seq(
    "The quick brown fox jumps over the lazy dog. " * 5,
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa runs compress well " + "b" * 200,
    "short",
    "x") // final page shorter than one row
    .map(_.getBytes("UTF-8"))

  test("multi-page roundtrip: both byte orders, both compressions") {
    for (big <- Seq(false, true); pb <- Seq(false, true)) {
      val got = Tiff.decodePages(Tiff.encode(pages, big, pb))
      assert(got.length === pages.length, s"bigEndian=$big packbits=$pb")
      got.zip(pages).foreach { case (g, w) =>
        assert(g.toSeq === w.toSeq, s"bigEndian=$big packbits=$pb") }
    }
  }

  test("packbits: exact inverse on adversarial inputs") {
    val rnd = new scala.util.Random(3)
    for (trial <- 1 to 60) {
      val d = new Array[Byte](rnd.nextInt(2000))
      trial % 3 match {
        case 0 => rnd.nextBytes(d) // noise → literals
        case 1 => java.util.Arrays.fill(d, 7.toByte) // one long run
        case _ => // mixed: runs of random lengths
          var i = 0
          while (i < d.length) {
            val v = rnd.nextInt(4).toByte
            val n = math.min(d.length - i, 1 + rnd.nextInt(300))
            java.util.Arrays.fill(d, i, i + n, v)
            i += n
          }
      }
      val enc = Tiff.packBits(d)
      assert(Tiff.unpackBits(enc, d.length).toSeq === d.toSeq, s"trial $trial")
    }
    // strict decode: truncation and trailing garbage throw
    val enc = Tiff.packBits("hello world".getBytes("ISO-8859-1"))
    assertThrows[IllegalArgumentException](Tiff.unpackBits(enc, 12))
    assertThrows[IllegalArgumentException](
      Tiff.unpackBits(enc ++ Array(0.toByte, 65.toByte), 11))
  }

  test("seeded fuzz: arbitrary page sets round trip exactly") {
    val rnd = new scala.util.Random(19)
    for (trial <- 1 to 30) {
      val ps = (0 until 1 + rnd.nextInt(6)).map { _ =>
        val b = new Array[Byte](rnd.nextInt(1500))
        rnd.nextBytes(b) // arbitrary binary pixels, incl. NUL and 0xFF
        b
      }
      for (big <- Seq(false, true); pb <- Seq(false, true)) {
        val got = Tiff.decodePages(Tiff.encode(ps, big, pb))
        assert(got.length === ps.length, s"trial $trial big=$big pb=$pb")
        got.zip(ps).foreach { case (g, w) =>
          assert(g.toSeq === w.toSeq, s"trial $trial big=$big pb=$pb") }
      }
    }
  }

  test("unsupported and corrupt files throw loudly") {
    val good = Tiff.encode(pages)
    // bad byte order / magic
    assertThrows[IllegalArgumentException](Tiff.decodePages("XX".getBytes ++ good.drop(2)))
    val badMagic = good.clone(); badMagic(2) = 41.toByte
    assertThrows[IllegalArgumentException](Tiff.decodePages(badMagic))
    // truncated strip data
    assertThrows[IllegalArgumentException](Tiff.decodePages(good.dropRight(8)))
    // IFD cycle: point IFD0's next-IFD link back at IFD0. IFD0 sits at
    // offset 8 with 10 entries → next-IFD field at 8 + 2 + 120
    val cyc = good.clone()
    val nextOff = 8 + 2 + 12 * 10
    cyc(nextOff) = 8; cyc(nextOff + 1) = 0; cyc(nextOff + 2) = 0; cyc(nextOff + 3) = 0
    val e = intercept[IllegalArgumentException](Tiff.decodePages(cyc))
    assert(e.getMessage.contains("cycle"))
    // unsupported compression (LZW = 5): Compression is the 4th of the
    // 10 ascending tags (256,257,258,259,...) → entry at 8+2+12*3,
    // inline SHORT value at entry+8 (little-endian fixture)
    val lzw = good.clone()
    val compOff = 8 + 2 + 12 * 3 + 8
    lzw(compOff) = 5
    val e2 = intercept[IllegalArgumentException](Tiff.decodePages(lzw))
    assert(e2.getMessage.contains("compression 5"))
  }
}
