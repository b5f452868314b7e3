package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Unit tier for the JPEG container codec (q60s's engine): roundtrips
  * across every staged shape, the byte-stuffing poison cases, both Exif
  * byte orders, restart-marker ordering, and the loud-failure contracts
  * for corrupt or unsupported files. */
class JpegCodecSpec extends AnyFunSuite {

  private val text = "The quick brown fox jumps over the lazy dog. " * 8
  private val payload = text.getBytes("UTF-8")

  private def meta(bytes: Array[Byte]): Jpeg.Meta = Jpeg.decode(bytes)

  test("baseline grayscale JFIF with comment round-trips") {
    val m = meta(Jpeg.encode(payload, 100, 80, components = 1,
      comment = Some("hello world")))
    assert(m.width === 100 && m.height === 80 && m.components === 1)
    assert(!m.progressive && m.nScans === 1)
    assert(m.orientation === 1) // no Exif → top-left default
    assert(m.comment === Some("hello world") && m.description.isEmpty)
    assert(m.payload.toSeq === payload.toSeq)
  }

  test("Exif little-endian orientation is parsed") {
    for (o <- 1 to 8) {
      val m = meta(Jpeg.encode(payload, 64, 64, exifOrientation = Some(o)))
      assert(m.orientation === o, s"orientation $o")
    }
  }

  test("Exif big-endian orientation + offset-stored ImageDescription") {
    val m = meta(Jpeg.encode(payload, 640, 480, exifOrientation = Some(6),
      exifBigEndian = true, exifDescription = Some("a camera caption")))
    assert(m.orientation === 6)
    assert(m.description === Some("a camera caption"))
  }

  test("Exif short ImageDescription takes the TIFF inline-value form") {
    // <= 4 bytes including the NUL must sit IN the value field, both
    // byte orders (TIFF 6.0 §2) — the offset form would decode garbage
    for (big <- Seq(false, true); d <- Seq("", "a", "ab", "abc")) {
      val m = meta(Jpeg.encode(payload, 64, 64, exifOrientation = Some(2),
        exifBigEndian = big, exifDescription = Some(d)))
      assert(m.description === Some(d), s"bigEndian=$big desc='$d'")
    }
  }

  test("progressive two-scan file concatenates its scans") {
    val m = meta(Jpeg.encode(payload, 32, 32, progressive = true,
      exifOrientation = Some(3)))
    assert(m.progressive && m.nScans === 2)
    assert(m.payload.toSeq === payload.toSeq)
  }

  test("restart markers are stripped and their order verified") {
    val m = meta(Jpeg.encode(payload, 64, 64, dri = 16, extraDqt = true,
      comment = Some("c")))
    assert(m.payload.toSeq === payload.toSeq)
    // corrupt one restart marker's index → out-of-order throws
    val bytes = Jpeg.encode(payload, 64, 64, dri = 16)
    var i = -1
    for (k <- 2 until bytes.length - 1
         if i < 0 && (bytes(k) & 0xff) == 0xff && (bytes(k + 1) & 0xff) == 0xd0)
      i = k
    assert(i > 0, "fixture has no RST0")
    bytes(i + 1) = 0xd5.toByte
    val e = intercept[IllegalArgumentException](Jpeg.decode(bytes))
    assert(e.getMessage.contains("restart marker out of order"))
  }

  test("byte stuffing survives payloads full of 0xFF and phantom EOI") {
    // the poison payload: raw FFD9 (EOI) and FFD0 (RST0) patterns plus
    // a run of FFs — only correct FF00 unstuffing recovers it
    val poison = Array(0xff, 0xd9, 0xff, 0x00, 0xff, 0xff, 0xd0, 0x41,
      0xff, 0xfe).map(_.toByte)
    val m = meta(Jpeg.encode(poison, 8, 8))
    assert(m.payload.toSeq === poison.toSeq)
  }

  test("empty payload round-trips (the preamble alone proves stuffing)") {
    val m = meta(Jpeg.encode(Array.emptyByteArray, 16, 16))
    assert(m.payload.isEmpty)
  }

  test("unsupported and corrupt files throw loudly") {
    val good = Jpeg.encode(payload, 64, 64)
    // no SOI
    assertThrows[IllegalArgumentException](Jpeg.decode(good.drop(2)))
    // truncated mid-scan (EOI lost)
    assertThrows[IllegalArgumentException](Jpeg.decode(good.dropRight(4)))
    // unsupported SOF (lossless SOF3)
    val sof3 = good.clone()
    var i = -1
    for (k <- 2 until sof3.length - 1
         if i < 0 && (sof3(k) & 0xff) == 0xff && (sof3(k + 1) & 0xff) == 0xc0)
      i = k
    sof3(i + 1) = 0xc3.toByte
    val e = intercept[IllegalArgumentException](Jpeg.decode(sof3))
    assert(e.getMessage.contains("SOF 0xc3"))
    // restart marker with no DRI declared
    val noDri = Jpeg.encode(payload, 64, 64, dri = 16)
    val driPos = {
      var p = -1
      for (k <- 2 until noDri.length - 3
           if p < 0 && (noDri(k) & 0xff) == 0xff && (noDri(k + 1) & 0xff) == 0xdd)
        p = k
      p
    }
    assert(driPos > 0)
    val stripped = noDri.take(driPos) ++ noDri.drop(driPos + 6)
    val e2 = intercept[IllegalArgumentException](Jpeg.decode(stripped))
    assert(e2.getMessage.contains("restart marker without DRI"))
  }

  test("corrupt Exif throws: bad magic, bad byte order, bad orientation") {
    val app1 = Jpeg.exifApp1(3, None, bigEndian = false)
    // byte order neither II nor MM
    val badOrder = app1.clone(); badOrder(6) = 'X'.toByte
    assertThrows[IllegalArgumentException](Jpeg.parseExif(badOrder))
    // TIFF magic != 42
    val badMagic = app1.clone(); badMagic(8) = 41.toByte
    assertThrows[IllegalArgumentException](Jpeg.parseExif(badMagic))
    // orientation out of 1..8 (little-endian SHORT value at entry + 8)
    assertThrows[IllegalArgumentException](Jpeg.exifApp1(9, None, bigEndian = false))
    val badO = app1.clone()
    // IFD0 at 8: count(2) + entry: tag(2) type(2) count(4) → value at
    // TIFF base 6 + 8 + 2 + 8 = 24
    badO(24) = 0
    assertThrows[IllegalArgumentException](Jpeg.parseExif(badO))
  }

  test("geometry exceeding the 16-bit SOF fields is rejected at encode") {
    assertThrows[IllegalArgumentException](Jpeg.encode(payload, 70000, 10))
  }

  test("seeded fuzz: arbitrary binary payloads round trip across all shapes") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 40) {
      val p = new Array[Byte](rnd.nextInt(4000))
      rnd.nextBytes(p) // includes 0xFF runs, NUL, marker-like patterns
      val m = meta(Jpeg.encode(p,
        width = 1 + rnd.nextInt(1000), height = 1 + rnd.nextInt(1000),
        components = if (rnd.nextBoolean()) 1 else 3,
        progressive = rnd.nextBoolean(),
        exifOrientation = if (rnd.nextBoolean()) Some(1 + rnd.nextInt(8)) else None,
        exifBigEndian = rnd.nextBoolean(),
        exifDescription = if (rnd.nextBoolean()) Some("d" * rnd.nextInt(10)) else None,
        comment = if (rnd.nextBoolean()) Some("c" * rnd.nextInt(50)) else None,
        dri = if (rnd.nextBoolean()) 1 + rnd.nextInt(100) else 0,
        extraDqt = rnd.nextBoolean()))
      assert(m.payload.toSeq === p.toSeq, s"trial $trial")
    }
  }
}
