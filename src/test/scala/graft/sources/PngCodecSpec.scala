package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The PNG image codec round trip — sample streams in, identical streams
  * out through real signature/chunk/CRC/zlib/filter bytes — plus the
  * loud-failure contract for corrupt payloads. The encoder cycles rows
  * through all five scanline filter types, so one multi-row round trip
  * exercises None, Sub, Up, Average AND Paeth reconstruction. */
class PngCodecSpec extends AnyFunSuite {

  private def rt(samples: Array[Int], width: Int = 64, channels: Int = 1): Array[Int] =
    Png.decode(Png.encode(samples, width, channels)).samples

  test("round trip: grayscale, >5 rows so every filter type runs") {
    // deterministic but jagged values — gradients exercise Sub/Up/Average,
    // discontinuities exercise Paeth's three-way branch
    val samples = Array.tabulate(64 * 7 + 13)(i => (i * 31 + (i * i) % 97) % 256)
    assert(rt(samples).toSeq === samples.toSeq)
  }

  test("round trip: RGB interleaved channels") {
    val samples = Array.tabulate(48 * 3 * 6)(i => (i * 7 + 11) % 256)
    assert(rt(samples, width = 48, channels = 3).toSeq === samples.toSeq)
  }

  test("round trip: padding trim — lengths not a multiple of the row") {
    for (n <- Seq(0, 1, 63, 64, 65, 200)) {
      val samples = Array.tabulate(n)(i => (i * 13) % 256)
      assert(rt(samples).toSeq === samples.toSeq, s"length $n")
    }
  }

  test("decoded geometry matches the encoder's layout") {
    val img = Png.decode(Png.encode(Array.tabulate(130)(_ % 256), width = 64))
    assert(img.width === 64)
    assert(img.height === 3) // ceil(130/64)
    assert(img.channels === 1)
    assert(img.samples.length === 130)
  }

  test("corrupt payloads fail loudly, never half-decode") {
    val good = Png.encode(Array.tabulate(300)(i => (i * 3) % 256))
    // not a PNG at all
    intercept[IllegalArgumentException] { Png.decode("plain".getBytes("UTF-8")) }
    // one flipped bit in the IDAT payload → CRC mismatch
    val bitflip = good.clone()
    bitflip(good.length - 20) = (bitflip(good.length - 20) ^ 0x40).toByte
    intercept[IllegalArgumentException] { Png.decode(bitflip) }
    // truncated mid-chunk
    intercept[Exception] { Png.decode(good.take(good.length / 2)) }
  }

  test("unsupported layouts are rejected, not mis-decoded") {
    // hand-build a 1x1 palette-type PNG header (color type 3) with a
    // correct CRC: the IHDR gate must throw on the layout, proving the
    // reject happens even when framing is pristine
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = new java.io.ByteArrayOutputStream()
    ihdr.write(Array(0, 0, 0, 1, 0, 0, 0, 1).map(_.toByte)) // 1x1
    ihdr.write(8); ihdr.write(3)                             // depth 8, palette
    ihdr.write(0); ihdr.write(0); ihdr.write(0)
    val body = ihdr.toByteArray
    out.write(Array(0, 0, 0, 13).map(_.toByte))
    out.write("IHDR".getBytes("US-ASCII"))
    out.write(body)
    val crc = new java.util.zip.CRC32
    crc.update("IHDR".getBytes("US-ASCII")); crc.update(body)
    val v = crc.getValue.toInt
    out.write(Array(v >>> 24, v >>> 16, v >>> 8, v).map(_.toByte))
    val e = intercept[IllegalArgumentException] { Png.decode(out.toByteArray) }
    assert(e.getMessage.contains("unsupported PNG layout"))
  }

  test("decode dispatch: Multimodal routes PNG payloads to the real codec") {
    val samples = Array.tabulate(200)(i => (i * 5 + 3) % 256)
    assert(Multimodal.decodeSamples(Png.encode(samples)).toSeq === samples.toSeq)
  }

  test("encode is deterministic (content-addressed cache keys hold)") {
    val samples = Array.tabulate(333)(i => (i * 17) % 256)
    assert(Png.encode(samples).toSeq === Png.encode(samples).toSeq)
  }
}
