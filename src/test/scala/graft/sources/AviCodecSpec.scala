package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Unit tier for the AVI container codec (q60u's engine): frame
  * roundtrips incl. odd-length word-alignment, header agreement, the
  * idx1 cross-check, and loud failures on corruption. */
class AviCodecSpec extends AnyFunSuite {

  private def frames(sizes: Int*): Seq[Array[Byte]] =
    sizes.zipWithIndex.map { case (n, i) =>
      Array.tabulate[Byte](n)(k => ((k * 31 + i * 7) & 0xff).toByte) }

  test("frames round trip, odd lengths exercise the RIFF pad byte") {
    val fs = frames(200, 199, 1, 64, 3)
    val v = Avi.decode(Avi.encode(fs, width = 640, height = 360, usPerFrame = 33367))
    assert(v.width === 640 && v.height === 360 && v.usPerFrame === 33367)
    assert(v.frames.length === fs.length)
    v.frames.zip(fs).foreach { case (g, w) => assert(g.toSeq === w.toSeq) }
  }

  test("seeded fuzz: arbitrary frame payloads round trip exactly") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 30) {
      val fs = (0 until 1 + rnd.nextInt(20)).map { _ =>
        val b = new Array[Byte](rnd.nextInt(700))
        rnd.nextBytes(b) // includes RIFF-looking fourcc bytes mid-frame
        b
      }
      val v = Avi.decode(Avi.encode(fs))
      assert(v.frames.length === fs.length, s"trial $trial")
      v.frames.zip(fs).foreach { case (g, w) =>
        assert(g.toSeq === w.toSeq, s"trial $trial") }
    }
  }

  test("corrupt and unsupported files throw loudly") {
    val good = Avi.encode(frames(100, 101, 102))
    // not RIFF / not AVI
    assertThrows[IllegalArgumentException](Avi.decode("XXXX".getBytes ++ good.drop(4)))
    // truncation
    assertThrows[IllegalArgumentException](Avi.decode(good.dropRight(10)))
    // a crafted near-Int.MaxValue chunk length must hit the overrun
    // require (Long bound math), not wrap into a negative scan position
    val wrap = good.clone()
    // first top-level chunk's length field sits at offset 16 (RIFF(8) +
    // 'AVI '(4) + fourcc(4)); 0x7FFFFFF4 little-endian
    wrap(16) = 0xf4.toByte; wrap(17) = 0xff.toByte
    wrap(18) = 0xff.toByte; wrap(19) = 0x7f.toByte
    val eo = intercept[IllegalArgumentException](Avi.decode(wrap))
    assert(eo.getMessage.contains("overruns"))
    // header frame-count lie: avih dwTotalFrames is 16 bytes into avih's
    // body; avih is the first chunk inside hdrl (RIFF(12) + LIST hdr(12))
    val lie = good.clone()
    val totalFramesOff = 12 + 12 + 8 + 16
    lie(totalFramesOff) = 9
    val e = intercept[IllegalArgumentException](Avi.decode(lie))
    assert(e.getMessage.contains("frame counts"))
    // idx1 desync: corrupt the last index entry's size field
    val bad = good.clone()
    val sizeOff = bad.length - 4
    bad(sizeOff) = (bad(sizeOff) + 1).toByte
    val e2 = intercept[IllegalArgumentException](Avi.decode(bad))
    assert(e2.getMessage.contains("idx1"))
    // non-video stream type
    val audio = Avi.encode(frames(10))
    val strhTypeOff = {
      // find 'vids' (unique in the fixture)
      val s = new String(audio, "ISO-8859-1")
      s.indexOf("vids")
    }
    audio(strhTypeOff) = 'a'.toByte
    assertThrows[IllegalArgumentException](Avi.decode(audio))
  }
}
