package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The strict MP3 frame-header codec (q152's container walk). */
class Mp3CodecSpec extends AnyFunSuite {

  test("encode/decode round-trips frame count, bitrate, samplerate, padding") {
    val bytes = Mp3.encode(nFrames = 7, bitrateIdx = 9, sampleRateIdx = 1,
      padding = true, seed = 42L)
    val frames = Mp3.decode(bytes)
    assert(frames.length == 7)
    assert(frames.forall(f => f.bitrateIdx == 9 && f.sampleRateIdx == 1 && f.padding))
    assert(Mp3.bitrateKbps(frames.head) == 128 && Mp3.sampleRateHz(frames.head) == 48000)
    // ISO frame length: 144000*128/48000 + 1 = 385
    assert(frames.head.lengthBytes == 385)
    assert(bytes.length == 7 * 385)
  }

  test("padding bit adds exactly one byte and does not corrupt the samplerate field") {
    val unpadded = Mp3.decode(Mp3.encode(1, 5, 0, padding = false, 0L))
    val padded = Mp3.decode(Mp3.encode(1, 5, 0, padding = true, 0L))
    assert(padded.head.lengthBytes == unpadded.head.lengthBytes + 1)
    assert(padded.head.sampleRateIdx == 0 && unpadded.head.sampleRateIdx == 0)
  }

  test("a VBR concatenation of frames decodes in order") {
    val vbr = Mp3.encode(1, 2, 0, padding = false, 1L) ++
      Mp3.encode(1, 14, 2, padding = true, 2L) ++
      Mp3.encode(1, 7, 1, padding = false, 3L)
    val frames = Mp3.decode(vbr)
    assert(frames.map(_.bitrateIdx) == Seq(2, 14, 7))
    assert(frames.map(_.sampleRateIdx) == Seq(0, 2, 1))
  }

  test("corruption throws loudly") {
    val good = Mp3.encode(3, 9, 1, padding = false, 7L)
    def bad(b: Array[Byte]): Unit =
      intercept[IllegalArgumentException](Mp3.decode(b))
    bad(Array.emptyByteArray)                       // empty
    bad(good.dropRight(1))                          // truncated final frame
    bad(good ++ Array[Byte](0x00))                  // trailing junk (lost sync)
    val badSync = good.clone(); badSync(0) = 0x00; bad(badSync)
    val badLayer = good.clone()
    badLayer(1) = (badLayer(1) & ~0x06).toByte      // layer bits 00 (reserved)
    bad(badLayer)
    val freeFormat = good.clone()
    freeFormat(2) = (freeFormat(2) & 0x0f).toByte   // bitrate idx 0
    bad(freeFormat)
    val mpeg2 = good.clone()
    mpeg2(1) = (mpeg2(1) & ~0x08).toByte            // version != MPEG-1
    bad(mpeg2)
  }
}
