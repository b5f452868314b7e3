package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Mp4's strict-decode contract: a round trip preserves every header
  * field, and structural corruption — truncation, non-tiling children,
  * missing/duplicate mandatory boxes, unsupported size encodings,
  * version-1 headers — throws rather than yielding a wrong census. */
class Mp4CodecSpec extends AnyFunSuite {

  private def sample(brand: String = "isom"): Array[Byte] =
    Mp4.encode(brand, timescale = 1000L, durationTicks = 400L,
      tracks = Seq(("vide", 90000L, 36000L), ("soun", 48000L, 9600L)),
      mdat = Array.tabulate(13)(_.toByte))

  test("round trip preserves brand, clocks, durations, and mdat length") {
    val m = Mp4.decode(sample("mp42"))
    assert(m.brand == "mp42")
    assert(m.timescale == 1000L && m.durationTicks == 400L && m.durationMs == 400L)
    assert(m.tracks.map(_.handler) == Seq("vide", "soun"))
    assert(m.tracks.head.timescale == 90000L && m.tracks.head.durationTicks == 36000L)
    assert(m.tracks.head.durationMs == 400L)   // 36000 / 90000 * 1000
    assert(m.tracks(1).durationMs == 200L)     // 9600 / 48000 * 1000
    assert(m.mdatBytes == 13L)
  }

  test("the exact-millisecond tick rates divide (the census' integer contract)") {
    // video: nf frames at 25 fps on 90 kHz -> nf * 40 ms, audio: n chars
    // at 48 kHz -> n ms — for arbitrary nf/n
    for (nf <- Seq(1L, 7L, 123L); n <- Seq(1L, 199L, 12345L)) {
      val m = Mp4.decode(Mp4.encode("isom", 1000L, math.max(nf * 40, n),
        Seq(("vide", 90000L, nf * 3600L), ("soun", 48000L, n * 48L)), Array[Byte](1)))
      assert(m.tracks.head.durationMs == nf * 40)
      assert(m.tracks(1).durationMs == n)
      assert(m.durationMs == math.max(nf * 40, n))
    }
  }

  test("structural corruption throws loudly") {
    val ok = sample()
    def bad(mut: Array[Byte] => Array[Byte]): Unit =
      intercept[IllegalArgumentException](Mp4.decode(mut(ok.clone())))
    // truncated mid-box
    bad(b => b.take(b.length - 3))
    // first box not ftyp (retag)
    bad { b => b(4) = 'f'; b(5) = 'r'; b(6) = 'e'; b(7) = 'e'; b }
    // size-0 (to-EOF) encoding refused
    bad { b => b(0) = 0; b(1) = 0; b(2) = 0; b(3) = 0; b }
    // child overruns container: inflate the ftyp size by 1
    bad { b => b(3) = (b(3) + 1).toByte; b }
    // version-1 mvhd refused: moov payload starts at 24+8, mvhd version
    // byte right after its 8-byte header
    bad { b => b(24 + 8 + 8) = 1; b }
    // duplicate moov: append a copy of the moov box
    val moov = ok.slice(24, 24 + 462)
    intercept[IllegalArgumentException](Mp4.decode(ok ++ moov))
    // empty movie: no trak
    intercept[IllegalArgumentException](
      Mp4.encode("isom", 1000L, 0L, Seq.empty, Array[Byte](0)))
  }

  test("encode refuses tick fields past unsigned 32 bits (no silent mod-2^32)") {
    // 48 kHz audio track overflowing u32 ticks (~89M-char docs): must
    // throw at encode, not truncate into a wrong census
    intercept[IllegalArgumentException](
      Mp4.encode("isom", 1000L, 1L, Seq(("soun", 48000L, 0x100000000L)), Array[Byte](1)))
    // movie-level duration and timescales too
    intercept[IllegalArgumentException](
      Mp4.encode("isom", 1000L, 0x100000000L, Seq(("soun", 48000L, 48L)), Array[Byte](1)))
    intercept[IllegalArgumentException](
      Mp4.encode("isom", 0x100000000L, 1L, Seq(("soun", 48000L, 48L)), Array[Byte](1)))
    // boundary value still encodes: u32 max ticks on the movie clock
    val m = Mp4.decode(Mp4.encode("isom", 1000L, 0xffffffffL,
      Seq(("soun", 48000L, 48L)), Array[Byte](1)))
    assert(m.durationTicks == 0xffffffffL)
  }

  test("decode bounds the hdlr handler fourcc by the hdlr box end") {
    // shrink the hdlr payload below 12 bytes so the handler fourcc would
    // fall outside it: rebuild a movie whose hdlr box is truncated but
    // whose containers re-tile exactly (all ancestor sizes shrunk by 17)
    val ok = sample()
    def be32(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    // layout: ftyp 24, then moov. First trak starts at moov payload +108
    // (mvhd 108); trak = tkhd 92 + mdia(mdhd 32 + hdlr 33). Shrink the
    // first hdlr from 33 to 16 bytes (payload 8 < 12) and re-tile.
    val moovOff = 24
    val trakOff = moovOff + 8 + 108
    val mdiaOff = trakOff + 8 + 92
    val hdlrOff = mdiaOff + 8 + 32
    assert(new String(ok, hdlrOff + 4, 4, java.nio.charset.StandardCharsets.US_ASCII) == "hdlr")
    val cut = 17 // 33 - 16
    val b = ok.slice(0, hdlrOff) ++ be32(16) ++ ok.slice(hdlrOff + 4, hdlrOff + 16) ++
      ok.slice(hdlrOff + 33, ok.length)
    def shrink(arr: Array[Byte], off: Int): Unit = {
      val sz = java.nio.ByteBuffer.wrap(arr, off, 4).getInt - cut
      System.arraycopy(be32(sz), 0, arr, off, 4)
    }
    shrink(b, moovOff); shrink(b, trakOff); shrink(b, mdiaOff)
    val e = intercept[IllegalArgumentException](Mp4.decode(b))
    assert(e.getMessage.contains("hdlr too short"))
  }

  test("the box grammar's fixed sizes (the oracle's file_bytes arithmetic)") {
    // ftyp 24 + moov 462 + mdat 8+payload — the constants the q157
    // oracle bakes in; a layout change must fail HERE, not at the gate
    assert(sample().length == 24 + 462 + 8 + 13)
  }
}
