package graft.sources

/** Minimal strict MPEG-1 Audio Layer III (.mp3) frame-header codec — the
  * compressed-audio side of the container family (WAV/AVI already real).
  * Only the header walk is implemented: frame sync, version/layer bits,
  * the Layer III bitrate/samplerate tables, padding, and the frame-length
  * arithmetic `144·bitrate/samplerate + padding` (ISO 11172-3 §2.4.3.1) —
  * exactly what a corpus census (duration, bitrate, frame count) needs
  * without a DCT decoder. Payload bytes are opaque.
  *
  * Decode is strict in the repo's codec discipline: every frame must
  * start with 11 sync bits, declare MPEG-1 Layer III, a valid bitrate
  * (no free-format) and samplerate index, and the file must end exactly
  * at a frame boundary — truncation, junk, or a mid-file format switch
  * throws LOUDLY.
  */
object Mp3 {

  /** kbps by bitrate index 1..14 (MPEG-1 Layer III; 0 = free, 15 = bad). */
  private[sources] val BitrateKbps: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** Hz by samplerate index 0..2 (3 = reserved). */
  private[sources] val SampleRateHz: Array[Int] = Array(44100, 48000, 32000)

  final case class Frame(bitrateIdx: Int, sampleRateIdx: Int, padding: Boolean) {
    def lengthBytes: Int =
      144000 * BitrateKbps(bitrateIdx) / SampleRateHz(sampleRateIdx) +
        (if (padding) 1 else 0)
  }

  /** Header: FFF(sync) B(version=11 MPEG1, layer=01 L3, prot=1) then
    * bitrate/samplerate/padding bits; channel mode fixed to mono (11). */
  private def header(f: Frame): Array[Byte] = {
    require(f.bitrateIdx >= 1 && f.bitrateIdx <= 14, s"bad bitrate idx ${f.bitrateIdx}")
    require(f.sampleRateIdx >= 0 && f.sampleRateIdx <= 2, s"bad samplerate idx ${f.sampleRateIdx}")
    val b2 = 0xfb // 1111 1011: sync low 3 bits, version 11, layer 01, prot 1
    // byte 3 layout (MSB→LSB): bitrate idx (4) | samplerate idx (2) |
    // padding (1) | private (1)
    val b3 = (f.bitrateIdx << 4) | (f.sampleRateIdx << 2) |
      (if (f.padding) 2 else 0)
    Array(0xff.toByte, b2.toByte, b3.toByte, 0xc0.toByte)
  }

  /** nFrames CBR frames; payload filler deterministic from `seed`. */
  def encode(nFrames: Int, bitrateIdx: Int, sampleRateIdx: Int,
             padding: Boolean, seed: Long): Array[Byte] = {
    require(nFrames > 0, "empty MP3")
    val f = Frame(bitrateIdx, sampleRateIdx, padding)
    val out = new java.io.ByteArrayOutputStream(nFrames * f.lengthBytes)
    (0 until nFrames).foreach { i =>
      out.write(header(f))
      var j = 4
      while (j < f.lengthBytes) {
        out.write(((seed + i * 7 + j) % 251).toInt); j += 1
      }
    }
    out.toByteArray
  }

  /** Strict frame walk → per-frame headers (order preserved). */
  def decode(bytes: Array[Byte]): Seq[Frame] = {
    val frames = Seq.newBuilder[Frame]
    var off = 0
    require(bytes.nonEmpty, "corrupt MP3: empty file")
    while (off < bytes.length) {
      require(off + 4 <= bytes.length, s"corrupt MP3: truncated header at $off")
      val b1 = bytes(off) & 0xff; val b2 = bytes(off + 1) & 0xff
      val b3 = bytes(off + 2) & 0xff
      require(b1 == 0xff && (b2 & 0xe0) == 0xe0, s"corrupt MP3: lost sync at $off")
      require((b2 & 0x18) == 0x18, s"corrupt MP3: not MPEG-1 at $off")
      require((b2 & 0x06) == 0x02, s"corrupt MP3: not Layer III at $off")
      val bi = (b3 >> 4) & 0x0f
      require(bi >= 1 && bi <= 14, s"corrupt MP3: bitrate index $bi at $off")
      val si = (b3 >> 2) & 0x03
      require(si <= 2, s"corrupt MP3: samplerate index $si at $off")
      val f = Frame(bi, si, (b3 & 0x02) != 0)
      require(off + f.lengthBytes <= bytes.length,
        s"corrupt MP3: truncated frame at $off (need ${f.lengthBytes})")
      frames += f
      off += f.lengthBytes
    }
    frames.result()
  }

  def bitrateKbps(f: Frame): Int = BitrateKbps(f.bitrateIdx)
  def sampleRateHz(f: Frame): Int = SampleRateHz(f.sampleRateIdx)
}
