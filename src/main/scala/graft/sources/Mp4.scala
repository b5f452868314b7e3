package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.US_ASCII

/** Minimal strict ISO Base Media File Format (.mp4) box codec — the
  * container modern crawled video ships in (ISO/IEC 14496-12; AVI is the
  * legacy RIFF side, [[Avi]]). Implements exactly the box walk a corpus
  * census touches: the big-endian size+fourcc box framing, `ftyp`
  * (major/minor/compatible brands), the `moov` container with `mvhd`
  * (movie timescale/duration) and per-`trak` `tkhd` + `mdia`(`mdhd`
  * timescale/duration + `hdlr` handler fourcc), and an opaque `mdat`
  * payload — geometry and duration arithmetic without any sample-table
  * or codec decode, the same payload-opaque discipline as [[Mp3]]/[[Avi]].
  *
  * Decode is strict in the repo's codec discipline: 32-bit box sizes
  * only (size 0 "to EOF" and size 1 "largesize" are refused — this lake
  * never writes them), the first box must be `ftyp`, exactly one `moov`,
  * children must tile their container's payload exactly, version-0
  * full boxes only, every trak must carry tkhd + mdia(mdhd + hdlr), and
  * the file must end on a box boundary — truncation, overlap, or junk
  * throws LOUDLY rather than yielding a silently-wrong census.
  */
object Mp4 {

  final case class Track(handler: String, timescale: Long, durationTicks: Long) {
    /** Exact integer milliseconds (callers pick tick rates that divide). */
    def durationMs: Long = durationTicks * 1000L / timescale
  }

  final case class Movie(brand: String, timescale: Long, durationTicks: Long,
                         tracks: Seq[Track], mdatBytes: Long) {
    def durationMs: Long = durationTicks * 1000L / timescale
  }

  private def fourcc(s: String): Array[Byte] = {
    require(s.length == 4, s"fourcc '$s'")
    s.getBytes(US_ASCII)
  }

  private def be32(v: Long): Array[Byte] =
    ByteBuffer.allocate(4).putInt(v.toInt).array()

  /** Version-0 full boxes carry 32-bit tick fields: a timescale or tick
    * count past 2³²−1 would silently truncate mod 2³² in putInt (e.g. a
    * 48 kHz audio track overflows at ~89M-char docs) — refuse loudly,
    * mirroring decode's strictness. */
  private def u32Field(what: String, v: Long): Int = {
    require(v >= 0 && v <= 0xffffffffL,
      s"MP4 encode: $what $v does not fit unsigned 32 bits (version-0 box)")
    v.toInt
  }

  private def box(typ: String, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(body.length + 8)
    out.write(be32(body.length + 8L)); out.write(fourcc(typ)); out.write(body)
    out.toByteArray
  }

  /** mvhd version 0 (ISO 14496-12 §8.2.2): fixed 100-byte payload. */
  private def mvhd(timescale: Long, duration: Long): Array[Byte] = {
    val b = ByteBuffer.allocate(100)
    b.putInt(0)                       // version 0 + flags
    b.putInt(0).putInt(0)             // creation, modification
    b.putInt(u32Field("mvhd timescale", timescale))
    b.putInt(u32Field("mvhd duration", duration))
    b.putInt(0x00010000)              // rate 1.0
    b.putShort(0x0100.toShort)        // volume 1.0
    b.putShort(0); b.putInt(0).putInt(0) // reserved
    // unity matrix
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000).foreach(b.putInt)
    (0 until 6).foreach(_ => b.putInt(0)) // pre_defined
    b.putInt(3)                       // next_track_ID
    box("mvhd", b.array())
  }

  /** tkhd version 0 (§8.3.2): fixed 84-byte payload. */
  private def tkhd(trackId: Int, duration: Long): Array[Byte] = {
    val b = ByteBuffer.allocate(84)
    b.putInt(7)                       // version 0, flags: enabled|in_movie|in_preview
    b.putInt(0).putInt(0)             // creation, modification
    b.putInt(trackId); b.putInt(0)    // track_ID, reserved
    b.putInt(u32Field("tkhd duration", duration))
    b.putInt(0).putInt(0)             // reserved
    b.putShort(0); b.putShort(0); b.putShort(0); b.putShort(0) // layer, group, volume, reserved
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000).foreach(b.putInt)
    b.putInt(0).putInt(0)             // width, height (0 for audio; opaque here)
    box("tkhd", b.array())
  }

  /** mdhd version 0 (§8.4.2): fixed 24-byte payload. */
  private def mdhd(timescale: Long, duration: Long): Array[Byte] = {
    val b = ByteBuffer.allocate(24)
    b.putInt(0)                       // version + flags
    b.putInt(0).putInt(0)             // creation, modification
    b.putInt(u32Field("mdhd timescale", timescale))
    b.putInt(u32Field("mdhd duration", duration))
    b.putShort(0x55c4.toShort)        // language 'und'
    b.putShort(0)                     // pre_defined
    box("mdhd", b.array())
  }

  /** hdlr (§8.4.3): fullbox + pre_defined + handler + 3×reserved + "" name. */
  private def hdlr(handler: String): Array[Byte] = {
    val b = ByteBuffer.allocate(25)
    b.putInt(0); b.putInt(0)
    b.put(fourcc(handler))
    b.putInt(0).putInt(0).putInt(0)
    b.put(0.toByte)                   // empty null-terminated name
    box("hdlr", b.array())
  }

  /** Encode a structurally-valid two-level movie: ftyp + moov(mvhd +
    * trak per track) + one opaque mdat. Movie duration must be given in
    * MOVIE timescale ticks; track durations in each track's own. */
  def encode(brand: String, timescale: Long, durationTicks: Long,
             tracks: Seq[(String, Long, Long)], mdat: Array[Byte]): Array[Byte] = {
    require(tracks.nonEmpty, "MP4 needs at least one trak")
    val ftypBody = new ByteArrayOutputStream()
    ftypBody.write(fourcc(brand)); ftypBody.write(be32(512))
    ftypBody.write(fourcc("isom")); ftypBody.write(fourcc("iso2"))
    val ftyp = box("ftyp", ftypBody.toByteArray)
    val traks = tracks.zipWithIndex.map { case ((handler, ts, dur), i) =>
      val mdia = box("mdia", mdhd(ts, dur) ++ hdlr(handler))
      // rescale to movie ticks with overflow-exact multiply: both factors
      // are u32-bounded but their product can exceed Long
      box("trak", tkhd(i + 1, Math.multiplyExact(dur, timescale) / ts) ++ mdia)
    }
    val moov = box("moov",
      mvhd(timescale, durationTicks) ++ traks.reduce(_ ++ _))
    ftyp ++ moov ++ box("mdat", mdat)
  }

  /** Strict box walk → movie header census. mdat payload stays opaque
    * (only its length is reported). */
  def decode(bytes: Array[Byte]): Movie = {
    def u32(off: Int): Long = {
      require(off + 4 <= bytes.length, s"corrupt MP4: truncated u32 at $off")
      ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
        ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
    }
    def typ(off: Int): String = {
      require(off + 4 <= bytes.length, s"corrupt MP4: truncated fourcc at $off")
      new String(bytes, off, 4, US_ASCII)
    }
    /** children (type, payloadStart, payloadEnd) tiling [from, to) exactly. */
    def walk(from: Int, to: Int): Seq[(String, Int, Int)] = {
      val out = Seq.newBuilder[(String, Int, Int)]
      var off = from
      while (off < to) {
        require(off + 8 <= to, s"corrupt MP4: truncated box header at $off")
        val size = u32(off)
        require(size != 0 && size != 1,
          s"corrupt MP4: unsupported size=$size (to-EOF/largesize) at $off")
        require(size >= 8, s"corrupt MP4: box size $size < 8 at $off")
        require(off + size <= to, s"corrupt MP4: box overruns container at $off")
        out += ((typ(off + 4), off + 8, off + size.toInt))
        off += size.toInt
      }
      require(off == to, s"corrupt MP4: children do not tile container at $off != $to")
      out.result()
    }
    val top = walk(0, bytes.length)
    require(top.nonEmpty && top.head._1 == "ftyp", "corrupt MP4: first box not ftyp")
    val (_, fs, fe) = top.head
    require(fe - fs >= 8, "corrupt MP4: ftyp too short")
    val brand = typ(fs)
    val moovs = top.filter(_._1 == "moov")
    require(moovs.length == 1, s"corrupt MP4: ${moovs.length} moov boxes")
    val (_, ms, me) = moovs.head
    val kids = walk(ms, me)
    val mvhds = kids.filter(_._1 == "mvhd")
    require(mvhds.length == 1, s"corrupt MP4: ${mvhds.length} mvhd boxes")
    val (_, vs, ve) = mvhds.head
    require(ve - vs == 100, s"corrupt MP4: mvhd payload ${ve - vs} != 100 (version 0)")
    require(u32(vs) == 0, "corrupt MP4: mvhd version/flags != 0")
    val mTs = u32(vs + 12); val mDur = u32(vs + 16)
    require(mTs > 0, "corrupt MP4: zero movie timescale")
    val tracks = kids.filter(_._1 == "trak").map { case (_, ts0, te0) =>
      val tk = walk(ts0, te0)
      require(tk.exists(_._1 == "tkhd"), "corrupt MP4: trak without tkhd")
      val mdias = tk.filter(_._1 == "mdia")
      require(mdias.length == 1, s"corrupt MP4: ${mdias.length} mdia in trak")
      val (_, ds, de) = mdias.head
      val mk = walk(ds, de)
      val mdhds = mk.filter(_._1 == "mdhd")
      require(mdhds.length == 1, s"corrupt MP4: ${mdhds.length} mdhd in mdia")
      val (_, hs, he) = mdhds.head
      require(he - hs == 24, s"corrupt MP4: mdhd payload ${he - hs} != 24 (version 0)")
      require(u32(hs) == 0, "corrupt MP4: mdhd version/flags != 0")
      val ts = u32(hs + 12); val dur = u32(hs + 16)
      require(ts > 0, "corrupt MP4: zero track timescale")
      val hdlrs = mk.filter(_._1 == "hdlr")
      require(hdlrs.length == 1, s"corrupt MP4: ${hdlrs.length} hdlr in mdia")
      // the handler fourcc sits at payload offset 8..12: bound it by the
      // hdlr box END, not the file end — a short hdlr must throw, not
      // read the neighboring box's bytes as the handler
      require(hdlrs.head._3 - hdlrs.head._2 >= 12, "corrupt MP4: hdlr too short")
      val handler = typ(hdlrs.head._2 + 8)
      Track(handler, ts, dur)
    }
    require(tracks.nonEmpty, "corrupt MP4: moov without trak")
    val mdats = top.filter(_._1 == "mdat")
    val mdatBytes = mdats.map { case (_, s, e) => (e - s).toLong }.sum
    Movie(brand, mTs, mDur, tracks, mdatBytes)
  }
}
