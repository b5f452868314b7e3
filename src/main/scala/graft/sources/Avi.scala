package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

/** Real AVI video-container codec, pure JVM (the RIFF AVI layout of the
  * public OpenDML/Microsoft specification — the container the WAV codec's
  * RIFF walk generalizes to).
  *
  * Implements the container structure a frame-sampling video pipeline
  * actually touches: the `RIFF..AVI ` envelope, the `hdrl` LIST with the
  * `avih` main header and one `strl` stream (a `strh` 'vids' header +
  * `strf` BITMAPINFOHEADER), the `movi` LIST of `00dc` frame chunks with
  * RIFF word-alignment padding, and the `idx1` index whose per-frame
  * offsets and sizes are VERIFIED against the movi walk on decode —
  * a desynced index is exactly how corrupt AVIs lie about their frames.
  * Frame PAYLOAD decoding (the actual video codec) stays out of scope,
  * same stand-in discipline as [[Jpeg]]'s entropy data: frames are
  * opaque byte blobs carried bit-exactly, which is precisely what the
  * decode → frame-sample stage of a corpus pipeline needs the container
  * for. Structural corruption — bad fourccs, chunk overruns, a frame
  * count disagreeing between avih/strh/movi/idx1 — throws LOUDLY.
  */
object Avi {

  private def fourcc(s: String): Array[Byte] = {
    require(s.length == 4, s"fourcc '$s'")
    s.getBytes(US_ASCII)
  }

  private def le32(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()

  /** One decoded container: geometry + frame rate from the headers, and
    * the frame payloads in stream order. */
  final case class Video(width: Int, height: Int, usPerFrame: Int,
                         frames: Seq[Array[Byte]])

  /** Encode opaque frame payloads as a structurally-valid AVI. */
  def encode(frames: Seq[Array[Byte]], width: Int = 320, height: Int = 240,
             usPerFrame: Int = 40000): Array[Byte] = {
    require(frames.nonEmpty, "AVI needs at least one frame")
    require(width > 0 && height > 0 && usPerFrame > 0, "bad AVI geometry/rate")
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream(body.length + 9)
      out.write(fourcc(id)); out.write(le32(body.length)); out.write(body)
      if (body.length % 2 == 1) out.write(0) // RIFF word alignment
      out.toByteArray
    }
    def list(typ: String, body: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream(body.length + 13)
      out.write(fourcc("LIST")); out.write(le32(body.length + 4))
      out.write(fourcc(typ)); out.write(body)
      out.toByteArray
    }
    val avih = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(usPerFrame)            // dwMicroSecPerFrame
      b.putInt(0).putInt(0)           // max bytes/sec, padding granularity
      b.putInt(0x10)                  // AVIF_HASINDEX
      b.putInt(frames.length)         // dwTotalFrames
      b.putInt(0)                     // initial frames
      b.putInt(1)                     // streams
      b.putInt(frames.map(_.length).max) // suggested buffer size
      b.putInt(width).putInt(height)
      b.array()
    }
    val strh = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.put(fourcc("vids")).put(fourcc("GRFT")) // type + handler
      b.putInt(0).putInt(0)           // flags, priority+language
      b.putInt(0)                     // initial frames
      b.putInt(usPerFrame)            // dwScale
      b.putInt(1000000)               // dwRate → rate/scale = fps
      b.putInt(0)                     // start
      b.putInt(frames.length)         // dwLength (in frames)
      b.array()
    }
    val strf = {
      val b = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(40)                    // biSize
      b.putInt(width).putInt(height)
      b.putShort(1).putShort(8)       // planes, bpp
      b.array()
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    // movi body: frame chunks; idx1 offsets are relative to the START of
    // the movi LIST's type fourcc (the de-facto convention readers use)
    val moviBody = new ByteArrayOutputStream()
    val offsets = frames.map { f =>
      val off = 4 + moviBody.size() // relative to 'movi' fourcc start
      moviBody.write(chunk("00dc", f))
      off
    }
    val movi = list("movi", moviBody.toByteArray)
    val idx1 = {
      val b = ByteBuffer.allocate(16 * frames.length).order(ByteOrder.LITTLE_ENDIAN)
      frames.zip(offsets).foreach { case (f, off) =>
        b.put(fourcc("00dc"))
        b.putInt(0x10)                // AVIIF_KEYFRAME
        b.putInt(off)
        b.putInt(f.length)
      }
      b.array()
    }
    val riffBody = new ByteArrayOutputStream()
    riffBody.write(fourcc("AVI "))
    riffBody.write(hdrl)
    riffBody.write(movi)
    riffBody.write(chunk("idx1", idx1))
    val out = new ByteArrayOutputStream(riffBody.size() + 8)
    out.write(fourcc("RIFF")); out.write(le32(riffBody.size()))
    out.write(riffBody.toByteArray)
    out.toByteArray
  }

  /** Decode: RIFF/'AVI ' envelope, hdrl headers, the movi frame walk
    * (word-aligned `00dc` chunks), and the idx1 cross-check — every
    * index entry's offset and size must match the frame actually found
    * at that position. Frame-count agreement between avih, strh, the
    * movi walk, and idx1 is required. */
  def decode(bytes: Array[Byte]): Video = {
    require(bytes.length >= 12, "not an AVI payload (too short)")
    def tag(off: Int): String = {
      require(off + 4 <= bytes.length, s"corrupt AVI: fourcc past end at $off")
      new String(bytes, off, 4, US_ASCII)
    }
    def r32(off: Int): Int = {
      require(off + 4 <= bytes.length, s"corrupt AVI: read past end at $off")
      ByteBuffer.wrap(bytes, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
    }
    require(tag(0) == "RIFF" && tag(8) == "AVI ", "not a RIFF/AVI payload")
    val riffLen = r32(4)
    // all bound checks in Long: a crafted 32-bit length wraps Int sums
    require(riffLen >= 4 && 8L + riffLen <= bytes.length,
      "corrupt AVI: RIFF size overruns payload")
    var width = -1; var height = -1; var usPerFrame = -1
    var avihFrames = -1; var strhFrames = -1
    var frames = Vector.empty[(Int, Array[Byte])] // (offset rel. to movi fourcc, data)
    var idx = Vector.empty[(Int, Int)]            // (offset, size) from idx1
    // walk the top-level chunks inside RIFF
    var i = 12
    val end = 8 + riffLen
    while (i < end) {
      val id = tag(i)
      val len = r32(i + 4)
      require(len >= 0 && i + 8L + len <= end, s"corrupt AVI: chunk $id overruns")
      id match {
        case "LIST" =>
          val typ = tag(i + 8)
          typ match {
            case "hdrl" =>
              // nested walk for avih + strl/strh
              var j = i + 12
              val lend = i + 8 + len
              while (j < lend) {
                val cid = tag(j)
                val clen = r32(j + 4)
                require(clen >= 0 && j + 8L + clen <= lend,
                  s"corrupt AVI: hdrl chunk $cid overruns")
                cid match {
                  case "avih" =>
                    require(clen >= 40, "corrupt AVI: avih too short")
                    usPerFrame = r32(j + 8)
                    avihFrames = r32(j + 8 + 16)
                    width = r32(j + 8 + 32)
                    height = r32(j + 8 + 36)
                  case "LIST" if tag(j + 8) == "strl" =>
                    var k = j + 12
                    val send = j + 8 + clen
                    while (k < send) {
                      val sid = tag(k)
                      val slen = r32(k + 4)
                      require(slen >= 0 && k + 8L + slen <= send,
                        s"corrupt AVI: strl chunk $sid overruns")
                      if (sid == "strh") {
                        require(slen >= 40, "corrupt AVI: strh too short")
                        require(tag(k + 8) == "vids",
                          s"unsupported AVI: stream type '${tag(k + 8)}'")
                        strhFrames = r32(k + 8 + 32)
                      }
                      k += 8 + slen + (slen & 1)
                    }
                  case _ => () // other header chunks — skip
                }
                j += 8 + clen + (clen & 1)
              }
            case "movi" =>
              var j = i + 12
              val lend = i + 8 + len
              while (j < lend) {
                val cid = tag(j)
                val clen = r32(j + 4)
                require(clen >= 0 && j + 8L + clen <= lend,
                  s"corrupt AVI: movi chunk $cid overruns")
                require(cid == "00dc", s"unsupported AVI: movi chunk '$cid'")
                frames :+= ((j - (i + 8),
                  java.util.Arrays.copyOfRange(bytes, j + 8, j + 8 + clen)))
                j += 8 + clen + (clen & 1)
              }
            case _ => () // other LISTs — skip
          }
        case "idx1" =>
          require(len % 16 == 0, s"corrupt AVI: idx1 length $len")
          for (k <- 0 until len / 16) {
            val e = i + 8 + 16 * k
            require(tag(e) == "00dc", s"unsupported AVI: idx1 entry '${tag(e)}'")
            idx :+= ((r32(e + 8), r32(e + 12)))
          }
        case _ => () // other top-level chunks — skip
      }
      i += 8 + len + (len & 1)
    }
    require(width > 0 && height > 0 && usPerFrame > 0,
      "corrupt AVI: missing or invalid avih header")
    require(frames.nonEmpty, "corrupt AVI: no movi frames")
    require(avihFrames == frames.length && strhFrames == frames.length,
      s"corrupt AVI: header frame counts (avih=$avihFrames strh=$strhFrames) " +
        s"disagree with the movi walk (${frames.length})")
    require(idx.length == frames.length,
      s"corrupt AVI: idx1 has ${idx.length} entries for ${frames.length} frames")
    // the index must agree with reality — a desynced idx1 is corruption
    frames.zip(idx).zipWithIndex.foreach { case (((off, data), (ioff, isize)), k) =>
      require(off == ioff && data.length == isize,
        s"corrupt AVI: idx1 entry $k (off=$ioff size=$isize) " +
          s"disagrees with movi (off=$off size=${data.length})")
    }
    Video(width, height, usPerFrame, frames.map(_._2))
  }
}
