package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1

/** Real multi-page TIFF codec, pure JVM (TIFF 6.0, the scanned-document
  * format: every fax/scanner/archival pipeline ships multi-page .tif).
  *
  * Implements the public baseline-TIFF structure: the II/MM byte-order
  * header, the CHAINED IFD walk (one IFD per page — the multi-page
  * mechanism §2), ascending-tag entries with both value placements
  * (inline ≤ 4 bytes, offset otherwise), SHORT/LONG/ASCII types, strip
  * layout (RowsPerStrip → StripOffsets/StripByteCounts arrays), and the
  * PackBits compression of §9 (the RLE every baseline reader must
  * support). Supported pixel layout: 8-bit grayscale (BitsPerSample 8,
  * PhotometricInterpretation 1, one sample per pixel) — anything else
  * fails LOUDLY, same contract as [[Png]]/[[Jpeg]]/[[Pdf]]: a silently
  * mis-decoded scan is corpus poison no downstream filter can catch.
  *
  * Pages carry their pixel payload verbatim (the true byte length rides
  * in each page's ImageDescription tag, trimming the rectangular
  * zero-padding — PNG's tEXt discipline), so a staged document whose
  * page pixels are its text bytes reassembles bit-exactly and q01's
  * oracle applies VERBATIM to the round trip.
  */
object Tiff {

  /** Row width of staged pages; RowsPerStrip 4 gives multi-strip pages
    * with a short final strip — both array placements get exercised. */
  private val Width = 32
  private val RowsPerStrip = 4

  /** Tag carrying the unpadded pixel count: "len:<n>". */
  private val LenPrefix = "len:"

  private final case class Entry(tag: Int, typ: Int, count: Long, value: Long)

  /** PackBits compress (TIFF 6.0 §9): repeats of ≥ 2 become runs, the
    * rest literal groups of ≤ 128 cut where the next repeat starts. */
  private[graft] def packBits(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length + data.length / 128 + 2)
    var i = 0
    while (i < data.length) {
      var run = 1
      while (i + run < data.length && run < 128 && data(i + run) == data(i)) run += 1
      if (run >= 2) {
        out.write(1 - run) // -(run-1) as signed byte
        out.write(data(i) & 0xff)
        i += run
      } else {
        val start = i
        i += 1
        while (i < data.length && i - start < 128 &&
               !(i + 1 < data.length && data(i + 1) == data(i))) i += 1
        out.write(i - start - 1) // count-1
        out.write(data, start, i - start)
      }
    }
    out.toByteArray
  }

  /** PackBits decompress, strict: must yield exactly `expected` bytes;
    * truncation or overrun throws. -128 is the documented noop. */
  private[graft] def unpackBits(data: Array[Byte], expected: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(expected)
    var i = 0
    while (out.size < expected) {
      require(i < data.length, s"corrupt TIFF: PackBits strip truncated at $i")
      val n = data(i)
      i += 1
      if (n >= 0) {
        require(i + n + 1 <= data.length, "corrupt TIFF: PackBits literal overruns")
        out.write(data, i, n + 1)
        i += n + 1
      } else if (n != -128) {
        require(i < data.length, "corrupt TIFF: PackBits run missing its byte")
        val v = data(i) & 0xff
        i += 1
        for (_ <- 0 until 1 - n) out.write(v)
      }
    }
    require(out.size == expected,
      s"corrupt TIFF: PackBits yielded ${out.size} bytes, expected $expected")
    require(i == data.length, "corrupt TIFF: PackBits strip has trailing bytes")
    out.toByteArray
  }

  /** Encode pages (each page = its pixel bytes, verbatim) as one
    * multi-page TIFF. `bigEndian` selects MM; `packbits` selects §9
    * compression (else uncompressed). */
  def encode(pages: Seq[Array[Byte]], bigEndian: Boolean = false,
             packbits: Boolean = false): Array[Byte] = {
    require(pages.nonEmpty, "TIFF needs at least one page")
    val out = new ByteArrayOutputStream(4096)
    def w16(v: Int): Unit =
      if (bigEndian) { out.write(v >>> 8); out.write(v & 0xff) }
      else { out.write(v & 0xff); out.write(v >>> 8) }
    def w32(v: Long): Unit = {
      val x = v.toInt
      if (bigEndian) { out.write(x >>> 24); out.write((x >>> 16) & 0xff); out.write((x >>> 8) & 0xff); out.write(x & 0xff) }
      else { out.write(x & 0xff); out.write((x >>> 8) & 0xff); out.write((x >>> 16) & 0xff); out.write(x >>> 24) }
    }
    out.write((if (bigEndian) "MM" else "II").getBytes(ISO_8859_1))
    w16(42)
    w32(8) // IFD0 directly after the header
    // lay pages out one after another: [IFD][entry-overflow][strip data]
    var pos = 8L
    for ((px, pi) <- pages.zipWithIndex) {
      val height = math.max(1, (px.length + Width - 1) / Width)
      val padded = java.util.Arrays.copyOf(px, height * Width)
      val nStrips = (height + RowsPerStrip - 1) / RowsPerStrip
      val strips = (0 until nStrips).map { s =>
        val from = s * RowsPerStrip * Width
        val to = math.min(padded.length, (s + 1) * RowsPerStrip * Width)
        val raw = java.util.Arrays.copyOfRange(padded, from, to)
        if (packbits) packBits(raw) else raw
      }
      val desc = (LenPrefix + px.length + "\u0000").getBytes(ISO_8859_1)
      // entries, ascending tags; arrays of count>1 go to the overflow area
      var entries = List.empty[Entry]
      def short(tag: Int, v: Int) =
        entries ::= Entry(tag, 3, 1, v) // inline SHORT
      short(256, Width)          // ImageWidth
      short(257, height)         // ImageLength
      short(258, 8)              // BitsPerSample
      short(259, if (packbits) 32773 else 1) // Compression
      short(262, 1)              // PhotometricInterpretation BlackIsZero
      entries ::= Entry(270, 2, desc.length, 0) // ImageDescription
      entries ::= Entry(273, 4, nStrips, 0)     // StripOffsets
      short(277, 1)              // SamplesPerPixel
      short(278, RowsPerStrip)   // RowsPerStrip
      entries ::= Entry(279, 4, nStrips, 0)     // StripByteCounts
      val sorted = entries.sortBy(_.tag)
      val ifdSize = 2 + 12 * sorted.length + 4
      // overflow area: description, then (if >1 strip) the two arrays
      var ovf = pos + ifdSize
      val descOff = ovf
      ovf += desc.length
      val offArrOff = ovf
      if (nStrips > 1) ovf += 4L * nStrips
      val cntArrOff = ovf
      if (nStrips > 1) ovf += 4L * nStrips
      var stripPos = ovf
      val stripOffsets = strips.map { s => val o = stripPos; stripPos += s.length; o }
      val nextIfd = if (pi == pages.length - 1) 0L else stripPos
      // emit the IFD
      w16(sorted.length)
      for (e <- sorted) {
        w16(e.tag); w16(e.typ); w32(e.count)
        e.tag match {
          case 270 => w32(descOff)
          case 273 =>
            if (nStrips == 1) w32(stripOffsets.head) else w32(offArrOff)
          case 279 =>
            if (nStrips == 1) w32(strips.head.length) else w32(cntArrOff)
          case _ => // inline SHORT: value in the first 2 bytes, then zero
            w16(e.value.toInt); w16(0)
        }
      }
      w32(nextIfd)
      out.write(desc)
      if (nStrips > 1) { stripOffsets.foreach(w32); strips.foreach(s => w32(s.length)) }
      strips.foreach(s => out.write(s))
      pos = stripPos
    }
    out.toByteArray
  }

  /** Decode a multi-page TIFF back to its pages' pixel bytes: header, chained
    * IFD walk (cycle-guarded), both byte orders, inline + offset value
    * placements, strip reassembly, PackBits, padding trim via the
    * ImageDescription length. Unsupported layouts and structural
    * corruption throw. */
  def decodePages(bytes: Array[Byte]): Seq[Array[Byte]] = {
    require(bytes.length >= 8, "not a TIFF payload (too short)")
    val order = new String(bytes, 0, 2, ISO_8859_1)
    val big = order match {
      case "MM" => true
      case "II" => false
      case o    => throw new IllegalArgumentException(s"not a TIFF payload (order '$o')")
    }
    def r16(off: Long): Int = {
      val i = off.toInt
      require(i >= 0 && i + 2 <= bytes.length, s"corrupt TIFF: read16 past end at $off")
      if (big) ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
      else ((bytes(i + 1) & 0xff) << 8) | (bytes(i) & 0xff)
    }
    def r32(off: Long): Long = {
      val i = off.toInt
      require(i >= 0 && i + 4 <= bytes.length, s"corrupt TIFF: read32 past end at $off")
      val v =
        if (big) ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
          ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
        else ((bytes(i + 3) & 0xffL) << 24) | ((bytes(i + 2) & 0xffL) << 16) |
          ((bytes(i + 1) & 0xffL) << 8) | (bytes(i) & 0xffL)
      v
    }
    require(r16(2) == 42, "corrupt TIFF: magic is not 42")
    var ifd = r32(4)
    val seen = scala.collection.mutable.Set.empty[Long]
    val pages = Seq.newBuilder[Array[Byte]]
    while (ifd != 0) {
      require(seen.add(ifd), s"corrupt TIFF: IFD cycle at $ifd")
      val n = r16(ifd)
      require(n > 0, "corrupt TIFF: empty IFD")
      var width = -1; var height = -1; var bits = -1; var compression = -1
      var photometric = -1; var rowsPerStrip = -1; var trueLen = -1
      var stripOffsets: Seq[Long] = Nil
      var stripCounts: Seq[Long] = Nil
      for (i <- 0 until n) {
        val e = ifd + 2 + 12 * i
        val tag = r16(e); val typ = r16(e + 2); val count = r32(e + 4)
        // a value of <= 4 bytes is inline at e+8; larger values live at
        // the 32-bit offset stored there (TIFF 6.0 §2)
        val typSize = typ match {
          case 1 | 2 => 1L // BYTE, ASCII
          case 3     => 2L // SHORT
          case 4     => 4L // LONG
          case _ =>
            throw new IllegalArgumentException(s"unsupported TIFF: type $typ on tag $tag")
        }
        val valOff = if (typSize * count <= 4) e + 8 else r32(e + 8)
        def scalar: Long = typ match {
          case 3 => r16(valOff)
          case 4 => r32(valOff)
          case t => throw new IllegalArgumentException(
            s"corrupt TIFF: tag $tag expects an integer type, got $t")
        }
        def longs: Seq[Long] =
          (0L until count).map(k => if (typ == 3) r16(valOff + 2 * k).toLong
                                    else r32(valOff + 4 * k))
        tag match {
          case 256 => width = scalar.toInt
          case 257 => height = scalar.toInt
          case 258 =>
            require(count == 1 && scalar == 8,
              "unsupported TIFF: only 8-bit single-sample pages")
            bits = 8
          case 259 => compression = scalar.toInt
          case 262 => photometric = scalar.toInt
          case 270 =>
            require(typ == 2, s"corrupt TIFF: ImageDescription type $typ")
            val i0 = valOff.toInt
            require(i0 >= 0 && i0 + count <= bytes.length && count >= 1 &&
              bytes((valOff + count - 1).toInt) == 0,
              "corrupt TIFF: ImageDescription is not NUL-terminated in bounds")
            val d = new String(bytes, i0, count.toInt - 1, ISO_8859_1)
            require(d.startsWith(LenPrefix), s"corrupt TIFF: description '$d'")
            trueLen = d.stripPrefix(LenPrefix).toInt
          case 273 => stripOffsets = longs
          case 277 => require(scalar == 1, "unsupported TIFF: multi-sample pages")
          case 278 => rowsPerStrip = scalar.toInt
          case 279 => stripCounts = longs
          case _   => () // unknown ancillary tag — skip (public extension point)
        }
      }
      require(width > 0 && height > 0, s"corrupt TIFF: geometry ${width}x$height")
      require(bits == 8, "corrupt TIFF: BitsPerSample missing")
      require(photometric == 1, s"unsupported TIFF: photometric $photometric")
      require(compression == 1 || compression == 32773,
        s"unsupported TIFF: compression $compression (baseline none/PackBits only)")
      require(rowsPerStrip > 0, "corrupt TIFF: RowsPerStrip missing")
      require(stripOffsets.nonEmpty && stripOffsets.length == stripCounts.length,
        s"corrupt TIFF: ${stripOffsets.length} strip offsets vs ${stripCounts.length} counts")
      val expStrips = (height + rowsPerStrip - 1) / rowsPerStrip
      require(stripOffsets.length == expStrips,
        s"corrupt TIFF: ${stripOffsets.length} strips, geometry implies $expStrips")
      require(trueLen >= 0 && trueLen <= width * height,
        s"corrupt TIFF: described length $trueLen outside ${width}x$height")
      val px = new ByteArrayOutputStream(width * height)
      for (((off, cnt), s) <- stripOffsets.zip(stripCounts).zipWithIndex) {
        require(off >= 0 && off + cnt <= bytes.length,
          s"corrupt TIFF: strip $s overruns payload")
        val raw = java.util.Arrays.copyOfRange(bytes, off.toInt, (off + cnt).toInt)
        val rows = math.min(rowsPerStrip, height - s * rowsPerStrip)
        val expected = rows * width
        val data = if (compression == 32773) unpackBits(raw, expected) else raw
        require(data.length == expected,
          s"corrupt TIFF: strip $s has ${data.length} bytes, expected $expected")
        px.write(data)
      }
      pages += java.util.Arrays.copyOfRange(px.toByteArray, 0, trueLen)
      ifd = r32(ifd + 2 + 12 * n)
    }
    val out = pages.result()
    require(out.nonEmpty, "corrupt TIFF: no pages")
    out
  }
}
