package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

/** Real JPEG/JFIF container codec, pure JVM.
  *
  * Implements the public JPEG interchange format (ITU-T T.81 / ISO 10918
  * Annex B, the JFIF spec, and the Exif TIFF header of CIPA DC-008): the
  * marker-segment walk (SOI, APP0/JFIF, APP1/Exif, COM, DQT, SOFn, DHT,
  * DRI, SOS, EOI), big-endian length framing, entropy-coded data with
  * 0xFF 0x00 byte stuffing and RSTn restart markers, multi-scan
  * (progressive) files, and the Exif IFD walk in BOTH byte orders for
  * the Orientation tag. JPEG is the dominant image format of every web
  * crawl — the multimodal mandate's image leg (q60e covers PNG) is not
  * closed without it.
  *
  * Scope mirrors the rest of the codec family ([[Png]], [[Multimodal]],
  * [[Pdf]]): the CONTAINER is parsed for real — geometry, progression,
  * component layout, Exif orientation, comments, and the exact
  * entropy-coded byte stream (unstuffed, restart markers stripped with
  * their modulo-8 cycling order verified) all sit under the bit-exact
  * oracle gate — while DCT entropy *decoding* stays out of scope (no
  * codec deps in this container; the corpus rides in the scan bytes
  * verbatim, the same stand-in discipline as q94's raster). Anything
  * structurally off — an unknown marker, a truncated segment, a bad Exif
  * magic, an out-of-order restart, an arithmetic-coded or hierarchical
  * SOF — fails LOUDLY: a silently mis-parsed image is corpus poison no
  * downstream filter can catch.
  */
object Jpeg {

  /** Fixed scan-data preamble, prepended by [[encode]] and stripped (and
    * verified) by [[decode]]: contains raw 0xFF bytes — including the
    * exact EOI (FF D9) and RST0 (FF D0) patterns — so every file proves
    * the byte-stuffing layer: an unstuffing bug truncates the payload at
    * the phantom EOI and breaks the bit-exact oracle loudly. */
  private[graft] val Preamble: Array[Byte] =
    Array(0xff, 0xd9, 0xff, 0xd0, 0x00, 0xff, 0xff, 0x41).map(_.toByte)

  /** 8-bit luminance quantization table stand-in (all 16s — flat, valid,
    * and obviously synthetic). */
  private val QTable: Array[Byte] = Array.fill(64)(16.toByte)

  private def be16(v: Int): Array[Byte] = Array((v >>> 8).toByte, v.toByte)

  private def seg(out: ByteArrayOutputStream, marker: Int, data: Array[Byte]): Unit = {
    out.write(0xff); out.write(marker)
    out.write(be16(data.length + 2)) // length includes its own two bytes
    out.write(data)
  }

  /** Minimal structurally-valid DHT payload: class/id byte, the 16
    * BITS counts (one code of length 2), one symbol. */
  private def dht(clsId: Int): Array[Byte] = {
    val b = new ByteArrayOutputStream(19)
    b.write(clsId)
    b.write(0); b.write(1)           // one code of length 2
    for (_ <- 3 to 16) b.write(0)
    b.write(0)                       // its symbol
    b.toByteArray
  }

  /** One DQT segment body: Pq=0 (8-bit) | Tq, then 64 table bytes. */
  private def dqt(tq: Int): Array[Byte] = {
    val b = new ByteArrayOutputStream(65)
    b.write(tq)
    b.write(QTable, 0, 64)
    b.toByteArray
  }

  /** SOF0/SOF2 body: precision 8, height, width, Nf components with the
    * standard sampling factors (2x2 luma + 1x1 chroma for color). */
  private def sof(height: Int, width: Int, components: Int): Array[Byte] = {
    require(components == 1 || components == 3, s"components $components: 1 or 3")
    require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff,
      s"geometry ${width}x$height exceeds the 16-bit SOF fields")
    val b = new ByteArrayOutputStream(6 + 3 * components)
    b.write(8)                        // sample precision
    b.write(be16(height)); b.write(be16(width))
    b.write(components)
    for (c <- 1 to components) {
      b.write(c)                      // component id
      b.write(if (c == 1) 0x22 else 0x11) // HiVi sampling factors
      b.write(if (c == 1) 0 else 1)   // quant table selector
    }
    b.toByteArray
  }

  /** SOS header for all components; spectral selection covers the
    * baseline whole-spectrum form (Ss=0 Se=63 Ah/Al=0). */
  private def sos(components: Int): Array[Byte] = {
    val b = new ByteArrayOutputStream(4 + 2 * components)
    b.write(components)
    for (c <- 1 to components) {
      b.write(c)
      b.write(0)                      // DC/AC huffman selectors
    }
    b.write(0); b.write(63); b.write(0) // Ss, Se, AhAl
    b.toByteArray
  }

  /** Byte-stuff entropy data (0xFF → FF 00) and, when `dri` > 0, insert
    * RSTn markers (cycling FFD0..FFD7) every `dri` PAYLOAD bytes — the
    * wire shape T.81 §B.2.1.2 defines. */
  private def stuff(payload: Array[Byte], dri: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(payload.length + payload.length / 8 + 16)
    var rst = 0
    var sinceRst = 0
    var i = 0
    while (i < payload.length) {
      if (dri > 0 && sinceRst == dri) {
        out.write(0xff); out.write(0xd0 + rst)
        rst = (rst + 1) % 8
        sinceRst = 0
      }
      val v = payload(i) & 0xff
      out.write(v)
      if (v == 0xff) out.write(0x00)
      sinceRst += 1
      i += 1
    }
    out.toByteArray
  }

  /** The Exif APP1 body: "Exif\0\0" + a TIFF header + IFD0 carrying the
    * Orientation SHORT in-line and (when given) an ImageDescription
    * ASCII value via the beyond-4-byte offset mechanism — the two value
    * placements a real IFD walker must handle. `bigEndian` selects the
    * MM vs II byte order (cameras emit both). */
  private[graft] def exifApp1(orientation: Int, description: Option[String],
                              bigEndian: Boolean): Array[Byte] = {
    require(orientation >= 1 && orientation <= 8, s"orientation $orientation")
    val b = new ByteArrayOutputStream(64)
    b.write("Exif".getBytes(ISO_8859_1)); b.write(0); b.write(0)
    def w16(v: Int): Unit =
      if (bigEndian) { b.write(v >>> 8); b.write(v & 0xff) }
      else { b.write(v & 0xff); b.write(v >>> 8) }
    def w32(v: Int): Unit =
      if (bigEndian) { b.write(v >>> 24); b.write((v >>> 16) & 0xff); b.write((v >>> 8) & 0xff); b.write(v & 0xff) }
      else { b.write(v & 0xff); b.write((v >>> 8) & 0xff); b.write((v >>> 16) & 0xff); b.write(v >>> 24) }
    // TIFF header (offsets are relative to ITS first byte, = position 6)
    b.write((if (bigEndian) "MM" else "II").getBytes(ISO_8859_1))
    w16(42)
    w32(8)                            // IFD0 right after the header
    val n = 1 + description.size
    w16(n)
    // entries must be ascending by tag: 0x010E ImageDescription, 0x0112
    val descBytes = description.map(d => (d + "\u0000").getBytes(UTF_8))
    val dataOff = 8 + 2 + 12 * n + 4  // value area after the next-IFD link
    descBytes.foreach { db =>
      // TIFF 6.0 type 2 (ASCII) is 7-bit only; UTF-8 payloads are
      // declared UNDEFINED (type 7), the Exif escape hatch real writers
      // use — the ASCII-typed-but-UTF-8 shape was ADVICE r15's flag
      val dtyp = if (db.forall(x => (x & 0xff) < 0x80)) 2 else 7
      w16(0x010e); w16(dtyp)          // ASCII or UNDEFINED
      w32(db.length)
      // TIFF 6.0: values of <= 4 bytes sit INLINE in the value field
      // (left-justified, zero-padded); only longer values go via offset
      if (db.length <= 4) {
        db.foreach(x => b.write(x & 0xff))
        for (_ <- db.length until 4) b.write(0)
      } else w32(dataOff)
    }
    w16(0x0112); w16(3)               // SHORT
    w32(1)
    // a SHORT value sits in the FIRST TWO bytes of the value field,
    // in the declared byte order, remainder zero (TIFF 6.0 §2)
    w16(orientation); w16(0)
    w32(0)                            // no IFD1
    descBytes.filter(_.length > 4).foreach(db => b.write(db))
    b.toByteArray
  }

  private def jfifApp0: Array[Byte] = {
    val b = new ByteArrayOutputStream(14)
    b.write("JFIF".getBytes(ISO_8859_1)); b.write(0)
    b.write(1); b.write(2)            // version 1.02
    b.write(0)                        // units: aspect ratio only
    b.write(be16(1)); b.write(be16(1))
    b.write(0); b.write(0)            // no thumbnail
    b.toByteArray
  }

  /** Encode a structurally-valid JPEG whose entropy-coded data is
    * [[Preamble]] ++ `payload`, byte-stuffed. `progressive` emits SOF2
    * with the payload split across TWO scans (the multi-SOS shape real
    * progressive files take); `dri` > 0 emits a DRI segment and restart
    * markers; `exifOrientation` adds an Exif APP1 (with `exifBigEndian`
    * byte order and optional ImageDescription); `comment` adds a COM
    * segment. */
  def encode(payload: Array[Byte], width: Int, height: Int,
             components: Int = 3, progressive: Boolean = false,
             exifOrientation: Option[Int] = None, exifBigEndian: Boolean = false,
             exifDescription: Option[String] = None,
             comment: Option[String] = None, dri: Int = 0,
             extraDqt: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream(payload.length + 512)
    out.write(0xff); out.write(0xd8)  // SOI
    // camera files lead with Exif APP1; JFIF files with APP0 — emit
    // JFIF only when no Exif is present (the common split in the wild)
    exifOrientation match {
      case Some(o) => seg(out, 0xe1, exifApp1(o, exifDescription, exifBigEndian))
      case None    => seg(out, 0xe0, jfifApp0)
    }
    comment.foreach(c => seg(out, 0xfe, c.getBytes(UTF_8)))
    seg(out, 0xdb, dqt(0))
    if (extraDqt) seg(out, 0xdb, dqt(1))
    seg(out, if (progressive) 0xc2 else 0xc0, sof(height, width, components))
    seg(out, 0xc4, dht(0x00))         // DC table 0
    seg(out, 0xc4, dht(0x10))         // AC table 0
    if (dri > 0) seg(out, 0xdd, be16(dri))
    val full = Preamble ++ payload
    if (progressive) {
      val half = full.length / 2
      seg(out, 0xda, sos(components))
      out.write(stuff(java.util.Arrays.copyOfRange(full, 0, half), dri))
      seg(out, 0xda, sos(components))
      out.write(stuff(java.util.Arrays.copyOfRange(full, half, full.length), dri))
    } else {
      seg(out, 0xda, sos(components))
      out.write(stuff(full, dri))
    }
    out.write(0xff); out.write(0xd9)  // EOI
    out.toByteArray
  }

  /** Parsed container metadata plus the exact entropy payload (scans
    * concatenated, unstuffed, restart markers stripped, [[Preamble]]
    * verified and removed). `orientation` defaults to 1 (top-left) when
    * no Exif tag is present, as every real consumer does. */
  final case class Meta(width: Int, height: Int, components: Int,
                        progressive: Boolean, orientation: Int,
                        comment: Option[String], description: Option[String],
                        nScans: Int, payload: Array[Byte])

  private def readBe16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** Parse the Exif APP1 body: TIFF byte order, magic, IFD0 walk;
    * returns (orientation, description). Unknown tags are skipped (the
    * IFD is a public extension point); structural corruption throws. */
  private[graft] def parseExif(seg: Array[Byte]): (Option[Int], Option[String]) = {
    require(seg.length >= 6 + 8 &&
      new String(seg, 0, 4, ISO_8859_1) == "Exif" && seg(4) == 0 && seg(5) == 0,
      "corrupt JPEG: APP1 without the Exif\\0\\0 identifier")
    val t = 6 // TIFF base
    val order = new String(seg, t, 2, ISO_8859_1)
    val big = order match {
      case "MM" => true
      case "II" => false
      case o    => throw new IllegalArgumentException(s"corrupt Exif: byte order '$o'")
    }
    def r16(off: Int): Int = {
      require(t + off + 2 <= seg.length, "corrupt Exif: read past segment")
      if (big) ((seg(t + off) & 0xff) << 8) | (seg(t + off + 1) & 0xff)
      else ((seg(t + off + 1) & 0xff) << 8) | (seg(t + off) & 0xff)
    }
    def r32(off: Int): Int = {
      require(t + off + 4 <= seg.length, "corrupt Exif: read past segment")
      if (big) ((seg(t + off) & 0xff) << 24) | ((seg(t + off + 1) & 0xff) << 16) |
        ((seg(t + off + 2) & 0xff) << 8) | (seg(t + off + 3) & 0xff)
      else ((seg(t + off + 3) & 0xff) << 24) | ((seg(t + off + 2) & 0xff) << 16) |
        ((seg(t + off + 1) & 0xff) << 8) | (seg(t + off) & 0xff)
    }
    require(r16(2) == 42, "corrupt Exif: TIFF magic is not 42")
    val ifd = r32(4)
    require(ifd >= 8, s"corrupt Exif: IFD0 offset $ifd inside the header")
    val n = r16(ifd)
    var orientation: Option[Int] = None
    var description: Option[String] = None
    for (i <- 0 until n) {
      val e = ifd + 2 + 12 * i
      val tag = r16(e); val typ = r16(e + 2); val count = r32(e + 4)
      tag match {
        case 0x0112 =>
          require(typ == 3 && count == 1, s"corrupt Exif: Orientation type $typ count $count")
          val o = r16(e + 8)
          require(o >= 1 && o <= 8, s"corrupt Exif: orientation $o out of range")
          orientation = Some(o)
        case 0x010e =>
          // type 2 = ASCII; type 7 (UNDEFINED) carries UTF-8 in the wild
          require(typ == 2 || typ == 7, s"corrupt Exif: ImageDescription type $typ")
          val off = if (count <= 4) e + 8 else r32(e + 8)
          require(t + off + count <= seg.length,
            "corrupt Exif: ImageDescription value overruns segment")
          require(count >= 1 && seg(t + off + count - 1) == 0,
            "corrupt Exif: ImageDescription is not NUL-terminated")
          description = Some(new String(seg, t + off, count - 1, UTF_8))
        case _ => () // unknown tag — skip (public extension point)
      }
    }
    (orientation, description)
  }

  /** Real JPEG parse: SOI, marker-segment walk with length validation,
    * SOF0/SOF2 geometry (all other SOFn — extended sequential,
    * lossless, arithmetic, hierarchical — throw as unsupported), DQT and
    * DHT structural checks, Exif orientation in both byte orders, COM
    * text, and the entropy-coded data of every scan: unstuffed (FF 00 →
    * FF), restart markers stripped with their D0..D7 cycling order
    * VERIFIED, terminated only by a genuine marker. Truncation, unknown
    * markers, duplicate SOF, scans before SOF, or a missing EOI throw. */
  def decode(bytes: Array[Byte]): Meta = {
    require(bytes.length >= 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
      "not a JPEG payload (no SOI)")
    var i = 2
    var width = -1; var height = -1; var components = -1
    var progressive = false
    var sawSof = false; var sawEoi = false
    var driInterval = 0
    var orientation: Option[Int] = None
    var comment: Option[String] = None
    var description: Option[String] = None
    var nScans = 0
    val payload = new ByteArrayOutputStream(bytes.length)
    while (!sawEoi) {
      require(i + 2 <= bytes.length, "corrupt JPEG: truncated before a marker")
      require((bytes(i) & 0xff) == 0xff, f"corrupt JPEG: expected a marker at $i, got 0x${bytes(i) & 0xff}%02x")
      val m = bytes(i + 1) & 0xff
      i += 2
      m match {
        case 0xd9 => sawEoi = true
        case sm if sm == 0x01 || (sm >= 0xd0 && sm <= 0xd7) =>
          throw new IllegalArgumentException(
            f"corrupt JPEG: standalone marker 0x$sm%02x outside a scan")
        case _ =>
          require(i + 2 <= bytes.length, "corrupt JPEG: truncated segment length")
          val len = readBe16(bytes, i)
          require(len >= 2 && i + len <= bytes.length,
            s"corrupt JPEG: segment length $len overruns payload")
          val body = java.util.Arrays.copyOfRange(bytes, i + 2, i + len)
          i += len
          m match {
            case 0xe0 => // APP0/JFIF — identifier checked, content free-form
              require(body.length >= 5 && new String(body, 0, 4, ISO_8859_1) == "JFIF",
                "corrupt JPEG: APP0 without the JFIF identifier")
            case 0xe1 =>
              val (o, d) = parseExif(body)
              orientation = o; description = d
            case 0xfe => comment = Some(new String(body, UTF_8))
            case 0xdb =>
              // one or more 65-byte (8-bit) tables per segment
              var off = 0
              while (off < body.length) {
                val pq = (body(off) & 0xff) >>> 4
                require(pq == 0, s"unsupported JPEG: 16-bit quantization table (Pq=$pq)")
                require(off + 65 <= body.length, "corrupt JPEG: truncated DQT table")
                off += 65
              }
            case 0xc4 =>
              var off = 0
              while (off < body.length) {
                require(off + 17 <= body.length, "corrupt JPEG: truncated DHT header")
                val nSym = (1 to 16).map(k => body(off + k) & 0xff).sum
                require(off + 17 + nSym <= body.length, "corrupt JPEG: DHT symbols overrun")
                off += 17 + nSym
              }
            case 0xc0 | 0xc2 =>
              require(!sawSof, "corrupt JPEG: duplicate SOF")
              sawSof = true
              progressive = m == 0xc2
              require(body.length >= 6, "corrupt JPEG: truncated SOF")
              require((body(0) & 0xff) == 8, s"unsupported JPEG: precision ${body(0) & 0xff}")
              height = readBe16(body, 1); width = readBe16(body, 3)
              components = body(5) & 0xff
              require(width > 0 && height > 0, s"corrupt JPEG: geometry ${width}x$height")
              require(components == 1 || components == 3,
                s"unsupported JPEG: $components components")
              require(body.length == 6 + 3 * components, "corrupt JPEG: SOF component list")
            case sofn if (sofn >= 0xc1 && sofn <= 0xcf) && sofn != 0xc4 && sofn != 0xc8 =>
              throw new IllegalArgumentException(
                f"unsupported JPEG: SOF 0x$sofn%02x (only baseline SOF0 / progressive SOF2)")
            case 0xdd =>
              require(body.length == 2, "corrupt JPEG: DRI length")
              driInterval = readBe16(body, 0)
            case 0xda =>
              require(sawSof, "corrupt JPEG: SOS before SOF")
              require(body.length >= 1 && body.length == 1 + 2 * (body(0) & 0xff) + 3,
                "corrupt JPEG: SOS header length")
              nScans += 1
              // entropy-coded data: runs to the next genuine marker
              var rst = 0
              var done = false
              while (!done) {
                require(i < bytes.length, "corrupt JPEG: scan data truncated (no EOI)")
                val v = bytes(i) & 0xff
                if (v != 0xff) { payload.write(v); i += 1 }
                else {
                  require(i + 1 < bytes.length, "corrupt JPEG: dangling 0xFF at end of scan")
                  val nxt = bytes(i + 1) & 0xff
                  if (nxt == 0x00) { payload.write(0xff); i += 2 } // stuffed data byte
                  else if (nxt >= 0xd0 && nxt <= 0xd7) {
                    require(driInterval > 0, "corrupt JPEG: restart marker without DRI")
                    require(nxt - 0xd0 == rst,
                      f"corrupt JPEG: restart marker out of order (got RST${nxt - 0xd0}, expected RST$rst)")
                    rst = (rst + 1) % 8
                    i += 2
                  } else done = true // a real marker ends the scan
                }
              }
            case other =>
              throw new IllegalArgumentException(
                f"unsupported JPEG: marker 0x$other%02x")
          }
      }
    }
    require(sawSof, "corrupt JPEG: no SOF frame header")
    require(nScans > 0, "corrupt JPEG: no SOS scan")
    val full = payload.toByteArray
    require(full.length >= Preamble.length &&
      (0 until Preamble.length).forall(k => full(k) == Preamble(k)),
      "corrupt JPEG: scan data lost the stuffing preamble — unstuffing bug")
    Meta(width, height, components, progressive, orientation.getOrElse(1),
      comment, description, nScans,
      java.util.Arrays.copyOfRange(full, Preamble.length, full.length))
  }
}
