package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** The ustar bundle codec: entry round trips, long-name paths, gzip
  * transport, and the loud-failure contract. */
class TarCodecSpec extends AnyFunSuite {

  private def e(name: String, text: String) = (name, text.getBytes(UTF_8))
  private def texts(v: Vector[(String, Array[Byte])]) =
    v.map { case (n, b) => (n, new String(b, UTF_8)) }

  test("round trip: entries survive encode → decode in order") {
    val in = Seq(e("docs/a.txt", "alpha"), e("docs/b.txt", "beta beta"),
      e("c.txt", ""), e("docs/nested/deep/d.txt", "x" * 1500))
    val out = texts(Tar.decode(Tar.encode(in)))
    assert(out === in.map { case (n, b) => (n, new String(b, UTF_8)) }.toVector)
  }

  test("block discipline: archive is 512-aligned and ends with two zero blocks") {
    val bytes = Tar.encode(Seq(e("a.txt", "payload of 17 by")))
    assert(bytes.length % 512 === 0)
    assert(bytes.takeRight(1024).forall(_ == 0))
    // header + 1 data block + 2 terminator blocks
    assert(bytes.length === 512 * 4)
  }

  test("long names: ustar prefix split survives the round trip") {
    val name = ("d" * 60) + "/" + ("f" * 80) + ".txt" // 100 < len ≤ 255, splittable
    assert(name.length > 100)
    val bytes = Tar.encode(Seq(e(name, "deep")))
    assert(texts(Tar.decode(bytes)) === Vector((name, "deep")))
    // the long name must NOT have used a GNU 'L' record
    assert(!new String(bytes, UTF_8).contains("@LongLink"))
  }

  test("long names: unsplittable name falls back to a GNU 'L' record") {
    val name = "x" * 150 // no '/', cannot prefix-split
    val bytes = Tar.encode(Seq(e(name, "gnu")))
    assert(new String(bytes, UTF_8).contains("././@LongLink"))
    assert(texts(Tar.decode(bytes)) === Vector((name, "gnu")))
  }

  test("long names: GNU placeholder truncates at a UTF-8 character boundary") {
    // a multi-byte char straddling the 100-byte placeholder cut: naive
    // take(100) splits it, the U+FFFD replacement re-encodes to 3 bytes,
    // and the placeholder overruns 100 bytes — encode threw on a valid
    // name. 99 ASCII bytes then a 2-byte char puts the split at byte 100.
    val name = ("x" * 99) + ("é" * 30) // unsplittable (no '/'), 159 bytes
    assert(name.getBytes(UTF_8).length > 100)
    val bytes = Tar.encode(Seq(e(name, "utf8")))
    assert(new String(bytes, UTF_8).contains("././@LongLink"))
    assert(texts(Tar.decode(bytes)) === Vector((name, "utf8")))
    // a char ending EXACTLY at byte 100 keeps the full 100-byte placeholder
    val exact = ("x" * 98) + ("é" * 40) // 98 + 2 = 100 at the cut
    val bytes2 = Tar.encode(Seq(e(exact, "edge")))
    assert(texts(Tar.decode(bytes2)) === Vector((exact, "edge")))
    // 3- and 4-byte chars at every straddle offset survive too
    for (pad <- 97 to 99; ch <- Seq("中", new String(Character.toChars(0x1F600)))) {
      val n = ("y" * pad) + (ch * 40)
      assert(texts(Tar.decode(Tar.encode(Seq(e(n, "p"))))) === Vector((n, "p")))
    }
  }

  test("gzip transport: detected and reversed") {
    val tar = Tar.encode(Seq(e("a.txt", "zipped")))
    val gz = Tar.gzip(tar)
    assert(Tar.isGzip(gz) && !Tar.isGzip(tar))
    assert(Tar.gunzip(gz) === tar)
    assertThrows[IllegalArgumentException](Tar.gunzip(tar))
  }

  test("loud failure: corrupted checksum throws with the offset") {
    val bytes = Tar.encode(Seq(e("a.txt", "abc")))
    bytes(0) = 'z'.toByte // name byte changes, stored checksum now stale
    val ex = intercept[IllegalArgumentException](Tar.decode(bytes))
    assert(ex.getMessage.contains("checksum mismatch"))
  }

  test("loud failure: truncated data, missing terminator, lone zero block") {
    val full = Tar.encode(Seq(e("a.txt", "x" * 600)))
    // cut inside the entry's data blocks
    assert(intercept[IllegalArgumentException](
      Tar.decode(full.take(512 * 2))).getMessage.contains("overruns archive"))
    // drop one terminator block → lone zero block
    assert(intercept[IllegalArgumentException](
      Tar.decode(full.dropRight(512))).getMessage.contains("lone zero block"))
    // non-block-aligned input
    assert(intercept[IllegalArgumentException](
      Tar.decode(full.drop(7))).getMessage.contains("not a multiple"))
  }

  test("NUL typeflag means regular file (pre-POSIX writers)") {
    val bytes = Tar.encode(Seq(e("a.txt", "old-style")))
    bytes(156) = 0 // typeflag NUL
    var sum = 0L
    for (i <- 0 until 512) sum += (if (i >= 148 && i < 156) ' '.toInt else bytes(i) & 0xff)
    val cs = java.lang.Long.toOctalString(sum)
    val field = (("0" * (6 - cs.length)) + cs).getBytes(UTF_8) ++ Array[Byte](0, ' ')
    System.arraycopy(field, 0, bytes, 148, 8)
    assert(texts(Tar.decode(bytes)) === Vector(("a.txt", "old-style")))
  }

  test("loud failure: pax headers and links are rejected, not half-parsed") {
    for (flag <- Seq('x', 'g', '1', '2', 'S', ' ')) {
      val bytes = Tar.encode(Seq(e("a.txt", "abc")))
      bytes(156) = flag.toByte
      // fix up the checksum so the typeflag is what the parser actually sees
      var sum = 0L
      for (i <- 0 until 512) sum += (if (i >= 148 && i < 156) ' '.toInt else bytes(i) & 0xff)
      val cs = java.lang.Long.toOctalString(sum)
      val field = (("0" * (6 - cs.length)) + cs).getBytes(UTF_8) ++ Array[Byte](0, ' ')
      System.arraycopy(field, 0, bytes, 148, 8)
      val ex = intercept[IllegalArgumentException](Tar.decode(bytes))
      assert(ex.getMessage.contains("unsupported entry type"))
    }
  }

  test("loud failure: non-ustar magic is rejected") {
    val bytes = Tar.encode(Seq(e("a.txt", "abc")))
    bytes(257) = 'G'.toByte
    val ex = intercept[IllegalArgumentException](Tar.decode(bytes))
    assert(ex.getMessage.contains("bad magic"))
  }

  test("directories are skipped; a directory with data is rejected") {
    // hand-build: dir entry then a file — reuse encode for the file part
    val file = Tar.encode(Seq(e("d/a.txt", "inside")))
    // craft a directory header by encoding a zero-byte file and patching
    val dir = Tar.encode(Seq(e("d/", ""))).take(512)
    dir(156) = '5'.toByte
    var sum = 0L
    for (i <- 0 until 512) sum += (if (i >= 148 && i < 156) ' '.toInt else dir(i) & 0xff)
    val cs = java.lang.Long.toOctalString(sum)
    val field = (("0" * (6 - cs.length)) + cs).getBytes(UTF_8) ++ Array[Byte](0, ' ')
    System.arraycopy(field, 0, dir, 148, 8)
    val archive = dir ++ file
    assert(texts(Tar.decode(archive)) === Vector(("d/a.txt", "inside")))
  }

  test("deterministic bytes: same entries → same archive") {
    val in = Seq(e("docs/a.txt", "alpha"), e("docs/b.txt", "beta"))
    assert(Tar.encode(in) === Tar.encode(in))
  }
}
