package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** WARC codec: strict ISO 28500 record walk — round trips, multi-record
  * order, and the fail-loudly contract on every corruption class. */
class WarcCodecSpec extends AnyFunSuite {

  private def rec(id: Long, body: String) = Warc.Record(
    "conversion", s"<urn:graft:rec/$id>", s"urn:graft:doc/$id",
    "2024-01-01T00:00:00Z", body.getBytes(UTF_8))

  test("round trip: single record survives encode → decode exactly") {
    val r = rec(7, "hello warc\nsecond line")
    val got = Warc.decode(Warc.encode(Seq(r)))
    assert(got.length === 1)
    assert(got.head.warcType === "conversion")
    assert(got.head.targetUri === "urn:graft:doc/7")
    assert(new String(got.head.payload, UTF_8) === "hello warc\nsecond line")
  }

  test("round trip: multi-record file keeps order; payloads may contain CRLF") {
    val rs = Seq(
      Warc.Record("warcinfo", "<urn:graft:warcinfo/0>", "", "2024-01-01T00:00:00Z",
        "software: graft\r\n".getBytes(UTF_8)),
      rec(1, "a\r\n\r\nb"), // payload containing the record terminator bytes
      rec(2, ""), // empty payload
      rec(3, "plain"))
    val got = Warc.decode(Warc.encode(rs))
    assert(got.map(_.recordId) === rs.map(_.recordId))
    assert(got.map(r => new String(r.payload, UTF_8)) ===
      Seq("software: graft\r\n", "a\r\n\r\nb", "", "plain"))
    assert(got.head.targetUri === "")
  }

  test("corrupt payloads fail loudly, never half-parse") {
    val good = Warc.encode(Seq(rec(1, "abcdef"), rec(2, "ghijkl")))
    // truncated mid-payload
    intercept[IllegalArgumentException] {
      Warc.decode(java.util.Arrays.copyOfRange(good, 0, good.length - 12))
    }
    // bad version line
    val badVersion = ("WARC/2.9\r\n" + new String(good, UTF_8).split("\r\n", 2)(1)).getBytes(UTF_8)
    intercept[IllegalArgumentException] { Warc.decode(badVersion) }
    // missing record terminator (flip the final CRLF CRLF)
    val noTerm = good.clone(); noTerm(good.length - 1) = 'x'
    intercept[IllegalArgumentException] { Warc.decode(noTerm) }
    // header without a colon
    val noColon = new String(good, UTF_8).replaceFirst("WARC-Date: ", "WARC-Date ").getBytes(UTF_8)
    intercept[IllegalArgumentException] { Warc.decode(noColon) }
    // gzip member refused up front
    intercept[IllegalArgumentException] {
      Warc.decode(Array(0x1f.toByte, 0x8b.toByte, 0x08.toByte, 0x00.toByte))
    }
    // empty input
    intercept[IllegalArgumentException] { Warc.decode(Array.emptyByteArray) }
    // missing Content-Length
    val noLen = ("WARC/1.0\r\nWARC-Type: conversion\r\n\r\n").getBytes(UTF_8)
    intercept[RuntimeException] { Warc.decode(noLen) }
    // non-numeric Content-Length: reported with record offset, not a bare
    // NumberFormatException
    val nonNum = ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "Content-Length: twelve\r\n\r\n").getBytes(UTF_8)
    val e = intercept[RuntimeException] { Warc.decode(nonNum) }
    assert(e.getMessage.contains("offset"))
    // duplicate header field names are the same corruption class
    val dup = ("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Type: response\r\n" +
      "Content-Length: 0\r\n\r\n\r\n\r\n").getBytes(UTF_8)
    intercept[IllegalArgumentException] { Warc.decode(dup) }
  }

  test("seeded fuzz: arbitrary binary payloads round trip exactly") {
    val rnd = new scala.util.Random(42)
    (1 to 50).foreach { trial =>
      val recs = (0 until 1 + rnd.nextInt(6)).map { i =>
        val payload = new Array[Byte](rnd.nextInt(300))
        rnd.nextBytes(payload) // includes CR, LF, NUL, high bytes
        Warc.Record("conversion", s"<urn:graft:rec/$trial-$i>",
          s"urn:graft:doc/$trial-$i", "2024-01-01T00:00:00Z", payload)
      }
      val got = Warc.decode(Warc.encode(recs))
      assert(got.length === recs.length, s"trial $trial")
      got.zip(recs).foreach { case (g, w) =>
        assert(g.recordId === w.recordId)
        assert(g.payload.toSeq === w.payload.toSeq, s"trial $trial payload")
      }
    }
  }

  test("oversized declared Content-Length fails the bounds check, never wraps") {
    val huge = ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "Content-Length: 99999999999\r\n\r\n").getBytes(UTF_8)
    intercept[IllegalArgumentException] { Warc.decode(huge) }
    // near Long.MaxValue the naive pos + len + 4 sum wraps negative —
    // the buffer-size bound must reject it before the sum
    val wrap = ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      s"Content-Length: ${Long.MaxValue - 30}\r\n\r\n").getBytes(UTF_8)
    intercept[IllegalArgumentException] { Warc.decode(wrap) }
  }

  test("encode is deterministic (content-addressed staging keys hold)") {
    val rs = Seq(rec(1, "abc"), rec(2, "def"))
    assert(Warc.encode(rs).toSeq === Warc.encode(rs).toSeq)
  }

  test("HTTP payloads: all four wire framings unwrap to the body") {
    val body = ("<html><body>" + "x" * 1700 + "</body></html>").getBytes("UTF-8")
    for (f <- 0 to 3)
      assert(Warc.httpBody(Warc.httpWrap(body, f)).toSeq === body.toSeq, s"framing $f")
    // chunked framing really chunks (1700+ bytes → >1 chunk) and gzip
    // really compresses (body absent from the wire bytes)
    val chunked = new String(Warc.httpWrap(body, 1), "ISO-8859-1")
    assert(chunked.contains("Transfer-Encoding: chunked"))
    assert(chunked.contains("1f4\r\n")) // 500-byte chunk size line
    val gz = Warc.httpWrap(body, 2)
    assert(!new String(gz, "ISO-8859-1").contains("xxxxxxxx"))
  }

  test("HTTP payloads: non-HTTP passes through, malformed throws") {
    val raw = "<html>legacy raw record</html>".getBytes("UTF-8")
    assert(Warc.httpBody(raw).toSeq === raw.toSeq)
    // no header terminator
    assertThrows[IllegalArgumentException](
      Warc.httpBody("HTTP/1.1 200 OK\r\nContent-Length: 3".getBytes("ISO-8859-1")))
    // bad chunk framing (size lies)
    assertThrows[Exception](Warc.httpBody(
      "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nff\r\nhi\r\n0\r\n\r\n"
        .getBytes("ISO-8859-1")))
    // unknown content coding stays loud
    assertThrows[IllegalArgumentException](Warc.httpBody(
      "HTTP/1.1 200 OK\r\nContent-Encoding: br\r\nContent-Length: 2\r\n\r\nhi"
        .getBytes("ISO-8859-1")))
    // duplicated FRAMING headers are the smuggling shape — rejected
    assertThrows[IllegalArgumentException](Warc.httpBody(
      ("HTTP/1.1 200 OK\r\nContent-Length: 2\r\nContent-Length: 3\r\n\r\nhi")
        .getBytes("ISO-8859-1")))
    // duplicated NON-framing headers (Set-Cookie, Via, ...) are legal and
    // ubiquitous on the real wire (RFC 9110 §5.3) — pass through
    assert(Warc.httpBody(
      ("HTTP/1.1 200 OK\r\nSet-Cookie: a=1\r\nSet-Cookie: b=2\r\n" +
        "Content-Length: 2\r\n\r\nhi").getBytes("ISO-8859-1")).toSeq ===
      "hi".getBytes("ISO-8859-1").toSeq)
  }
}
