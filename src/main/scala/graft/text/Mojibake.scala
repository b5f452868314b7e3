package graft.text

import java.nio.charset.{CharacterCodingException, CodingErrorAction}
import java.nio.charset.StandardCharsets.UTF_8

/** Mojibake (UTF-8-as-cp1252 double encoding) detect-and-repair — the
  * ftfy class of web-corpus cleanup (C4/CCNet pipelines run exactly this
  * before anything else; the reference ingests user uploads at
  * `app.py:145-158` with a bare latin-1 fallback and ships whatever that
  * produces). The classic corruption: a UTF-8 byte stream decoded as
  * Windows-1252 and re-saved, turning "é" into "Ã©" — sometimes twice.
  *
  * Repair rule (deterministic, no heuristics beyond the round-trip
  * test): re-encode the string through SLOPPY cp1252 (the 5 bytes
  * cp1252 leaves undefined — 0x81 8D 8F 90 9D — map to themselves, as
  * every real-world decoder that produced the mojibake did); if every
  * char is encodable and the bytes parse as STRICT UTF-8 to a STRICTLY
  * SHORTER string, accept and iterate (double mojibake needs two
  * rounds), else stop. A legitimate cp1252-ish text ("café") re-encodes
  * to bytes that are NOT valid UTF-8, so it never false-positives; a
  * string with chars outside cp1252 (CJK, symbols) is not encodable, so
  * repaired text is a fixpoint. The strictly-shorter condition makes
  * the loop a measure-decreasing function — termination is structural,
  * the iteration cap is only a defensive bound.
  */
object Mojibake {

  /** Unicode code point for each sloppy-cp1252 byte 0x80-0x9F (the
    * window where cp1252 diverges from latin-1); undefined bytes map to
    * themselves (the "sloppy" extension ftfy documents). Bytes 0x00-7F
    * and 0xA0-FF are identity (latin-1). */
  private val Cp1252High: Array[Char] = {
    val a = new Array[Char](32)
    for (b <- 0x80 until 0xA0) a(b - 0x80) = b.toChar // sloppy default
    val defined = Map(
      0x80 -> '€', 0x82 -> '‚', 0x83 -> 'ƒ', 0x84 -> '„',
      0x85 -> '…', 0x86 -> '†', 0x87 -> '‡', 0x88 -> 'ˆ',
      0x89 -> '‰', 0x8A -> 'Š', 0x8B -> '‹', 0x8C -> 'Œ',
      0x8E -> 'Ž', 0x91 -> '‘', 0x92 -> '’', 0x93 -> '“',
      0x94 -> '”', 0x95 -> '•', 0x96 -> '–', 0x97 -> '—',
      0x98 -> '˜', 0x99 -> '™', 0x9A -> 'š', 0x9B -> '›',
      0x9C -> 'œ', 0x9E -> 'ž', 0x9F -> 'Ÿ')
    defined.foreach { case (b, c) => a(b - 0x80) = c }
    a
  }

  private val Cp1252Inverse: Map[Char, Byte] =
    (0x80 until 0xA0).map(b => Cp1252High(b - 0x80) -> b.toByte).toMap

  /** Decode raw bytes as sloppy cp1252 (the corruption direction —
    * used by fixtures and by anyone ingesting legacy byte streams). */
  def decodeSloppyCp1252(bytes: Array[Byte]): String = {
    val sb = new StringBuilder(bytes.length)
    bytes.foreach { b =>
      val u = b & 0xff
      sb.append(if (u >= 0x80 && u < 0xA0) Cp1252High(u - 0x80) else u.toChar)
    }
    sb.toString
  }

  /** Encode through sloppy cp1252; None when a char has no byte (true
    * non-cp1252 content — CJK, arrows, emoji: not mojibake residue). */
  def encodeSloppyCp1252(s: String): Option[Array[Byte]] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 0x80 || (c >= 0xA0 && c <= 0xFF)) out(i) = c.toByte
      else Cp1252Inverse.get(c) match {
        case Some(b) => out(i) = b
        case None => return None
      }
      i += 1
    }
    Some(out)
  }

  private def strictUtf8(bytes: Array[Byte]): Option[String] = {
    val dec = UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try Some(dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
    catch { case _: CharacterCodingException => None }
  }

  /** Repair up to `maxRounds` layers of UTF-8-as-cp1252 mojibake.
    * Returns (repaired text, rounds applied). Pure ASCII and already-
    * clean text return unchanged with 0 rounds. */
  def repair(s: String, maxRounds: Int = 4): (String, Int) = {
    var cur = s
    var rounds = 0
    var continue = true
    while (continue && rounds < maxRounds) {
      continue = false
      encodeSloppyCp1252(cur).foreach { bytes =>
        strictUtf8(bytes).foreach { decoded =>
          // strictly shorter = at least one multi-byte sequence folded;
          // equal length means the text was plain ASCII already
          if (decoded.length < cur.length) {
            cur = decoded
            rounds += 1
            continue = true
          }
        }
      }
    }
    (cur, rounds)
  }

  /** The corruption itself (fixture direction): what a cp1252 pipeline
    * does to clean UTF-8 text, `rounds` times. */
  def corrupt(s: String, rounds: Int): String = {
    var cur = s
    var i = 0
    while (i < rounds) { cur = decodeSloppyCp1252(cur.getBytes(UTF_8)); i += 1 }
    cur
  }
}
