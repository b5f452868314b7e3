package graft.sources

import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}
import java.nio.ByteBuffer

/** O1-O3 — document text extraction semantics (SURVEY §2.1).
  *
  * The reference extracts PDF text by iterating pages and concatenating
  * (`/root/reference/app.py:123-132`), DOCX by joining paragraphs with
  * "\n" (`app.py:134-143`), and TXT by decoding UTF-8 with a latin-1
  * fallback (`app.py:145-158`). The page/paragraph reassembly is a
  * DataFrame op (ordered groupBy concat — see RagQueries.pagesConcat);
  * the byte-level decode lives here and runs inside executors
  * (mapPartitions over binary content), never on the driver.
  */
object TextExtract {

  /** Strict UTF-8 decode; on malformed input fall back to ISO-8859-1
    * (which never fails — every byte is a valid latin-1 char), mirroring
    * app.py:149-155. Returns (text, encodingUsed). */
  def decodeWithFallback(bytes: Array[Byte]): (String, String) = {
    if (bytes == null) return ("", "utf-8")
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try {
      (dec.decode(ByteBuffer.wrap(bytes)).toString, "utf-8")
    } catch {
      case _: CharacterCodingException =>
        (new String(bytes, StandardCharsets.ISO_8859_1), "latin-1")
    }
  }

  /** BOM-aware decode — the step `app.py:145-158` is missing and real
    * text corpora need: Windows tooling writes UTF-8 with a BOM and
    * UTF-16 both endiannesses with theirs, and a BOM-blind UTF-8 reader
    * either keeps a garbage U+FEFF first char or (UTF-16) falls through
    * to latin-1 and interleaves every char with NULs. Sniff order:
    * EF BB BF → UTF-8 (BOM stripped); FF FE → UTF-16LE; FE FF →
    * UTF-16BE; else [[decodeWithFallback]]. UTF-16 decode is STRICT —
    * a truncated surrogate or odd byte count throws rather than
    * silently replacing, the codec family's discipline. Returns
    * (text, encodingUsed). */
  def decodeAuto(bytes: Array[Byte]): (String, String) = {
    if (bytes == null || bytes.isEmpty) return ("", "utf-8")
    def strict(cs: java.nio.charset.Charset, from: Int): String = {
      val dec = cs.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      dec.decode(ByteBuffer.wrap(bytes, from, bytes.length - from)).toString
    }
    def b(i: Int) = bytes(i) & 0xff
    if (bytes.length >= 3 && b(0) == 0xEF && b(1) == 0xBB && b(2) == 0xBF)
      (strict(StandardCharsets.UTF_8, 3), "utf-8-bom")
    // UTF-32 BOMs first: FF FE 00 00 is a valid UTF-16LE prefix too, so
    // the longer match must win or UTF-32LE text NUL-interleaves silently
    else if (bytes.length >= 4 && b(0) == 0xFF && b(1) == 0xFE && b(2) == 0 && b(3) == 0)
      (strict(java.nio.charset.Charset.forName("UTF-32LE"), 4), "utf-32le")
    else if (bytes.length >= 4 && b(0) == 0 && b(1) == 0 && b(2) == 0xFE && b(3) == 0xFF)
      (strict(java.nio.charset.Charset.forName("UTF-32BE"), 4), "utf-32be")
    else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xFF && (bytes(1) & 0xff) == 0xFE)
      (strict(StandardCharsets.UTF_16LE, 2), "utf-16le")
    else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xFE && (bytes(1) & 0xff) == 0xFF)
      (strict(StandardCharsets.UTF_16BE, 2), "utf-16be")
    else decodeWithFallback(bytes)
  }

  /** DOCX-style paragraph join: non-empty trimmed paragraphs, "\n" glue
    * (app.py:134-143 keeps only truthy `para.text`). */
  def joinParagraphs(paras: Seq[String]): String =
    paras.iterator.map(_.trim).filter(_.nonEmpty).mkString("\n")
}
