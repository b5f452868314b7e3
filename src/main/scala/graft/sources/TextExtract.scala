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

  /** DOCX-style paragraph join: non-empty trimmed paragraphs, "\n" glue
    * (app.py:134-143 keeps only truthy `para.text`). */
  def joinParagraphs(paras: Seq[String]): String =
    paras.iterator.map(_.trim).filter(_.nonEmpty).mkString("\n")
}
