package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/** Real DOCX container codec, pure JVM (java.util.zip + StAX — no deps).
  *
  * A .docx is a ZIP package whose text lives in `word/document.xml` as
  * `<w:p>` paragraphs of `<w:r>` runs holding `<w:t>` text nodes (ECMA-376
  * WordprocessingML). The reference extracts it with python-docx —
  * `text += para.text + "\n"` per paragraph (app.py:134-143), where
  * `para.text` is the concatenation of the paragraph's run texts; this
  * decoder reproduces exactly that contract from raw bytes.
  *
  * Like the WAV codec ([[Multimodal]]), corrupt input fails LOUDLY: a
  * payload without the ZIP magic, without a `word/document.xml` entry, or
  * with malformed XML throws — silently extracting half a document is a
  * corpus poison no downstream filter can catch. */
object Docx {

  /** ZIP local-file-header magic ("PK"). */
  private[graft] def isZip(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == 'P' && bytes(1) == 'K' &&
      bytes(2) == 3 && bytes(3) == 4

  private val wNs =
    "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

  private def xmlEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case c   => sb.append(c)
    }
    sb.toString
  }

  private val contentTypesXml =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
      |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
      |<Default Extension="xml" ContentType="application/xml"/>
      |<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
      |</Types>""".stripMargin

  private val relsXml =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>
      |</Relationships>""".stripMargin

  /** Encode paragraphs as a minimal standards-shaped .docx: the three
    * mandatory package parts, one `<w:p><w:r><w:t>` per paragraph.
    * `xml:space="preserve"` keeps leading/trailing spaces through any
    * conformant reader. Entry timestamps are pinned so identical input
    * yields identical bytes (cache keys stay content-addressed). */
  private[graft] def encode(paragraphs: Seq[String]): Array[Byte] = {
    val doc = new StringBuilder
    doc.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    doc.append(s"""<w:document xmlns:w="$wNs"><w:body>""")
    paragraphs.foreach { p =>
      if (p.isEmpty) doc.append("<w:p/>")
      else doc.append("<w:p><w:r><w:t xml:space=\"preserve\">")
        .append(xmlEscape(p)).append("</w:t></w:r></w:p>")
    }
    doc.append("</w:body></w:document>")
    val out = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(out, UTF_8)
    def entry(name: String, content: String): Unit = {
      val e = new ZipEntry(name)
      e.setTime(0L)
      zip.putNextEntry(e)
      zip.write(content.getBytes(UTF_8))
      zip.closeEntry()
    }
    entry("[Content_Types].xml", contentTypesXml)
    entry("_rels/.rels", relsXml)
    entry("word/document.xml", doc.toString)
    zip.close()
    out.toByteArray
  }

  /** Pull `word/document.xml` out of the package. Streams the zip (no
    * temp file, no random access) — central-directory trust is not needed
    * to read one known entry. */
  private def documentXml(bytes: Array[Byte]): Array[Byte] = {
    require(isZip(bytes), "not a ZIP package (missing PK magic)")
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes), UTF_8)
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (e.getName == "word/document.xml") {
          val buf = new ByteArrayOutputStream()
          val chunk = new Array[Byte](8192)
          var n = zin.read(chunk)
          while (n >= 0) { buf.write(chunk, 0, n); n = zin.read(chunk) }
          return buf.toByteArray
        }
        e = zin.getNextEntry
      }
      throw new IllegalArgumentException(
        "not a DOCX: package has no word/document.xml")
    } finally zin.close()
  }

  // XMLInputFactory is not documented thread-safe; one per thread, with
  // DTD/external-entity resolution off (untrusted bytes at lake scale)
  private val xmlFactory = new ThreadLocal[XMLInputFactory] {
    override def initialValue(): XMLInputFactory = {
      val f = XMLInputFactory.newInstance()
      f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
      f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
        java.lang.Boolean.FALSE)
      f
    }
  }

  /** Real DOCX text extraction: unzip, StAX-walk `word/document.xml`,
    * emit one string per body-level `<w:p>` — the concatenation of its
    * `<w:t>` text nodes, empty for an empty paragraph — in document
    * order. Matches python-docx `[p.text for p in doc.paragraphs]`,
    * which yields BODY paragraphs only: paragraphs nested inside a
    * `<w:tbl>` table cell are NOT in `doc.paragraphs` (they live under
    * `doc.tables`), so this walker skips any `<w:p>` under a table —
    * the distinction that makes the reference's two loader paths
    * (app.py:137-139 vs app.py:172) return different text on a
    * table-bearing document. */
  private[graft] def decodeParagraphs(bytes: Array[Byte]): Seq[String] = {
    val xml = documentXml(bytes)
    val reader = xmlFactory.get().createXMLStreamReader(
      new ByteArrayInputStream(xml), "UTF-8")
    val paragraphs = Seq.newBuilder[String]
    val sb = new StringBuilder
    var inP = false
    var tblDepth = 0
    try {
      while (reader.hasNext) {
        reader.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            reader.getLocalName match {
              case "tbl" if reader.getNamespaceURI == wNs =>
                tblDepth += 1
              case "p" if tblDepth == 0 && reader.getNamespaceURI == wNs =>
                inP = true; sb.clear()
              case "t" if inP && reader.getNamespaceURI == wNs =>
                sb.append(reader.getElementText) // consumes through </w:t>
              case _ => ()
            }
          case XMLStreamConstants.END_ELEMENT =>
            reader.getLocalName match {
              case "tbl" if reader.getNamespaceURI == wNs =>
                tblDepth -= 1
              case "p" if inP && reader.getNamespaceURI == wNs =>
                paragraphs += sb.toString
                inP = false
              case _ => ()
            }
          case _ => ()
        }
      }
    } finally reader.close()
    paragraphs.result()
  }

  // --- docx2txt-parity whole-package extraction -----------------------------

  /** One package part as docx2txt's `xml2text` renders it (the loader
    * path the reference's splitter uses, app.py:172): a pre-order walk
    * where `<w:p>` contributes "\n\n" BEFORE its own text (ElementTree
    * `iter()` visits the element before its children), `<w:t>` its
    * text, `<w:tab/>` a tab, and `<w:br/>`/`<w:cr/>` a newline. Table
    * cell paragraphs are ordinary `<w:p>` elements in this walk, which
    * is exactly why docx2txt sees table text python-docx's
    * `doc.paragraphs` misses. */
  private def xmlToText(xml: Array[Byte]): String = {
    val reader = xmlFactory.get().createXMLStreamReader(
      new ByteArrayInputStream(xml), "UTF-8")
    val sb = new StringBuilder
    try {
      while (reader.hasNext) {
        reader.next() match {
          case XMLStreamConstants.START_ELEMENT if reader.getNamespaceURI == wNs =>
            reader.getLocalName match {
              case "p"          => sb.append("\n\n")
              case "t"          => sb.append(reader.getElementText)
              case "tab"        => sb.append('\t')
              case "br" | "cr"  => sb.append('\n')
              case _            => ()
            }
          case _ => ()
        }
      }
    } finally reader.close()
    sb.toString
  }

  private val headerName = "word/header[0-9]*\\.xml".r
  private val footerName = "word/footer[0-9]*\\.xml".r

  /** Whole-package text in docx2txt's contract (`docx2txt.process`,
    * the engine under the reference's `Docx2txtLoader`, app.py:172):
    * every `word/header*.xml` part, then `word/document.xml`, then
    * every `word/footer*.xml` part, each rendered by [[xmlToText]],
    * concatenated and stripped — headers/footers and table cells are
    * included, the loader-path text python-docx's paragraph walk
    * drops. Header/footer parts are taken in package (zip entry)
    * order, as docx2txt iterates `namelist()`. Fails loudly on a
    * non-ZIP payload or a package without `word/document.xml`. */
  private[graft] def decodeText(bytes: Array[Byte]): String = {
    require(isZip(bytes), "not a ZIP package (missing PK magic)")
    val headers = Seq.newBuilder[Array[Byte]]
    val footers = Seq.newBuilder[Array[Byte]]
    var document: Option[Array[Byte]] = None
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes), UTF_8)
    try {
      var e = zin.getNextEntry
      while (e != null) {
        val name = e.getName
        def readAll(): Array[Byte] = {
          val buf = new ByteArrayOutputStream()
          val chunk = new Array[Byte](8192)
          var n = zin.read(chunk)
          while (n >= 0) { buf.write(chunk, 0, n); n = zin.read(chunk) }
          buf.toByteArray
        }
        if (name == "word/document.xml") document = Some(readAll())
        else if (headerName.pattern.matcher(name).matches()) headers += readAll()
        else if (footerName.pattern.matcher(name).matches()) footers += readAll()
        e = zin.getNextEntry
      }
    } finally zin.close()
    val doc = document.getOrElse(throw new IllegalArgumentException(
      "not a DOCX: package has no word/document.xml"))
    val all = headers.result() ++ Seq(doc) ++ footers.result()
    all.map(xmlToText).mkString.strip()
  }

  /** A paragraph with inline structure: text runs interleaved with
    * `<w:tab/>` and `<w:br/>` elements — rendered by docx2txt as tab
    * and newline characters, invisible to a text-node-only walker. */
  private[graft] final case class RichPara(pieces: Seq[String], seps: Seq[String]) {
    require(seps.length == pieces.length - 1 &&
      seps.forall(s => s == "\t" || s == "\n"),
      "RichPara: seps must interleave pieces and be tab or newline")
  }

  /** Encode a FULL package: optional header/footer parts, body
    * paragraphs (the first optionally a [[RichPara]] with tab/br
    * structure), and a trailing one-row table whose cells each hold
    * one paragraph — the table-bearing shape whose text the
    * reference's docx2txt loader path extracts but its python-docx
    * path drops. Deterministic bytes, same discipline as [[encode]]. */
  private[graft] def encodeFull(header: Option[String],
                                richPara: Option[RichPara],
                                paragraphs: Seq[String],
                                tableCells: Seq[String],
                                footer: Option[String]): Array[Byte] = {
    def para(p: String): String =
      if (p.isEmpty) "<w:p/>"
      else "<w:p><w:r><w:t xml:space=\"preserve\">" + xmlEscape(p) +
        "</w:t></w:r></w:p>"
    val doc = new StringBuilder
    doc.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    doc.append(s"""<w:document xmlns:w="$wNs"><w:body>""")
    richPara.foreach { rp =>
      doc.append("<w:p><w:r>")
      rp.pieces.zipWithIndex.foreach { case (piece, i) =>
        if (i > 0) doc.append(if (rp.seps(i - 1) == "\t") "<w:tab/>" else "<w:br/>")
        doc.append("<w:t xml:space=\"preserve\">").append(xmlEscape(piece))
          .append("</w:t>")
      }
      doc.append("</w:r></w:p>")
    }
    paragraphs.foreach(p => doc.append(para(p)))
    if (tableCells.nonEmpty) {
      doc.append("<w:tbl><w:tr>")
      tableCells.foreach(c => doc.append("<w:tc>").append(para(c)).append("</w:tc>"))
      doc.append("</w:tr></w:tbl>")
    }
    doc.append("</w:body></w:document>")
    def part(root: String, text: String): String =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        s"""<w:$root xmlns:w="$wNs">""" + para(text) + s"</w:$root>"
    val out = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(out, UTF_8)
    def entry(name: String, content: String): Unit = {
      val e = new ZipEntry(name)
      e.setTime(0L)
      zip.putNextEntry(e)
      zip.write(content.getBytes(UTF_8))
      zip.closeEntry()
    }
    val overrides = new StringBuilder
    header.foreach(_ => overrides.append(
      """<Override PartName="/word/header1.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.header+xml"/>"""))
    footer.foreach(_ => overrides.append(
      """<Override PartName="/word/footer1.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.footer+xml"/>"""))
    entry("[Content_Types].xml", contentTypesXml.replace("</Types>",
      overrides.toString + "</Types>"))
    entry("_rels/.rels", relsXml)
    header.foreach(h => entry("word/header1.xml", part("hdr", h)))
    entry("word/document.xml", doc.toString)
    footer.foreach(f => entry("word/footer1.xml", part("ftr", f)))
    zip.close()
    out.toByteArray
  }
}
