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
    * emit one string per `<w:p>` — the concatenation of its `<w:t>` text
    * nodes, empty for an empty paragraph — in document order. Matches
    * python-docx `[p.text for p in doc.paragraphs]` on this structure. */
  private[graft] def decodeParagraphs(bytes: Array[Byte]): Seq[String] = {
    val xml = documentXml(bytes)
    val reader = xmlFactory.get().createXMLStreamReader(
      new ByteArrayInputStream(xml), "UTF-8")
    val paragraphs = Seq.newBuilder[String]
    val sb = new StringBuilder
    var inP = false
    try {
      while (reader.hasNext) {
        reader.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            reader.getLocalName match {
              case "p" if reader.getNamespaceURI == wNs =>
                inP = true; sb.clear()
              case "t" if inP && reader.getNamespaceURI == wNs =>
                sb.append(reader.getElementText) // consumes through </w:t>
              case _ => ()
            }
          case XMLStreamConstants.END_ELEMENT =>
            if (inP && reader.getLocalName == "p" &&
                reader.getNamespaceURI == wNs) {
              paragraphs += sb.toString
              inP = false
            }
          case _ => ()
        }
      }
    } finally reader.close()
    paragraphs.result()
  }
}
