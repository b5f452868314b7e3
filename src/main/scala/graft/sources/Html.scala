package graft.sources

/** Pure-JVM HTML → text extraction — the WET-conversion step of a web
  * corpus pipeline (what Common Crawl runs to turn crawled HTML into the
  * text that WARC/WET shards carry, and what trafilatura/jusText-class
  * tools do before any quality filter; the reference ingests only
  * PDF/DOCX/TXT, `app.py:123-158` — web pages are the missing, dominant
  * real-world shape).
  *
  * Unlike the strict binary codecs (Pdf/Png/Tar: fail loudly), real
  * HTML is essentially never well-formed, so the extraction contract is
  * DETERMINISTIC LENIENCE — fixed, documented rules, the same output
  * for the same bytes every time:
  *
  *  - `<script> <style> <noscript> <template>` subtrees are dropped
  *    (matching close tag or EOF); `<head>` content except nothing —
  *    the whole head subtree is dropped.
  *  - comments `<!-- -->` and CDATA sections are dropped; a doctype or
  *    processing instruction is dropped to its closing `>`.
  *  - any other tag is replaced by a separator: BLOCK tags (p, div, br,
  *    li, ul, ol, h1-h6, tr, table, section, article, header, footer,
  *    blockquote, pre, hr) become a newline, inline tags become
  *    nothing. Attributes are skipped verbatim, including quoted `>`.
  *  - character references decode: the HTML5 core names (amp, lt, gt,
  *    quot, apos, nbsp) and numeric `&#NNN;` / `&#xHH;` forms; an
  *    unterminated or unknown reference stays literal (lenient).
  *  - whitespace collapses to single spaces within a line; lines trim;
  *    empty lines drop. Output lines join with '\n'.
  *
  * An unclosed tag at EOF, a stray `<`, or a lone `&` are all data, not
  * errors — the rules above assign them a deterministic reading.
  */
object Html {

  private val Block = Set(
    "p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
    "tr", "table", "section", "article", "header", "footer", "blockquote",
    "pre", "hr", "dl", "dt", "dd", "form", "main", "nav", "aside")

  /** Cell separators: a word boundary within the row's line, not a new
    * line — `<td>e</td><td>f</td>` reads "e f". */
  private val Cell = Set("td", "th")

  private val Dropped = Set("script", "style", "noscript", "template", "head")

  private val Named = Map(
    "amp" -> '&', "lt" -> '<', "gt" -> '>', "quot" -> '"', "apos" -> '\'',
    "nbsp" -> ' ')

  /** Extract visible text per the contract above. */
  def extractText(html: String): String = {
    val out = new StringBuilder
    val n = html.length
    var i = 0

    def tagNameAt(start: Int): (String, Boolean) = {
      // start points AT '<'; returns (lowercase name, isClosing). HTML5
      // lexing: a name starts with an ASCII LETTER — "<3", "<生" and a
      // lone '<' are character data, not tags
      var j = start + 1
      val closing = j < n && html.charAt(j) == '/'
      if (closing) j += 1
      def asciiLetter(c: Char) = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
      if (j >= n || !asciiLetter(html.charAt(j))) return ("", closing)
      val b = new StringBuilder
      while (j < n && (asciiLetter(html.charAt(j)) || html.charAt(j).isDigit)) {
        b.append(html.charAt(j)); j += 1
      }
      (b.toString.toLowerCase, closing)
    }

    def skipTag(start: Int): Int = {
      // start at '<'; returns index AFTER the closing '>', honoring
      // quoted attribute values (a '>' inside quotes is data)
      var j = start + 1
      var quote: Char = 0
      while (j < n) {
        val c = html.charAt(j)
        if (quote != 0) { if (c == quote) quote = 0 }
        else if (c == '"' || c == '\'') quote = c
        else if (c == '>') return j + 1
        j += 1
      }
      n // unclosed tag at EOF: consume the rest (lenient)
    }

    def skipUntil(start: Int, marker: String): Int = {
      val at = html.indexOf(marker, start)
      if (at < 0) n else at + marker.length
    }

    def skipDroppedElement(afterOpen: Int, name: String): Int = {
      // drop content up to and including the matching close tag (no
      // nesting for these elements in practice; first match wins). For
      // <head>, whose close tag is OPTIONAL in HTML5, also stop AT an
      // opening <body> — browsers infer </head> there, and scanning to
      // EOF would discard the whole page
      var j = afterOpen
      while (j < n) {
        val close = html.indexOf('<', j)
        if (close < 0) return n
        if (html.startsWith("</", close)) {
          val (nm, _) = tagNameAt(close)
          if (nm == name) return skipTag(close)
        } else if (name == "head") {
          val (nm, closing) = tagNameAt(close)
          if (!closing && nm == "body") return close // resume at <body>
        }
        j = close + 1
      }
      n
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) i = skipUntil(i + 4, "-->")
        else if (html.startsWith("<![CDATA[", i)) i = skipUntil(i + 9, "]]>")
        else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?'))
          i = skipTag(i) // doctype / PI
        else {
          val (name, closing) = tagNameAt(i)
          if (name.isEmpty) { out.append(c); i += 1 } // stray '<' is data
          else {
            val after = skipTag(i)
            if (!closing && Dropped(name)) i = skipDroppedElement(after, name)
            else {
              if (Block(name)) out.append('\n')
              else if (Cell(name)) out.append(' ')
              i = after
            }
          }
        }
      } else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        val ref = if (semi > i && semi - i <= 10) html.substring(i + 1, semi) else null
        val decoded: Option[String] =
          if (ref == null) None
          else if (ref.startsWith("#x") || ref.startsWith("#X"))
            try Some(new String(Character.toChars(Integer.parseInt(ref.drop(2), 16))))
            catch { case _: Exception => None }
          else if (ref.startsWith("#"))
            try Some(new String(Character.toChars(Integer.parseInt(ref.drop(1)))))
            catch { case _: Exception => None }
          else Named.get(ref).map(_.toString)
        decoded match {
          case Some(s) => out.append(s); i = semi + 1
          case None => out.append(c); i += 1 // lone '&' is data
        }
      } else { out.append(c); i += 1 }
    }

    // whitespace discipline: collapse within lines, trim, drop empties
    out.toString.split('\n').iterator
      .map(_.replaceAll("[\\s ]+", " ").trim)
      .filter(_.nonEmpty)
      .mkString("\n")
  }

  /** Fixture direction: wrap text lines into a deterministic page
    * (head with title+style, an h1, one `<p>` per line, entity-encoded
    * content) whose extraction contract is mirrored by the q60l
    * oracle. */
  def encodePage(title: String, heading: String, paragraphs: Seq[String]): String = {
    def esc(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val body = paragraphs.map(p => s"  <p class='t'>${esc(p)}</p>").mkString("\n")
    s"""<!DOCTYPE html>
       |<html><head><title>${esc(title)}</title>
       |<style>p.t { margin: 0; }</style>
       |<script>var x = "<p>not text</p>";</script>
       |</head>
       |<body>
       |<!-- generated fixture -->
       |<h1>${esc(heading)}</h1>
       |$body
       |</body></html>""".stripMargin
  }
}
