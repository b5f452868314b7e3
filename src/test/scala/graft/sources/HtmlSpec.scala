package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** HTML → text extraction: the deterministic-lenience contract. */
class HtmlSpec extends AnyFunSuite {

  test("basic page: head dropped, blocks become lines, inline tags vanish") {
    val html = "<html><head><title>T</title></head>" +
      "<body><h1>Head</h1><p>one <b>two</b> three</p><p>four</p></body></html>"
    assert(Html.extractText(html) === "Head\none two three\nfour")
  }

  test("script/style/noscript subtrees are dropped, even containing tags") {
    val html = "<body><script>var x = \"<p>fake</p>\";</script>" +
      "<style>p { color: red }</style><noscript><p>no js</p></noscript>" +
      "<p>real</p></body>"
    assert(Html.extractText(html) === "real")
  }

  test("entities: named, decimal, hex; unknown and lone & stay literal") {
    val html = "<p>A &amp; B &lt;ok&gt; &quot;q&quot; &#65; &#x42; &unknown; R&D</p>"
    assert(Html.extractText(html) === "A & B <ok> \"q\" A B &unknown; R&D")
  }

  test("comments, CDATA, doctype and PIs are dropped") {
    val html = "<!DOCTYPE html><?xml version='1.0'?><!-- note --><p>a</p>" +
      "<![CDATA[ignored]]><p>b</p>"
    assert(Html.extractText(html) === "a\nb")
  }

  test("attributes with quoted '>' do not end the tag") {
    val html = "<p title=\"a > b\" data-x='> y'>text</p>"
    assert(Html.extractText(html) === "text")
  }

  test("whitespace collapses within lines; blank lines drop") {
    val html = "<p>  a   b\t c  </p>\n\n  <div> </div> <p>d</p>"
    assert(Html.extractText(html) === "a b c\nd")
  }

  test("an unclosed <head> (optional in HTML5) still yields the body") {
    val html = "<html><head><title>T</title><body><p>Hello</p></body></html>"
    assert(Html.extractText(html) === "Hello")
    // and a page that is ALL head extracts nothing
    assert(Html.extractText("<head><title>T</title>") === "")
  }

  test("'<' not followed by an ASCII letter is character data (HTML5 lexing)") {
    assert(Html.extractText("<p>I <3 u > you</p>") === "I <3 u > you")
    assert(Html.extractText("<p>a < b</p>") === "a < b")
    assert(Html.extractText("<p>x <9pt> y</p>") === "x <9pt> y")
  }

  test("lenience: unclosed tags, stray '<', EOF inside script") {
    assert(Html.extractText("<p>a <b") === "a")
    assert(Html.extractText("x < y") === "x < y")
    assert(Html.extractText("<script>never closed") === "")
    assert(Html.extractText("<p>a</p><em") === "a")
  }

  test("br and list items separate lines; tables row-per-line") {
    val html = "<p>a<br>b</p><ul><li>c</li><li>d</li></ul>" +
      "<table><tr><td>e</td><td>f</td></tr></table>"
    assert(Html.extractText(html) === "a\nb\nc\nd\ne f")
  }

  test("non-BMP numeric references decode via surrogate pairs") {
    assert(Html.extractText("<p>&#x1F600;</p>") === new String(Character.toChars(0x1F600)))
  }

  test("encodePage round-trips: extraction = heading + paragraphs") {
    val paras = Seq("alpha beta", "R&D <lab> \"x\"", "gamma")
    val page = Html.encodePage("title text", "Doc 7", paras)
    assert(Html.extractText(page) === ("Doc 7" +: paras).mkString("\n"))
  }

  test("deterministic: same input, same output") {
    val page = Html.encodePage("t", "h", Seq("a & b"))
    assert(Html.extractText(page) === Html.extractText(page))
  }
}
