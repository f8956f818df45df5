package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String

/** The HTML extraction state machine against the real-HTML corner cases
  * each semantic in the scaladoc claims to handle. */
class HtmlExtractSpec extends AnyFunSuite {

  private def x(html: String): String =
    HtmlExtractText.compute(UTF8String.fromString(html)).toString

  test("tags strip; attribute values may contain '>'") {
    assert(x("<p>hello <b>world</b></p>") == "hello world")
    assert(x("""<a href="https://e.com/q?a>b" title='x>y'>link</a>""") == "link")
    assert(x("""<img src="a.png" alt="5 > 4"/>after""") == "after")
  }

  test("script/style/title raw text drops wholesale, incl. quoted close tags") {
    assert(x("""a<script>var s = "</p>"; if (1 < 2 && 3 > 0) {}</script>b""")
      == "a b")
    assert(x("a<style>p { content: \"<div>\"; }</style>b") == "a b")
    assert(x("<title>drop</title>keep") == "keep")
    // case-insensitive close, attributes-free close with spaces
    assert(x("a<SCRIPT>x<y</ScRiPt >b") == "a b")
    // unterminated raw text swallows the tail rather than leaking code
    assert(x("a<script>var leak = 1;") == "a")
  }

  test("comments drop, including tags and fake closers inside") {
    assert(x("a<!-- <p>junk</p> & more -->b") == "a b")
    assert(x("a<!-- unterminated") == "a")
  }

  test("entities decode; unknown and unterminated pass through") {
    assert(x("&quot;hi&quot; &amp; &lt;tag&gt; a&nbsp;b") == "\"hi\" & <tag> a b")
    assert(x("&#34;q&#34; &#x22;h&#x22;") == "\"q\" \"h\"")
    assert(x("AT&T and fish &chips; &bogus12345; x") ==
      "AT&T and fish &chips; &bogus12345; x")
    // a numeric reference beyond U+10FFFF parses as an int but is not a
    // code point — it must pass through literally, not crash
    // appendCodePoint (real crawl HTML contains malformed entities)
    assert(x("a &#x110000; b") == "a &#x110000; b")
    assert(x("a &#1114112; b") == "a &#1114112; b")
    // a surrogate reference is "valid" to isValidCodePoint but appending
    // it makes a lone surrogate the UTF-8 encoder mangles to '?' —
    // it must also pass through literally
    assert(x("a &#xD800; b") == "a &#xD800; b")
    assert(x("a &#xDFFF; b") == "a &#xDFFF; b")
  }

  test("whitespace collapses across text, tags and newlines") {
    assert(x("  a \n\t b  ") == "a b")
    assert(x("<div>a</div><div>b</div>") == "a b")
    assert(x("a<br/>b<hr/>c") == "a b c")
    assert(x("") == "")
    assert(x("<html><head></head><body></body></html>") == "")
  }

  test("the synthesized-wrapper round trip matches the oracle derivation") {
    // the exact query-level contract on a miniature document
    val words = (0 until 30).map(i => s"w$i")
    val marked = words.zipWithIndex.map { case (w, i) =>
      if (i % 11 == 3) s"&quot;$w&quot;"
      else if (i % 7 == 2) s"<b>$w</b>"
      else if (i % 7 == 5) s"""<a href="https://x.example/q?a=1&amp;b=2">$w</a>"""
      else if (i % 13 == 7) s"""<!-- <p>junk&amp;</p> -->\n<span class="k">$w</span>"""
      else w
    }
    val html = "<html><head><title>drop this</title>" +
      "<style>p { color: #000; content: \"<never>\"; }</style>" +
      "<script>var x = \"</p>\"; if (x < 'y' && 1 > 0) { z = x; }</script>" +
      "</head>\n<body><p>" + marked.mkString(" ") + "</p><hr/></body></html>"
    val expected = words.zipWithIndex.map { case (w, i) =>
      if (i % 11 == 3) "\"" + w + "\"" else w
    }.mkString(" ")
    assert(x(html) == expected)
  }

  test("fuzz: arbitrary input never throws, never leaks tag/comment text") {
    // The state machine must TOTAL over arbitrary strings — crawled HTML
    // is hostile by default (unterminated tags/comments/entities, stray
    // control bytes, markup soup). Deterministic generator biased toward
    // state-machine triggers; the invariants: no exception, and no output
    // longer than the input (extraction only removes or substitutes).
    val rng = new scala.util.Random(0x4754A11L)
    val atoms = Array("<", ">", "</", "<!--", "-->", "&", ";", "\"", "'",
      "=", " ", "\n", "<script", "</script>", "<style", "<p", "amp", "lt",
      "quot", "x", "wor d", "<b attr=\"v>\"", "&#6", "&#65;", "\u0000")
    for (_ <- 0 until 2000) {
      val sb = new StringBuilder
      for (_ <- 0 until rng.nextInt(40))
        sb.append(atoms(rng.nextInt(atoms.length)))
      val in = sb.toString
      val out = x(in) // must not throw
      assert(out.length <= in.length + 1,
        s"extraction grew the input: ${in.take(80)} -> ${out.take(80)}")
    }
    // pathological unterminated constructs specifically
    for (bad <- Seq("<", "<!", "<!-", "<!--", "<!-- never closed",
        "<script>alert(1)", "<a href=\"", "&", "&#", "&#xZZ", "<p<p<p",
        "</" * 1000, "<!--" * 1000, "&amp" * 1000))
      x(bad) // must not throw
  }
}
