package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Pins every scan rule of [[HtmlText.extract]] against hand-computed
  * outputs; the html_extract gate separately cross-pins the same rules
  * against the independent Python mirror on the documents fixture. */
class HtmlTextSpec extends AnyFunSuite {
  private def x(s: String) = HtmlText.extract(s)

  test("tags strip; block elements make lines; inline tags do not") {
    assert(x("<html><body><p>Hello  world</p><p>Second</p></body></html>")
      == "Hello world\nSecond")
    assert(x("<div>a</div><span>b</span><li>c</li>") == "a\nb\nc")
    assert(x("one <b>bold</b> word") == "one bold word")
  }

  test("script and style drop wholesale, including markup inside") {
    assert(x("""<p>a</p><script>if(x<3){b("</p>")}</script><p>c</p>""")
      == "a\nc")
    assert(x("""<style type="text/css">p { color: red; }</style>After""")
      == "After")
    assert(x("before<script>var x=1;") == "before",
      "unterminated script drops to end of input")
    assert(x("<P>a</P><SCRIPT>x</ScRiPt>b") == "a\nb",
      "tag names and closers are case-insensitive")
    // case folding is ASCII-ONLY: Java's Unicode fold would match the
    // Turkish İ (U+0130) against 'i' while the Python oracle's .lower()
    // expands it and never matches — both twins must treat this closer
    // as NOT a closer (script drops to end of input)
    assert(x("before<script>x</scrİpt>after") == "before",
      "a Turkish-I closer must not end the script block")
    assert(x("before<script>x</scrıpt>after") == "before",
      "dotless-i closer must not end the script block either")
  }

  test("comments drop; unterminated comment drops to end") {
    assert(x("a<!-- <p>hidden</p> -->b") == "ab")
    assert(x("a<!--b") == "a")
  }

  test("named and numeric entities decode; invalid ones stay literal") {
    assert(x("fish &amp; chips &lt;tag&gt; &quot;q&quot; &apos;a&apos;")
      == "fish & chips <tag> \"q\" 'a'")
    assert(x("x&nbsp;y") == "x y", "nbsp decodes to a PLAIN space")
    assert(x("&#65;&#x42;&#x1F600;") == "AB😀")
    assert(x("&unknown; &#; &#x; &#xD800; &#999999999; a&&b")
      == "&unknown; &#; &#x; &#xD800; &#999999999; a&&b")
    assert(x("&" + "a" * 40 + ";") == "&" + "a" * 40 + ";",
      "no ';' within 31 chars of '&' means no entity")
    assert(x("&lt;p&gt;decoded markup is text&lt;/p&gt;")
      == "<p>decoded markup is text</p>",
      "decoded '<' is never re-scanned as a tag")
  }

  test("stray '<' is literal text") {
    assert(x("1 < 2 and 2 > 1") == "1 < 2 and 2 > 1")
    assert(x("a <b unclosed") == "a <b unclosed",
      "'<'+letter with no later '>' is literal")
  }

  test("doctype and processing instructions drop without a line break") {
    assert(x("<!DOCTYPE html><?xml version=\"1.0\"?>text") == "text")
  }

  test("whitespace: source newlines/tabs are spaces; lines trim and collapse") {
    assert(x("x\n\t y") == "x y")
    assert(x("<p>&nbsp; padded &nbsp;</p>") == "padded")
    assert(x("<div> </div><div></div>") == "", "all-blank lines drop")
  }

  test("documented simplification: a '>' inside a quoted attribute ends the tag") {
    assert(x("<a title=\"x>y\">t</a>") == "y\">t")
  }

  test("title is a block: head metadata never glues onto body text") {
    assert(x("<head><title>T</title></head><body><p>b</p></body>")
      == "T\nb")
  }
}
