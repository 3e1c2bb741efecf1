package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.GbPdf

/** GbPdf — the native pdftohtml stand-in (XmlDoc.cpp:19192 pipes CT_PDF
  * through `pdftohtml -q -i -noframes -stdout` and indexes the HTML). */
class GbPdfSpec extends AnyFunSuite {

  private def pdf(body: String): Array[Byte] =
    (s"%PDF-1.4\n1 0 obj << /Length ${body.length} >> stream\n" +
      body + "\nendstream endobj\n%%EOF\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  test("Tj text inside BT/ET converts to paragraph html") {
    val h = GbPdf.toHtml(pdf("BT /F1 12 Tf 72 720 Td (Hello World) Tj ET"))
    assert(h == "<html>\n<body>\n<p>Hello World</p>\n</body>\n</html>\n")
  }

  test("TJ arrays join strings and ignore kerning numbers") {
    val h = GbPdf.toHtml(pdf("BT [ (Hel) -120 (lo) 40 (there) ] TJ ET"))
    assert(h.contains("<p>Hel lo there</p>"))
  }

  test("Td/T* line moves break lines; ' shows on a new line") {
    val h = GbPdf.toHtml(pdf("BT (line one) Tj T* (line two) Tj 0 -14 Td (line three) ' ET"))
    assert(h.contains("<p>line one</p>") && h.contains("<p>line two</p>") &&
      h.contains("<p>line three</p>"))
  }

  test("literal escapes: octal, balanced parens, specials, html escaping") {
    val h = GbPdf.toHtml(pdf("""BT (a\(b\)c \101 (nested) <tag> & \\ ) Tj ET"""))
    assert(h.contains("<p>a(b)c A (nested) &lt;tag&gt; &amp; \\</p>"))
  }

  test("hex strings decode, UTF-16BE BOM honored") {
    // <48690> odd digit pads 0: 'H','i','\0'... keep even: 4869 = Hi
    val h = GbPdf.toHtml(pdf("BT <4869> Tj ET"))
    assert(h.contains("<p>Hi</p>"))
    // FE FF 00 4F 00 4B = UTF-16BE "OK"
    val h2 = GbPdf.toHtml(pdf("BT <FEFF004F004B> Tj ET"))
    assert(h2.contains("<p>OK</p>"))
  }

  test("FlateDecode streams inflate") {
    val body = "BT (compressed text) Tj ET"
    val raw = body.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](1024)
    val n = d.deflate(buf); d.end()
    val head = (s"%PDF-1.4\n1 0 obj << /Filter /FlateDecode /Length $n >> stream\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val tail = "\nendstream endobj\n%%EOF\n"
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = head ++ buf.take(n) ++ tail
    assert(GbPdf.toHtml(out).contains("<p>compressed text</p>"))
  }

  test("no text → null: image-only (DCTDecode), non-PDF, empty BT") {
    assert(GbPdf.toHtml(
      ("%PDF-1.4\n1 0 obj << /Filter /DCTDecode /Length 4 >> stream\n" +
        "\u00ff\u00d8\u00ff\u00d9\nendstream endobj\n%%EOF\n")
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)) == null)
    assert(GbPdf.toHtml("not a pdf at all".getBytes) == null)
    assert(GbPdf.toHtml(pdf("BT ET")) == null)
    assert(GbPdf.toHtml(Array.emptyByteArray) == null)
    assert(GbPdf.toHtml(null: Array[Byte]) == null)
  }

  test("text outside BT/ET is ignored (operand strings never leak)") {
    val h = GbPdf.toHtml(pdf("(outside) Tj BT (inside) Tj ET"))
    assert(h == "<html>\n<body>\n<p>inside</p>\n</body>\n</html>\n")
  }

  test("the corpus doc.pdf fixture converts; scan.pdf does not") {
    val spec = graft.frontier.Corpus.micro
    val pages = graft.frontier.Corpus.pages(SparkTestSession.spark, spec, 0)
      .collect().filter(_.url.endsWith(".pdf"))
    val doc = pages.find(_.url.endsWith("/doc.pdf")).get
    val scan = pages.find(_.url.endsWith("/scan.pdf")).get
    val h = GbPdf.toHtml(doc.html)
    assert(h != null && h.contains("host 2 report") &&
      h.contains("pdf fixture body for host 2"))
    assert(GbPdf.toHtml(scan.html) == null)
  }
}
