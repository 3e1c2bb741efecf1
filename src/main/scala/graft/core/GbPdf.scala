package graft.core

import java.util.zip.Inflater

/** Minimal PDF → HTML text converter — the Spark-side analogue of the
  * reference's pdftohtml pipe: XmlDoc.cpp:19192 shells out
  * `pdftohtml -q -i -noframes -stdout` for every CT_PDF doc
  * (getFilteredContent, XmlDoc.cpp:18989 marks PDF "filterable") and
  * feeds the HTML into the normal parse chain. No converter binaries
  * exist in this sandbox, so the deterministic core of PDF 1.x text
  * extraction is implemented natively:
  *
  *  - content streams: `stream ... endstream` bodies, uncompressed or
  *    /FlateDecode (java.util.zip.Inflater); streams with any other
  *    filter (DCTDecode images, LZW, ...) are skipped
  *  - text ops inside BT/ET blocks: `(s) Tj`, `(s) '`, `aw ac (s) "`,
  *    `[ (a) -120 (b) ] TJ` (kerning numbers ignored), with the PDF
  *    literal-string escapes (\n \r \t \b \f \( \) \\ \ooo, balanced
  *    unescaped parens, backslash-newline continuation) and `<hex>`
  *    strings; UTF-16BE literals (FE FF BOM) are decoded, everything
  *    else is treated as Latin-1 (PDFDocEncoding's ASCII range)
  *  - Td, TD, T*, Tm line moves and ET close a line, like pdftohtml's
  *    per-line output
  *
  * Returns null when the file bears no extractable text (no valid
  * text-bearing stream) — the caller keeps its bad-content-type path,
  * mirroring the reference freeing empty filter output
  * (XmlDoc.cpp:19073) and indexing nothing.
  */
object GbPdf {

  def toHtml(pdf: Array[Byte]): String = {
    if (pdf == null || pdf.length < 8) return null
    val s = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!s.startsWith("%PDF-")) return null
    val lines = new collection.mutable.ArrayBuffer[String]
    var from = 0
    var sawStream = false
    while (from < s.length) {
      val si = s.indexOf("stream", from)
      if (si < 0) { from = s.length }
      else if (si > 0 && !(s.charAt(si - 1).isWhitespace || s.charAt(si - 1) == '>')) {
        // keyword boundary: `stream` must follow the dict (`>>`) or
        // whitespace — the bare substring also occurs inside
        // `endstream`, names and string text, which would misalign
        // every following segment
        from = si + "stream".length
      } else {
        // dict immediately before the `stream` keyword decides the filter
        val dictStart = s.lastIndexOf("<<", si)
        val dict = if (dictStart >= 0) s.substring(dictStart, si) else ""
        // stream data begins after the CRLF/LF that follows `stream`
        var ds = si + "stream".length
        if (ds < s.length && s.charAt(ds) == '\r') ds += 1
        if (ds < s.length && s.charAt(ds) == '\n') ds += 1
        // prefer a CONSISTENT declared /Length (binary Flate bodies can
        // contain the `endstream` bytes, which would truncate the
        // segment); a wrong or indirect /Length falls back to the scan
        val de = declaredEnd(s, dict, ds).getOrElse(s.indexOf("endstream", ds))
        if (de < 0) { from = s.length }
        else {
          val flate = dict.contains("/FlateDecode")
          val otherFilter = !flate && dict.contains("/Filter")
          if (!otherFilter) {
            val raw = java.util.Arrays.copyOfRange(pdf, ds, de)
            val body = if (flate) inflate(raw) else raw
            if (body != null) {
              sawStream = true
              extractText(new String(body,
                java.nio.charset.StandardCharsets.ISO_8859_1), lines)
            }
          }
          from = de + "endstream".length
        }
      }
    }
    val text = lines.filter(_.nonEmpty)
    if (!sawStream || text.isEmpty) return null
    val body = text.map(l => "<p>" + escapeHtml(l) + "</p>").mkString("\n")
    "<html>\n<body>\n" + body + "\n</body>\n</html>\n"
  }

  def toHtml(pdf: String): String =
    toHtml(if (pdf == null) null
      else pdf.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))

  /** `/Length n` direct value whose end lands exactly on `endstream`
    * (after the optional EOL the spec allows before the keyword);
    * None when absent, indirect, or inconsistent. */
  private val LengthRe = "/Length\\s+(\\d+)(\\s+\\d+\\s+R)?".r
  private def declaredEnd(s: String, dict: String, ds: Int): Option[Int] =
    LengthRe.findFirstMatchIn(dict)
      .filter(_.group(2) == null) // `n 0 R` is an indirect reference
      .flatMap { m =>
      val end = ds.toLong + m.group(1).toLong
      if (end > s.length) None
      else {
        var e = end.toInt
        if (e < s.length && s.charAt(e) == '\r') e += 1
        if (e < s.length && s.charAt(e) == '\n') e += 1
        if (s.startsWith("endstream", e)) Some(e) else None
      }
    }

  /** Hard cap on decompressed stream size: crawled/WARC PDFs are
    * untrusted, and a small FlateDecode bomb otherwise expands to
    * gigabytes in executor memory — the reference is insulated by
    * running conversion in an external pdftohtml process; here the
    * oversized stream is treated as undecodable (null), like any
    * other corrupt input. 256× the compressed size (legit text
    * streams compress ~5-20×) with a 64 MiB floor for tiny inputs. */
  private def inflateCap(rawLen: Int): Long =
    math.max(64L << 20, 256L * rawLen)

  /** Inflate tolerant of a wrong /Length and trailing garbage; null on
    * undecodable or cap-exceeding input. */
  private def inflate(raw: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    val cap = inflateCap(raw.length)
    try {
      inf.setInput(raw)
      val out = new java.io.ByteArrayOutputStream(raw.length * 4 + 64)
      val buf = new Array[Byte](8192)
      var n = inf.inflate(buf)
      while (n > 0 && out.size() <= cap) { out.write(buf, 0, n); n = inf.inflate(buf) }
      if (out.size() > cap) null
      else if (out.size() == 0) null else out.toByteArray
    } catch { case _: Exception => null } finally inf.end()
  }

  /** Walk one decoded content stream, appending shown text lines. */
  private def extractText(cs: String, lines: collection.mutable.ArrayBuffer[String]): Unit = {
    val line = new StringBuilder
    // strings pending an operator (a TJ array holds several)
    val pending = new collection.mutable.ArrayBuffer[String]
    var inText = false
    def flushLine(): Unit = {
      val l = line.result().trim
      if (l.nonEmpty) lines += l
      line.clear()
    }
    def show(): Unit = {
      pending.foreach { t => if (line.nonEmpty) line += ' '; line ++= t }
      pending.clear()
    }
    var i = 0
    val n = cs.length
    while (i < n) {
      val c = cs.charAt(i)
      if (c == '%') { // comment to EOL
        while (i < n && cs.charAt(i) != '\n' && cs.charAt(i) != '\r') i += 1
      } else if (c == '(') {
        val (str, ni) = parseLiteral(cs, i)
        if (inText) pending += str
        i = ni
      } else if (c == '<' && i + 1 < n && cs.charAt(i + 1) != '<') {
        val (str, ni) = parseHex(cs, i)
        if (inText) pending += str
        i = ni
      } else if (c.isLetter || c == '\'' || c == '"' || c == '*') {
        var j = i
        while (j < n && (cs.charAt(j).isLetter || cs.charAt(j) == '\'' ||
          cs.charAt(j) == '"' || cs.charAt(j) == '*')) j += 1
        cs.substring(i, j) match {
          case "BT" => inText = true; pending.clear()
          case "ET" => show(); flushLine(); inText = false
          case "Tj" | "TJ" => show()
          case "'" | "\"" => flushLine(); show()
          case "Td" | "TD" | "T*" | "Tm" => show(); flushLine()
          case _ => pending.clear() // any other op consumes its operands
        }
        i = j
      } else i += 1
    }
    show(); flushLine()
  }

  /** PDF literal string: balanced unescaped parens, \-escapes, octal;
    * returns (decoded, index-after-')'). */
  private def parseLiteral(cs: String, start: Int): (String, Int) = {
    val sb = new StringBuilder
    var depth = 1
    var i = start + 1
    val n = cs.length
    while (i < n && depth > 0) {
      val c = cs.charAt(i)
      if (c == '\\' && i + 1 < n) {
        cs.charAt(i + 1) match {
          case 'n' => sb += '\n'; i += 2
          case 'r' => sb += '\r'; i += 2
          case 't' => sb += '\t'; i += 2
          case 'b' => sb += '\b'; i += 2
          case 'f' => sb += '\f'; i += 2
          case '(' => sb += '('; i += 2
          case ')' => sb += ')'; i += 2
          case '\\' => sb += '\\'; i += 2
          case '\n' => i += 2 // line continuation
          case '\r' =>
            i += 2; if (i < n && cs.charAt(i) == '\n') i += 1
          case d if d >= '0' && d <= '7' =>
            var v = 0; var k = 0; i += 1
            while (k < 3 && i < n && cs.charAt(i) >= '0' && cs.charAt(i) <= '7') {
              v = v * 8 + (cs.charAt(i) - '0'); i += 1; k += 1
            }
            sb += (v & 0xff).toChar
          case other => sb += other; i += 2
        }
      } else if (c == '(') { depth += 1; sb += c; i += 1 }
      else if (c == ')') { depth -= 1; if (depth > 0) sb += c; i += 1 }
      else { sb += c; i += 1 }
    }
    (decodeMaybeUtf16(sb.result()), i)
  }

  /** `<48656c6c6f>` hex string; whitespace allowed, odd digit padded 0. */
  private def parseHex(cs: String, start: Int): (String, Int) = {
    var i = start + 1
    val n = cs.length
    val digits = new StringBuilder
    while (i < n && cs.charAt(i) != '>') {
      val c = cs.charAt(i)
      if (("0123456789abcdefABCDEF").indexOf(c.toInt) >= 0) digits += c
      i += 1
    }
    if (i < n) i += 1 // consume '>'
    if (digits.length % 2 == 1) digits += '0'
    val sb = new StringBuilder
    var k = 0
    while (k + 1 < digits.length + 1 && k + 2 <= digits.length) {
      sb += Integer.parseInt(digits.substring(k, k + 2), 16).toChar
      k += 2
    }
    (decodeMaybeUtf16(sb.result()), i)
  }

  /** UTF-16BE text strings carry a FE FF BOM (PDF 32000 §7.9.2.2). */
  private def decodeMaybeUtf16(raw: String): String = {
    if (raw.length >= 2 && raw.charAt(0) == 0xfe.toChar && raw.charAt(1) == 0xff.toChar) {
      val sb = new StringBuilder
      var i = 2
      while (i + 1 < raw.length) {
        sb += ((raw.charAt(i) << 8) | (raw.charAt(i + 1) & 0xff)).toChar
        i += 2
      }
      sb.result()
    } else raw
  }

  private def escapeHtml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
}
