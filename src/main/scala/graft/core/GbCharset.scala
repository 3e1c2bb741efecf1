package graft.core

import java.nio.charset.{Charset, CodingErrorAction, CharacterCodingException}
import java.nio.{ByteBuffer, CharBuffer}

/** X7: charset detection + conversion to UTF-8 — the reference's
  * `getRawUtf8Content` front half:
  *
  *  - detection ports `getCharsetFast` (`/root/reference/src/
  *    XmlDoc.cpp:18544-18718`): BOM (`ucDetectBOM`, Unicode.cpp), a
  *    claimed-UTF-8 validation scan, the `charset=` / `encoding=` meta
  *    scan (only inside a `<meta`/`<xml`/`<?xml` tag within 500 bytes),
  *    the GB-family / EUC-KR aliases, default-to-UTF-8, and the final
  *    invalid-UTF-8 → Latin-1 fallback (with the 0x80 0x99 apostrophe
  *    exception)
  *  - conversion ports `ucToAny` (Unicode.cpp): ISO-8859-1 is aliased to
  *    WINDOWS-1252, EUC-KR to CP949; a bad byte emits '?' and skips ONE
  *    input byte (iconv EILSEQ branch, ignoreBadChars=-1)
  *  - then `\0` → ' ' and the trailing-bad-utf8 overflow guard
  *    (XmlDoc.cpp:19498-19539)
  *
  * The cp1252 mapping is hand-tabled because glibc iconv treats the five
  * undefined bytes (81 8D 8F 90 9D) as EILSEQ → '?', while Java's
  * windows-1252 decoder maps them to C1 controls.
  */
object GbCharset {

  // charset ids (subset of iana_charset.h mib enums, by name here)
  final val CsUnknown = 0
  final val CsAscii = 1
  final val CsUtf8 = 2
  final val CsLatin1 = 3 // → cp1252
  final val CsGb18030 = 4
  final val CsCp949 = 5
  final val CsUtf16LE = 6
  final val CsUtf16BE = 7
  final val CsUtf32LE = 8
  final val CsUtf32BE = 9
  final val CsOtherSupported = 10 // resolved via javaName
  final val CsUnsupported = -1

  final case class Detected(id: Int, javaName: String)

  /** HTTP-header charset (X17 precedence: header first, then BOM/meta/
    * sniff — XmlDoc::getCharset). Unknown/unsupported → null, which lets
    * detect() fall through to the document-level detection. */
  def fromHttpHeader(name: String): Detected =
    if (name == null || name.isEmpty) null else ianaLookup(name)

  /** get_iana_charset analogue for names seen in meta tags (lowercased,
    * practical subset of iana_charset.cpp's alias table; unknown → null). */
  private[core] def ianaLookup(nameRaw: String): Detected = {
    val name = nameRaw.toLowerCase
    name match {
      case "utf-8" | "utf8" => Detected(CsUtf8, "UTF-8")
      case "us-ascii" | "ascii" | "us" | "ansi_x3.4-1968" => Detected(CsAscii, "US-ASCII")
      case "iso-8859-1" | "latin1" | "l1" | "iso_8859-1" | "iso8859-1" | "cp819" | "iso-ir-100" =>
        Detected(CsLatin1, "ISO-8859-1")
      case "windows-1252" | "cp1252" => Detected(CsOtherSupported, "windows-1252")
      case "gb2312" | "gbk" | "gb18030" | "hz-gb-2312" | "iso-ir-58" | "gb_2312-80" | "csiso58gb231280" =>
        Detected(CsGb18030, "GB18030")
      case "euc-kr" | "ks_c_5601-1987" | "x-windows-949" | "cp949" => Detected(CsCp949, "x-windows-949")
      case "utf-16" | "utf-16le" => Detected(CsUtf16LE, "UTF-16LE")
      case "utf-16be" => Detected(CsUtf16BE, "UTF-16BE")
      case "utf-32le" => Detected(CsUtf32LE, "UTF-32LE")
      case "utf-32be" => Detected(CsUtf32BE, "UTF-32BE")
      case "shift_jis" | "sjis" | "x-sjis" | "shift-jis" | "ms_kanji" => Detected(CsOtherSupported, "Shift_JIS")
      case "euc-jp" | "x-euc-jp" => Detected(CsOtherSupported, "EUC-JP")
      case "big5" | "big-5" | "csbig5" => Detected(CsOtherSupported, "Big5")
      case "koi8-r" | "cskoi8r" => Detected(CsOtherSupported, "KOI8-R")
      case "koi8-u" => Detected(CsOtherSupported, "KOI8-U")
      case "windows-1251" | "cp1251" | "win-1251" => Detected(CsOtherSupported, "windows-1251")
      case "ibm866" | "cp866" | "866" | "csibm866" => Detected(CsOtherSupported, "IBM866")
      case "macintosh" | "mac" | "csmacintosh" => Detected(CsOtherSupported, "x-MacRoman")
      case "tis-620" | "cstis620" | "iso-8859-11" => Detected(CsOtherSupported, "TIS-620")
      // iana_charset.cpp language-name aliases for the 8859 family
      case "latin2" | "l2" | "csisolatin2" => Detected(CsOtherSupported, "ISO-8859-2")
      case "latin3" | "l3" => Detected(CsOtherSupported, "ISO-8859-3")
      case "latin4" | "l4" => Detected(CsOtherSupported, "ISO-8859-4")
      case "cyrillic" | "csisolatincyrillic" => Detected(CsOtherSupported, "ISO-8859-5")
      case "arabic" | "ecma-114" | "csisolatinarabic" => Detected(CsOtherSupported, "ISO-8859-6")
      case "greek" | "greek8" | "ecma-118" | "csisolatingreek" => Detected(CsOtherSupported, "ISO-8859-7")
      case "hebrew" | "csisolatinhebrew" => Detected(CsOtherSupported, "ISO-8859-8")
      case "latin5" | "l5" => Detected(CsOtherSupported, "ISO-8859-9")
      case "latin6" | "l6" => Detected(CsOtherSupported, "ISO-8859-10")
      case n if n.startsWith("iso-8859-") || n.startsWith("iso8859-") =>
        val suffix = n.substring(n.indexOf("8859-") + 5)
        if (suffix.forall(_.isDigit) && suffix.nonEmpty && suffix.toInt >= 2 && suffix.toInt <= 16)
          Detected(CsOtherSupported, s"ISO-8859-$suffix")
        else null
      case n if n.startsWith("windows-125") && n.length == 12 && n.last.isDigit =>
        Detected(CsOtherSupported, s"windows-125${n.last}")
      case _ => null
    }
  }

  @inline private def lowerA(c: Int): Int = if (c >= 'A' && c <= 'Z') c + 32 else c
  @inline private def isWspaceA(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == 0x0b || c == '\f'

  /** ucDetectBOM (Unicode.cpp). */
  private def detectBOM(s: Array[Byte]): Detected = {
    if (s.length < 4) return null
    val b0 = s(0) & 0xff; val b1 = s(1) & 0xff; val b2 = s(2) & 0xff; val b3 = s(3) & 0xff
    if (b0 == 0xfe && b1 == 0xff) Detected(CsUtf16BE, "UTF-16BE")
    else if (b0 == 0xff && b1 == 0xfe) {
      if (b2 == 0 && b3 == 0) Detected(CsUtf32LE, "UTF-32LE") else Detected(CsUtf16LE, "UTF-16LE")
    }
    else if (b0 == 0xef && b1 == 0xbb && b2 == 0xbf) Detected(CsUtf8, "UTF-8")
    else if (b0 == 0 && b1 == 0 && b2 == 0xfe && b3 == 0xff) Detected(CsUtf32BE, "UTF-32BE")
    else null
  }

  /** true iff the buffer validates as UTF-8 by the reference's scan:
    * step by getUtf8CharSize, every landing byte must be a first-byte.
    * `apostropheSlide`: the 0x80 0x99 exception (XmlDoc.cpp:18759). */
  private def validUtf8Scan(s: Array[Byte], apostropheSlide: Boolean): Boolean = {
    var i = 0
    while (i < s.length) {
      val b = s(i) & 0xff
      if ((b & 0xc0) == 0x80) { // !isFirstUtf8Char
        if (apostropheSlide && b == 0x80 && i + 1 < s.length && (s(i + 1) & 0xff) == 0x99) {
          i += 2
        } else return false
      } else i += GbXml.utf8Size(b)
    }
    true
  }

  /** getCharsetFast port; `mimeCharset` from an HTTP header when known. */
  def detect(s: Array[Byte], mimeCharset: Detected = null): Detected = {
    var charset = mimeCharset
    val bom = detectBOM(s)
    if (bom != null && charset == null) charset = bom
    if (charset != null && charset.id == CsUtf8 && !validUtf8Scan(s, apostropheSlide = false))
      charset = null
    // meta charset=/encoding= scan (skipped when already known)
    if (charset == null) {
      var p = 10 // `p += 10` after pstart in the C scan
      val n = s.length
      var done = false
      while (p < n && !done) {
        if (s(p) == '=') {
          val c = lowerA(s(p - 1) & 0xff)
          val isCharset = c == 't' && p >= 7 &&
            lowerA(s(p - 2) & 0xff) == 'e' && lowerA(s(p - 3) & 0xff) == 's' &&
            lowerA(s(p - 4) & 0xff) == 'r' && lowerA(s(p - 5) & 0xff) == 'a' &&
            lowerA(s(p - 6) & 0xff) == 'h' && lowerA(s(p - 7) & 0xff) == 'c'
          val isEncoding = c == 'g' && p >= 8 &&
            lowerA(s(p - 2) & 0xff) == 'n' && lowerA(s(p - 3) & 0xff) == 'i' &&
            lowerA(s(p - 4) & 0xff) == 'd' && lowerA(s(p - 5) & 0xff) == 'o' &&
            lowerA(s(p - 6) & 0xff) == 'c' && lowerA(s(p - 7) & 0xff) == 'n' &&
            lowerA(s(p - 8) & 0xff) == 'e'
          if (isCharset || isEncoding) {
            // must sit inside a <meta / <xml / <?xml tag opened ≤500 back
            var limit = p - 500
            if (limit < 0) limit = 0
            var inTag = false
            var k = p
            var stop = false
            while (k >= limit && !stop) {
              val ck = s(k) & 0xff
              if (ck == '>') stop = true
              else if (ck == '<') {
                @inline def at(off: Int, ch: Char): Boolean =
                  k + off < n && lowerA(s(k + off) & 0xff) == ch
                if ((at(1, 'm') && at(2, 'e') && at(3, 't') && at(4, 'a')) ||
                    (at(1, 'x') && at(2, 'm') && at(3, 'l')) ||
                    (at(1, '?') && at(2, 'x') && at(3, 'm') && at(4, 'l'))) inTag = true
                stop = true
              }
              k -= 1
            }
            if (inTag) {
              var q = p + 1
              if (q < n && s(q) == '\'') q += 1
              if (q < n && s(q) == '"') q += 1
              val vs = q
              var lim2 = q + 50
              if (lim2 > n) lim2 = n
              while (q < lim2 && {
                val cq = s(q) & 0xff
                cq != 0 && cq != '"' && cq != '\'' && !isWspaceA(cq) && cq != '>' &&
                  cq != '<' && cq != '?' && cq != '/' && cq != ';' && cq != '\\'
              }) q += 1
              val name = new String(s, vs, q - vs, java.nio.charset.StandardCharsets.ISO_8859_1)
              val meta = ianaLookup(name)
              if (meta != null) { charset = meta; done = true }
            }
          }
        }
        p += 1
      }
    }
    if (charset == null) charset = Detected(CsUtf8, "UTF-8")
    if (charset.id == CsUtf8 && !validUtf8Scan(s, apostropheSlide = true))
      charset = Detected(CsLatin1, "ISO-8859-1")
    charset
  }

  // cp1252 bytes 0x80-0x9F → codepoints; -1 = undefined. glibc iconv
  // (verified via refharness fixture f71) raises EILSEQ for the five
  // undefined bytes (81 8D 8F 90 9D) → ucToAny emits '?'. Note the
  // SNIFFED-latin1 path is NOT cp1252 at all: get_charset_str returns an
  // underscore spelling for csISOLatin1, so ucToAny's "ISO-8859-1" →
  // WINDOWS-1252 alias (Unicode.cpp) never fires and real pages convert
  // with true latin1 semantics (80-9F → C1 controls → spaces; fixtures
  // f27/f67/f70).
  private val cp1252Hi: Array[Int] = Array(
    0x20ac, -1, 0x201a, 0x0192, 0x201e, 0x2026, 0x2020, 0x2021,
    0x02c6, 0x2030, 0x0160, 0x2039, 0x0152, -1, 0x017d, -1,
    -1, 0x2018, 0x2019, 0x201c, 0x201d, 0x2022, 0x2013, 0x2014,
    0x02dc, 0x2122, 0x0161, 0x203a, 0x0153, -1, 0x017e, 0x0178)

  private def utf8Append(out: GbXml.ByteBuf, cp: Int): Unit = {
    if (cp < 0x80) out += cp.toByte
    else if (cp < 0x800) {
      out += (0xc0 | (cp >> 6)).toByte
      out += (0x80 | (cp & 0x3f)).toByte
    } else {
      out += (0xe0 | (cp >> 12)).toByte
      out += (0x80 | ((cp >> 6) & 0x3f)).toByte
      out += (0x80 | (cp & 0x3f)).toByte
    }
  }

  private def cp1252ToUtf8(s: Array[Byte]): Array[Byte] = {
    val out = new GbXml.ByteBuf(s.length + 16)
    var i = 0
    while (i < s.length) {
      val b = s(i) & 0xff
      val cp = if (b < 0x80) b else if (b < 0xa0) cp1252Hi(b - 0x80) else b
      if (cp < 0) out += '?' else utf8Append(out, cp)
      i += 1
    }
    out.toArray
  }

  /** True ISO-8859-1: byte == codepoint, every byte valid. */
  private def latin1ToUtf8(s: Array[Byte]): Array[Byte] = {
    val out = new GbXml.ByteBuf(s.length + 16)
    var i = 0
    while (i < s.length) { utf8Append(out, s(i) & 0xff); i += 1 }
    out.toArray
  }

  /** Java-decoder conversion mirroring iconv's EILSEQ branch: on a bad
    * byte emit '?', advance ONE byte (ucToAny, Unicode.cpp). */
  private def decodeWith(s: Array[Byte], cs: Charset): Array[Byte] = {
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    val sb = new StringBuilder(s.length)
    val in = ByteBuffer.wrap(s)
    val out = CharBuffer.allocate(4096)
    var eof = false
    while (!eof) {
      val res = dec.decode(in, out, true)
      out.flip(); sb.appendAll(out.array(), 0, out.limit()); out.clear()
      if (res.isError) {
        sb.append('?')
        in.position(math.min(in.position() + 1, in.limit()))
        dec.reset()
      } else if (!res.isOverflow) eof = true
    }
    sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Full step 0 of the extraction chain (getRawUtf8Content). */
  def toUtf8(html: Array[Byte], mimeCharset: Detected = null): Array[Byte] = {
    val d = detect(html, mimeCharset)
    val conv: Array[Byte] =
      if (d.id == CsUtf8 || d.id == CsAscii) html.clone()
      else if (d.javaName == "ISO-8859-1") latin1ToUtf8(html)
      else if (d.javaName == "windows-1252") cp1252ToUtf8(html)
      else {
        try decodeWith(html, Charset.forName(d.javaName))
        catch { case _: Exception => Array.empty[Byte] } // unsupported → empty doc
      }
    // \0 → ' ' (XmlDoc.cpp:19498-19505)
    var i = 0
    while (i < conv.length) { if (conv(i) == 0) conv(i) = ' '; i += 1 }
    // trailing bad-utf8 overflow guard (XmlDoc.cpp:19516-19539)
    var p = 0
    var lastp = -1
    while (p < conv.length) { lastp = p; p += GbXml.utf8Size(conv(p) & 0xff) }
    if (p > conv.length && lastp >= 0) {
      var k = lastp
      while (k < conv.length) { conv(k) = ' '; k += 1 }
    }
    conv
  }
}
