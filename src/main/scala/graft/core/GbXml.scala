package graft.core

import java.nio.charset.StandardCharsets
import scala.collection.mutable.ArrayBuffer

/** HTML tokenizer + visible-text extraction with the semantics of the
  * reference parser. This closes the per-row invariant "byte-identical
  * extracted text per url".
  *
  * Pipeline (same order as `XmlDoc::getUtf8Content`,
  * `/root/reference/src/XmlDoc.cpp:20092-20489`):
  *  1. UTF-8 sanitize: insane lead byte or continuation byte without the
  *     high bit → first byte becomes ' ' (XmlDoc.cpp:20177-20205;
  *     `utf8_sane` table Unicode.h:52-66)
  *  2. `htmlDecode` (fctypes.cpp:1215-1268): entities decoded to UTF-8;
  *     with doSpecial, `&lt;`/`&gt;` → '|' and `&quot;` → '\''; `&nbsp;`
  *     decodes to a PLAIN SPACE (Entities.cpp initEntityTable nbsp hack)
  *  3. unicode normalize pass (XmlDoc.cpp:20316-20484): `N<sup>st</sup>`
  *     ordinal flatten; curly quotes → ascii quote; U+0080-009F → ' ';
  *     soft hyphen / en / em dash → '-'; non-ascii whitespace → ' '
  *  4. tokenize (Xml::set, Xml.cpp:231-660; XmlNode::set,
  *     XmlNode.cpp:212-560): text nodes, tags with the quote-aware
  *     `getTagLen`, `<!--` comments, `<![` conditional comments,
  *     `<![CDATA[`, and the quote/comment-aware `<script>` body scanner
  *  5. `getText` (Xml.cpp:662-840): skip invisible subtrees, breaking
  *     tags emit `\n\n` when the buffer is non-empty, trailing
  *     whitespace stripped
  *
  * Tag properties come from the reference's g_nodes table
  * (XmlNode.cpp:16-163), shipped as resource `graft/gnodes.txt`
  * (index == nodeId; asserted by the reference at XmlNode.cpp:219-227).
  */
object GbXml {

  /** Unboxed growable byte buffer (ArrayBuffer[Byte] boxes every byte —
    * this is the extraction hot path at ~500k pages/sec). */
  final class ByteBuf(initial: Int) {
    private var arr = new Array[Byte](math.max(initial, 16))
    private var len = 0
    @inline def length: Int = len
    @inline def isEmpty: Boolean = len == 0
    @inline def nonEmpty: Boolean = len != 0
    @inline def apply(i: Int): Byte = arr(i)
    @inline def +=(b: Byte): Unit = {
      if (len == arr.length) { val n = new Array[Byte](arr.length * 2); System.arraycopy(arr, 0, n, 0, len); arr = n }
      arr(len) = b; len += 1
    }
    @inline def +=(c: Char): Unit = this += c.toByte
    @inline def dropLast(): Unit = if (len > 0) len -= 1
    def toArray: Array[Byte] = java.util.Arrays.copyOf(arr, len)
    def take(n: Int): Array[Byte] = java.util.Arrays.copyOf(arr, n)
  }

  final case class TagInfo(name: String, hasBackTag: Boolean, isBreaking: Boolean, isVisible: Boolean)

  val tags: Array[TagInfo] = {
    val in = getClass.getResourceAsStream("/graft/gnodes.txt")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().map { l =>
      val f = l.trim.split(' ')
      TagInfo(f(1), f(2) == "1", f(3) == "1", f(4) == "1")
    }.toArray
    finally src.close()
  }
  private val tagIdByName: Map[String, Int] =
    tags.zipWithIndex.map { case (t, i) => t.name.toUpperCase -> i }.toMap

  val TagTextNode = 0
  val TagXmlTag = 1
  val TagScript: Int = tagIdByName("SCRIPT")
  val TagComment: Int = tagIdByName("!--")
  val TagCdata: Int = tagIdByName("![CDATA[")
  val TagScriptText: Int = tagIdByName("SCRIPTTEXT")

  /** One parsed node. Text nodes have nodeId 0. isTag == nodeId > 0
    * (XmlNode.h:27) — so scriptText/CDATA/comment nodes count as tags in
    * getText: their content is never copied, and they emit a break. */
  final case class Node(off: Int, len: Int, nodeId: Int, isFrontTag: Boolean,
                        hasBackTag: Boolean, isBreaking: Boolean, isVisible: Boolean) {
    def isTag: Boolean = nodeId > 0
  }

  // ------------------------------------------------------------ utf8 bits

  /** Unicode.h:36-50 — 0x80-0xBF and 0xF8-0xFF count as 1. */
  @inline def utf8Size(b: Int): Int = {
    if (b < 0x80) 1
    else if (b < 0xc0) 1
    else if (b < 0xe0) 2
    else if (b < 0xf0) 3
    else if (b < 0xf8) 4
    else 1
  }
  /** utf8_sane (Unicode.h:52-66): continuation bytes and 0xF8+ are insane. */
  @inline private def saneLead(b: Int): Boolean = b < 0x80 || (b >= 0xc0 && b < 0xf8)

  @inline private def isWspaceA(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == 0x0b || c == '\f'
  @inline private def isAlnumA(b: Int): Boolean = {
    val c = b & 0xff
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= 192 && c != 215 && c != 247)
  }
  @inline private def isTagNameChar(b: Int): Boolean = {
    val c = b & 0xff
    isAlnumA(c) || c == '-' || c == ':'
  }
  @inline private def lowerA(c: Int): Int = if (c >= 'A' && c <= 'Z') c + 32 else c

  /** step 1: in-place sanitize (XmlDoc.cpp:20187-20218). The loop is
    * `for (; *x; x += size)` in C — it STOPS at the first NUL; bytes
    * after an embedded NUL are left unsanitized (and the normalize
    * pass truncates there anyway, see normalizeAfterDecode). */
  def sanitizeUtf8(x: Array[Byte]): Unit = {
    var i = 0
    while (i < x.length && x(i) != 0) {
      val b = x(i) & 0xff
      if (!saneLead(b)) { x(i) = ' '; i += 1 }
      else {
        val size = utf8Size(b)
        if (size == 1) i += 1
        else if (i + 1 >= x.length || (x(i + 1) & 0x80) == 0) { x(i) = ' '; i += 1 }
        else if (size == 2) i += 2
        else if (i + 2 >= x.length || (x(i + 2) & 0x80) == 0) { x(i) = ' '; i += 1 }
        else if (size == 3) i += 3
        else if (i + 3 >= x.length || (x(i + 3) & 0x80) == 0) { x(i) = ' '; i += 1 }
        else i += 4
      }
    }
  }

  // ------------------------------------------------------------- entities

  /** name (without '&') → codepoint; `nbsp` → ' ' (Entities.cpp:66-380,
    * init hack for 160). Case-sensitive (hash64 of the raw name). */
  lazy val entityTable: Map[String, Int] = {
    val in = getClass.getResourceAsStream("/graft/entities.txt")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().map { l =>
      val f = l.trim.split(' ')
      val cp = f(1).toInt
      f(0) -> (if (cp == 160) ' '.toInt else cp)
    }.toMap
    finally src.close()
  }

  /** getDecimalEntity (Entities.cpp:453-495) — ported byte-for-byte,
    * INCLUDING the reference's digit-indexing bugs: the len==7 branch
    * uses s[5] for both the tens and units place (s[6] ignored) and the
    * len==9 branch uses s[7] twice (s[8] ignored). Out-of-range values
    * (<32 or >0x10FFFF) decode to a SPACE, not to "invalid". */
  private def decimalEntity(s: Array[Byte], off: Int, lenIn: Int): Int = {
    @inline def d(k: Int): Int = (s(off + k) & 0xff) - 48
    var len = lenIn
    if (s(off + len - 1) == ';') len -= 1
    if (len < 3 || len > 9) return 0
    if (s(off) != '&' || s(off + 1) != '#') return 0
    if (d(2) < 0 || d(2) > 9) return 0
    val v: Long = len match {
      case 3 => d(2)
      case 4 => d(2) * 10 + d(3)
      case 5 => d(2) * 100 + d(3) * 10 + d(4)
      case 6 => d(2) * 1000 + d(3) * 100 + d(4) * 10 + d(5)
      case 7 => d(2) * 10000L + d(3) * 1000 + d(4) * 100 + d(5) * 10 + d(5) // sic: s[5] twice
      case 8 => d(2) * 100000L + d(3) * 10000 + d(4) * 1000 + d(5) * 100 + d(6) * 10 + d(7)
      case 9 => d(2) * 1000000L + d(3) * 100000 + d(4) * 10000 + d(5) * 1000 + d(6) * 100 + d(7) * 10 + d(7) // sic: s[7] twice
      case _ => return ' '
    }
    if (v < 32 || v > 0x10ffff) ' ' else v.toInt
  }

  /** getHexadecimalEntity (Entities.cpp:497-546): strict lowercase 'x',
    * 1-6 hex digits; out-of-range decodes to SPACE. */
  private def hexEntity(s: Array[Byte], off: Int, lenIn: Int): Int = {
    var len = lenIn
    if (s(off + len - 1) == ';') len -= 1
    if (len < 4 || len > 9) return 0
    if (s(off) != '&' || s(off + 1) != '#' || s(off + 2) != 'x') return 0
    // htob (fctypes.h:266-271): non-hex chars map to 0; is_hex is only
    // checked for s[3]
    @inline def hex(k: Int): Int = {
      val c = lowerA(s(off + k) & 0xff)
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'a' && c <= 'f') c - 'a' + 10
      else 0
    }
    val c3 = lowerA(s(off + 3) & 0xff)
    if (!((c3 >= '0' && c3 <= '9') || (c3 >= 'a' && c3 <= 'f'))) return 0
    var v = 0L
    var i = 3
    while (i < len) {
      v = (v << 4) + hex(i)
      i += 1
    }
    if (v < 32 || v > 0x10ffff) ' ' else v.toInt
  }

  /** getEntity_a (Entities.cpp:18-47): returns (skipLen, codepoint) or null. */
  def parseEntity(s: Array[Byte], off: Int): (Int, Int) = {
    if (s(off) != '&') return null
    val maxLen = s.length - off
    var len = 1
    if (len < maxLen && s(off + len) == '#') len += 1
    while (len < maxLen && len < 9 && isAlnumA(s(off + len))) len += 1
    if (len < maxLen && s(off + len) == ';') len += 1
    if (len > 10 || len < 3) return null
    var cp = 0
    if (s(off + 1) == '#') {
      cp = if (len >= 3 && s(off + 2) == 'x') hexEntity(s, off, len)
           else decimalEntity(s, off, len)
    } else {
      var bodyLen = len
      if (s(off + bodyLen - 1) == ';') bodyLen -= 1
      val name = new String(s, off + 1, bodyLen - 1, StandardCharsets.ISO_8859_1)
      cp = entityTable.getOrElse(name, 0)
    }
    if (cp == 0) null else (len, cp)
  }

  private def utf8Encode(cp: Int, out: ByteBuf): Unit = {
    if (cp < 0x80) out += cp.toByte
    else if (cp < 0x800) {
      out += (0xc0 | (cp >> 6)).toByte
      out += (0x80 | (cp & 0x3f)).toByte
    } else if (cp < 0x10000) {
      out += (0xe0 | (cp >> 12)).toByte
      out += (0x80 | ((cp >> 6) & 0x3f)).toByte
      out += (0x80 | (cp & 0x3f)).toByte
    } else {
      out += (0xf0 | (cp >> 18)).toByte
      out += (0x80 | ((cp >> 12) & 0x3f)).toByte
      out += (0x80 | ((cp >> 6) & 0x3f)).toByte
      out += (0x80 | (cp & 0x3f)).toByte
    }
  }

  /** step 2: htmlDecode (fctypes.cpp:1215-1268). */
  def htmlDecode(src: Array[Byte], doSpecial: Boolean): Array[Byte] = {
    val out = new ByteBuf(src.length)
    var i = 0
    while (i < src.length) {
      val b = src(i) & 0xff
      if (b != '&') {
        val size = utf8Size(b)
        var k = 0
        while (k < size && i + k < src.length) { out += src(i + k); k += 1 }
        i += size
      } else {
        val e = parseEntity(src, i)
        if (e == null) { out += src(i); i += 1 }
        else {
          val (skip, cp) = e
          if (doSpecial && (cp == '<' || cp == '>')) out += '|'
          else if (doSpecial && cp == '"') out += '\''
          else utf8Encode(cp, out)
          i += skip
        }
      }
    }
    out.toArray
  }

  /** Unicode whitespace for the normalize pass — the EXACT codepoint set
    * of the reference's is_wspace_utf8 (fctypes.h:470 → is_wspace_uc over
    * ucdata/properties.dat), extracted by probing the compiled reference
    * (refharness). Note: U+FEFF (BOM) and U+200B are NOT whitespace. */
  private def isUnicodeSpaceCp(cp: Int): Boolean =
    cp == 0x85 || cp == 0xa0 || cp == 0x1680 || cp == 0x180e ||
      (cp >= 0x2000 && cp <= 0x200a) || cp == 0x2028 || cp == 0x2029 ||
      cp == 0x202f || cp == 0x205f || cp == 0x3000

  private def decodeCp(s: Array[Byte], off: Int, size: Int): Int = size match {
    case 1 => s(off) & 0xff
    case 2 => ((s(off) & 0x1f) << 6) | (s(off + 1) & 0x3f)
    case 3 => ((s(off) & 0x0f) << 12) | ((s(off + 1) & 0x3f) << 6) | (s(off + 2) & 0x3f)
    case _ => ((s(off) & 0x07) << 18) | ((s(off + 1) & 0x3f) << 12) | ((s(off + 2) & 0x3f) << 6) | (s(off + 3) & 0x3f)
  }

  /** step 3: the post-decode transform loop (XmlDoc.cpp:20335-20474).
    * The C loop is `for (; *p; p += size)` — an embedded NUL ends it,
    * TRUNCATING the content there (size_utf8Content = dst - content). */
  def normalizeAfterDecode(src: Array[Byte]): Array[Byte] = {
    val out = new ByteBuf(src.length)
    @inline def b(i: Int): Int = if (i < src.length) src(i) & 0xff else 0
    var i = 0
    while (i < src.length && src(i) != 0) {
      val c0 = b(i)
      val size = utf8Size(c0)
      if (size == 1 && c0 != '<') { out += src(i); i += 1 }
      else if (c0 == '<' && lowerA(b(i + 1)) == 's' && lowerA(b(i + 2)) == 'u' && lowerA(b(i + 3)) == 'p') {
        // ordinal flatten: digit <sup> st|nd|rd|th </sup> (XmlDoc.cpp:20345-20412)
        out += '<'
        i += 1
        // find last non-space in out
        var matched = false
        var pn = out.length - 2 // char before the '<'
        while (pn >= 0 && isWspaceA(out(pn) & 0xff)) pn -= 1
        if (pn >= 0 && (out(pn) & 0xff) >= '0' && (out(pn) & 0xff) <= '9') {
          var s2 = i + 3 // after "sup"
          while (s2 < src.length && b(s2) != '>') s2 += 1
          if (s2 < src.length) {
            s2 += 1
            while (s2 < src.length && isWspaceA(b(s2))) s2 += 1
            val suf0 = lowerA(b(s2)); val suf1 = lowerA(b(s2 + 1))
            val gotIt = (suf0 == 's' && suf1 == 't') || (suf0 == 'n' && suf1 == 'd') ||
              (suf0 == 'r' && suf1 == 'd') || (suf0 == 't' && suf1 == 'h')
            if (gotIt && s2 + 1 < src.length) {
              val sufOff = s2
              var s3 = s2 + 2
              while (s3 < src.length && isWspaceA(b(s3))) s3 += 1
              if (s3 + 5 < src.length && b(s3) == '<' && b(s3 + 1) == '/' &&
                  lowerA(b(s3 + 2)) == 's' && lowerA(b(s3 + 3)) == 'u' &&
                  lowerA(b(s3 + 4)) == 'p' && b(s3 + 5) == '>') {
                // success: drop the '<', emit lowercase suffix, jump past </sup>
                out.dropLast()
                out += lowerA(b(sufOff)).toByte
                out += lowerA(b(sufOff + 1)).toByte
                i = s3 + 6
                matched = true
              }
            }
          }
        }
        if (!matched) { /* '<' already copied; continue from i (after '<') */ }
      } else if (size == 1) { out += src(i); i += 1 } // plain '<' not sup
      else {
        val c1 = b(i + 1); val c2 = b(i + 2)
        if (c0 == 0xe2 && c1 == 0x80 && (c2 == 0x99 || c2 == 0x98 || c2 == 0x9b)) { out += '\''; i += size }
        else if (c0 == 0xc2 && c1 >= 0x80 && c1 <= 0x9f) { out += ' '; i += size }
        else if (c0 == 0xe2 && c1 == 0x80 && c2 == 0x9c) { out += '"'; i += size }
        else if (c0 == 0xe2 && c1 == 0x80 && c2 == 0x9d) { out += '"'; i += size }
        else if (c0 == 0xc2 && c1 == 0xad) { out += '-'; i += size }
        else if (c0 == 0xe2 && c1 == 0x80 && (c2 == 0x93 || c2 == 0x94)) { out += '-'; i += size }
        else if (isUnicodeSpaceCp(decodeCp(src, i, size))) { out += ' '; i += size }
        else {
          var k = 0
          while (k < size && i + k < src.length) { out += src(i + k); k += 1 }
          i += size
        }
      }
    }
    out.toArray
  }

  // ------------------------------------------------------------ tokenizer

  /** isTagStart (XmlNode.h:101-140). */
  private def isTagStart(s: Array[Byte], i: Int): Boolean = {
    @inline def b(k: Int): Int = if (k < s.length) s(k) & 0xff else 0
    if (b(i) != '<') return false
    if (isAlnumA(b(i + 1))) return true
    if (b(i + 1) == '/') return isAlnumA(b(i + 2)) || b(i + 2) == '>'
    if (b(i + 1) == '?') return isAlnumA(b(i + 2))
    if (b(i + 1) == '!') {
      if (isAlnumA(b(i + 2))) return true
      if (b(i + 2) == '[' && b(i + 3) == 'C' && b(i + 4) == 'D' && b(i + 5) == 'A' &&
          b(i + 6) == 'T' && b(i + 7) == 'A' && b(i + 8) == '[') return true
      if (b(i + 2) == '-' && b(i + 3) == '-') return true
      if (b(i + 2) == '[') return true // <![if ...]> conditional comment
      false
    } else false
  }

  /** getTagLen (XmlNode.cpp:337-430) with the quote heuristics. */
  private def tagLen(s: Array[Byte], off: Int): Int = {
    @inline def b(k: Int): Int = if (off + k < s.length) s(off + k) & 0xff else 0
    val n = s.length - off
    var i = 1
    var break = false
    while (i < n && !break) {
      val c = b(i)
      if (c != '<' && c != '>' && c != '"' && c != '\'') i += 1
      else if (c == '<' || c == '>') break = true
      else if (c == '"') {
        // only treat as a quoted attr if '=' precedes (skipping spaces)
        var k = i - 1
        while (k > 1 && isWspaceA(b(k))) k -= 1
        if (k <= 1 || b(k) != '=') i += 1
        else {
          i += 1
          var stop = false
          while (i < n && b(i) != '"' && !stop) {
            if (b(i) == '>' && b(i - 1) == '"') { i -= 1; stop = true }
            else if (b(i) == '>' && b(i - 1) == ' ' && b(i - 2) == '"') { i -= 1; stop = true }
            else i += 1
          }
          if (i >= n) return i // abrupt end
          if (!stop) {
            if (b(i + 1) == '"') i += 1
            i += 1
          }
        }
      } else { // '\''
        if (b(i - 1) != '=' && !isWspaceA(b(i - 1))) i += 1
        else {
          i += 1
          while (i < n && b(i) != '\'') i += 1
          if (i < n) i += 1
        }
      }
    }
    if (i < n && b(i) == '>') i + 1
    else {
      // no closure outside quotes: be stringent
      var k = 1
      while (off + k < s.length && b(k) != '>' && b(k) != '<') k += 1
      k
    }
  }

  /** Xml::set (Xml.cpp:231-660), html mode, version 121 (newVersion). */
  def parse(buf: Array[Byte]): ArrayBuffer[Node] = {
    val nodes = new ArrayBuffer[Node](64)
    @inline def b(k: Int): Int = if (k < buf.length) buf(k) & 0xff else 0
    var i = 0
    val n = buf.length
    while (i < n) {
      var nodeId = TagTextNode
      var isFront = true
      var hasBack = false
      var breaking = false
      var visible = true
      var len = 0
      if (b(i) == '<' && b(i + 1) == '!' && b(i + 2) == '[' && b(i + 3) == 'C' && b(i + 4) == 'D' &&
          b(i + 5) == 'A' && b(i + 6) == 'T' && b(i + 7) == 'A' && b(i + 8) == '[') {
        // CDATA (XmlNode.cpp:491-530)
        nodeId = TagCdata; breaking = true; visible = true; hasBack = false
        var k = i + 8
        var stop = false
        while (k < n && !stop) {
          if (b(k) == ']' && b(k + 1) == ']' && b(k + 2) == '>') { k += 3; stop = true }
          else k += 1
        }
        len = k - i
      } else if (b(i) != '<' || !isTagStart(buf, i)) {
        // text node
        var k = i
        do { k += 1 } while (k < n && !(b(k) == '<' && isTagStart(buf, k)))
        if (i + 1 > k) len = 1 else len = k - i
        nodeId = TagTextNode; visible = true; breaking = false
      } else if (b(i + 1) == '!' && b(i + 2) == '-' && b(i + 3) == '-') {
        // comment (XmlNode.cpp:430-457)
        nodeId = TagComment; breaking = true; visible = true
        var k = i + 3
        var stop = false
        while (k < n && !stop) {
          if (b(k) == '>' && b(k - 1) == '-' && b(k - 2) == '-') stop = true
          else k += 1
        }
        if (k < n) k += 1
        len = k - i
      } else if (b(i + 1) == '!' && b(i + 2) == '[') {
        // <![if ...]> conditional comment (XmlNode.cpp:460-488)
        nodeId = TagComment; breaking = false; visible = false
        var k = i + 2
        var stop = false
        while (k < n && !stop) {
          if (b(k) == '>' && (b(k - 1) == ']' || (b(k - 1) == '-' && b(k - 2) == '-'))) stop = true
          else k += 1
        }
        if (k < n) k += 1
        len = k - i
      } else {
        // regular tag
        len = tagLen(buf, i)
        var tn = i + 1
        if (!isAlnumA(b(tn))) tn += 1
        var te = tn
        while (te < i + len && isTagNameChar(b(te))) te += 1
        val name = new String(buf, tn, te - tn, StandardCharsets.ISO_8859_1).toUpperCase
        nodeId = tagIdByName.getOrElse(name, TagXmlTag)
        val info = tags(nodeId)
        hasBack = info.hasBackTag
        breaking = info.isBreaking
        visible = info.isVisible
        isFront = b(i + 1) != '/'
        // self-closing (XmlNode.cpp:330-333)
        if (len >= 2 && (b(i + len - 2) == '/' || b(i + len - 2) == '?')) hasBack = false
      }
      nodes += Node(i, len, nodeId, isFront, hasBack, breaking, visible)
      i += len
      // script body scanning (Xml.cpp:389-560, version>120)
      if (nodeId == TagScript && isFront) {
        val pstart = i
        var p = i
        var inDoubles = false; var inSingles = false
        var inC1 = false; var inC2 = false; var inC3 = false; var inC4 = false
        var escaped = false
        var stop = false
        while (p < n && !stop) {
          val c = b(p)
          if (c == '\n' || c == 13) inC1 = false
          if (c == '\\') { escaped = !escaped; p += 1 }
          else {
            if (c == '<' && b(p + 1) == '!' && b(p + 2) == '-' && !inSingles && !inDoubles && !inC1 && !inC2 && !inC4)
              inC3 = true // note: C checks p[2]=='-' twice (p[3] unchecked)
            if (c == '-' && b(p + 1) == '-' && b(p + 2) == '>' && inC3) inC3 = false
            if (c == '/' && b(p + 1) == '/' && !inSingles && !inDoubles && !inC2 && !inC3 && !inC4) inC1 = true
            if (c == '/' && b(p + 1) == '*' && !inSingles && !inDoubles && !inC1 && !inC3 && !inC4) inC2 = true
            if (c == '<' && b(p + 1) == '!' && b(p + 2) == '[' && b(p + 3) == 'C' && b(p + 4) == 'D' &&
                b(p + 5) == 'A' && b(p + 6) == 'T' && b(p + 7) == 'A' && b(p + 8) == '[') inC4 = true
            if (c == ']' && b(p + 1) == ']' && b(p + 2) == '>') inC4 = false
            if (c == '*' && b(p + 1) == '/' && !inC4) inC2 = false
            if (inC1) { escaped = false }
            if (inC2 || inC3 || inC4) { escaped = false; p += 1 }
            else {
              if (c == '"' && !escaped && !inSingles && !inC1) inDoubles = !inDoubles
              if (c == '\'' && !escaped && !inDoubles && !inC1) inSingles = !inSingles
              escaped = false
              if (c == '<') {
                if (b(p + 1) == '/' &&
                    lowerA(b(p + 2)) == 's' && lowerA(b(p + 3)) == 'c' && lowerA(b(p + 4)) == 'r' &&
                    lowerA(b(p + 5)) == 'i' && lowerA(b(p + 6)) == 'p' && lowerA(b(p + 7)) == 't') {
                  if (inDoubles || inSingles) p += 1 else stop = true
                } else if (b(p + 1) == '/' &&
                    lowerA(b(p + 2)) == 'g' && lowerA(b(p + 3)) == 'b' && lowerA(b(p + 4)) == 'f' &&
                    lowerA(b(p + 5)) == 'r' && lowerA(b(p + 6)) == 'a' && lowerA(b(p + 7)) == 'm') {
                  // </gbframe> stops script text UNCONDITIONALLY — even
                  // inside quotes (Xml.cpp:590-596; the iframe-expansion
                  // splice wraps js frames whose quoting may be broken)
                  stop = true
                } else if (lowerA(b(p + 1)) == 's' && lowerA(b(p + 2)) == 'c' && lowerA(b(p + 3)) == 'r' &&
                           lowerA(b(p + 4)) == 'i' && lowerA(b(p + 5)) == 'p' && lowerA(b(p + 6)) == 't') {
                  if (inDoubles || inSingles) p += 1 else stop = true
                } else p += 1
              } else p += 1
            }
          }
        }
        if (p - pstart > 0) {
          // scripttext nodes are non-breaking and invisible
          // (Xml.cpp:627-636: m_isBreaking=false, m_isVisible=false)
          nodes += Node(pstart, p - pstart, TagScriptText, isFrontTag = true,
            hasBackTag = false, isBreaking = false, isVisible = false)
        }
        i = p
      }
    }
    nodes
  }

  private lazy val TagRdf = tagIdByName("RDF:RDF")
  private lazy val TagRss = tagIdByName("RSS")
  private lazy val TagFeed = tagIdByName("FEED")
  private lazy val TagChannel = tagIdByName("CHANNEL")
  private lazy val TagItem = tagIdByName("ITEM")
  private lazy val TagEntry: Int = tagIdByName.getOrElse("ENTRY", -1)

  /** Xml::isRSSFeed (Xml.cpp:1012-1050): 0 = not a feed; 1 = rss/rdf;
    * 6 = atom. An embedded rdf:RDF additionally needs a channel/item/
    * entry node. */
  def isRSSFeed(nodes: ArrayBuffer[Node]): Int = {
    var tag = 0
    var tpe = 0
    var i = 0
    while (i < nodes.length && tag == 0) {
      val id = nodes(i).nodeId
      if (id != TagTextNode) {
        if (id == TagRdf) { tag = TagRdf; tpe = 1 }
        if (id == TagRss) { tag = TagRss; tpe = 1 }
        if (id == TagFeed) { tag = TagFeed; tpe = 6 }
      }
      i += 1
    }
    if (tag == 0) return 0
    if (tag != TagRdf) return tpe
    i = 0
    while (i < nodes.length) {
      val id = nodes(i).nodeId
      if (id == TagChannel || id == TagItem || (TagEntry >= 0 && id == TagEntry)) return tpe
      i += 1
    }
    0
  }

  // -------------------------------------------------------------- getText

  /** Xml::getText (Xml.cpp:662-840), includeTags=false. Returns raw bytes. */
  def getTextBytes(buf: Array[Byte], nodes: ArrayBuffer[Node], filterSpaces: Boolean = false): Array[Byte] = {
    val dst = new ByteBuf(buf.length / 4 + 16)
    var notVisible = 0
    var idx = 0
    while (idx < nodes.length) {
      val nd = nodes(idx)
      // invisible-subtree tracking
      if (nd.isTag && !nd.isVisible && nd.hasBackTag) {
        if (nd.isFrontTag) notVisible += 1
        else { notVisible -= 1; if (notVisible < 0) notVisible = 0 }
      }
      if (nd.isTag) {
        if (dst.nonEmpty && nd.isBreaking) {
          if (!filterSpaces) { dst += '\n'; dst += '\n' }
          else {
            // ".." logic (Xml.cpp:738-768) — only used by summaries
            if (dst.length >= 2) {
              val prev = dst(dst.length - 1) & 0xff
              val prevIsPunct = !isAlnumA(prev) && prev > ' ' // approx is_punct_a
              if (!prevIsPunct) { dst += '.'; dst += '.' }
            }
          }
        }
      } else if (notVisible == 0) {
        // copy text node
        var src = nd.off
        val srcEnd = nd.off + nd.len
        while (src < srcEnd) {
          val cs = utf8Size(buf(src) & 0xff)
          var skip = false
          if (filterSpaces && isWspaceA(buf(src) & 0xff)) {
            if (dst.isEmpty) skip = true
            else if ((dst(dst.length - 1) & 0xff) == ' ') skip = true
          }
          if (!skip) {
            var k = 0
            while (k < cs && src + k < buf.length) { dst += buf(src + k); k += 1 }
          }
          src += cs
        }
      }
      idx += 1
    }
    // strip trailing ascii whitespace
    var end = dst.length
    while (end > 0 && isWspaceA(dst(end - 1) & 0xff)) end -= 1
    dst.take(end)
  }

  /** The full X7→X10 pipeline over raw page bytes: charset detect +
    * convert to UTF-8 (GbCharset, step 0 = getRawUtf8Content), then the
    * getUtf8Content chain. */
  def extractTextBytes(html: Array[Byte]): Array[Byte] = {
    val work = GbCharset.toUtf8(html)
    sanitizeUtf8(work)
    val decoded = htmlDecode(work, doSpecial = true)
    val norm = normalizeAfterDecode(decoded)
    getTextBytes(norm, parse(norm))
  }

  def extractText(html: Array[Byte]): String =
    new String(extractTextBytes(html), StandardCharsets.UTF_8)
  def extractText(html: String): String = extractText(html.getBytes(StandardCharsets.UTF_8))
}
