package graft.core

import java.nio.charset.StandardCharsets

/** URL canonicalizer + classifiers with the semantics of the reference
  * engine's `Url::set` (`/root/reference/src/Url.cpp:140-839`), TLD split
  * (`/root/reference/src/Domains.cpp:7-93`), and classifier methods
  * (`/root/reference/src/Url.cpp`: isRoot:867, isSimpleSubdomain:893,
  * isPingServer:2286, hasMediaExtension:2469, isWarc:1610, isArc:1647).
  *
  * This is a from-scratch Scala implementation of the documented behavior:
  *  - leading junk skip; whitespace/non-ascii truncation; `http://http://`
  *    collapse (Url.cpp:157-335)
  *  - non-ASCII hosts → RFC 3492 punycode labels (`xn--`), non-ASCII path
  *    bytes → `%XX` (uppercase) encoding (Url.cpp:163-318)
  *  - `#fragment` excluded from the canonical url unless `#!` (hash-bang),
  *    with the reference's quirk that a fragment AFTER a `?query` is kept
  *    (Url.cpp:336-352, 728-736, 755-775)
  *  - optional session-id strip (~25 patterns) and common-filename strip
  *    (both default-OFF at the reference's spider call sites,
  *    XmlDoc.cpp:1977, Spider.cpp:14958) (Url.cpp:362-513, 517-558)
  *  - `\`→`/`; lowercase scheme + host; trailing-dot host trim; scheme
  *    defaulting to `http://`; default-port elision 80/443/21
  *    (Url.cpp:561-702)
  *  - path `//`, `/./`, `/../` collapse, `;?`→`?`; `&&`→`&` in query
  *    (Url.cpp:737-775)
  *  - host/domain/TLD split against the reference's two-label TLD table
  *    (resource `graft/tlds.txt`; any all-alpha single label is a TLD,
  *    Domains.cpp:97-110)
  *
  * All offsets index into the canonical ASCII `url` string.
  */
final case class GbUrl(
    url: String,
    schemeLen: Int,
    hostOff: Int, hostLen: Int,
    domOff: Int, domLen: Int,
    tldOff: Int, tldLen: Int,
    port: Int, defPort: Int,
    pathOff: Int, pathLen: Int,
    queryOff: Int, queryLen: Int, // offset of char AFTER '?'; -1 if none
    ip: Int
) {
  def isValid: Boolean = url.nonEmpty && hostLen > 0
  def scheme: String = url.substring(0, schemeLen)
  def host: String = url.substring(hostOff, hostOff + hostLen)
  def domain: String = if (domLen > 0) url.substring(domOff, domOff + domLen) else ""
  def tld: String = if (tldLen > 0) url.substring(tldOff, tldOff + tldLen) else ""
  /** hostname minus domain minus the joining dot ("www." → "www"). */
  def subdomainPrefixLen: Int = if (domLen > 0) hostLen - domLen else hostLen
  def path: String = url.substring(pathOff, pathOff + pathLen)
  def hasQuery: Boolean = queryOff >= 0
  def query: String = if (hasQuery) url.substring(queryOff, queryOff + queryLen) else ""

  /** filename = path chars after last '/' (Url.cpp:777-780). */
  def filename: String = {
    var f = 0
    while (f < pathLen && url.charAt(pathOff + pathLen - 1 - f) != '/') f += 1
    url.substring(pathOff + pathLen - f, pathOff + pathLen)
  }

  /** extension = trailing alnum run of path preceded by '.' (Url.cpp:781-785). */
  def extension: String = {
    var e = 0
    while (e < pathLen && GbUrl.isAlnum(url.charAt(pathOff + pathLen - 1 - e))) e += 1
    if (e < pathLen && url.charAt(pathOff + pathLen - 1 - e) == '.') url.substring(pathOff + pathLen - e, pathOff + pathLen)
    else ""
  }

  def isCgi: Boolean = hasQuery

  /** Url.cpp:867-880: path is exactly "/" and no query. */
  def isRoot: Boolean = pathLen == 1 && url.charAt(pathOff) == '/' && !hasQuery

  /** Url.cpp:893-900: host == domain or host == "www." + domain. */
  def isSimpleSubdomain: Boolean = {
    if (domLen == 0) false
    else if (hostOff == domOff && hostLen == domLen) true
    else hostLen == domLen + 4 && url.regionMatches(true, hostOff, "www.", 0, 4)
  }

  def isWWWSubdomain: Boolean =
    domLen > 0 && hostLen == domLen + 4 && url.startsWith("www.", hostOff)

  /** Url.cpp:2286-2294. */
  def isPingServer: Boolean =
    url == "http://rpc.weblogs.com/int16_tChanges.xml" ||
      url == "http://127.0.0.1:8000/int16_tChanges.xml"

  /** Url.cpp:2469-2553 — prefix match on the extension: checks only the
    * first 3 (or 4) chars, so ".jpgx" also matches. The chars after the
    * extension inside `url` (query or end) participate exactly as the C
    * code reads past the extension into `m_url`. */
  def hasMediaExtension: Boolean = {
    val e = extension
    if (e.isEmpty) false
    else {
      val tail = url.substring(pathOff + pathLen - e.length).toLowerCase
      GbUrl.media3.exists(tail.startsWith) || GbUrl.media4.exists(tail.startsWith)
    }
  }

  /** X16: Url::isBadExtension (Url.cpp:1568-1608) — the static list
    * (resource graft/badexts.txt with the TR version each entry was
    * banned at: everything through "zip" at 50; wmv/wma/ogg at 73),
    * .warc/.arc exempt. */
  def isBadExtension(version: Int = 121): Boolean = {
    val e = extension.toLowerCase
    if (e.isEmpty) false
    else GbUrl.badExtVersion.get(e) match {
      case Some(v) if v <= version => !isWarc && !isArc
      case _ => false
    }
  }

  /** X16: Url::isLinkLoop (Url.cpp:1674-1730) — repeated path
    * components: any component 3+ times, or two doubled components
    * back-to-back. */
  def isLinkLoop: Boolean = {
    val counts = new java.util.HashMap[String, Integer]()
    var count = 0
    var components = 0
    var prevWasDouble = false
    var last = -1
    var s = pathOff
    val send = url.length
    while (s < send) {
      if (url.charAt(s) == '/') {
        if (last < 0) last = s
        else {
          if (components >= 50) return false
          components += 1
          val comp = url.substring(last, s)
          val old = counts.get(comp)
          if (old == null) { counts.put(comp, 1); last = s }
          else {
            val v = old + 1
            if (v >= 3) return true
            if (v == 2) count += 1
            if (count >= 2 && prevWasDouble) return true
            prevWasDouble = v == 2
            counts.put(comp, v)
            last = s
          }
        }
      }
      s += 1
    }
    false
  }

  def isWarc: Boolean = {
    val u = url
    u.endsWith(".warc") || u.endsWith(".warc.gz")
  }
  def isArc: Boolean = {
    val u = url
    u.endsWith(".arc") || u.endsWith(".arc.gz")
  }

  def hostHash32: Int = GbHash.hash32(host)
  def domHash32: Int = GbHash.hash32(domain)
  def uh48: Long = GbHash.uh48(url)
  def probableDocId: Long = GbHash.probableDocId(url, domain)
  def fakeFirstIp: Int = GbHash.fakeFirstIp(url, domain)
}

object GbUrl {
  val MaxUrlLen = 2083 // Url.h:9

  private[core] val media3 = Seq("css", "mpg", "png", "wmv", "wav", "jpg", "gif", "ico", "mp3", "mp4", "mov", "avi")
  private[core] val media4 = Seq("mpeg", "jpeg")

  /** Dotted TLD table (Domains.cpp:116-816), lowercase. Single all-alpha
    * labels are always TLDs (Domains.cpp:101-107). */
  /** extension → TR version it was banned at (Url.cpp s_badExtensions). */
  lazy val badExtVersion: Map[String, Int] = {
    val in = getClass.getResourceAsStream("/graft/badexts.txt")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().map { l => val f = l.trim.split(' '); f(0) -> f(1).toInt }.toMap
    finally src.close()
  }

  lazy val dottedTlds: Set[String] = {
    val in = getClass.getResourceAsStream("/graft/tlds.txt")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().map(_.trim.toLowerCase).filter(_.nonEmpty).toSet
    finally src.close()
  }

  @inline def isAlnum(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  @inline private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  @inline private def isWspace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == 0x0b || c == '\f'
  @inline private def lower(c: Char): Char = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  val empty: GbUrl = GbUrl("", 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, -1, 0, 0)

  def parse(raw: String): GbUrl = parse(raw, addWWW = false)

  def parse(raw: String, addWWW: Boolean, stripSessionId: Boolean = false,
            stripPound: Boolean = false, stripCommonFile: Boolean = false): GbUrl =
    setFrom(raw.getBytes(StandardCharsets.UTF_8), addWWW, stripSessionId, stripPound, stripCommonFile)

  /** Byte-preserving entry point: `raw` is a Latin-1 CARRIER string
    * (char i == original byte i, as produced by `new String(bytes,
    * ISO_8859_1)`). The reference's Url::set consumes raw bytes
    * (Url.cpp:158+); round-tripping a latin1-decoded href through
    * getBytes(UTF_8) double-encodes non-ASCII (C3 A9 → C3 83 C2 A9),
    * diverging the canonical url, punycode host, and uh48. */
  def parseLatin1(raw: String, addWWW: Boolean = false, stripSessionId: Boolean = false,
                  stripPound: Boolean = false, stripCommonFile: Boolean = false): GbUrl =
    setFrom(raw.getBytes(StandardCharsets.ISO_8859_1), addWWW, stripSessionId, stripPound, stripCommonFile)

  /** Relative resolution against a base (Url.cpp:47-135). Note: absolute
    * hrefs get stripCommonFile=false regardless (Url.cpp:110-114).
    * `latin1`: treat `href` as a Latin-1 byte carrier (see parseLatin1);
    * safe to mix with `base.url`, which is canonical ASCII. */
  def parseRel(base: GbUrl, href: String, addWWW: Boolean = false,
               stripSessionId: Boolean = false, stripPound: Boolean = false,
               stripCommonFile: Boolean = false, latin1: Boolean = false): GbUrl = {
    def parseEnc(s: String, aw: Boolean, ssi: Boolean, sp: Boolean, scf: Boolean): GbUrl =
      if (latin1) parseLatin1(s, aw, ssi, sp, scf) else parse(s, aw, ssi, sp, scf)
    if (!base.isValid) return parseEnc(href, addWWW, stripSessionId, stripPound, stripCommonFile)
    var blen = base.url.length
    if (base.hasQuery) blen -= (base.queryLen + 1)
    // strip filename from base unless it ends in '/'
    if (blen > 0 && base.url.charAt(blen - 1) != '/')
      while (blen > 0 && base.url.charAt(blen - 1) != '/') blen -= 1
    // "?page=3" keeps the base filename
    var s = href
    if (s.nonEmpty && s.charAt(0) == '?') {
      while (blen < base.url.length && base.url.charAt(blen) != '?') blen += 1
    }
    if (blen == 0 && s.isEmpty) return empty
    // skip leading whitespace of s
    s = s.dropWhile(isWspace)
    // absolute?
    var i = 0
    while (i < s.length && (isAlnum(s.charAt(i)) || s.charAt(i) == '-')) i += 1
    var isAbsolute =
      (i + 2 < s.length && s.charAt(i) == ':' && (s.charAt(i + 1) == '/' || s.charAt(i + 1) == '\\'))
    if (!isAbsolute && s.length > 1 && ((s.charAt(0) == '/' && s.charAt(1) == '/') || (s.charAt(0) == '\\' && s.charAt(1) == '\\')))
      isAbsolute = true
    if (blen == 0 || isAbsolute)
      return parseEnc(s, addWWW, stripSessionId, stripPound, scf = false)
    // s starting with '/' → keep only scheme://host[:port]
    if (s.nonEmpty && s.charAt(0) == '/') blen = base.pathOff
    val sb = new StringBuilder(base.url.substring(0, blen))
    if (s.nonEmpty && s.charAt(0) != '/' && s.charAt(0) != '?' && sb.nonEmpty && sb.charAt(sb.length - 1) != '/')
      sb.append('/')
    sb.append(s)
    parseEnc(sb.toString, addWWW, stripSessionId, stripPound, stripCommonFile)
  }

  // ---------------------------------------------------------------- set()

  private def setFrom(input: Array[Byte], addWWW: Boolean, stripSessionId: Boolean,
                      stripPound: Boolean, stripCommonFile: Boolean): GbUrl = {
    var t = input
    var toff = 0
    var tlen = t.length
    if (tlen == 0) return empty
    if (tlen > MaxUrlLen - 10) tlen = MaxUrlLen - 10
    // skip leading non-(alnum|-|/) chars (Url.cpp:158); is_alnum_a treats
    // bytes 192-255 (except 215/247) as alnum (fctypes.cpp g_map_is_alnum)
    def alnumA(b: Int): Boolean =
      isAlnum(b.toChar) || (b >= 192 && b != 215 && b != 247)
    while (tlen > 0 && { val b = t(toff) & 0xff; !alnumA(b) && b != '-' && b != '/' }) {
      toff += 1; tlen -= 1
    }
    // stop at first space or non-ascii char (Url.cpp:161-172)
    var i = 0
    var nonAsciiPos = -1
    var break = false
    while (i < tlen && !break) {
      val b = t(toff + i)
      if (b >= 0 && isWspace(b.toChar)) break = true
      else if (b < 0) { nonAsciiPos = i; break = true }
      else i += 1
    }
    if (nonAsciiPos != -1) {
      val enc = punycodeUrl(t, toff, tlen)
      if (enc == null) return empty
      return setFrom(enc, addWWW, stripSessionId, stripPound, stripCommonFile)
    }
    tlen = i
    var str = new String(t, toff, tlen, StandardCharsets.ISO_8859_1)
    // collapse http://http:// (Url.cpp:330-335)
    while (str.length > 14 && str.regionMatches(true, 0, "http://http://", 0, 14))
      str = str.substring(7)
    // find '#' (not '#!'): capture anchor, truncate if stripPound (Url.cpp:337-352)
    var anchorPos = -1
    i = 0
    break = false
    while (i < str.length && !break) {
      if (str.charAt(i) == '#' && !(i + 1 < str.length && str.charAt(i + 1) == '!')) {
        anchorPos = i
        if (stripPound) str = str.substring(0, i)
        break = true
      }
      i += 1
    }
    var s = str
    if (stripSessionId) s = stripSessionIds(s)
    if (stripCommonFile) s = stripCommonFiles(s)
    s = s.replace('\\', '/')
    // scheme (Url.cpp:566-610)
    val out = new StringBuilder(s.length + 16)
    i = 0
    while (i < s.length && (isAlnum(s.charAt(i)) || s.charAt(i) == '-')) i += 1
    var slen = 0
    var pos = 0 // read cursor in s
    if (i + 2 < s.length && s.charAt(i) == ':' && s.charAt(i + 1) == '/' && s.charAt(i + 2) == '/') {
      var k = 0
      while (k < i + 3) { out.append(lower(s.charAt(k))); k += 1 }
      slen = i; pos = i + 3
    } else if (i + 2 < s.length && s.charAt(i) == ':' && s.charAt(i + 1) == '/' && isAlnum(s.charAt(i + 2))) {
      var k = 0
      while (k < i + 2) { out.append(lower(s.charAt(k))); k += 1 }
      out.append('/')
      slen = i; pos = i + 2
    } else {
      out.append("http://")
      slen = 4
      pos = 0
      if (s.length > 1 && s.charAt(0) == '/' && s.charAt(1) == '/') pos = 2
    }
    // host (Url.cpp:612-625): alnum . - _
    var j = pos
    while (j < s.length && { val c = s.charAt(j); isAlnum(c) || c == '.' || c == '-' || c == '_' }) j += 1
    val hostOff = out.length
    var k = pos
    while (k < j) { out.append(lower(s.charAt(k))); k += 1 }
    var hostLen = j - pos
    while (hostLen > 0 && out.charAt(hostOff + hostLen - 1) == '.') { hostLen -= 1; out.setLength(out.length - 1) }
    val host = out.substring(hostOff, hostOff + hostLen)
    val ip = atoip(host)
    i = j
    // domain/tld (Url.cpp:636-666)
    var domOff = 0; var domLen = 0; var tldOff = 0; var tldLen = 0
    if (ip != 0) {
      val lastDot = host.lastIndexOf('.')
      if (lastDot > 0) { domOff = hostOff; domLen = lastDot }
    } else {
      val tldRel = getTld(host)
      // Url.cpp:651: tld recorded only when it exists AND is not the whole
      // host (`m_tld > m_host`); a whole-host TLD yields no tld, no domain
      if (tldRel > 0) {
        tldOff = hostOff + tldRel
        tldLen = hostLen - tldRel
        val dRel = getDomainRel(host, tldRel)
        if (dRel >= 0) { domOff = hostOff + dRel; domLen = hostLen - dRel }
      }
    }
    // addWWW (Url.cpp:669-681)
    var hOff = hostOff; var hLen = hostLen
    if (ip == 0 && addWWW && domLen == hLen && domOff == hOff && host.contains('.')) {
      out.insert(hostOff, "www.")
      hLen += 4
      if (domLen > 0) domOff += 4
      if (tldLen > 0) tldOff += 4
    }
    // port (Url.cpp:683-718)
    var defPort = 80
    if (slen == 5 && out.substring(0, 5) == "https") defPort = 443
    if (slen == 3 && out.substring(0, 3) == "ftp") defPort = 21
    var port = defPort
    if (i < s.length && s.charAt(i) == ':') {
      val saved = out.length
      out.append(':')
      j = i + 1
      while (j < s.length && s.charAt(j) != '/') { out.append(s.charAt(j)); j += 1 }
      port = atol2(s, i + 1, j - (i + 1))
      if (port == defPort) out.setLength(saved)
      i = j
    }
    // path (Url.cpp:723-775)
    val pathOff = out.length
    if (i >= s.length || s.charAt(i) != '/') {
      out.append('/')
      return finish(out.toString, slen, hOff, hLen, domOff, domLen, tldOff, tldLen, port, defPort, pathOff, 1, -1, 0, ip)
    }
    j = i
    break = false
    while (j < s.length && s.charAt(j) != '?' && !break) {
      if (s.charAt(j) == '#' && (j + 1 >= s.length || s.charAt(j + 1) != '!')) break = true
      else j += 1
    }
    var p = i
    while (p < j) {
      val c = s.charAt(p)
      val last = out.charAt(out.length - 1)
      if (c == '/' && last == '/' && out.length - 1 >= pathOff && out.length >= 2 && out.charAt(out.length - 2) != ':') {
        // dedup '//'
        p += 1
      } else if (c == '.' && last == '/' && (p + 1 == j || s.charAt(p + 1) == '/')) {
        p += 1
      } else if (c == '.' && p + 1 < s.length && s.charAt(p + 1) == '.' && last == '/') {
        // pop segment (Url.cpp:747-754)
        if (out.length - 1 > pathOff) out.setLength(out.length - 1)
        while (out.charAt(out.length - 1) != '/') out.setLength(out.length - 1)
        while (p < s.length && s.charAt(p) != '/') p += 1
      } else if (c == ';' && p + 1 < s.length && s.charAt(p + 1) == '?') {
        p += 1
      } else {
        out.append(c)
        p += 1
      }
    }
    val pathLen = out.length - pathOff
    // query (Url.cpp:755-775): includes the '?', collapses '&&' runs; an
    // un-stripped '#fragment' after the query rides along (kept quirk)
    var queryOff = -1; var queryLen = 0
    if (p < s.length && s.charAt(p) != '#') {
      out.append(s.charAt(p)) // the '?'
      queryOff = out.length
      var q = p + 1
      while (q < s.length) {
        val c = s.charAt(q)
        if (!(c == '&' && s.charAt(q - 1) == '&')) out.append(c)
        q += 1
      }
      queryLen = out.length - queryOff
    }
    finish(out.toString, slen, hOff, hLen, domOff, domLen, tldOff, tldLen, port, defPort, pathOff, pathLen, queryOff, queryLen, ip)
  }

  private def finish(url: String, slen: Int, hOff: Int, hLen: Int, dOff: Int, dLen: Int,
                     tOff: Int, tLen: Int, port: Int, defPort: Int, pOff: Int, pLen: Int,
                     qOff: Int, qLen: Int, ip: Int): GbUrl =
    GbUrl(url, slen, hOff, hLen, dOff, dLen, tOff, tLen, port, defPort, pOff, pLen, qOff, qLen, ip)

  /** getTLD (Domains.cpp:51-93): returns offset of TLD within host, or -1.
    * Tries last label, last two labels, last three labels; any all-alpha
    * single label is a TLD; dotted candidates consult the table. */
  private def getTld(host: String): Int = {
    if (host.isEmpty) return -1
    var best = -1
    var s = host.length - 1
    while (s > 0 && host.charAt(s) != '.') s -= 1
    var t = if (host.charAt(s) == '.') s + 1 else s
    if (isTLD(host.substring(t))) best = t
    if (s == 0) return best
    var iter = 0
    while (iter < 2) {
      s -= 1
      while (s > 0 && host.charAt(s) != '.') s -= 1
      t = if (host.charAt(s) == '.') s + 1 else s
      if (isTLD(host.substring(t))) best = t
      if (s == 0) return best
      iter += 1
    }
    best
  }

  /** Domains.cpp:97-110. */
  private def isTLD(tld: String): Boolean = {
    var pcount = 0
    var i = 0
    while (i < tld.length) {
      val c = tld.charAt(i)
      if (c == '.') pcount += 1
      else if (!isAlpha(c)) return false
      i += 1
    }
    if (tld.isEmpty) false
    else if (pcount == 0) true
    else if (pcount >= 2) false
    else dottedTlds.contains(tld.toLowerCase)
  }

  /** getDomain (Domains.cpp:22-48): offset of domain within host given TLD
    * offset, or -1. */
  private def getDomainRel(host: String, tldRel: Int): Int = {
    if (tldRel <= 0) return -1
    var sp = tldRel - 1
    if (host.charAt(sp) != '.') return -1
    sp -= 1
    while (sp > 0 && host.charAt(sp) != '.') sp -= 1
    if (sp == 0 && host.charAt(0) != '.') return 0
    sp + 1
  }

  /** inet_aton semantics (ip.cpp:5-27): dotted numeric (dec/oct/hex) host
    * → IP as the int32 read of the network-byte-order address; else 0. */
  def atoip(host: String): Int = {
    if (host.isEmpty) return 0
    val parts = host.split("\\.", -1)
    if (parts.length > 4) return 0
    val vals = new Array[Long](parts.length)
    var i = 0
    while (i < parts.length) {
      val p = parts(i)
      if (p.isEmpty) return 0
      val v = try {
        if (p.length > 2 && (p.startsWith("0x") || p.startsWith("0X"))) java.lang.Long.parseLong(p.substring(2), 16)
        else if (p.length > 1 && p.charAt(0) == '0') java.lang.Long.parseLong(p, 8)
        else java.lang.Long.parseLong(p)
      } catch { case _: NumberFormatException => return 0 }
      if (v < 0) return 0
      vals(i) = v
      i += 1
    }
    val n = parts.length
    // leading parts must fit a byte; final part fills remaining bytes
    var addr = 0L
    var b = 0
    while (b < n - 1) {
      if (vals(b) > 255) return 0
      addr = (addr << 8) | vals(b)
      b += 1
    }
    val lastBytes = 4 - (n - 1)
    val max = if (lastBytes >= 4) 0xffffffffL else (1L << (8 * lastBytes)) - 1
    if (vals(n - 1) > max) return 0
    addr = (addr << (8 * lastBytes)) | vals(n - 1)
    // addr is now host-order a.b.c.d; m_ip is the little-endian int read of
    // network byte order = byte-reversed
    java.lang.Integer.reverseBytes((addr & 0xffffffffL).toInt)
  }

  private def atol2(s: String, off: Int, len: Int): Int = {
    var v = 0
    var i = 0
    while (i < len && i + off < s.length) {
      val c = s.charAt(off + i)
      if (c >= '0' && c <= '9') v = v * 10 + (c - '0')
      else return v
      i += 1
    }
    v
  }

  // ------------------------------------------------- session-id stripping

  /** Url.cpp:362-513 — first matching pattern wins; ordering preserved. */
  private def stripSessionIds(sIn: String): String = {
    var s = sIn
    var p = 0
    while (p < s.length && s.charAt(p) != '?' && s.charAt(p) != ';') p += 1
    if (p >= s.length) return s
    val tail = s // searches run over the suffix starting at p in C; strstr from p
    def findCi(pat: String): Int = {
      val idx = tail.toLowerCase.indexOf(pat.toLowerCase, p)
      idx
    }
    def findCs(pat: String): Int = tail.indexOf(pat, p)
    var tt = -1
    var x = 0
    def tryPat(idx: Int, xlen: Int): Unit = { if (tt < 0 && idx >= 0) { tt = idx; x = xlen } }
    def hexOk(off: Int): Boolean = isSessionIdHex(s, off)
    tryPat(findCi("PHPSESSID="), 10)
    tryPat(findCs("SID="), 4)
    if (tt < 0) { val i2 = findCs("osCsid="); if (i2 >= 0 && hexOk(i2 + 7)) { tt = i2; x = 7 } }
    if (tt < 0) { val i2 = findCs("XTCsid="); if (i2 >= 0 && hexOk(i2 + 7)) { tt = i2; x = 7 } }
    if (tt < 0) { val i2 = findCs("osCsid/"); if (i2 >= 0 && hexOk(i2 + 7)) { tt = i2; x = 7 } }
    if (tt < 0) { val i2 = findCs("sid="); if (i2 >= 0 && hexOk(i2 + 4)) { tt = i2; x = 4 } }
    tryPat(findCi("jsessionid="), 11)
    tryPat(findCi("vbsessid="), 9)
    tryPat(findCi("asesessid="), 10)
    tryPat(findCi("nlsessid="), 9)
    tryPat(findCi("psession="), 9)
    tryPat(findCi("session_id="), 11)
    tryPat(findCi("sessionid="), 10)
    tryPat(findCi("sessid="), 7)
    tryPat(findCi("session="), 8)
    tryPat(findCi("session/"), 8)
    tryPat(findCi("POSTNUKESID="), 12)
    tryPat(findCi("auth_sess="), 10)
    tryPat(findCi("mysid="), 6)
    tryPat(findCi("oscsid="), 7)
    tryPat(findCi("cg_sess="), 8)
    tryPat(findCi("galileoSession"), 14)
    tryPat(findCi("sess="), 5)
    if (tt < 0) {
      // .php?s= + 32 hex (Url.cpp:469-483)
      val i2 = s.indexOf(".php?s=", math.max(0, p - 4))
      if (i2 >= 0) {
        val pp = i2 + 7
        var n = 0
        while (pp + n < s.length && { val c = s.charAt(pp + n); (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') }) n += 1
        if (n >= 32) { tt = i2 + 5; x = 2 }
      }
    }
    if (tt < 0) return s
    if (tt > 0 && isAlnum(s.charAt(tt - 1))) return s
    var a = tt
    var b = a + x
    while (a > 0 && s.charAt(a - 1) != '?' && s.charAt(a - 1) != '&' && s.charAt(a - 1) != '/' && s.charAt(a - 1) != ';') a -= 1
    if (a < s.length && s.charAt(a) == '?') a += 1
    if (a > 0 && s.charAt(a - 1) == ';') a -= 1
    while (b < s.length && s.charAt(b) != '&' && s.charAt(b) != '?' && s.charAt(b) != ';') b += 1
    if (b - (a + x) < 5) return s
    if (b < s.length && (s.charAt(b) == '&' || s.charAt(b) == ';')) b += 1
    var res = s.substring(0, a) + s.substring(b)
    while (res.nonEmpty && { val c = res.charAt(res.length - 1); c == '?' || c == '&' || c == ';' }) res = res.substring(0, res.length - 1)
    res
  }

  /** Url.cpp:~850 isSessionId for v>=69: all chars 0-9a-f, >=12 chars,
    * at least one a-f. */
  private def isSessionIdHex(s: String, off: Int): Boolean = {
    var count = 0
    var nonNum = 0
    var i = off
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') {}
      else if (c >= 'a' && c <= 'f') nonNum += 1
      else return false
      count += 1
      i += 1
    }
    nonNum > 0 && count >= 12
  }

  /** Url.cpp:517-558. */
  private val commonFiles = Seq(
    "/default.xhtml",
    "/default.html", "/default.ascx", "/default.ashx", "/default.asmx", "/default.xhtm", "/default.aspx",
    "/default.htm", "/default.php", "/default.asp", "/index.xhtml",
    "/index.html", "/index.aspx", "/index.xhtm", "/default.pl", "/default.cs",
    "/index.htm", "/index.php", "/index.asp", "/main.html", "/main.aspx",
    "/index.pl", "/main.htm", "/main.php",
    "/main.pl")

  private def stripCommonFiles(s: String): String = {
    for (cf <- commonFiles) {
      if (s.length > cf.length && s.regionMatches(true, s.length - cf.length, cf, 0, cf.length))
        return s.substring(0, s.length - cf.length + 1) // keep the '/'
    }
    s
  }

  // ----------------------------------------------------------- punycode

  /** Url.cpp:179-318: per-label punycode of the hostname, %XX-encode of
    * non-ASCII path bytes. Returns the all-ASCII re-encoded URL bytes. */
  private def punycodeUrl(t: Array[Byte], toff: Int, tlen: Int): Array[Byte] = {
    val out = new StringBuilder
    var p = toff
    val pend = toff + tlen
    val str = new String(t, toff, tlen, StandardCharsets.ISO_8859_1)
    if (tlen > 7 && str.startsWith("http://")) p += 7
    else if (tlen > 8 && str.startsWith("https://")) p += 8
    out.append(new String(t, toff, p - toff, StandardCharsets.ISO_8859_1))
    // host labels
    while (p < pend && t(p) != '/') {
      val labelStart = p
      while (p < pend && t(p) != '.' && t(p) != '/') p += 1
      val labelLen = p - labelStart
      // decode label as UTF-8 code points; invalid → Latin-1 fallback
      var cps = List.newBuilder[Int]
      var ascii = true
      var valid = true
      var q = labelStart
      while (q < labelStart + labelLen && valid) {
        val b = t(q) & 0xff
        if (b < 0x80) { cps += b; q += 1 }
        else {
          ascii = false
          val size =
            if ((b & 0xe0) == 0xc0) 2 else if ((b & 0xf0) == 0xe0) 3 else if ((b & 0xf8) == 0xf0) 4 else 0
          if (size == 0 || q + size > labelStart + labelLen) valid = false
          else {
            var cp = b & (0x7f >> size)
            var k = 1
            while (k < size && valid) {
              val cb = t(q + k) & 0xff
              if ((cb & 0xc0) != 0x80) valid = false
              else cp = (cp << 6) | (cb & 0x3f)
              k += 1
            }
            if (valid) { cps += cp; q += size }
          }
        }
      }
      if (ascii) {
        var end = labelStart + labelLen
        if (end < pend && t(end) == '.') end += 1 // include the dot
        out.append(new String(t, labelStart, end - labelStart, StandardCharsets.ISO_8859_1))
        p = end
      } else {
        val codepoints: Array[Int] =
          if (valid) cps.result().toArray
          else (labelStart until labelStart + labelLen).map(t(_) & 0xff).toArray // latin1 fallback
        val enc = punycodeEncode(codepoints)
        if (enc == null || enc.isEmpty || enc.exists(isWspace)) {
          p += 1 // drop the chunk (Url.cpp:268-273)
        } else {
          out.append("xn--").append(enc)
          if (p < pend) { out.append((t(p) & 0xff).toChar); p += 1 } // '.' or '/'
        }
      }
    }
    // rest of url: %XX-encode non-ascii UTF-8 bytes, stop at whitespace
    var brk = false
    while (p < pend && !brk) {
      val b = t(p) & 0xff
      if (b == 0) brk = true
      else if (b >= 0x80) {
        val size = if ((b & 0xe0) == 0xc0) 2 else if ((b & 0xf0) == 0xe0) 3 else if ((b & 0xf8) == 0xf0) 4 else 1
        if (size <= 1 || p + size > pend) brk = true
        else {
          var k = 0
          while (k < size) {
            out.append('%')
            val v = t(p + k) & 0xff
            out.append(Character.toUpperCase(Character.forDigit(v >> 4, 16)))
            out.append(Character.toUpperCase(Character.forDigit(v & 0xf, 16)))
            k += 1
          }
          p += size
        }
      } else if (isWspace(b.toChar)) brk = true
      else { out.append(b.toChar); p += 1 }
    }
    out.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  /** RFC 3492 punycode encoder (lowercase digits), as used per-label. */
  private def punycodeEncode(input: Array[Int]): String = {
    val base = 36; val tmin = 1; val tmax = 26; val skew = 38; val damp = 700
    var n = 128; var delta = 0; var bias = 72
    val out = new StringBuilder
    val basic = input.filter(_ < 128)
    basic.foreach(c => out.append(c.toChar))
    var h = basic.length
    val b = h
    if (b > 0) out.append('-')
    def digit(d: Int): Char = if (d < 26) ('a' + d).toChar else ('0' + d - 26).toChar
    def adapt(d0: Int, numPoints: Int, first: Boolean): Int = {
      var d = if (first) d0 / damp else d0 / 2
      d += d / numPoints
      var kk = 0
      while (d > ((base - tmin) * tmax) / 2) { d /= (base - tmin); kk += base }
      kk + (base - tmin + 1) * d / (d + skew)
    }
    while (h < input.length) {
      var m = Int.MaxValue
      input.foreach(c => if (c >= n && c < m) m = c)
      if (m - n > (Int.MaxValue - delta) / (h + 1)) return null
      delta += (m - n) * (h + 1)
      n = m
      for (c <- input) {
        if (c < n) { delta += 1; if (delta == 0) return null }
        if (c == n) {
          var q = delta
          var k = base
          var done = false
          while (!done) {
            val t = if (k <= bias) tmin else if (k >= bias + tmax) tmax else k - bias
            if (q < t) { out.append(digit(q)); done = true }
            else {
              out.append(digit(t + (q - t) % (base - t)))
              q = (q - t) / (base - t)
              k += base
            }
          }
          bias = adapt(delta, h + 1, h == b)
          delta = 0
          h += 1
        }
      }
      delta += 1
      n += 1
    }
    out.toString
  }
}
