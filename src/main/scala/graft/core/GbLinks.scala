package graft.core

import java.nio.charset.StandardCharsets
import scala.collection.mutable.ArrayBuffer

/** Outlink harvesting with the semantics of the reference's `Links::set`
  * (`/root/reference/src/Linkdb.cpp:3424-3737`) and `Links::addLink`
  * (`Linkdb.cpp:3791-3990`):
  *
  *  - link-bearing tags: a, link, loc, area, enclosure, weblog (url=),
  *    UrlFrom, feedburner:origlink (Linkdb.cpp:3487-3499)
  *  - `<link>/<loc>/<UrlFrom>/<feedburner:origlink>` with no href take the
  *    tag BODY as the url, stripping CDATA (Linkdb.cpp:3547-3566)
  *  - `javascript:` hrefs are salvaged from onclick='...' single-quoted
  *    urls starting with / (Linkdb.cpp:3573-3592)
  *  - skip `#...`, `mailto:`, and any protocol other than http/https
  *    (Linkdb.cpp:3594-3614)
  *  - rel=nofollow flags; type=application/rss+xml|atom+xml|text/xml with
  *    rel=alternate marks RSS; rel=replies/edit skipped (3630-3654)
  *  - embedded-space fix: %20 in path, '+' after '?' (3850-3880)
  *  - hrefs are entity-decoded (doSpecial=false), then canonicalized with
  *    stripSessionIds=true, stripPound=true, stripCommonFile=true,
  *    addWWW=false (Linkdb.cpp:3655-3663, 3884-3892)
  *  - links lacking a domain/host, or a TLD for non-ip hosts, are dropped
  */
object GbLinks {

  final case class OutLink(url: GbUrl, tagId: Int, isRSS: Boolean, nofollow: Boolean, fromAhref: Boolean, fromFeedburner: Boolean)

  private def tagId(name: String): Int = GbXml.tags.indexWhere(_.name == name)
  val TagA: Int = tagId("A")
  val TagLink: Int = tagId("LINK")
  val TagLoc: Int = tagId("LOC")
  val TagArea: Int = tagId("AREA")
  val TagEnclosure: Int = tagId("ENCLOSURE")
  val TagWeblog: Int = tagId("WEBLOG")
  val TagUrlFrom: Int = tagId("URLFROM")
  val TagFbOrigLink: Int = tagId("FEEDBURNER:ORIGLINK")

  @inline private def isWspaceA(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == 0x0b || c == '\f'
  @inline private def lowerA(c: Int): Int = if (c >= 'A' && c <= 'Z') c + 32 else c

  /** Attribute lookup inside a tag node (XmlNode::getFieldValue semantics:
    * case-insensitive name, quoted or bare value). Returns null if absent. */
  def getAttr(buf: Array[Byte], off: Int, len: Int, field: String): String = {
    val end = off + len
    var i = off + 1
    // skip tag name
    while (i < end && !isWspaceA(buf(i) & 0xff) && (buf(i) & 0xff) != '>') i += 1
    while (i < end) {
      // skip whitespace
      while (i < end && isWspaceA(buf(i) & 0xff)) i += 1
      if (i >= end || (buf(i) & 0xff) == '>') return null
      // attr name
      val ns = i
      while (i < end && { val c = buf(i) & 0xff; c != '=' && c != '>' && !isWspaceA(c) }) i += 1
      val ne = i
      // skip ws before '='
      var j = i
      while (j < end && isWspaceA(buf(j) & 0xff)) j += 1
      var value: (Int, Int) = null
      if (j < end && (buf(j) & 0xff) == '=') {
        j += 1
        while (j < end && isWspaceA(buf(j) & 0xff)) j += 1
        if (j < end && ((buf(j) & 0xff) == '"' || (buf(j) & 0xff) == '\'')) {
          val q = buf(j) & 0xff
          j += 1
          val vs = j
          while (j < end && (buf(j) & 0xff) != q) j += 1
          value = (vs, j)
          if (j < end) j += 1
        } else {
          val vs = j
          while (j < end && { val c = buf(j) & 0xff; !isWspaceA(c) && c != '>' }) j += 1
          value = (vs, j)
        }
        i = j
      }
      val nameMatches = (ne - ns) == field.length && {
        var k = 0
        var ok = true
        while (k < field.length && ok) {
          if (lowerA(buf(ns + k) & 0xff) != lowerA(field.charAt(k))) ok = false
          k += 1
        }
        ok
      }
      if (nameMatches) {
        return if (value == null) "" else new String(buf, value._1, value._2 - value._1, StandardCharsets.ISO_8859_1)
      }
      if (value == null && ne == ns) return null // no progress safeguard
    }
    null
  }

  /** Links::set over parsed nodes. `buf` must be the same byte array the
    * nodes index into (post decode/normalize). */
  def harvest(buf: Array[Byte], nodes: ArrayBuffer[GbXml.Node], baseUrl: GbUrl): Seq[OutLink] = {
    val out = new ArrayBuffer[OutLink]
    var i = 0
    var isFeedburnerPage = false
    while (i < nodes.length) {
      val nd = nodes(i)
      val id = nd.nodeId
      if (id == TagA || id == TagLink || id == TagLoc || id == TagArea ||
          id == TagEnclosure || id == TagWeblog || id == TagUrlFrom || id == TagFbOrigLink) {
        if (nd.isFrontTag) {
          if (id == TagFbOrigLink) isFeedburnerPage = true
          val urlattr = if (id == TagWeblog) "url" else "href"
          val rel = getAttr(buf, nd.off, nd.len, "rel")
          val nofollow = rel != null && rel.length >= 8 && rel.regionMatches(true, 0, "nofollow", 0, 8)
          var link: String = getAttr(buf, nd.off, nd.len, urlattr)
          if ((link == null || link.isEmpty) &&
              (id == TagLink || id == TagLoc || id == TagUrlFrom || id == TagFbOrigLink)) {
            // take tag body if <x>url</x> (Linkdb.cpp:3547-3566)
            val selfClosing = nd.len >= 2 && (buf(nd.off + nd.len - 2) & 0xff) == '/'
            if (!selfClosing && i + 2 < nodes.length && nodes(i + 2).nodeId == id && !nodes(i + 2).isFrontTag) {
              val body = nodes(i + 1)
              var s = new String(buf, body.off, body.len, StandardCharsets.ISO_8859_1)
              if (s.length > 12 && s.regionMatches(true, 0, "<![CDATA[", 0, 9)) s = s.substring(9, s.length - 3)
              link = s
            }
          }
          if (link != null && link.nonEmpty) {
            link = link.dropWhile(c => isWspaceA(c))
            // javascript: onclick salvage (Linkdb.cpp:3573-3592)
            if (link.length >= 11 && link.regionMatches(true, 0, "javascript:", 0, 11)) {
              val oc = getAttr(buf, nd.off, nd.len, "onclick")
              link = null
              if (oc != null) {
                val k = oc.indexOf("'/")
                if (k >= 0) {
                  val e = oc.indexOf('\'', k + 1)
                  link = if (e > k) oc.substring(k + 1, e) else oc.substring(k + 1)
                }
              }
            }
            if (link != null && link.nonEmpty && link.charAt(0) != '#' &&
                !(link.length >= 7 && link.regionMatches(true, 0, "mailto:", 0, 7))) {
              // protocol check (first 20 chars)
              var p = 0
              val pmax = math.min(link.length, 20)
              while (p < pmax && (GbUrl.isAlnum(link.charAt(p)) || link.charAt(p) == '-')) p += 1
              var proto = true
              if (p < pmax && link.charAt(p) == ':') {
                proto = (p == 4 && link.regionMatches(true, 0, "http", 0, 4)) ||
                        (p == 5 && link.regionMatches(true, 0, "https", 0, 5))
              }
              if (proto && link.length <= GbUrl.MaxUrlLen) {
                // rss detection
                val typ = getAttr(buf, nd.off, nd.len, "type")
                var isRSS = typ != null && (typ.regionMatches(true, 0, "application/atom+xml", 0, 20) ||
                  typ.regionMatches(true, 0, "application/rss+xml", 0, 19) ||
                  typ.regionMatches(true, 0, "text/xml", 0, 8))
                var skip = false
                if (isRSS && rel != null && !rel.regionMatches(true, 0, "alternate", 0, 9)) isRSS = false
                if (rel != null && rel.regionMatches(true, 0, "replies", 0, 7)) skip = true
                if (rel != null && rel.regionMatches(true, 0, "edit", 0, 4)) skip = true
                if (!skip) {
                  // embedded-space fix (Linkdb.cpp:3850-3880)
                  var l = link
                  if (l.contains(' ') && !l.takeWhile(_ != ' ').contains('>')) {
                    val sb = new StringBuilder
                    var hitQ = false
                    l.foreach { c =>
                      if (c == '?') { hitQ = true; sb.append(c) }
                      else if (c != ' ') sb.append(c)
                      else if (hitQ) sb.append('+')
                      else sb.append("%20")
                    }
                    l = sb.toString
                  }
                  // entity-decode the href (doSpecial=false); the string
                  // stays a Latin-1 BYTE CARRIER end to end (latin1=true
                  // below) so GbUrl consumes the exact decoded bytes —
                  // UTF-8 re-encoding would double-encode non-ASCII hrefs
                  val decoded = new String(
                    GbXml.htmlDecode(l.getBytes(StandardCharsets.ISO_8859_1), doSpecial = false),
                    StandardCharsets.ISO_8859_1)
                  val u = GbUrl.parseRel(baseUrl, decoded, addWWW = false,
                    stripSessionId = true, stripPound = true, stripCommonFile = true,
                    latin1 = true)
                  if (u.isValid && u.domLen > 0 && (u.ip != 0 || u.tldLen > 0)) {
                    out += OutLink(u, id, isRSS, nofollow, fromAhref = id == TagA, fromFeedburner = id == TagFbOrigLink)
                  }
                }
              }
            }
          }
        }
      }
      i += 1
    }
    if (isFeedburnerPage) out.filter(_.fromFeedburner).toSeq else out.toSeq
  }
}
