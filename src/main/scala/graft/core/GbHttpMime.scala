package graft.core

/** X17: HTTP MIME header parse — a faithful port of the reference's
  * HttpMime (`/root/reference/src/HttpMime.cpp:55` set, `:90` getMimeLen,
  * `:123` parse, `:513` getContentTypeFromStr, `:586`
  * getContentTypePrivate; CT_* ids `HttpMime.h:27-49`).
  *
  * Reference quirks preserved:
  *  - the mime boundary accepts `\r\r`, `\n\n`, `\r\n\r\n` AND `\n\r\n\r`
  *    (getMimeLen), and a buffer under 13 bytes is "no mime";
  *  - the status is whatever integer follows the first whitespace run on
  *    the first line (`atol2` — a stray leading '-' accepted, no
  *    HTTP/x.x validation); an all-whitespace header is no mime at all
  *    (parse() returns false, HttpMime.cpp:137);
  *  - an absent Content-Type means CT_HTML (`parse` pre-seeds it);
  *  - the charset is taken ONLY from a `;charset=` parameter of
  *    Content-Type (spaces around `=` tolerated), terminated by
  *    space/tab/CR/LF;
  *  - Content-Encoding matches by CASE-SENSITIVE substring (strstr):
  *    anything containing "gzip" is gzip, else anything containing
  *    "deflate" is deflate — "GZIP" is neither;
  *  - Location: skips at most TWO leading spaces (the reference's two
  *    `if (*tt==' ') tt++;` lines — a third space stays in the field);
  *  - unknown content types map to CT_UNKNOWN=0, with octet-stream/
  *    binary/x-tar and the audio/ prefix forced to CT_UNKNOWN explicitly.
  */
object GbHttpMime {

  // HttpMime.h:27-49
  val CtUnknown = 0
  val CtHtml = 1
  val CtText = 2
  val CtXml = 3
  val CtPdf = 4
  val CtDoc = 5
  val CtXls = 6
  val CtPpt = 7
  val CtPs = 8
  val CtGif = 9
  val CtJpg = 10
  val CtPng = 11
  val CtTiff = 12
  val CtBmp = 13
  val CtJs = 14
  val CtCss = 15
  val CtJson = 16
  val CtImage = 17
  val CtStatus = 18
  val CtGz = 19
  val CtArc = 20
  val CtWarc = 21

  final case class Mime(
      mimeLen: Int, // header bytes incl. boundary; content starts here
      status: Int, // atol2 of the first post-whitespace token (0 when non-numeric)
      contentLen: Long, // -1 when absent
      contentType: Int, // CT_* id; CT_HTML when header absent
      contentTypeRaw: String, // the field text up to ';' (trimmed)
      charset: String, // "" when absent
      location: String, // "" when absent (raw field, reference spacing)
      gzip: Boolean,
      deflate: Boolean)

  /** getMimeLen (HttpMime.cpp:90): index just past the blank-line
    * boundary, or -1 if none. */
  def mimeLen(buf: Array[Byte], bufLen: Int): Int = {
    var i = 0
    while (i < bufLen) {
      val b = buf(i)
      if (b == '\r' || b == '\n') {
        if (i + 1 < bufLen) {
          if (buf(i) == '\r' && buf(i + 1) == '\r') return i + 2
          if (buf(i) == '\n' && buf(i + 1) == '\n') return i + 2
          if (i + 3 < bufLen) {
            if (buf(i) == '\r' && buf(i + 1) == '\n' &&
                buf(i + 2) == '\r' && buf(i + 3) == '\n') return i + 4
            if (buf(i) == '\n' && buf(i + 1) == '\r' &&
                buf(i + 2) == '\n' && buf(i + 3) == '\r') return i + 4
          }
        }
      }
      i += 1
    }
    -1
  }

  /** HttpMime::set + parse over the response bytes. None = no mime
    * boundary (or under-13-byte buffer), like set() returning false. */
  def parse(buf: Array[Byte]): Option[Mime] = {
    if (buf.length < 13) return None
    val mlen = mimeLen(buf, buf.length)
    if (mlen < 0) return None
    // Latin-1 carrier: header bytes map 1:1 to chars
    val mime = new String(buf, 0, mlen, java.nio.charset.StandardCharsets.ISO_8859_1)

    // status: skip to first whitespace, skip the run, atol2
    var p = 0
    val n = mime.length
    while (p < n && !isWs(mime.charAt(p))) p += 1
    while (p < n && isWs(mime.charAt(p))) p += 1
    // all-whitespace header → parse() returns false in the reference
    // (HttpMime.cpp:137 `if (p == pend) return false`): no mime at all
    if (p >= n) return None
    val status = atol2(mime, p).toInt

    var contentLen = -1L
    var ct = CtHtml
    var ctRaw = ""
    var charset = ""
    var location = ""
    var gzip = false
    var deflate = false

    var ls = 0
    while (ls < n) {
      var le = ls
      while (le < n && mime.charAt(le) != '\r' && mime.charAt(le) != '\n') le += 1
      val line = mime.substring(ls, le)
      if (startsWithIgnoreCase(line, "Content-Length:")) {
        contentLen = atol2(line, 15)
      } else if (startsWithIgnoreCase(line, "Content-Type:")) {
        var s = 13
        while (s < line.length && (line.charAt(s) == ' ' || line.charAt(s) == '\t')) s += 1
        var send = s
        while (send < line.length && line.charAt(send) != ';') send += 1
        ctRaw = line.substring(s, send)
        // charset param (HttpMime.cpp:600-620)
        if (send < line.length && line.charAt(send) == ';') {
          var t = send + 1
          while (t < line.length && (line.charAt(t) == ' ' || line.charAt(t) == '\t')) t += 1
          if (t + 7 <= line.length && line.substring(t, t + 7).equalsIgnoreCase("charset")) {
            t += 7
            while (t < line.length && (line.charAt(t) == ' ' || line.charAt(t) == '\t')) t += 1
            if (t < line.length && line.charAt(t) == '=') t += 1
            while (t < line.length && (line.charAt(t) == ' ' || line.charAt(t) == '\t')) t += 1
            val cs = t
            while (t < line.length && line.charAt(t) != ' ' && line.charAt(t) != '\t') t += 1
            charset = line.substring(cs, t)
          }
        }
        ct = contentTypeFromStr(ctRaw)
      } else if (startsWithIgnoreCase(line, "Location:")) {
        var t = 9
        // reference skips at most two spaces (two literal if-statements)
        if (t < line.length && line.charAt(t) == ' ') t += 1
        if (t < line.length && line.charAt(t) == ' ') t += 1
        location = line.substring(math.min(t, line.length))
      } else if (startsWithIgnoreCase(line, "Content-Encoding:")) {
        // the value match is CASE-SENSITIVE strstr in the reference
        // (HttpMime.cpp:202,205): "GZIP" does NOT set gzip there
        val v = line.substring(17)
        if (v.contains("gzip")) gzip = true
        else if (v.contains("deflate")) deflate = true
      }
      ls = le
      while (ls < n && (mime.charAt(ls) == '\r' || mime.charAt(ls) == '\n')) ls += 1
    }
    Some(Mime(mlen, status, contentLen, ct, ctRaw.trim, charset, location, gzip, deflate))
  }

  /** getContentTypeFromStr (HttpMime.cpp:513-583), order preserved. */
  def contentTypeFromStr(raw: String): Int = {
    val s = raw.trim
    def eq(t: String) = s.equalsIgnoreCase(t)
    if (eq("text/html")) CtHtml
    else if (eq("text/plain") || eq("text/txt") || eq("text") || eq("txt")) CtText
    else if (eq("text/xml") || eq("application/xml")) CtXml
    else if (eq("application/xhtml+xml")) CtHtml // spiders links, Cpp:544
    else if (eq("application/rss+xml") || eq("rss") || eq("application/rdf+xml") ||
             eq("application/atom+xml") || eq("atom+xml")) CtXml
    else if (eq("application/pdf")) CtPdf
    else if (eq("application/msword")) CtDoc
    else if (eq("application/vnd.ms-excel")) CtXls
    else if (eq("application/vnd.ms-powerpoint") || eq("application/mspowerpoint")) CtPpt
    else if (eq("application/postscript")) CtPs
    else if (eq("application/warc")) CtWarc
    else if (eq("application/arc")) CtArc
    else if (eq("image/gif")) CtGif
    else if (eq("image/jpeg")) CtJpg
    else if (eq("image/png")) CtPng
    else if (eq("image/tiff")) CtTiff
    else if (s.length >= 6 && s.substring(0, 6).equalsIgnoreCase("image/")) CtImage
    else if (eq("application/javascript") || eq("application/x-javascript") ||
             eq("text/javascript") || eq("text/x-js") || eq("text/js")) CtJs
    else if (eq("application/x-gzip")) CtGz
    else if (eq("text/css")) CtCss
    else if (eq("application/json")) CtJson
    else if (eq("application/vnd.wap.xhtml+xml")) CtHtml // facebook, Cpp:572
    else if (eq("binary/octet-stream") || eq("application/octet-stream") ||
             eq("application/binary") || eq("application/x-tar")) CtUnknown
    else if (s.length >= 6 && s.substring(0, 6).compareTo("audio/") == 0) CtUnknown
    else if (eq("text/x-vcard")) CtHtml // "might have an address", Cpp:580
    else CtUnknown
  }

  /** Does the reference index this content type as a document body?
    * (XmlDoc gates text docs on html/text/xml.) */
  def isTextual(ct: Int): Boolean = ct == CtHtml || ct == CtText || ct == CtXml

  /** CTs the engine indexes DIRECTLY (no converter). The reference's
    * indexability list (XmlDoc.cpp:3897-3903, 4012-4020) also accepts
    * PDF/XLS/PPT/PS/DOC via gbfilter conversion (pdftohtml/antiword/
    * pstotext, XmlDoc.cpp:19192). CT_PDF converts through the native
    * GbPdf (the fetch path and WARC ingest route it there); the other
    * converter formats have no open implementation in this sandbox and
    * fall to EDOCBADCONTENTTYPE. */
  def isIndexable(ct: Int): Boolean =
    ct == CtHtml || ct == CtText || ct == CtXml || ct == CtJson

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' || c == 11 // is_wspace_a

  private def startsWithIgnoreCase(s: String, p: String): Boolean =
    s.length >= p.length && s.substring(0, p.length).equalsIgnoreCase(p)

  /** atol2 (fctypes.cpp:968): skip whitespace, optional '-', digits;
    * 0 when no digits — a non-numeric status parses as 0, exactly like
    * the reference. */
  private def atol2(s: String, from: Int): Long = {
    var i = from
    val n = s.length
    while (i < n && isWs(s.charAt(i))) i += 1
    if (i == n) return 0L
    var negative = false
    if (s.charAt(i) == '-') { negative = true; i += 1 }
    var v = 0L
    while (i < n && s.charAt(i) >= '0' && s.charAt(i) <= '9') {
      v = v * 10 + (s.charAt(i) - '0'); i += 1
    }
    if (negative) -v else v
  }
}
