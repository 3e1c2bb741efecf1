package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.GbHttpMime
import java.nio.charset.StandardCharsets.ISO_8859_1

/** X17: HttpMime port — quirks pinned against HttpMime.cpp semantics
  * (set:55, getMimeLen:90, parse:123, getContentTypeFromStr:513). */
class GbHttpMimeSpec extends AnyFunSuite {

  private def m(s: String) = GbHttpMime.parse(s.getBytes(ISO_8859_1))

  test("basic 200 response: status, content-type, charset, body offset") {
    val r = m("HTTP/1.1 200 OK\r\nContent-Type: text/html;charset=UTF-8\r\nContent-Length: 5\r\n\r\nhello").get
    assert(r.status == 200)
    assert(r.contentType == GbHttpMime.CtHtml)
    assert(r.contentTypeRaw == "text/html")
    assert(r.charset == "UTF-8")
    assert(r.contentLen == 5)
    assert(r.mimeLen == "HTTP/1.1 200 OK\r\nContent-Type: text/html;charset=UTF-8\r\nContent-Length: 5\r\n\r\n".length)
  }

  test("boundary variants: \\n\\n and \\n\\r\\n\\r accepted (getMimeLen)") {
    assert(m("HTTP/1.0 301 Moved\nLocation: http://x.test/\n\n").get.status == 301)
    assert(m("HTTP/1.0 404 NF\n\r\n\rbody").get.status == 404) // the \n\r\n\r variant
  }

  test("under-13-byte buffer and missing boundary → None (set:68)") {
    assert(m("HTTP/1.1 200").isEmpty)
    assert(m("HTTP/1.1 200 OK Content-Type: text/html").isEmpty)
  }

  test("absent Content-Type defaults to CT_HTML (parse:140)") {
    val r = m("HTTP/1.1 200 OK\r\nServer: x\r\n\r\n").get
    assert(r.contentType == GbHttpMime.CtHtml)
    assert(r.contentTypeRaw == "")
    assert(r.charset == "")
  }

  test("non-numeric status parses as 0 via atol2, not an error") {
    assert(m("HTTP/1.1 abc def\r\n\r\n").get.status == 0)
  }

  test("charset param tolerates spaces around '=' (getContentTypePrivate:606-614)") {
    val r = m("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset = euc-jp\r\n\r\n").get
    assert(r.charset == "euc-jp")
    // and a missing 'charset' key after ';' yields none
    val r2 = m("HTTP/1.1 200 OK\r\nContent-Type: text/html; boundary=x\r\n\r\n").get
    assert(r2.charset == "")
  }

  test("Location skips at most two spaces (parse:186-189)") {
    assert(m("HTTP/1.1 302 F\r\nLocation:  http://a.test/\r\n\r\n").get.location == "http://a.test/")
    assert(m("HTTP/1.1 302 F\r\nLocation:   http://a.test/\r\n\r\n").get.location == " http://a.test/")
  }

  test("content-encoding substring match: gzip beats deflate (parse:199-210)") {
    val r = m("HTTP/1.1 200 OK\r\nContent-Encoding: x-gzip\r\n\r\n").get
    assert(r.gzip && !r.deflate)
    val r2 = m("HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n").get
    assert(!r2.gzip && r2.deflate)
  }

  test("content-type table rows (getContentTypeFromStr:513-583)") {
    import GbHttpMime._
    assert(contentTypeFromStr("application/xhtml+xml") == CtHtml) // spiders links
    assert(contentTypeFromStr("application/rss+xml") == CtXml)
    assert(contentTypeFromStr("Application/JSON") == CtJson)
    assert(contentTypeFromStr("image/webp") == CtImage) // image/* catch-all
    assert(contentTypeFromStr("application/octet-stream") == CtUnknown)
    assert(contentTypeFromStr("audio/mpeg") == CtUnknown)
    assert(contentTypeFromStr("text/x-vcard") == CtHtml) // address quirk
    assert(contentTypeFromStr("text/css") == CtCss)
    assert(contentTypeFromStr("madeup/thing") == CtUnknown)
  }

  test("warc path: header charset wins over body sniff (X17→X7 precedence)") {
    // é in ISO-8859-1 is 0xE9 — invalid as UTF-8, sniffs as latin1 anyway;
    // but an explicit KOI8-R header must override: 0xE9 in KOI8-R is 'И'
    val body = "<html><body>café</body></html>".getBytes(ISO_8859_1)
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html;charset=koi8-r\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(ISO_8859_1) ++ body
    val mm = GbHttpMime.parse(http).get
    assert(mm.charset == "koi8-r")
    val hdr = graft.core.GbCharset.fromHttpHeader(mm.charset)
    val utf8 = graft.core.GbCharset.toUtf8(body, hdr)
    assert(new String(utf8, java.nio.charset.StandardCharsets.UTF_8).contains("cafИ"))
  }
}
