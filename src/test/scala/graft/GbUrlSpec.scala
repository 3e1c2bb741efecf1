package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.GbUrl

class GbUrlSpec extends AnyFunSuite {

  private def canon(s: String): String = GbUrl.parse(s).url

  test("scheme defaulting and lowercase host") {
    assert(canon("WWW.Example.COM/Path") == "http://www.example.com/Path")
    assert(canon("HTTP://WWW.EXAMPLE.COM/A") == "http://www.example.com/A")
    assert(canon("//slashdot.org/story") == "http://slashdot.org/story")
  }

  test("http://http:// collapse") {
    assert(canon("http://http://www.x.com/") == "http://www.x.com/")
  }

  test("leading junk skipped, whitespace terminates") {
    assert(canon("  \t http://a.com/x") == "http://a.com/x")
    assert(canon("http://a.com/x y z") == "http://a.com/x")
    // only LEADING junk is skipped; a trailing quote is legal path char
    assert(canon("\"http://a.com/\"") == "http://a.com/\"")
  }

  test("fragment dropped unless hash-bang; kept after query (reference quirk)") {
    assert(canon("http://a.com/p#frag") == "http://a.com/p")
    assert(canon("http://a.com/p#!state") == "http://a.com/p#!state")
    assert(canon("http://a.com/p?q=1#frag") == "http://a.com/p?q=1#frag")
    assert(canon("http://a.com#top") == "http://a.com/")
  }

  test("default port elision per scheme") {
    assert(canon("http://a.com:80/x") == "http://a.com/x")
    assert(canon("https://a.com:443/x") == "https://a.com/x")
    assert(canon("http://a.com:8080/x") == "http://a.com:8080/x")
    assert(canon("https://a.com:80/x") == "https://a.com:80/x")
  }

  test("path dot and dot-dot collapse") {
    assert(canon("http://a.com/b/./c") == "http://a.com/b/c")
    assert(canon("http://a.com/b/../c") == "http://a.com/c")
    assert(canon("http://a.com/b//c") == "http://a.com/b/c")
    assert(canon("http://a.com/..") == "http://a.com/")
    assert(canon("http://www.ac.uk/../../news/x.asp") == "http://www.ac.uk/news/x.asp")
  }

  test("backslash to slash") {
    assert(canon("http://a.com\\b\\c") == "http://a.com/b/c")
  }

  test("trailing host dot trimmed") {
    assert(canon("http://a.com./x") == "http://a.com/x")
  }

  test("query && collapse") {
    assert(canon("http://a.com/p?x=1&&&y=2") == "http://a.com/p?x=1&y=2")
  }

  test("domain and tld split") {
    val u = GbUrl.parse("http://www.news.bbc.co.uk/stories/1.html")
    assert(u.host == "www.news.bbc.co.uk")
    assert(u.tld == "co.uk")
    assert(u.domain == "bbc.co.uk")
    val v = GbUrl.parse("http://example.com/")
    assert(v.domain == "example.com" && v.tld == "com")
    // any all-alpha label is a TLD (Domains.cpp:101-107)
    val w = GbUrl.parse("http://www.h3.test/")
    assert(w.tld == "test" && w.domain == "h3.test")
  }

  test("whole-host tld yields no domain") {
    val u = GbUrl.parse("http://com/")
    assert(u.domain == "" && u.tld == "")
  }

  test("ip-as-host") {
    val u = GbUrl.parse("http://1.2.3.4/x")
    assert(u.ip != 0)
    assert(u.domain == "1.2.3") // getDomainOfIp
    assert(u.tld == "")
    // network-byte-order int read little-endian: 1 | 2<<8 | 3<<16 | 4<<24
    assert(u.ip == (1 | (2 << 8) | (3 << 16) | (4 << 24)))
  }

  test("addWWW only when host==domain") {
    assert(GbUrl.parse("http://example.com/", addWWW = true).url == "http://www.example.com/")
    assert(GbUrl.parse("http://sub.example.com/", addWWW = true).url == "http://sub.example.com/")
  }

  test("session-id strip (flag-gated, default off)") {
    assert(canon("http://a.com/p?PHPSESSID=737aec14eb7b360983d4fe39395&p=1") ==
      "http://a.com/p?PHPSESSID=737aec14eb7b360983d4fe39395&p=1") // default OFF
    def strip(s: String) = GbUrl.parse(s, addWWW = false, stripSessionId = true).url
    assert(strip("http://a.com/p?PHPSESSID=737aec14eb7b360983d4fe39395&p=1") == "http://a.com/p?p=1")
    assert(strip("http://a.com/p.jhtml;jsessionid=J4QMFWBG1SPRVWCKUUXCJ0W?pp=1") == "http://a.com/p.jhtml?pp=1")
    // short ids (<5 chars) are kept
    assert(strip("http://a.com/p?session=abc") == "http://a.com/p?session=abc")
    // alnum char before pattern → not a session id (DAVESID=)
    assert(strip("http://a.com/p?DAVESID=0123456789ab&x=1") == "http://a.com/p?DAVESID=0123456789ab&x=1")
  }

  test("common filename strip (flag-gated)") {
    def strip(s: String) = GbUrl.parse(s, addWWW = false, stripCommonFile = true).url
    assert(strip("http://a.com/index.html") == "http://a.com/")
    assert(strip("http://a.com/sub/default.asp") == "http://a.com/sub/")
    assert(canon("http://a.com/index.html") == "http://a.com/index.html") // default OFF
  }

  test("filename and extension") {
    val u = GbUrl.parse("http://a.com/dir/pic.JPG")
    assert(u.filename == "pic.JPG")
    assert(u.extension == "JPG")
    assert(u.hasMediaExtension)
    val v = GbUrl.parse("http://a.com/style.css?v=2")
    assert(v.extension == "css" && v.hasMediaExtension)
    val w = GbUrl.parse("http://a.com/page.html")
    assert(!w.hasMediaExtension)
  }

  test("isRoot / isSimpleSubdomain / isCgi") {
    assert(GbUrl.parse("http://www.a.com/").isRoot)
    assert(!GbUrl.parse("http://www.a.com/x").isRoot)
    assert(!GbUrl.parse("http://www.a.com/?x=1").isRoot)
    assert(GbUrl.parse("http://www.a.com/").isSimpleSubdomain)
    assert(GbUrl.parse("http://a.com/").isSimpleSubdomain)
    assert(!GbUrl.parse("http://blog.a.com/").isSimpleSubdomain)
    assert(GbUrl.parse("http://a.com/?x").isCgi)
  }

  test("warc/arc classifiers") {
    assert(GbUrl.parse("http://a.com/f.warc").isWarc)
    assert(GbUrl.parse("http://a.com/f.warc.gz").isWarc)
    assert(GbUrl.parse("http://a.com/f.arc.gz").isArc)
    assert(!GbUrl.parse("http://a.com/f.html").isWarc)
  }

  test("relative resolution") {
    val base = GbUrl.parse("http://a.com/dir/page.html")
    assert(GbUrl.parseRel(base, "other.html").url == "http://a.com/dir/other.html")
    assert(GbUrl.parseRel(base, "/rooted").url == "http://a.com/rooted")
    assert(GbUrl.parseRel(base, "../up.html").url == "http://a.com/up.html")
    assert(GbUrl.parseRel(base, "http://b.com/x").url == "http://b.com/x")
    assert(GbUrl.parseRel(base, "//c.com/y").url == "http://c.com/y")
    assert(GbUrl.parseRel(base, "?page=3").url == "http://a.com/dir/page.html?page=3")
    val baseQ = GbUrl.parse("http://a.com/dir/page.html?z=1")
    assert(GbUrl.parseRel(baseQ, "n.html").url == "http://a.com/dir/n.html")
  }

  test("punycode host, %-encoded path") {
    val u = GbUrl.parse("http://bücher.example/straße")
    assert(u.host.startsWith("xn--"))
    assert(u.host == "xn--bcher-kva.example")
    assert(u.path.contains("%C3%9F"))
  }

  test("idempotence: parse(parse(u).url).url == parse(u).url (Url.cpp:826-838)") {
    for {
      scheme <- Seq("http://", "https://", "", "HTTP://")
      host <- Seq("www.example.com", "EXAMPLE.com", "a.b.co.uk", "1.2.3.4", "h-1.test", "x.y.z.w.v.com.")
      port <- Seq("", ":80", ":443", ":8080")
      path <- Seq("", "/", "/a/b", "/a/../b", "/a/./b", "/a//b", "/p.html#f", "/p?x=1&&y=2", "/p?q#f", "/.", "/..")
    } {
      val raw = scheme + host + port + path
      val once = GbUrl.parse(raw)
      if (once.isValid) {
        val twice = GbUrl.parse(once.url)
        assert(twice.url == once.url, s"raw=$raw once=${once.url} twice=${twice.url}")
      }
    }
  }

  test("uh48 of canonical url is stable and within 48 bits") {
    val u = GbUrl.parse("http://www.example.com/a")
    assert((u.uh48 >>> 48) == 0L)
  }
}
