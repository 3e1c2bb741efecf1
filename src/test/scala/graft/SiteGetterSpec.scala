package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{GbHash, GbUrl, SiteGetter}

/** SiteGetter port spec — expectations derive from reading
  * `/root/reference/src/SiteGetter.cpp` (cited per case). */
class SiteGetterSpec extends AnyFunSuite {

  test("plain host is its own site (setSite, SiteGetter.cpp:619-660)") {
    assert(SiteGetter.site("http://www.h3.test/s1/leaf0.html") == "www.h3.test")
    assert(SiteGetter.site("http://www.h3.test/") == "www.h3.test")
  }

  test("domain-only url gets www. prepended (SiteGetter.cpp:655-659)") {
    assert(SiteGetter.site("http://h3.test/") == "www.h3.test")
    assert(SiteGetter.site("http://h3.test/s1/") == "www.h3.test")
    assert(SiteGetter.site("http://example.com/page.html") == "www.example.com")
  }

  test("~user dirs are their own site (setRecognizedSite, :611,630-676)") {
    assert(SiteGetter.site("http://www.x.test/~fred/") == "www.x.test/~fred/")
    assert(SiteGetter.site("http://www.x.test/~fred/a/b.html") == "www.x.test/~fred/")
    assert(SiteGetter.site("http://www.x.test/~fred") == "www.x.test/~fred/")
    // domain-only + recognized pattern: www. prepended (:651-659)
    assert(SiteGetter.site("http://x.test/~fred/a.html") == "www.x.test/~fred/")
  }

  test("/users/ /user/ /members/ family (:612-618)") {
    assert(SiteGetter.site("http://www.x.test/users/jamie/p.html") == "www.x.test/users/jamie/")
    assert(SiteGetter.site("http://www.x.test/user/bob/") == "www.x.test/user/bob/")
    assert(SiteGetter.site("http://www.x.test/members/ann") == "www.x.test/members/ann/")
    assert(SiteGetter.site("http://www.x.test/membre/luc/x") == "www.x.test/membre/luc/")
  }

  test("username must contain an alnum char (:634-644)") {
    // "/users/" followed by nothing or pure punctuation is NOT a user site
    assert(SiteGetter.site("http://www.x.test/users/") == "www.x.test")
    assert(SiteGetter.site("http://www.x.test/users/---/p") == "www.x.test")
    // digits count (stackoverflow.com/users/271376, :640)
    assert(SiteGetter.site("http://www.x.test/users/271376/sig") == "www.x.test/users/271376/")
  }

  test("username scan stops at '?' (:637)") {
    assert(SiteGetter.site("http://www.x.test/users/fred?tab=1") == "www.x.test/users/fred/")
  }

  test("homestead hosts: first path component (:681-720)") {
    assert(SiteGetter.site("http://twitter.com/jack/status/1") == "www.twitter.com/jack/")
    assert(SiteGetter.site("http://vimeo.com/someuser/videos") == "www.vimeo.com/someuser/")
    assert(SiteGetter.site("http://www.facebook.com/acct/photos") == "www.facebook.com/acct/")
    // root path on a homestead host: just the hostname (:700-714)
    assert(SiteGetter.site("http://twitter.com/") == "www.twitter.com")
    // myspace only matches with the www spelling (:683)
    assert(SiteGetter.site("http://myspace.com/band/x") == "www.myspace.com")
  }

  test("member.php?u= forum pattern (:619)") {
    assert(SiteGetter.site("http://www.x.test/member.php?u=123") == "www.x.test/member.php?u=123/")
  }

  test("isSiteRootFunc3 (XmlDoc.cpp:21395-21406)") {
    val hostHash = GbHash.hash32("www.h3.test")
    assert(SiteGetter.isSiteRoot("http://www.h3.test/", hostHash))
    assert(SiteGetter.isSiteRoot("http://www.h3.test", hostHash))
    assert(!SiteGetter.isSiteRoot("http://www.h3.test/s1/", hostHash))
    // the www-prepend quirk: once the site tag says www.h3.test, the
    // domain-only root no longer matches
    assert(!SiteGetter.isSiteRoot("http://h3.test/", hostHash))
    assert(SiteGetter.isSiteRoot("http://h3.test/", GbHash.hash32("h3.test")))
    // QUIRK: a recognized site stores a trailing '/' in its tag
    // (SiteGetter.cpp:668-676) but isSiteRootFunc3 strips the url's
    // trailing '/' before hashing (XmlDoc.cpp:21399) — so user-dir site
    // roots NEVER test as site roots and keep their parent-derived hop
    val userSiteTag = GbHash.hash32("www.x.test/~fred/")
    assert(!SiteGetter.isSiteRoot("http://www.x.test/~fred/", userSiteTag))
  }

  test("hasSubdomain (Url.cpp:2094-2154)") {
    assert(SiteGetter.hasSubdomain(GbUrl.parse("http://www.h3.test/")))
    assert(!SiteGetter.hasSubdomain(GbUrl.parse("http://h3.test/")))
    assert(SiteGetter.hasSubdomain(GbUrl.parse("http://a.b.h3.test/")))
    // ip hostnames count as having a subdomain (:2133-2136)
    assert(SiteGetter.hasSubdomain(GbUrl.parse("http://10.5.66.32/")))
  }
}
