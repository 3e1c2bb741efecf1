package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.rules._

class UrlFiltersSpec extends AnyFunSuite {
  import UrlFilters._

  private val now = 1400000000L

  private def req(url: String = "http://www.a.com/x", hop: Int = 1) = UfnRequest(url = url, hopCount = hop)

  test("default web table has 24 rows with the reference constants") {
    assert(defaultWebRules.length == 24)
    assert(defaultWebRules(0).expr == "isreindex" && defaultWebRules(0).priority == 80)
    assert(defaultWebRules(1).forceDelete && defaultWebRules(1).priority == 100)
    assert(defaultWebRules.last.expr == "default" && defaultWebRules.last.priority == 1)
    assert(defaultWebRules(6).expr == "isaddurl" && defaultWebRules(6).priority == 85)
  }

  test("first-match: seed (isaddurl) hits row 6") {
    val r = req(hop = 0).copy(isAddUrl = true, fakeFirstIp = true)
    assert(urlFilterNum(r, None, now) == 6)
  }

  test("media url hits the ismedia delete row") {
    val r = req("http://www.a.com/pic.jpg").copy(hasMediaExtension = true)
    assert(urlFilterNum(r, None, now) == 1)
    assert(defaultWebRules(1).forceDelete)
  }

  test("www root new url hits hopcount==0 && iswww && isnew (row 9, pri 50)") {
    val r = req("http://www.a.com/", hop = 0)
    assert(urlFilterNum(r, None, now) == 9)
    assert(defaultWebRules(9).priority == 50)
  }

  test("non-www root new url hits hopcount==0 && isnew (row 11, pri 49)") {
    val r = req("http://a.com/", hop = 0)
    assert(urlFilterNum(r, None, now) == 11)
  }

  test("www root with reply hits hopcount==0 && iswww (row 10, pri 48)") {
    val r = req("http://www.a.com/", hop = 0).copy(hadReply = true)
    val rep = Some(UfnReply(spideredTime = now - 1000))
    assert(urlFilterNum(r, rep, now) == 10)
  }

  test("hopcount ladder") {
    assert(urlFilterNum(req(hop = 1), None, now) == 17) // isnew
    assert(urlFilterNum(req(hop = 1).copy(hadReply = true), Some(UfnReply(now - 10)), now) == 18)
    assert(urlFilterNum(req(hop = 2), None, now) == 19)
    assert(urlFilterNum(req(hop = 3), None, now) == 21)
    assert(urlFilterNum(req(hop = 9), None, now) == 21)
  }

  test("tmp error retries: errorcount rows") {
    val r = req().copy(hadReply = true)
    val tmpRep = Some(UfnReply(spideredTime = now - 10, errCode = EDNSTIMEDOUT, errCount = 1))
    assert(urlFilterNum(r, tmpRep, now) == 4) // errorcount>=1 && hastmperror → pri 45
    val tmp3 = Some(UfnReply(spideredTime = now - 10, errCode = ETCPTIMEDOUT, errCount = 3))
    assert(urlFilterNum(r, tmp3, now) == 3) // delete row
    val perm = Some(UfnReply(spideredTime = now - 10, errCode = 404, errCount = 1))
    assert(urlFilterNum(r, perm, now) == 5) // errorcount>=1 → pri 2 delete
  }

  test("numinlinks beats hopcount rows") {
    val r = req(hop = 2).copy(pageNumInlinks = 8)
    assert(urlFilterNum(r, None, now) == 7) // numinlinks>7 && isnew
  }

  test("parent rss/sitemap rows") {
    assert(urlFilterNum(req(hop = 5).copy(parentIsRSS = true), None, now) == 13)
    assert(urlFilterNum(req(hop = 5).copy(parentIsSiteMap = true), None, now) == 14)
    val old = req(hop = 5).copy(parentIsRSS = true, hadReply = true)
    assert(urlFilterNum(old, Some(UfnReply(now - 10)), now) == 15)
  }

  test("isreindex row wins over everything") {
    val r = req().copy(isPageReindex = true)
    assert(urlFilterNum(r, None, now) == 0)
  }

  test("pattern predicates") {
    val r = req("http://www.a.com/forum/showthread.php?t=1")
    assert(ruleMatches("^http://www.a.com/", r, None, now))
    assert(!ruleMatches("^https://", r, None, now))
    assert(ruleMatches("$\\.php?t=1", r, None, now)) // `$\.` hack: suffix ".php?t=1"
    assert(ruleMatches("showthread", r, None, now))
    assert(ruleMatches("!wiki", r, None, now))
    assert(!ruleMatches("wiki", r, None, now))
    assert(ruleMatches("$t=1", r, None, now))
  }

  test("tld and lang list comparisons") {
    val r = req("http://www.a.de/x")
    assert(ruleMatches("tld==de,fr", r, None, now))
    assert(!ruleMatches("tld==com,org", r, None, now))
    assert(ruleMatches("tld!=com,org", r, None, now))
    val rep = Some(UfnReply(now - 10, lang = "de"))
    assert(ruleMatches("lang==de", r, rep, now))
    assert(!ruleMatches("lang==en", r, rep, now))
  }

  test("reply-based token with no reply skips the row") {
    assert(!ruleMatches("hastmperror", req(), None, now))
    assert(!ruleMatches("errorcount>=0", req(), None, now))
    assert(!ruleMatches("lang==en", req(), None, now))
  }

  test("spiderTimeMs: max of ip-wait, crawl-delay, respider-freq") {
    val rules = defaultWebRules
    val r = req(hop = 0).copy(addedTime = 1000)
    // no reply, no prior download
    assert(spiderTimeMs(r, 12, None, rules, -1, -1) == 1000 * 1000L)
    // ip politeness: last download at 2,000,000ms + 1000ms wait
    assert(spiderTimeMs(r, 12, None, rules, 2000000L, -1) == 2001000L)
    // crawl delay dominates
    assert(spiderTimeMs(r, 12, None, rules, 2000000L, 5000) == 2005000L)
    // crawl delay capped at 60s
    assert(spiderTimeMs(r, 12, None, rules, 2000000L, 999999) == 2060000L)
    // respider frequency from reply: rule 12 (hopcount==0) freq 10 days
    val rep = Some(UfnReply(spideredTime = 3000))
    val t = spiderTimeMs(r.copy(hadReply = true), 12, rep, rules, -1, -1)
    assert(t == 3000 * 1000L + 10L * 86400 * 1000)
    // injection bypass
    assert(spiderTimeMs(r.copy(isInjecting = true), 12, None, rules, 99999999L, 5000) == 1000000L)
  }

  test("urlage / spiderwaited comparisons") {
    val r = req().copy(addedTime = now - 100, discoveryTime = now - 500)
    assert(ruleMatches("urlage>400", r, None, now)) // uses discoveryTime
    assert(!ruleMatches("urlage>600", r, None, now))
    val rep = Some(UfnReply(spideredTime = now - 50))
    assert(ruleMatches("spiderwaited>=50", r, rep, now))
    assert(!ruleMatches("spiderwaited>50", r, rep, now))
  }
}
