package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.GbUrl
import graft.frontier._
import graft.rules._

/** F6 site list + F4 matchesucp/matchesupp + isparentindexed. */
class SiteListSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("site-list line grammar and matching (PageBasic.cpp)") {
    val sl = new SiteList(Seq(
      "# a comment",
      "",
      "example.com",                      // domain match
      "sub.other.com",                    // host match
      "seed:http://www.seedy.com/",       // url-prefix pattern
      "site:dir.site.com/docs/",          // host + path prefix
      "contains:goodword",
      "-contains:badword",
      "tag:shallow depth.com"
    ))
    assert(!sl.isEmpty)
    def m(u: String) = sl.matchingPattern(GbUrl.parse(u))
    assert(m("http://example.com/x"))
    assert(m("http://www.example.com/x")) // domain pattern matches any host in dom
    assert(m("http://sub.other.com/a"))
    assert(!m("http://www.other.com/a")) // host pattern: other hosts don't match
    assert(m("http://www.seedy.com/page")) // url prefix
    assert(!m("http://seedy.com/page")) // prefix is exact (no www in url)
    assert(m("http://dir.site.com/docs/a.html"))
    assert(!m("http://dir.site.com/other/a.html")) // path prefix mismatch
    assert(m("http://random.net/goodword/x")) // positive contains
    assert(!m("http://example.com/badword")) // negative contains vetoes
    // tag matching
    assert(sl.matchingPattern(GbUrl.parse("http://depth.com/x"), "shallow"))
    assert(!sl.matchingPattern(GbUrl.parse("http://depth.com/x"), "deep"))
    assert(!sl.matchingPattern(GbUrl.parse("http://example.com/x"), "shallow"))
  }

  test("empty site list: insitelist matches everything (delete rule stays dead)") {
    val sl = new SiteList(Seq("# only comments", ""))
    assert(sl.isEmpty)
  }

  test("insitelist gates the crawl: off-list urls hit the forceDelete row") {
    // default web table row 2: "!ismanualadd && !insitelist" → delete.
    val ctx = RuleCtx(siteListEmpty = false,
      siteListMatch = u => u.contains("inlist.com"))
    val inReq = UfnRequest(url = "http://inlist.com/x", hopCount = 1, isNewOutlink = true)
    val outReq = UfnRequest(url = "http://other.com/x", hopCount = 1, isNewOutlink = true)
    val now = 1400003600L
    val nIn = UrlFilters.urlFilterNumCtx(inReq, None, now, UrlFilters.defaultWebRules, ctx)
    val nOut = UrlFilters.urlFilterNumCtx(outReq, None, now, UrlFilters.defaultWebRules, ctx)
    assert(!UrlFilters.defaultWebRules(nIn).forceDelete, s"in-list got rule $nIn")
    assert(UrlFilters.defaultWebRules(nOut).forceDelete && UrlFilters.defaultWebRules(nOut).expr.contains("insitelist"),
      s"off-list url must hit the delete row, got $nOut")
    // manual adds survive even off-list
    val manual = outReq.copy(isAddUrl = true)
    val nMan = UrlFilters.urlFilterNumCtx(manual, None, now, UrlFilters.defaultWebRules, ctx)
    assert(!UrlFilters.defaultWebRules(nMan).forceDelete)
  }

  test("matchesucp/matchesupp (Spider.cpp:11714-11777)") {
    val rules = Vector(
      UrlFilterRule("matchesucp && hopcount>=0", harvestLinks = true, 1, 9, 7, 1000, 60),
      UrlFilterRule("default", harvestLinks = true, 10, 9, 7, 1000, 1))
    val now = 1400003600L
    // substring list
    val ctx1 = RuleCtx(patterns = CrawlPatterns(ucp = Seq("/blog/", "/news/")))
    def ufn(u: String, ctx: RuleCtx, isAdd: Boolean = false) =
      UrlFilters.urlFilterNumCtx(UfnRequest(url = u, hopCount = 1, isAddUrl = isAdd), None, now, rules, ctx)
    assert(ufn("http://a.com/blog/x", ctx1) == 0)
    assert(ufn("http://a.com/other/x", ctx1) == 1) // no match → falls through
    assert(ufn("http://a.com/other/x", ctx1, isAdd = true) == 0) // manual add passes
    // regex wins over substrings
    val ctx2 = RuleCtx(patterns = CrawlPatterns(
      ucp = Seq("/never/"), ucr = Some(java.util.regex.Pattern.compile("/item\\d+"))))
    assert(ufn("http://a.com/item123", ctx2) == 0)
    assert(ufn("http://a.com/blog/x", ctx2) == 1)
    // unconfigured → token always passes
    assert(ufn("http://a.com/whatever", RuleCtx()) == 0)
    // upp has NO manual-add override
    val rulesUpp = Vector(
      UrlFilterRule("matchesupp", harvestLinks = true, 1, 9, 7, 1000, 60),
      UrlFilterRule("default", harvestLinks = true, 10, 9, 7, 1000, 1))
    val ctx3 = RuleCtx(patterns = CrawlPatterns(upp = Seq("/proc/")))
    val nAdd = UrlFilters.urlFilterNumCtx(UfnRequest(url = "http://a.com/x", hopCount = 1, isAddUrl = true),
      None, now, rulesUpp, ctx3)
    assert(nAdd == 1, "manual add must NOT override matchesupp")
  }

  test("interpreter fallback engages for site-list crawls (compiled == interpreted)") {
    import spark.implicits._
    val cfg = Crawl.Config(siteList = Seq("h0.test", "h1.test"))
    val reqs = spark.createDataset((0 until 6).map { k =>
      val u = GbUrl.parse(s"http://www.h$k.test/p.html")
      FrontierRequest(u.uh48, k + 1, u.url, u.hostHash32, u.domHash32, u.hostHash32,
        -1, 1400000000L, 1400000000L, 1, "", Flags.IsNewOutlink, 0, 0L)
    })
    val batch = Crawl.schedule(reqs, spark.emptyDataset[FrontierReply],
      spark.emptyDataset[IpState], spark.emptyDataset[DomState], cfg, 1).collect()
    // only h0/h1 survive (others hit the !insitelist delete row)
    assert(batch.map(_.url).toSet ==
      Set("http://www.h0.test/p.html", "http://www.h1.test/p.html"), batch.mkString(", "))
  }
}
