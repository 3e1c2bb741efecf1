package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{GbHash, GbUrl, SiteGetter}
import graft.frontier._
import org.apache.spark.sql.SparkSession

/** Minimal-tagdb behavior: warm/cold outlink site resolution
  * (XmlDoc.cpp:8895-8920), the site-root hop decision against the
  * resolved site (isSiteRootFunc3, XmlDoc.cpp:27766), firstip pinning
  * (Spider.h:108-118), and sitenuminlinks floors
  * (XmlDoc.cpp:27677-27695). */
class TagdbSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("tagdb-spec").getOrCreate()

  import Crawl.{FetchResult, ResolvedOutlink}

  private def task(url: String, ip: Int): FetchTask =
    FetchTask(GbUrl.parse(url).uh48, ip, url, 50, 0, 0L, 1, 0)

  private def outlink(url: String, hop: Int, flags: Long = Flags.IsNewOutlink): FrontierRequest = {
    val u = GbUrl.parse(url)
    FrontierRequest(u.uh48, 0, u.url, u.hostHash32, u.domHash32,
      u.hostHash32, -1, 100L, 100L, hop, "", flags, 0, 0L)
  }

  private def result(parentUrl: String, parentIp: Int, outs: Seq[FrontierRequest]): FetchResult =
    FetchResult(task(parentUrl, parentIp), found = true, allowed = true, 250, 200,
      Errs.OK, "en", 1, 0L, outs, "")

  private def resolve(results: Seq[FetchResult], hm: Seq[HostMeta],
                      tags: Seq[TagState]): Seq[ResolvedOutlink] = {
    import spark.implicits._
    Crawl.resolveOutlinks(
      spark.createDataset(results), spark.createDataset(hm), spark.createDataset(tags))
      .collect().toSeq
  }

  test("cold outlink: site = raw host, no www-prepend (XmlDoc.cpp:8916-8919)") {
    val rs = resolve(
      Seq(result("http://www.p.test/", 500, Seq(outlink("http://h3.test/~u1/a.html", 2)))),
      Seq(HostMeta("h3.test", 777, -1)), Nil)
    assert(rs.size == 1)
    assert(rs.head.req.site_hash32 == GbHash.hash32("h3.test"))
    assert(rs.head.link_site == "h3.test")
    assert(rs.head.req.first_ip == 777)
    // but the tagdb KEY (pin target) is the SiteGetter guess
    assert(rs.head.tag_key == "www.h3.test/~u1/")
  }

  test("warm outlink: tagdb site tag wins, sni from cblocks") {
    val site = "www.h3.test/~u1/"
    val tags = Seq(TagState(GbHash.hash32(site), site, 777, has_site_tag = true, Array(1, 2, 9), 1))
    val rs = resolve(
      Seq(result("http://www.p.test/", 500, Seq(outlink("http://h3.test/~u1/a.html", 2)))),
      Seq(HostMeta("h3.test", 888, 1)), tags)
    assert(rs.head.req.site_hash32 == GbHash.hash32(site))
    // pinned ip beats DNS
    assert(rs.head.req.first_ip == 777)
    // tag sni (3 cblocks) beats the sitelinks floor (1)
    assert(rs.head.req.site_num_inlinks == 3)
  }

  test("sitelinks floor raises a smaller tag sni (XmlDoc.cpp:27690-27695)") {
    val site = "www.q.test"
    val tags = Seq(TagState(GbHash.hash32(site), site, 0, has_site_tag = true, Array(4), 1))
    val rs = resolve(
      Seq(result("http://www.p.test/", 500, Seq(outlink("http://q.test/x.html", 2)))),
      Seq(HostMeta("q.test", 888, 6)), tags)
    assert(rs.head.req.site_num_inlinks == 6)
  }

  test("site-root hop 0 flips once the www-prepended tag exists (isSiteRootFunc3 quirk)") {
    val out = outlink("http://h3.test/", 3)
    // cold: site = "h3.test"; url-minus-scheme-minus-slash = "h3.test" → root, hop 0
    val cold = resolve(Seq(result("http://www.p.test/", 500, Seq(out))),
      Seq(HostMeta("h3.test", 777, -1)), Nil)
    assert(cold.head.req.hop_count == 0)
    // warm: site tag = "www.h3.test" → no longer a site root, hop kept
    val site = "www.h3.test"
    val warm = resolve(Seq(result("http://www.p.test/", 500, Seq(out))),
      Seq(HostMeta("h3.test", 777, -1)),
      Seq(TagState(GbHash.hash32(site), site, 0, has_site_tag = true, Array.empty, 1)))
    assert(warm.head.req.hop_count == 3)
  }

  test("sameSite flag vs the parent's SiteGetter site (XmlDoc.cpp:27890)") {
    val parent = "http://www.s.test/a/"
    val rs = resolve(
      Seq(result(parent, 500, Seq(
        outlink("http://www.s.test/b.html", 2), outlink("http://www.other.test/", 2)))),
      Nil, Nil)
    val bySite = rs.map(r => r.req.url -> Flags.has(r.req.flags, Flags.SameSite)).toMap
    assert(bySite("http://www.s.test/b.html"))
    assert(!bySite("http://www.other.test/"))
  }

  test("firstip pin survives a DNS change (Spider.h:108-118)") {
    val out = outlink("http://www.m.test/x.html", 2)
    val first = resolve(Seq(result("http://www.p.test/", 500, Seq(out))),
      Seq(HostMeta("www.m.test", 111, -1)), Nil)
    assert(first.head.req.first_ip == 111)
    // the pin row the loop would write (stamp 1)
    val pin = TagState(first.head.tag_key_hash32, first.head.tag_key, 111, has_site_tag = false, Array.empty, 1)
    // DNS now says 222 — the pinned tag still wins
    val later = resolve(Seq(result("http://www.p.test/", 500, Seq(out))),
      Seq(HostMeta("www.m.test", 222, -1)), Seq(pin))
    assert(later.head.req.first_ip == 111)
  }

  test("combineTags: pin keeps the earliest stamp's ip; cblocks keep the cap smallest") {
    val a = TagState(1, "www.x.test", 0, has_site_tag = false, Array(5, 9), 3)
    val b = TagState(1, "www.x.test", 42, has_site_tag = true, Array(2, 9, 11), 2)
    val m = Crawl.combineTags(a, b, 3)
    assert(m.first_ip == 42 && m.has_site_tag && m.stamp == 2)
    assert(m.cblocks.toSeq == Seq(2, 5, 9))
    // associativity with a third, earlier pin
    val c = TagState(1, "www.x.test", 7, has_site_tag = false, Array(1), 1)
    val l = Crawl.combineTags(Crawl.combineTags(a, b, 3), c, 3)
    val r = Crawl.combineTags(a, Crawl.combineTags(b, c, 3), 3)
    assert(l == r.copy(cblocks = l.cblocks) && l.cblocks.toSeq == r.cblocks.toSeq)
    assert(l.first_ip == 7)
  }
}
