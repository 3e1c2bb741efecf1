package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.GbUrl
import graft.frontier._
import graft.rules.UrlFilterRule

/** F7 scan-time corruption filters (Spider.cpp:4113-4183, 4466-4507) and
  * A4 dole caps (Spider.cpp:7607-7626; MAX_SPIDERS Spider.h:1637). */
class CorruptionSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val cfg = Crawl.Config()
  private val now = Crawl.nowSecs(cfg, 1)

  private def req(url: String, ip: Int, addedTime: Long = 1400000000L): FrontierRequest = {
    val u = GbUrl.parse(url)
    FrontierRequest(u.uh48, ip, url, u.hostHash32, u.domHash32, u.hostHash32,
      -1, addedTime, addedTime, 1, "", Flags.IsNewOutlink, 0, 0L)
  }

  test("corrupt requests dropped: non-http url, far-future addedTime") {
    import spark.implicits._
    val good = req("http://ok.test/a", 5)
    val badUrl = good.copy(uh48 = good.uh48 + 1, url = "garbage://x")
    val future = good.copy(uh48 = good.uh48 + 2, url = "http://ok.test/b",
      added_time = now + 200000) // > now + 86400
    val batch = Crawl.schedule(spark.createDataset(Seq(good, badUrl, future)),
      spark.emptyDataset[FrontierReply], spark.emptyDataset[IpState],
      spark.emptyDataset[DomState], cfg, 1).collect()
    assert(batch.map(_.url).toSet == Set("http://ok.test/a"))
  }

  test("corrupt replies skipped: future spideredTime, httpStatus>=1000 — older good reply wins") {
    import spark.implicits._
    val r = req("http://ok.test/c", 9)
    // good reply 30 days old (past the 20-day hopcount==1 respider wait),
    // then corrupt newer ones that must be skipped — if either corrupt
    // reply were used as "latest", its respider wait would push the row
    // out of this iteration entirely
    val goodRep = FrontierReply(r.uh48, 9, now - 30L * 86400, 0, 200, -1, 0L, "en", 1, 0f, 0L, 0)
    val futureRep = goodRep.copy(spidered_time = now + 999, content_hash32 = 2)
    val badStatus = goodRep.copy(spidered_time = now - 100, http_status = 1200, content_hash32 = 3)
    val reps = spark.createDataset(Seq(goodRep, futureRep, badStatus))
    val batch = Crawl.schedule(spark.createDataset(Seq(r)), reps,
      spark.emptyDataset[IpState], spark.emptyDataset[DomState], cfg, 1).collect()
    assert(batch.length == 1)
    // with the good reply surviving, the row is NOT new → hopcount==1
    // (not isnew) → priority 39; were a corrupt reply or no reply used,
    // priority would differ (40 isnew / tmp-error rows)
    assert(batch.head.priority == 39, s"got ${batch.head.priority}")
  }

  test("A4 dole caps (opt-in): greedy priority capped by maxSpidersPerRule, global MAX_SPIDERS") {
    import spark.implicits._
    // one greedy rule with maxSpidersPerRule=3, then default cap 5
    val rules = Vector(
      UrlFilterRule("hopcount==1", harvestLinks = true, 1, 3, 99, 1000, 60),
      UrlFilterRule("default", harvestLinks = true, 10, 5, 99, 1000, 1))
    val capCfg = Crawl.Config(rules = rules, enforceDoleCaps = true, maxSpidersGlobal = 6)
    // 10 hop-1 urls (priority 60) + 10 hop-0 urls (default, priority 1), all distinct IPs
    val reqs = (0 until 10).flatMap { k =>
      Seq(req(s"http://h$k.test/one.html", 100 + k),
        req(s"http://h$k.test/", 200 + k).copy(hop_count = 0))
    }
    val batch = Crawl.schedule(spark.createDataset(reqs), spark.emptyDataset[FrontierReply],
      spark.emptyDataset[IpState], spark.emptyDataset[DomState], capCfg, 1).collect()
    val byPri = batch.groupBy(_.priority).view.mapValues(_.length).toMap
    assert(byPri.getOrElse(60, 0) == 3, s"greedy rule must cap at 3, got $byPri")
    assert(batch.length == 6, s"global cap 6, got ${batch.length}")
    // global cap keeps the highest-priority work first
    assert(byPri.getOrElse(1, 0) == 3)
  }

  test("dole caps off by default: nothing dropped") {
    import spark.implicits._
    val reqs = (0 until 12).map(k => req(s"http://d$k.test/x.html", 300 + k))
    val batch = Crawl.schedule(spark.createDataset(reqs), spark.emptyDataset[FrontierReply],
      spark.emptyDataset[IpState], spark.emptyDataset[DomState], cfg, 1).collect()
    assert(batch.length == 12)
  }
}
