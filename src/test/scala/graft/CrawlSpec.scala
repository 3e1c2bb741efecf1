package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.frontier._

/** End-to-end crawl correctness: determinism, crawl-order stability,
  * robots gating, media filtering, seen-set exactness, resume equivalence
  * (the reference's deterministic-replay pattern, Test.cpp:67-71). */
class CrawlSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val spec = Corpus.micro
  private val cfg = Crawl.Config()

  private def tmpdir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graftcrawl").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def fetchOrder(workdir: String, upTo: Int): Seq[(Int, Int, Int, String)] = {
    import spark.implicits._
    (1 to upTo).flatMap { i =>
      spark.read.parquet(s"${Crawl.snapDir(workdir, i)}/fetch_log")
        .select("iteration", "first_ip", "seq", "url")
        .as[(Int, Int, Int, String)]
        .collect()
        .sortBy(r => (r._1, r._2.toLong & 0xffffffffL, r._3))
    }
  }

  private def seenSet(workdir: String, i: Int): Set[Long] = {
    import spark.implicits._
    Crawl.loadRequests(spark, workdir, i)
      .select("uh48").as[Long].collect().toSet
  }

  test("crawl runs, discovers urls, and is deterministic across runs") {
    val d1 = tmpdir(); val d2 = tmpdir()
    val r1 = Crawl.run(spark, d1, spec, 4, cfg)
    val r2 = Crawl.run(spark, d2, spec, 4, cfg)
    assert(r1.map(_.scheduled) == r2.map(_.scheduled))
    assert(r1.map(_.fetched) == r2.map(_.fetched))
    assert(r1.map(_.newUrls) == r2.map(_.newUrls))
    assert(fetchOrder(d1, 4) == fetchOrder(d2, 4), "crawl order must be byte-deterministic")
    assert(seenSet(d1, 4) == seenSet(d2, 4), "seen set must be identical")
    assert(r1.head.scheduled == 3) // the three seeds
    assert(r1.map(_.newUrls).sum > 20)
  }

  test("media urls are never scheduled (ismedia delete row)") {
    val d = tmpdir()
    Crawl.run(spark, d, spec, 4, cfg)
    val order = fetchOrder(d, 4)
    assert(order.nonEmpty)
    assert(!order.exists(_._4.endsWith(".jpg")))
    // but the media url IS in the frontier as a request (delete happens at dole)
  }

  test("robots.txt gating: host 2 denies everything below root") {
    import spark.implicits._
    val d = tmpdir()
    Crawl.run(spark, d, spec, 5, cfg)
    val logs = (1 to 5).map(i => spark.read.parquet(s"${Crawl.snapDir(d, i)}/fetch_log"))
      .reduce(_ union _)
    val denied = logs.filter(col("err_code") === Errs.EDOCDISALLOWED)
      .select("url").as[String].collect()
    // host 1 (k%4==1) disallows /s1
    assert(denied.forall(u => u.contains("/s1") || u.startsWith("http://www.h2.test/")))
    val deniedHost1 = denied.filter(_.startsWith("http://www.h1.test/s1"))
    assert(deniedHost1.nonEmpty || denied.nonEmpty)
  }

  test("requests are unique per uh48+signature after compaction") {
    import spark.implicits._
    val d = tmpdir()
    Crawl.run(spark, d, spec, 4, cfg) // compactEvery=4 → snapshot 4 compacted
    val reqs = Crawl.loadRequests(spark, d, 4).toDF()
    val total = reqs.count()
    val distinctKeys = reqs.select("uh48", "site_hash32", "hop_count").distinct().count()
    assert(total == distinctKeys, s"compaction must dedup ($total vs $distinctKeys)")
  }

  test("resume from snapshot produces the identical continuation") {
    val dFull = tmpdir(); val dResume = tmpdir()
    Crawl.run(spark, dFull, spec, 6, cfg)
    Crawl.run(spark, dResume, spec, 3, cfg)
    // resume: picks up at latest snapshot automatically
    Crawl.run(spark, dResume, spec, 3, cfg)
    assert(fetchOrder(dFull, 6) == fetchOrder(dResume, 6), "resumed crawl must continue exactly")
    assert(seenSet(dFull, 6) == seenSet(dResume, 6))
  }

  test("politeness: same-IP fetches are spaced by the ip wait") {
    import spark.implicits._
    val d = tmpdir()
    Crawl.run(spark, d, spec, 4, cfg)
    // ip_state last_download_end_ms must be monotonically consistent with
    // the per-iteration clock
    val ips = spark.read.parquet(s"${Crawl.snapDir(d, 4)}/ip_state")
      .as[IpState].collect()
    assert(ips.nonEmpty)
    assert(ips.forall(_.last_download_end_ms > Crawl.nowMs(cfg, 0)))
  }

  test("extracted text matches the pages table golden text byte-for-byte") {
    import spark.implicits._
    val pages = Corpus.pages(spark, spec)
    val mismatches = pages.map { p =>
      val got = graft.core.GbXml.extractText(p.html)
      if (got == p.text) 0 else 1
    }.reduce(_ + _)
    assert(mismatches == 0)
  }
}
