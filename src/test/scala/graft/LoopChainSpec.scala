package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.frontier._

/** The chained-in-memory loop (state passed between iterations as lazy
  * plans over persisted deltas, snapshot writes drained asynchronously)
  * must leave a disk chain EQUAL at every reader-visible table to the
  * legacy per-iteration-synchronous loop — rows and crawl ORDER. This is
  * the delta-merge ≡ full-merge proof for the async checkpoint design. */
class LoopChainSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def tmpdir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graftchain").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("chained loop's disk chain equals the synchronous loop's, across a compaction") {
    val iters = 7 // crosses the compaction at 4 and the RSS iterations
    val dChained = tmpdir(); val dLegacy = tmpdir()
    val rc = Crawl.run(spark, dChained, Corpus.micro, iters, Crawl.Config(loopChainState = true))
    val rl = Crawl.run(spark, dLegacy, Corpus.micro, iters, Crawl.Config(loopChainState = false))
    assert(rc == rl, "per-iteration counters must match")

    def eq(name: String, a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame): Unit = {
      val cols = a.columns.sorted.map(col)
      val da = a.select(cols: _*); val db = b.select(cols: _*)
      assert(da.exceptAll(db).count() == 0 && db.exceptAll(da).count() == 0,
        s"table $name differs between chained and legacy loops")
    }
    val cfg = Crawl.Config()
    eq("requests", Crawl.loadRequests(spark, dChained, iters).toDF, Crawl.loadRequests(spark, dLegacy, iters).toDF)
    eq("replies", Crawl.loadReplies(spark, dChained, iters).toDF, Crawl.loadReplies(spark, dLegacy, iters).toDF)
    eq("titledb", Crawl.loadTitledb(spark, dChained, iters).toDF, Crawl.loadTitledb(spark, dLegacy, iters).toDF)
    eq("ip_state", Crawl.loadIpState(spark, dChained, iters).toDF, Crawl.loadIpState(spark, dLegacy, iters).toDF)
    eq("dom_state", Crawl.loadDomState(spark, dChained, iters).toDF, Crawl.loadDomState(spark, dLegacy, iters).toDF)
    eq("inlink_state", Crawl.loadInlinkState(spark, dChained, iters).toDF, Crawl.loadInlinkState(spark, dLegacy, iters).toDF)
    eq("tag_state", Crawl.loadTagState(spark, dChained, iters).toDF, Crawl.loadTagState(spark, dLegacy, iters).toDF)
    eq("quota_state", Crawl.loadQuotaState(spark, dChained, iters), Crawl.loadQuotaState(spark, dLegacy, iters))
    eq("ip_counts", Crawl.loadIpCounts(spark, dChained, iters), Crawl.loadIpCounts(spark, dLegacy, iters))
    (Crawl.loadIpNext(spark, dChained, iters, cfg), Crawl.loadIpNext(spark, dLegacy, iters, cfg)) match {
      case (Some(a), Some(b)) => eq("ip_next", a, b)
      case (None, None) => ()
      case (a, b) => fail(s"ip_next presence differs: chained=${a.isDefined} legacy=${b.isDefined}")
    }
    for (i <- 1 to iters)
      eq(s"fetch_log@$i",
        spark.read.parquet(s"${Crawl.snapDir(dChained, i)}/fetch_log"),
        spark.read.parquet(s"${Crawl.snapDir(dLegacy, i)}/fetch_log"))
  }

  test("resume onto a chained-written chain continues identically") {
    // 4 iterations in one run vs 2+2 across a process-boundary-style
    // resume (new run() call, chained state rebuilt from disk)
    val dOne = tmpdir(); val dTwo = tmpdir()
    Crawl.run(spark, dOne, Corpus.micro, 4, Crawl.Config(loopChainState = true))
    Crawl.run(spark, dTwo, Corpus.micro, 2, Crawl.Config(loopChainState = true))
    Crawl.run(spark, dTwo, Corpus.micro, 2, Crawl.Config(loopChainState = true))
    def rows(w: String) = Crawl.loadRequests(spark, w, 4).toDF
      .select(Crawl.loadRequests(spark, w, 4).toDF.columns.sorted.map(col): _*)
    assert(rows(dOne).exceptAll(rows(dTwo)).count() == 0 &&
      rows(dTwo).exceptAll(rows(dOne)).count() == 0,
      "split run must reproduce the single-run frontier")
  }
}
