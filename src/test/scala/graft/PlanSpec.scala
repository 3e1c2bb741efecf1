package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.textops.TextOps

/** Physical-plan shape assertions for the scale-critical textops: the
  * properties that make an operator survive a 100× scale-up are plan
  * properties, so pin them (VERDICT r1: "assert via plan string"). */
class PlanSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("dedup_exact: hash aggregate, no window sort over the full text") {
    val p = plan(TextOps.exactDupCounts(docs))
    assert(!p.contains("Window"), s"window (full-text sort) in plan:\n$p")
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"),
      s"expected hash aggregate with map-side combine:\n$p")
  }

  test("dedup_embedding_cosine: no CartesianProduct (bounded broadcast loop)") {
    val p = plan(TextOps.embeddingDupPairs(emb, 300L, 35))
    assert(!p.contains("CartesianProduct"), s"cartesian product in plan:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"), s"expected broadcast NL join:\n$p")
  }

  test("dedup_embedding_lsh: candidate generation is an equi-join on band keys") {
    val p = plan(TextOps.embeddingLshDupPairs(emb, 90))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pairwise join must be an equi-join on (band, bkey):\n$p")
  }

  test("dedup_minhash_lsh: equi-join on band buckets, no cartesian") {
    val p = plan(TextOps.minhashLshCandidates(docs, 32, 8, 500L))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("schedule: frontier is exchanged once, on first_ip") {
    import spark.implicits._
    val reqs = spark.createDataset((0 until 100).map { k =>
      val u = graft.core.GbUrl.parse(s"http://h$k.test/p.html")
      graft.frontier.FrontierRequest(u.uh48, k + 1, u.url, u.hostHash32, u.domHash32,
        u.hostHash32, -1, 1400000000L, 1400000000L, 1, "", 0L, 0, 0L)
    })
    val batch = graft.frontier.Crawl.schedule(reqs,
      spark.emptyDataset[graft.frontier.FrontierReply],
      spark.emptyDataset[graft.frontier.IpState],
      spark.emptyDataset[graft.frontier.DomState],
      graft.frontier.Crawl.Config(), 1)
    val p = plan(batch.toDF())
    // exactly one exchange keyed by the frontier's first_ip partitioning;
    // the reply/state/inlink sides broadcast at this scale
    val exchanges = "Exchange hashpartitioning\\(first_ip".r.findAllIn(p).length
    assert(exchanges == 1, s"expected ONE frontier exchange on first_ip, got $exchanges:\n$p")
    // A2 winner selection is the BOUNDED-heap streamed operator, not a
    // window (a window's per-IP full sort buffers an entire skewed IP
    // in one task — the 100-TB scale-killer) and not the r3
    // partial+final aggregate (whose per-heap serde was the r3 schedule
    // kernel's top cost): ONE WinnerDole pass over the ip-sorted stream
    assert(!p.contains("Window"), s"winner selection must not be a Window:\n$p")
    assert(p.contains("WinnerDole"), s"expected the WinnerDole operator:\n$p")
    assert(!p.contains("winner_topk"), s"the groupBy(winner_topk) aggregate shape is retired:\n$p")
  }

  test("scheduleWake: due-IP semi-join prunes the frontier scan BELOW the exchange") {
    import spark.implicits._
    val reqs = spark.createDataset((0 until 100).map { k =>
      val u = graft.core.GbUrl.parse(s"http://h$k.test/p.html")
      graft.frontier.FrontierRequest(u.uh48, k + 1, u.url, u.hostHash32, u.domHash32,
        u.hostHash32, -1, 1400000000L, 1400000000L, 1, "", 0L, 0, 0L)
    })
    val due = Seq(1, 2, 3).toDF("first_ip")
    val so = graft.frontier.Crawl.scheduleWake(reqs,
      spark.emptyDataset[graft.frontier.FrontierReply],
      spark.emptyDataset[graft.frontier.IpState],
      spark.emptyDataset[graft.frontier.DomState],
      graft.frontier.Crawl.Config(), 1,
      spark.emptyDataset[graft.frontier.InlinkState], null,
      Some(due.withColumn("next_ms", lit(0L))))
    assert(so.wake, "default rules must be wake-safe")
    val p = plan(so.dole)
    // the semi-join on the due set must appear, and it must sit BELOW
    // the first_ip exchange (non-due rows never shuffle)
    assert(p.contains("LeftSemi"), s"expected the due-IP semi-join:\n$p")
    val semiAt = p.indexOf("LeftSemi")
    val exAt = p.indexOf("Exchange hashpartitioning(first_ip")
    assert(exAt >= 0 && semiAt > exAt,
      s"semi-join must be under the exchange (appear after it in the tree):\n$p")
  }
}
