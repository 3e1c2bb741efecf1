package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.frontier.{Crawl, StateTable}
import java.nio.file.Files

/** O(delta) state chains: bucketed full/delta writes, newest-bucket-wins
  * loads, path-level pruning, legacy (unbucketed) base compat.
  * Delta-merge ≡ full-merge over a real crawl is pinned separately by
  * the committed crawl goldens (CrawlSpec runs the whole loop through
  * the delta path). */
class StateTableSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val B = 8

  private def kv(rows: (Int, Long)*): DataFrame = {
    import spark.implicits._
    rows.toDF("key", "n")
  }

  private def keys(df: DataFrame) = Seq(df("key"))

  private def tmpdir(): String = Files.createTempDirectory("statetbl").toString

  private def loadAll(dir: String, i: Int): Map[Int, Long] =
    StateTable.load(spark, dir, i, "t", keys, B, kv())
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

  test("full write then delta writes: newest bucket version wins") {
    val w = tmpdir()
    StateTable.writeFull(kv(1 -> 10L, 2 -> 20L, 3 -> 30L), Seq(col("key")), B,
      s"${Crawl.snapDir(w, 0)}/t")
    // iteration 1 touches key 1's bucket: rewrite it merged
    val d1 = kv(1 -> 11L)
    val touched = StateTable.touchedBuckets(d1, keys, B)
    val prior = StateTable.loadBuckets(spark, w, 0, "t", keys, B, kv(), Some(touched))
    // prior must contain key 1 plus any same-bucket keys, nothing outside
    val priorKeys = prior.collect().map(_.getInt(0)).toSet
    assert(priorKeys.contains(1))
    val merged = prior.unionByName(d1).groupBy("key").agg(max("n").as("n"))
    StateTable.writeDelta(merged, Seq(col("key")), B, s"${Crawl.snapDir(w, 1)}/t")
    val got = loadAll(w, 1)
    assert(got(1) == 11L && got(2) == 20L && got(3) == 30L && got.size == 3)
  }

  test("untouched buckets are not re-read: loadBuckets path-prunes") {
    val w = tmpdir()
    StateTable.writeFull(kv((0 until 64).map(k => k -> k.toLong): _*), Seq(col("key")), B,
      s"${Crawl.snapDir(w, 0)}/t")
    val wanted = StateTable.touchedBuckets(kv(5 -> 0L), keys, B)
    assert(wanted.size == 1)
    val rows = StateTable.loadBuckets(spark, w, 0, "t", keys, B, kv(), Some(wanted))
      .collect().map(_.getInt(0)).toSet
    assert(rows.contains(5))
    // only ~1/8 of the keys live in that bucket
    assert(rows.size < 20, s"expected one bucket's keys, got ${rows.size}")
  }

  test("empty delta contributes nothing and does not stop the walk") {
    val w = tmpdir()
    StateTable.writeFull(kv(1 -> 1L), Seq(col("key")), B, s"${Crawl.snapDir(w, 0)}/t")
    StateTable.writeDelta(kv(), Seq(col("key")), B, s"${Crawl.snapDir(w, 1)}/t")
    assert(loadAll(w, 1) == Map(1 -> 1L))
  }

  test("legacy unbucketed base: shadowed buckets are row-filtered out") {
    val w = tmpdir()
    // legacy layout: plain parquet, no marker, no bucket dirs
    kv(1 -> 10L, 2 -> 20L, 3 -> 30L).write.parquet(s"${Crawl.snapDir(w, 0)}/t")
    val d1 = kv(2 -> 22L)
    val touched = StateTable.touchedBuckets(d1, keys, B)
    val prior = StateTable.loadBuckets(spark, w, 0, "t", keys, B, kv(), Some(touched))
    val merged = prior.unionByName(d1).groupBy("key").agg(max("n").as("n"))
    StateTable.writeDelta(merged, Seq(col("key")), B, s"${Crawl.snapDir(w, 1)}/t")
    val got = loadAll(w, 1)
    assert(got(2) == 22L && got(1) == 10L && got(3) == 30L)
  }

  test("empty full write (init) loads as empty and terminates the chain") {
    val w = tmpdir()
    StateTable.writeFull(kv(), Seq(col("key")), B, s"${Crawl.snapDir(w, 0)}/t")
    assert(loadAll(w, 0).isEmpty)
    StateTable.writeDelta(kv(7 -> 70L), Seq(col("key")), B, s"${Crawl.snapDir(w, 1)}/t")
    assert(loadAll(w, 1) == Map(7 -> 70L))
  }

  test("a full write mid-chain stops the walk (compaction reset)") {
    val w = tmpdir()
    StateTable.writeFull(kv(1 -> 1L, 9 -> 9L), Seq(col("key")), B, s"${Crawl.snapDir(w, 0)}/t")
    // compaction at snap 2 drops key 9 entirely
    StateTable.writeFull(kv(1 -> 2L), Seq(col("key")), B, s"${Crawl.snapDir(w, 2)}/t")
    assert(loadAll(w, 2) == Map(1 -> 2L), "key 9 must not leak from snap 0")
  }

  test("touchedBucketsMulti ≡ per-table touchedBuckets, in one job") {
    val a = kv(1 -> 1L, 2 -> 2L, 33 -> 3L)
    val b = kv(5 -> 5L)
    val c = kv() // empty delta → no touched buckets
    val parts = Seq[(DataFrame, DataFrame => Seq[org.apache.spark.sql.Column], Int)](
      (a, keys, B), (b, keys, B), (c, keys, B), (a, keys, 1))
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    val got = try {
      val r = StateTable.touchedBucketsMulti(parts)
      // listener events are posted asynchronously
      org.apache.spark.sql.GraftShim.waitListeners(spark)
      r
    } finally spark.sparkContext.removeSparkListener(l)
    assert(got(0) == StateTable.touchedBuckets(a, keys, B))
    assert(got(1) == StateTable.touchedBuckets(b, keys, B))
    assert(got(2) == Set.empty[Int])
    assert(got(3) == Set(0), "single-bucket table skips the scan")
    assert(jobs.get == 1, s"fused collection must be ONE job, ran ${jobs.get}")
  }
}
