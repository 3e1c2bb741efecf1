package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.frontier._

/** Ad-hoc driver for verifying library behavior (see .claude/skills/verify).
  *
  * Current check: the chained-in-memory loop (async checkpoint writes)
  * must leave a disk chain EQUAL at every snapshot to the legacy
  * per-iteration-synchronous loop — same rows in every table readers
  * resolve (requests, replies, titledb, all keyed state chains,
  * ip_counts, ip_next, fetch_log). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val iters = 7 // crosses the compaction at 4 and the rss iterations
    val dChained = java.nio.file.Files.createTempDirectory("graft_eq_chain").toString
    val dLegacy = java.nio.file.Files.createTempDirectory("graft_eq_sync").toString
    val rc = Crawl.run(spark, dChained, Corpus.micro, iters,
      Crawl.Config(loopChainState = true))
    val rl = Crawl.run(spark, dLegacy, Corpus.micro, iters,
      Crawl.Config(loopChainState = false))
    require(rc == rl, s"IterationResults differ:\n  chained=$rc\n  legacy =$rl")

    def eq(name: String, a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame): Unit = {
      val cols = a.columns.sorted.map(col)
      val da = a.select(cols: _*); val db = b.select(cols: _*)
      val extraA = da.exceptAll(db).count()
      val extraB = db.exceptAll(da).count()
      if (extraA != 0 || extraB != 0) {
        println(s"MISMATCH $name: onlyChained=$extraA onlyLegacy=$extraB")
        da.exceptAll(db).show(5, false)
        db.exceptAll(da).show(5, false)
        sys.error(s"table $name differs")
      } else println(f"OK $name%-24s rows=${da.count()}")
    }
    val cfg = Crawl.Config()
    for (i <- iters to iters) {
      eq(s"requests@$i", Crawl.loadRequests(spark, dChained, i).toDF, Crawl.loadRequests(spark, dLegacy, i).toDF)
      eq(s"replies@$i", Crawl.loadReplies(spark, dChained, i).toDF, Crawl.loadReplies(spark, dLegacy, i).toDF)
      eq(s"titledb@$i", Crawl.loadTitledb(spark, dChained, i).toDF, Crawl.loadTitledb(spark, dLegacy, i).toDF)
      eq(s"ip_state@$i", Crawl.loadIpState(spark, dChained, i).toDF, Crawl.loadIpState(spark, dLegacy, i).toDF)
      eq(s"dom_state@$i", Crawl.loadDomState(spark, dChained, i).toDF, Crawl.loadDomState(spark, dLegacy, i).toDF)
      eq(s"inlink_state@$i", Crawl.loadInlinkState(spark, dChained, i).toDF, Crawl.loadInlinkState(spark, dLegacy, i).toDF)
      eq(s"tag_state@$i", Crawl.loadTagState(spark, dChained, i).toDF, Crawl.loadTagState(spark, dLegacy, i).toDF)
      eq(s"quota_state@$i", Crawl.loadQuotaState(spark, dChained, i), Crawl.loadQuotaState(spark, dLegacy, i))
      eq(s"ip_counts@$i", Crawl.loadIpCounts(spark, dChained, i), Crawl.loadIpCounts(spark, dLegacy, i))
      (Crawl.loadIpNext(spark, dChained, i, cfg), Crawl.loadIpNext(spark, dLegacy, i, cfg)) match {
        case (Some(a), Some(b)) => eq(s"ip_next@$i", a, b)
        case (None, None) => println(s"OK ip_next@$i (both absent)")
        case (a, b) => sys.error(s"ip_next presence differs: chained=${a.isDefined} legacy=${b.isDefined}")
      }
    }
    // per-iteration fetch logs (crawl ORDER, not just final state)
    for (i <- 1 to iters)
      eq(s"fetch_log@$i",
        spark.read.parquet(s"${Crawl.snapDir(dChained, i)}/fetch_log"),
        spark.read.parquet(s"${Crawl.snapDir(dLegacy, i)}/fetch_log"))
    println("EQUIVALENCE OK")
    spark.stop()
  }
}
