package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.frontier._

/** Ad-hoc driver for verifying library behavior (see .claude/skills/verify). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft_scratch").toString
    val res = Crawl.run(spark, work, Corpus.micro, 8)
    res.zipWithIndex.foreach { case (r, i) =>
      println(s"iter ${i + 1}: scheduled=${r.scheduled} fetched=${r.fetched} robots=${r.robotsDenied} errs=${r.errors} new=${r.newUrls}")
    }
    val logs = (1 to 8).map(i => spark.read.parquet(s"${Crawl.snapDir(work, i)}/fetch_log")).reduce(_ unionByName _)
    println("--- feed fetches:")
    logs.filter(col("url").contains("feed")).orderBy("iteration", "url").show(20, false)
    val reqs = Crawl.loadRequests(spark, work, 8)
    println("--- host5 requests (s1/leaf1 must be hop 2 — the forced-hop pin):")
    reqs.filter(col("url").contains("h5.test")).select("url", "hop_count", "flags").orderBy("url").show(30, false)
    println("--- ahref targets (h6/s2 via feed2 desc of h5 (5+9=14->h14? check), h2/s2 via feed desc) present ONLY if legitimately linked:")
    reqs.filter(col("url") === "http://www.h6.test/s2/" || col("url") === "http://www.h2.test/s2/").select("url", "hop_count").show(10, false)
    println("--- seed root requests (revised under real ip after compaction @8):")
    reqs.filter(col("hop_count") === 0 && col("url").rlike("^http://www.h[015].test/$"))
      .select("url", "first_ip", "flags").orderBy("url", "first_ip").show(10, false)
    println("--- EFAKE replies present:")
    Crawl.loadReplies(spark, work, 8).filter(col("err_code") === Errs.EFAKEFIRSTIP)
      .select("uh48", "first_ip", "spidered_time").show(5, false)
    spark.stop()
  }
}
