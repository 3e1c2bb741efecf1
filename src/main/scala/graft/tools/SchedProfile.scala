package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.frontier._
import graft.core.GbHash

/** Stage-by-stage timing of the schedule kernel to locate the gap
  * between the r2 window rate and the WinnerDole rate. */
object SchedProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.shuffle.compress", sys.env.getOrElse("P_COMPRESS", "true"))
      .config("spark.shuffle.spill.compress", sys.env.getOrElse("P_COMPRESS", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val n = 16000000L
    val urlsPerIp = 40

    def frontier() = spark.range(n).mapPartitions(_.map { i =>
      val hostIdx = i / urlsPerIp
      val p = (i % urlsPerIp).toInt
      val host = s"www.b$hostIdx.test"
      val url = if (p == 0) s"http://$host/" else s"http://$host/p$p.html"
      val ip0 = GbHash.hash32(host)
      val ip = if (ip0 == 0 || ip0 == -1) 1 else ip0
      FrontierRequest(
        uh48 = GbHash.uh48(url), first_ip = ip, url = url,
        host_hash32 = ip0, dom_hash32 = GbHash.hash32(s"b$hostIdx.test"),
        site_hash32 = ip0, site_num_inlinks = -1,
        added_time = 1400000000L, discovery_time = 1400000000L,
        hop_count = math.min(p, 4), parent_lang = "en",
        flags = Flags.IsNewOutlink, err_count = 0, parent_doc_id = 0L)
    })

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$c")
    }

    val cfg = Crawl.Config()
    // warmups
    frontier().count(); Crawl.schedule(frontier(), spark.emptyDataset[FrontierReply],
      spark.emptyDataset[IpState], spark.emptyDataset[DomState], cfg, 1).count()

    time("gen only (count)") { frontier().count() }
    time("gen+exchange") { frontier().toDF().repartition(col("first_ip")).count() }
    time("gen+exchange+sort") {
      frontier().toDF().repartition(col("first_ip"))
        .sortWithinPartitions(col("first_ip")).count()
    }
    time("full schedule (WinnerDole)") {
      Crawl.schedule(frontier(), spark.emptyDataset[FrontierReply],
        spark.emptyDataset[IpState], spark.emptyDataset[DomState], cfg, 1).count()
    }
    // dole-only: 12 trivial columns, no scoring exprs
    time("dole only (no scoring)") {
      val in = frontier().toDF().repartition(col("first_ip"))
        .select(col("first_ip"), col("uh48"), col("url"),
          lit(50).as("priority"), lit(9).as("ufn"),
          col("added_time").multiply(1000L).as("spider_time_ms"),
          col("hop_count"), lit(7).as("ip_max"),
          lit(false).as("was_indexed_in"), col("flags"),
          col("site_hash32"), col("dom_hash32"))
      graft.plans.WinnerDole(in, 7, 2000).count()
    }
    // scoring-only: the compiled rule exprs + eligibility filter, no dole
    time("scoring only (no dole)") {
      val c = graft.rules.RuleCompiler.Cols(
        url = col("url"), hopCount = col("hop_count"), flags = col("flags"),
        addedTime = col("added_time"), discoveryTime = col("discovery_time"),
        siteNumInlinks = col("site_num_inlinks"), pageNumInlinks = lit(0),
        repExists = lit(false),
        repSpideredTime = lit(0L), repErrCode = lit(0), repErrCount = lit(0),
        repHttpStatus = lit(0), now = lit(1400000100L))
      val compiled = graft.rules.RuleCompiler.compile(cfg.rules, c).get
      val spiderTime = graft.rules.RuleCompiler.spiderTimeCol(c, compiled, lit(-1L), lit(-1))
      frontier().toDF().repartition(col("first_ip"))
        .withColumn("ufn", compiled.ufn)
        .withColumn("priority", compiled.priority)
        .withColumn("force_delete", compiled.forceDelete)
        .withColumn("ip_max", compiled.ipMaxSpiders)
        .withColumn("spider_time_ms", spiderTime)
        .filter(!col("force_delete") && col("spider_time_ms") <= 1400000100000L)
        .count()
    }
    // r2 window shape for comparison
    time("window shape") {
      import org.apache.spark.sql.expressions.Window
      val scored = frontier().toDF().repartition(col("first_ip"))
      val w = Window.partitionBy(col("first_ip"))
        .orderBy(col("hop_count").asc, col("added_time").asc, col("uh48").asc)
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 7).count()
    }
    spark.stop()
  }
}
