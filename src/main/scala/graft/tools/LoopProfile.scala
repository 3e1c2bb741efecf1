package graft.tools

import org.apache.spark.sql.SparkSession
import graft.frontier._
import java.nio.file.Files

/** Timed full-loop run (set GRAFT_LOOP_TIMING=1) — locates the
  * per-iteration fixed costs that bound micro-scale loop throughput. */
object LoopProfile {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("8").toInt
    val iters = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.shuffle.compress", sys.env.getOrElse("P_COMPRESS", "true"))
      .config("spark.shuffle.spill.compress", sys.env.getOrElse("P_COMPRESS", "true"))
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("P_AQE", "true"))
      .config("spark.sql.codegen.wholeStage", sys.env.getOrElse("P_WSCG", "true"))
      .config("spark.eventLog.enabled", sys.env.getOrElse("P_EVLOG", "false"))
      .config("spark.eventLog.dir", "/tmp/sparklogs")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // jobs-per-iteration: the micro-scale loop is bound by job-scheduling
    // fixed cost, so the count is the first-order metric to move
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val jobLog = sys.env.get("P_JOBLOG").contains("1")
    val sites = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (jobLog) {
          val site = js.stageInfos.sortBy(_.stageId).lastOption.map(_.name).getOrElse("?")
          sites.computeIfAbsent(site, _ => new java.util.concurrent.atomic.AtomicLong).incrementAndGet()
        }
      }
    })
    val work = Files.createTempDirectory(s"graft_loopprof").toString
    val spec = Corpus.small
    val cfg = Crawl.Config(clockStepMs = 60000L, seenBuckets = 8, expectedSeenPerBucket = 20000L,
      loopChainState = sys.env.getOrElse("P_CHAIN", "false").toBoolean)
    val seeds = (0 until spec.nHosts).map(k => s"http://${Corpus.host(k)}/")
    val t0 = System.nanoTime()
    val res = Crawl.run(spark, work, spec, iters, cfg, seedUrls = seeds)
    val secs = (System.nanoTime() - t0) / 1e9
    val sched = res.map(_.scheduled).sum
    println(f"TOTAL $secs%.1f s, scheduled=$sched, rate=${sched / secs}%.1f/s, jobs=${jobs.get}, jobs/iter=${jobs.get.toDouble / iters}%.1f")
    if (jobLog) {
      import scala.jdk.CollectionConverters._
      sites.asScala.toSeq.sortBy(-_._2.get).foreach { case (s, n) =>
        println(f"JOBSITE ${n.get}%5d  $s")
      }
    }
    spark.stop()
  }
}
