package graft.frontier

import org.apache.spark.sql.SparkSession

/** spark-submit entry point: run/resume a crawl on the synthetic corpus.
  * Usage: CrawlMain <workdir> <iterations> [spec=micro|small|bench] [cpus]
  */
object CrawlMain {
  def main(args: Array[String]): Unit = {
    val workdir = if (args.length > 0) args(0) else "/tmp/graft_crawl"
    val iterations = if (args.length > 1) args(1).toInt else 5
    val spec = if (args.length > 2) args(2) match {
      case "small" => Corpus.small
      case "bench" => Corpus.bench
      case _ => Corpus.micro
    } else Corpus.micro
    val cpus = if (args.length > 3) args(3) else sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-crawl")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val results = Crawl.run(spark, workdir, spec, iterations)
    val secs = (System.nanoTime() - t0) / 1e9
    results.zipWithIndex.foreach { case (r, i) =>
      println(f"iter=${i + 1} scheduled=${r.scheduled} fetched=${r.fetched} robots_denied=${r.robotsDenied} errors=${r.errors} new_urls=${r.newUrls} dups=${r.dupsDropped}")
    }
    val totalSched = results.map(_.scheduled).sum
    val totalFetched = results.map(_.fetched).sum
    println(f"TOTAL scheduled=$totalSched fetched=$totalFetched wall=$secs%.1fs rate=${totalSched / secs}%.0f scheduled/sec")
    spark.stop()
  }
}
