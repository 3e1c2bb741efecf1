package graft.tools
import org.apache.spark.sql.SparkSession
import graft.frontier._
import graft.sources.Warc

/** Ad-hoc driver used by the verify workflow. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // 1) crawl 2 iterations
    val work = java.nio.file.Files.createTempDirectory("graft_drive").toString
    val cfg = Crawl.Config()
    val r = Crawl.run(spark, work, Corpus.micro, 2, cfg)
    println(s"crawl: ${r.map(x => s"${x.scheduled}/${x.fetched}").mkString(" ")}")
    // 2) inject a url mid-crawl, continue, confirm it got fetched
    Crawl.inject(spark, work, Seq("http://www.h3.test/s1/"), cfg)
    val r2 = Crawl.run(spark, work, Corpus.micro, 2, cfg)
    println(s"after-inject: ${r2.map(x => s"${x.scheduled}/${x.fetched}").mkString(" ")}")
    import org.apache.spark.sql.functions.col
    Seq(3, 4).foreach { i =>
      println(s"--- iter $i log:")
      spark.read.parquet(s"${Crawl.snapDir(work, i)}/fetch_log").collect().foreach(r => println("  " + r))
    }
    val reqs = Crawl.loadRequests(spark, work, 4)
    println("injected in frontier: " + reqs.filter(col("url") === "http://www.h3.test/s1/").collect().mkString(";"))
    // 3) WARC ingest → pages
    val dir = java.nio.file.Files.createTempDirectory("graft_warc")
    val recs = (0 until 3).map(k => (Corpus.pageUrl(k, 0, Corpus.micro), "2014-01-01T00:00:00Z", Corpus.pageHtml(k, 0, Corpus.micro).getBytes("UTF-8")))
    java.nio.file.Files.write(dir.resolve("f.warc"), Warc.buildWarc(recs))
    println("warc pages: " + Warc.readPages(spark, dir.toString).count())
    spark.stop()
  }
}
