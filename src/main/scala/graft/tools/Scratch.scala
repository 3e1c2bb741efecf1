package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc driver used by the verify workflow to exercise library surfaces
  * inside a real Spark session. Not part of the public API. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-scratch")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // robots gating as it will run in the fetch stage: per-host robots body
    // joined to candidate urls, verdict computed executor-side
    val robots = Seq(
      ("h0.test", "User-agent: *\nDisallow: /private\nCrawl-delay: .5\n"),
      ("h1.test", "User-agent: Gigablast\nDisallow: /a\n\nUser-agent: *\nDisallow: /\n"),
      ("h2.test", "")
    ).toDF("host", "robots_txt")

    val cands = Seq(
      "http://h0.test/public/x.html",
      "http://h0.test/private/y.html",
      "http://h1.test/a/blocked.html",
      "http://h1.test/b/ok.html",
      "http://h2.test/anything"
    ).toDF("url")

    val hostOf = udf((u: String) => graft.core.GbUrl.parse(u).host)
    val verdict = udf((u: String, txt: String) => {
      val g = graft.core.GbUrl.parse(u)
      val body = if (txt == null) Array.empty[Byte] else txt.getBytes("UTF-8")
      val (allowed, delay) = graft.core.Robots.evaluate(g.url.substring(g.pathOff), body)
      s"$allowed/$delay"
    })

    cands.withColumn("host", hostOf($"url"))
      .join(broadcast(robots), Seq("host"), "left")
      .withColumn("allowed_delay", verdict($"url", $"robots_txt"))
      .select("url", "allowed_delay")
      .show(false)
    spark.stop()
  }
}
