package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.GbHash

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

    val canon = udf((u: String) => graft.core.GbUrl.parse(u).url)
    val domain = udf((u: String) => graft.core.GbUrl.parse(u).domain)
    val uh48 = udf((u: String) => GbHash.uh48(u))
    val fakeIp = udf((u: String, d: String) => GbHash.fakeFirstIp(u, d))

    val urls = Seq(
      "WWW.Example.COM/a/../b//c.html#frag",
      "http://http://www.example.com/index.html",
      "https://news.ycombinator.com:443/item?id=1&&x=2",
      "http://www.h0.test\\p\\q.jpg",
      "http://bücher.example/straße",
      "http://" + ("x" * 300) + ".test/" // >256 chars: index wrap path
    ).toDF("raw")

    import graft.rules._
    val ufn = udf((u: String, hop: Int, isNew: Boolean) => {
      val g = graft.core.GbUrl.parse(u)
      UrlFilters.urlFilterNum(
        UfnRequest(url = g.url, hopCount = hop, hadReply = !isNew,
          hasMediaExtension = g.hasMediaExtension),
        if (isNew) None else Some(UfnReply(spideredTime = 1400000000L)),
        1400003600L)
    })
    val pri = udf((n: Int) => if (n >= 0) UrlFilters.defaultWebRules(n).priority else -1)

    val out = urls
      .withColumn("url", canon($"raw"))
      .withColumn("domain", domain($"raw"))
      .withColumn("uh48", uh48($"url"))
      .withColumn("fake_first_ip", fakeIp($"url", $"domain"))
      .withColumn("hop", (crc32($"url") % 4).cast("int"))
      .withColumn("ufn", ufn($"url", $"hop", lit(true)))
      .withColumn("priority", pri($"ufn"))
      .drop("raw")

    out.show(false)

    // distributed distinctness: seen-set identity must not collide here
    val n = out.select("uh48").distinct().count()
    println(s"distinct uh48 = $n of ${urls.count()}")
    println(s"g_hashtab[0][0] = ${GbHash.table(0)}")
    spark.stop()
  }
}
