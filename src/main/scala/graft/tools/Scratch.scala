package graft.tools
import org.apache.spark.sql.SparkSession
import graft.frontier._
import graft.core.GbHash

object Scratch {
  def main(args: Array[String]): Unit = {
    def kernel(cpus: Int, n: Long): Unit = {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val spark = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      val reqs = spark.range(n).mapPartitions(_.map { i =>
        val hostIdx = i / 40
        val p = (i % 40).toInt
        val host = s"www.b$hostIdx.test"
        val url = if (p == 0) s"http://$host/" else s"http://$host/p$p.html"
        val ip0 = GbHash.hash32(host)
        val ip = if (ip0 == 0 || ip0 == -1) 1 else ip0
        FrontierRequest(GbHash.uh48(url), ip, url, ip0, GbHash.hash32(s"b$hostIdx.test"),
          ip0, -1, 1400000000L, 1400000000L, math.min(p, 4), "en", Flags.IsNewOutlink, 0, 0L)
      })
      def once(): Double = {
        val t0 = System.nanoTime()
        Crawl.schedule(reqs, spark.emptyDataset[FrontierReply],
          spark.emptyDataset[IpState], spark.emptyDataset[DomState], Crawl.Config(), 1).count()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val times = (1 to 3).map(_ => once())
      println(f"cpus=$cpus n=$n best=${times.min}%.2f rate=${n / times.min}%.0f all=${times.map(t => f"$t%.2f").mkString(",")}")
      spark.stop()
    }
    kernel(8, 64000000L)
    kernel(32, 64000000L)
  }
}
