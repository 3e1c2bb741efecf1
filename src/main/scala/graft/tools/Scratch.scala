package graft.tools
import org.apache.spark.sql.SparkSession
import graft.frontier._
import graft.core.GbXml

/** Ad-hoc driver used by the verify workflow. */
object Scratch {
  def main(args: Array[String]): Unit = {
    def kernel(cpus: Int): Unit = {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val spark = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      val pages = Corpus.pages(spark, Corpus.bench)
      def once(): Double = {
        val t0 = System.nanoTime()
        val ok = pages.map(p => if (GbXml.extractText(p.html) == p.text) 1L else 0L).reduce(_ + _)
        val s = (System.nanoTime() - t0) / 1e9
        assert(ok == Corpus.bench.totalPages)
        s
      }
      once()
      val times = (1 to 3).map(_ => once())
      println(f"cpus=$cpus best=${times.min}%.2f rate=${Corpus.bench.totalPages / times.min}%.0f pages/sec all=${times.map(t => f"$t%.2f").mkString(",")}")
      spark.stop()
    }
    kernel(8)
    kernel(32)
  }
}
