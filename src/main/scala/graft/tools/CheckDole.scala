package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc: a2_winner_dole vs a2_winner_topk equivalence at sf0.01. */
object CheckDole {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val a = graft.SparkEntry.queries("a2_winner_dole")(s, d).collect().map(_.toString).sorted
    val b = graft.SparkEntry.queries("a2_winner_topk")(s, d).collect().map(_.toString).sorted
    println(s"dole=${a.length} topk=${b.length} equal=${a.sameElements(b)}")
    s.stop()
  }
}
