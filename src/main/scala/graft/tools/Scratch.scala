package graft.tools
import org.apache.spark.sql.SparkSession

/** Ad-hoc driver used by the verify workflow. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.SparkEntry.entry(spark)
    println("entry rows=" + e.count())
    e.show(3, false)
    spark.stop()
  }
}
