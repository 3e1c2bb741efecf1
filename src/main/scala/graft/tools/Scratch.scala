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

    // extract_text over binary html column — the fetch/parse stage shape
    val pages = Seq(
      ("http://h0.test/", "<html><head><title>Home</title></head><body><p>Welcome &amp; enjoy</p><script>var x='<p>no</p>';</script></body></html>"),
      ("http://h0.test/a", "<p>café &quot;x&quot; 4<sup>th</sup></p>"),
      ("http://h1.test/", "<select><option>alpha</option></select><div>visible</div>")
    ).toDF("url", "html_str")
      .withColumn("html", col("html_str").cast("binary")).drop("html_str")

    val extract = udf((h: Array[Byte]) => graft.core.GbXml.extractText(h))
    val out = pages.withColumn("text", extract($"html"))
      .withColumn("text_vis", regexp_replace($"text", "\n", "\\\\n"))
    out.select("url", "text_vis").show(false)
    out.select(length($"text").as("chars"), octet_length($"text").as("bytes")).show()
    println("rows=" + out.count())
    spark.stop()
  }
}
