package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc driver for verifying library behavior (see .claude/skills/verify).
  *
  * Current check (r6 optimization round): job/time breakdown of the
  * two remaining slow headline queries — q1 (is it first-query session
  * warmup or the aggregate itself?) and dedup_clusters (per-round cost
  * of the label-propagation loop). Replicates the frozen bench session
  * (local[32], 32 shuffle partitions, AQE on). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = 32
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val jobs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    def time(label: String)(f: => Long): Unit = {
      val j0 = jobs.get
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  jobs=${jobs.get - j0}  rows=$n")
    }

    // q1 three times: first-run delta = session/datasource/codegen warmup
    val q1 = graft.SparkEntry.queries("q1_lineitem_agg")
    time("q1 run1")(q1(spark, sf).count())
    time("q1 run2")(q1(spark, sf).count())
    time("q1 run3")(q1(spark, sf).count())

    // dedup_clusters: pair stage alone, then the full loop
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    time("minhash pairs only")(
      graft.textops.TextOps.minhashLshCandidates(docs, 32, 8, 500L).count())
    time("dedup_clusters full")(
      graft.textops.TextOps.dupClusters(
        graft.textops.TextOps.minhashLshCandidates(docs, 32, 8, 500L))
        .orderBy(col("doc_id")).count())

    // a2 / j2 shapes for the record
    time("a2_winner_topk")(graft.SparkEntry.queries("a2_winner_topk")(spark, sf).count())
    time("j2_seen_antijoin")(graft.SparkEntry.queries("j2_seen_antijoin")(spark, sf).count())
    time("q2_search_topk")(graft.SparkEntry.queries("q2_search_topk")(spark, sf).count())
    time("q2 again")(graft.SparkEntry.queries("q2_search_topk")(spark, sf).count())
    spark.stop()
  }
}
