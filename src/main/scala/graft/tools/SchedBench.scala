package graft.tools

/** Ad-hoc schedule/skew kernel runner for iterating on WinnerTopK perf
  * without the full Bench (which runs ~25 min). Not driver-run. */
object SchedBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 32000000L
    val cpus = if (args.length > 1) args(1).toInt else 8
    val mode = if (args.length > 2) args(2) else "all"
    if (mode == "agg" || mode == "all") aggOnly(n, cpus)
    if (mode == "win") winOnly(n, cpus)
    if (mode == "sched" || mode == "all") {
      val (rate, scheduled, secs) = graft.Bench.scheduleKernel(cpus, n, 40)
      println(f"schedule: $rate%.0f urls/sec over $n rows at local[$cpus] ($secs%.2f s, $scheduled scheduled)")
    }
    if (mode == "skew" || mode == "all") {
      val (heapS, winS) = graft.Bench.skewKernel(math.min(cpus, 8), 1000000L, 2000)
      println(f"skew 1M one-IP: heap $heapS%.2f s, window $winS%.2f s")
    }
  }

  /** Window row_number ≤ k with WindowGroupLimit enabled (threshold > k):
    * same result as winner_topk, pure UnsafeRow pipeline. Also runs the
    * one-IP skew shape. */
  private def winOnly(n: Long, cpus: Int): Unit = {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.windowGroupLimitThreshold",
        sys.env.getOrElse("GRAFT_WGL", "2048"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(n).select(
      (col("id") / 40).cast("int").as("first_ip"),
      col("id").as("uh48"),
      concat(lit("http://www.b"), (col("id") / 40).cast("long"), lit(".test/p"), col("id") % 40).as("url"),
      (col("id") % 127).cast("int").as("priority"), lit(0).as("ufn"),
      (col("id") % 100000).as("spider_time_ms"), (col("id") % 7).cast("int").as("hop_count"))
    val w = Window.partitionBy(col("first_ip"))
      .orderBy(col("priority").desc, col("hop_count").asc, col("spider_time_ms").asc, col("uh48").asc)
    def once(): Double = {
      val t0 = System.nanoTime()
      df.withColumn("pos", row_number().over(w)).filter(col("pos") <= 2000).count()
      (System.nanoTime() - t0) / 1e9
    }
    once()
    val secs = (1 to 3).map(_ => once()).sorted.apply(1)
    println(f"winOnly: ${n / secs}%.0f rows/sec at local[$cpus] ($secs%.2f s) wgl=${sys.env.getOrElse("GRAFT_WGL", "2048")}")
    df.withColumn("pos", row_number().over(w)).filter(col("pos") <= 2000)
      .queryExecution.executedPlan.toString.linesIterator.take(12).foreach(println)
    // skew: one IP, n rows
    val sk = spark.range(1000000L).select(
      lit(42).as("first_ip"), col("id").as("uh48"),
      concat(lit("http://skew.test/p"), col("id")).as("url"),
      (col("id") % 127).cast("int").as("priority"), lit(0).as("ufn"),
      (col("id") % 100000).as("spider_time_ms"), (col("id") % 7).cast("int").as("hop_count"))
    def skOnce(): Double = {
      val t0 = System.nanoTime()
      sk.withColumn("pos", row_number().over(w)).filter(col("pos") <= 2000).count()
      (System.nanoTime() - t0) / 1e9
    }
    skOnce()
    println(f"win skew 1M one-IP: ${(1 to 3).map(_ => skOnce()).sorted.apply(1)}%.2f s")
    spark.stop()
  }

  /** Isolate the winner aggregate: groupBy(first_ip).agg(winner_topk)
    * over n synthetic rows with 40 urls/ip, no joins/scoring. */
  private def aggOnly(n: Long, cpus: Int): Unit = {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("GRAFT_OHA_FALLBACK", "128"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(n).select(
      (col("id") / 40).cast("int").as("first_ip"),
      col("id").as("uh48"),
      concat(lit("http://www.b"), (col("id") / 40).cast("long"), lit(".test/p"), col("id") % 40).as("url"),
      (col("id") % 127).cast("int").as("priority"), lit(0).as("ufn"),
      (col("id") % 100000).as("spider_time_ms"), (col("id") % 7).cast("int").as("hop_count"))
    def once(m: Long): Double = {
      val d = df.limit(0).union(df).filter(col("uh48") >= 0) // defeat caching
      val winners = graft.plans.WinnerTopKColumn(
        col("uh48"), col("url"), col("priority"), col("ufn"),
        col("spider_time_ms"), col("hop_count"), lit(2000), lit(false), lit(0L),
        lit(0), lit(0), 2000)
      val t0 = System.nanoTime()
      df.repartition(col("first_ip")).groupBy(col("first_ip")).agg(winners.as("ws"))
        .select(posexplode(col("ws"))).count()
      (System.nanoTime() - t0) / 1e9
    }
    once(n / 4)
    val secs = (1 to 3).map(_ => once(n)).sorted.apply(1)
    println(f"aggOnly: ${n / secs}%.0f rows/sec at local[$cpus] ($secs%.2f s) fallback=${sys.env.getOrElse("GRAFT_OHA_FALLBACK", "128")}")
    val t0 = System.nanoTime()
    df.repartition(col("first_ip")).agg(count(lit(1))).collect()
    println(f"repartition+count baseline: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
