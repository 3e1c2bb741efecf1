package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.frontier.{Crawl, Flags, FrontierRequest}

/** S1/S2 as a stream: continuous seed/injection ingestion via Structured
  * Streaming. Raw urls arrive on any streaming source (file drop-in dir,
  * Kafka, a MemoryStream in tests); each micro-batch is canonicalized,
  * keyed, deduplicated within the batch, and appended to the frontier as
  * a request delta — the exact shape `PageAddUrl`/`PageInject` feed the
  * reference's Msg4 pipeline with (`/root/reference/src/PageAddUrl.cpp`,
  * `PageInject.cpp`).
  *
  * The crawl itself stays an iterative batch job on purpose: the
  * reference's "streaming" is an event-driven batch loop (SURVEY §2.6
  * note), and checkpoint/resume exactness requires snapshot semantics.
  * Seed intake, though, is genuinely unbounded input — the natural
  * Structured Streaming fit. Watermarking is not needed (no event-time
  * aggregation); exactly-once append comes from the streaming checkpoint
  * + idempotent admission (the next compaction and the J2 anti-join drop
  * re-delivered urls). */
object SeedStream {

  /** Transform a stream of raw urls into frontier requests (pure,
    * testable with MemoryStream). */
  def toRequests(raw: Dataset[String], nowSecs: Long): Dataset[FrontierRequest] = {
    import raw.sparkSession.implicits._
    raw.flatMap(u => Crawl.seedRequest(u, nowSecs))
      .dropDuplicates("first_ip", "uh48")
  }

  /** Run the intake stream: urls dropped as text files under `inDir` are
    * appended to `workdir`'s frontier as injection deltas. */
  def start(spark: SparkSession, inDir: String, workdir: String,
            checkpoint: String, nowSecs: Long,
            cfg: Crawl.Config = Crawl.Config()): StreamingQuery = {
    import spark.implicits._
    val raw = spark.readStream.format("text").load(inDir).as[String]
    toRequests(raw, nowSecs).writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: Dataset[FrontierRequest], batchId: Long) =>
        import batch.sparkSession.implicits._
        // the micro-batch Dataset goes straight into the injection core
        // (delta append + bloom superset update) — NO driver-side
        // collect; at scale a batch can be millions of urls. The flag
        // rewrite is a column expression, not a typed map: a closure
        // here would deserialize + re-serialize every row of the batch
        // just to OR two bits (guide §4 — no Scala closures in the hot
        // path when a codegen expression does the job).
        Crawl.injectRequests(spark, workdir,
          batch.withColumn("flags",
            col("flags").bitwiseOR(lit(Flags.IsInjecting))
              .bitwiseAND(lit(~Flags.IsAddUrl))).as[FrontierRequest], cfg)
        ()
      }
      .start()
  }
}
