package graft.frontier

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** O(delta) state maintenance: hash-bucketed LSM chain for the small
  * keyed state tables (inlink/tag/quota/ip/dom state).
  *
  * The r3 engine rewrote EVERY state table in full each iteration even
  * though the per-iteration delta is tiny (VERDICT r3 "What's wrong"
  * #2): at 10^10 URLs, inlink_state is O(urls-with-inlinks) — a full
  * shuffle + rewrite per iteration. The reference never does this: its
  * Rdb trees absorb deltas in memory and dump/merge them incrementally
  * (Rdb.cpp addRecord / dumpTree; RdbMerge). This is the Spark-native
  * analogue, generalizing the SeenBloom touched-buckets-only pattern:
  *
  *  - rows are hash-bucketed on the table's key (tabulation/xxhash →
  *    uniform buckets regardless of host skew);
  *  - a snapshot stores either a FULL table (`_GRAFT_FULL` marker —
  *    init or compaction, all buckets present) or a DELTA (only the
  *    buckets whose keys this iteration touched, written via
  *    `partitionBy("bucket")` so untouched buckets simply do not
  *    appear);
  *  - the loader walks the snapshot chain newest-first taking the FIRST
  *    version of each bucket it sees (newer shadows older) and stops at
  *    a full snapshot — path-level pruning, no read of superseded
  *    versions;
  *  - the merge path loads ONLY the touched buckets (driver knows the
  *    bucket ids — the delta is small by construction), merges prior
  *    rows of those buckets with the delta under the caller's own
  *    semantics, and writes just those buckets forward.
  *
  * Iteration cost: O(delta + rows-in-touched-buckets) I/O and shuffle,
  * instead of O(state). Bucket count sizes a bucket to a comfortable
  * task (state/B rows); the chain is reset by compaction (writeFull).
  */
object StateTable {

  /** Uniform bucket id for a key column. uh48/site hashes are already
    * tabulation-hashed; xxhash64 re-mixes arbitrary key tuples. */
  def bucketCol(keys: Seq[Column], buckets: Int): Column =
    pmod(xxhash64(keys: _*), lit(buckets)).cast("int")

  private def fullMarker(dir: String) = new java.io.File(dir, "_GRAFT_FULL")

  /** Bucket count used when a chain has no recorded count (r3 layout,
    * whose `_GRAFT_FULL` markers are empty, and legacy loose-file
    * fulls). Matches the old fixed `Crawl.StateBuckets`. */
  val LegacyBuckets = 64

  /** One bucket is one task's worth of rows — so the COUNT must follow
    * the table's size, not a constant: a 100-row micro-loop table wants
    * 1 bucket (the r4 profile showed 64 near-empty partitions per write
    * and 64-path scans per load dominating the micro loop), while a
    * 10^10-url inlink_state wants thousands. Chosen at full-write
    * (init / compaction) time from the chain's on-disk bytes and
    * recorded in the `_GRAFT_FULL` marker; deltas and loads read it
    * from there, so bucket ids stay stable between compactions. */
  def bucketsForBytes(bytes: Long): Int = {
    val target = 32L * 1024 * 1024 // ~32 MB of parquet per bucket
    math.max(1L, math.min(65536L, (bytes + target - 1) / target)).toInt
  }

  /** Driver-side on-disk size of the table's live chain (file metadata
    * only — no jobs). Sizes the NEXT compaction's bucket count. */
  def chainBytes(workdir: String, i: Int, name: String): Long = {
    val (paths, legacy) = resolve(workdir, i, name, None)
    def dirBytes(p: String): Long = {
      val fs = new java.io.File(p).listFiles()
      if (fs == null) 0L else fs.filter(_.isFile).map(_.length).sum
    }
    paths.map(dirBytes).sum + legacy.map(l => dirBytes(l._1)).sum
  }

  /** The chain's bucket count as of snapshot i: recorded in the nearest
    * full marker at or below i. */
  def bucketsOf(workdir: String, i: Int, name: String): Int = {
    var k = i
    while (k >= 0) {
      val dir = new java.io.File(s"${Crawl.snapDir(workdir, k)}/$name")
      if (dir.exists) {
        val m = fullMarker(dir.getPath)
        if (m.exists()) {
          val txt = new String(java.nio.file.Files.readAllBytes(m.toPath)).trim
          return if (txt.isEmpty) LegacyBuckets else txt.toInt
        }
        val fs = dir.listFiles()
        if (fs != null && fs.exists(f => f.isFile && f.getName.startsWith("part-")))
          return LegacyBuckets // legacy loose-file full table
      }
      k -= 1
    }
    LegacyBuckets
  }

  /** Full write (init / compaction): all buckets, chain reset. An empty
    * table writes no bucket dirs — just the marker — and loads as
    * empty. */
  def writeFull(df: DataFrame, keys: Seq[Column], buckets: Int, dir: String): Unit = {
    bucketed(df, keys, buckets)
      .write.partitionBy("bucket").mode("overwrite").parquet(dir)
    new java.io.File(dir).mkdirs() // empty table → no task output dirs
    java.nio.file.Files.write(fullMarker(dir).toPath,
      buckets.toString.getBytes("UTF-8"))
  }

  /** Delta write: only the buckets present in `merged` (= the touched
    * buckets, already carrying their complete merged contents) appear
    * in this snapshot. `dynamic = true` uses dynamic partition
    * overwrite — ONLY the written bucket dirs are replaced, leaving
    * sibling buckets (and a `_GRAFT_FULL` marker) in an EXISTING dir
    * intact; used when appending to a snapshot that already has a
    * version of this table (the injection path). */
  def writeDelta(merged: DataFrame, keys: Seq[Column], buckets: Int, dir: String,
                 dynamic: Boolean = false): Unit = {
    val w = bucketed(merged, keys, buckets).write.partitionBy("bucket")
    (if (dynamic) w.option("partitionOverwriteMode", "dynamic") else w)
      .mode("overwrite").parquet(dir)
  }

  /** Clustering the write by bucket id gives ONE file per bucket dir
    * (instead of one per task × bucket): the loader's cost is paths ×
    * files, and a chain of N delta snapshots × B buckets × T tasks of
    * tiny files was the measured fixed cost of the micro loop. A bucket
    * is one task's worth of rows at any scale — that is what B sizes. */
  private def bucketed(df: DataFrame, keys: Seq[Column], buckets: Int): DataFrame = {
    val b = df.withColumn("bucket", bucketCol(keys, buckets))
    b.repartition(col("bucket"))
  }

  private def bucketDirs(dir: java.io.File): Array[java.io.File] = {
    val fs = dir.listFiles()
    if (fs == null) Array.empty
    else fs.filter(f => f.isDirectory && f.getName.startsWith("bucket="))
  }

  private def bucketId(f: java.io.File): Int = f.getName.stripPrefix("bucket=").toInt

  /** Per-bucket newest paths across the chain, optionally restricted to
    * `wanted` bucket ids. Returns (leafDirs, legacyFullDir): a legacy
    * full dir (pre-bucketing layout: plain part files, no marker
    * needed — every pre-StateTable snapshot wrote full) is read whole
    * minus the buckets already shadowed. */
  private def resolve(workdir: String, i: Int, name: String,
                      wanted: Option[Set[Int]]): (Seq[String], Option[(String, Set[Int])]) = {
    val seen = scala.collection.mutable.Set[Int]()
    val paths = scala.collection.mutable.ListBuffer[String]()
    var legacy: Option[(String, Set[Int])] = None
    var k = i
    var done = false
    while (k >= 0 && !done) {
      val dir = new java.io.File(s"${Crawl.snapDir(workdir, k)}/$name")
      if (dir.exists) {
        val bds = bucketDirs(dir)
        val hasLoose = {
          val fs = dir.listFiles()
          fs != null && fs.exists(f => f.isFile && f.getName.startsWith("part-"))
        }
        if (bds.isEmpty && hasLoose) {
          // legacy layout: unbucketed full table → base, stop
          legacy = Some((dir.getPath, seen.toSet)); done = true
        } else {
          // bucketed delta/full (an empty delta has neither bucket dirs
          // nor part files and simply contributes nothing)
          bds.foreach { bd =>
            val id = bucketId(bd)
            if (!seen(id) && wanted.forall(_.contains(id))) { seen += id; paths += bd.getPath }
            else if (!seen(id)) seen += id // shadowed for legacy-base exclusion
          }
          if (fullMarker(dir.getPath).exists()) done = true
        }
      }
      k -= 1
    }
    (paths.toSeq, legacy)
  }

  /** Load the table as of snapshot i. `keys` recompute the bucket id
    * for legacy-base exclusion; `empty` supplies the schema when the
    * chain holds nothing. */
  def load(spark: SparkSession, workdir: String, i: Int, name: String,
           keys: DataFrame => Seq[Column], buckets: Int, empty: => DataFrame): DataFrame =
    loadBuckets(spark, workdir, i, name, keys, buckets, empty, None)

  /** Load ONLY the given buckets (the merge path's prior side). */
  def loadBuckets(spark: SparkSession, workdir: String, i: Int, name: String,
                  keys: DataFrame => Seq[Column], buckets: Int, empty: => DataFrame,
                  wanted: Option[Set[Int]]): DataFrame = {
    val (paths, legacy) = resolve(workdir, i, name, wanted)
    // explicit schema (from `empty`): file-listing stays, but the
    // footer-reading schema-inference job per load goes away — the
    // chains produce many small leaf dirs by design
    def reader = {
      val e = empty
      if (e != null) spark.read.schema(e.schema) else spark.read
    }
    val parts = scala.collection.mutable.ListBuffer[DataFrame]()
    if (paths.nonEmpty)
      parts += reader.parquet(paths: _*)
    legacy.foreach { case (dir, shadowed) =>
      var df = reader.parquet(dir)
      if (shadowed.nonEmpty)
        df = df.filter(!bucketCol(keys(df), buckets).isInCollection(shadowed))
      wanted.foreach(w => df = df.filter(bucketCol(keys(df), buckets).isInCollection(w)))
      parts += df
    }
    if (parts.isEmpty) empty
    else parts.reduce(_ unionByName _)
  }

  /** The touched bucket ids of a delta (one tiny job on the — cached —
    * delta source; the driver needs the ids for path-level pruning).
    * With a single bucket there is nothing to prune — skip the job
    * (the merge then rewrites the whole — tiny — table, which is what
    * a 1-bucket table means). */
  def touchedBuckets(delta: DataFrame, keys: DataFrame => Seq[Column], buckets: Int): Set[Int] = {
    if (buckets == 1) return Set(0)
    import org.apache.spark.sql.Encoders
    delta.select(bucketCol(keys(delta), buckets).as("b")).distinct()
      .as[Int](Encoders.scalaInt).collect().toSet
  }

  /** Touched-bucket ids for SEVERAL tables in ONE Spark job (the
    * per-iteration loop launches one of these per state table — at
    * micro scale the job-scheduling fixed cost of seven one-task jobs
    * outweighs the work itself). The fused query is deliberately
    * SHUFFLE-FREE: each branch maps its — cached — delta to
    * (table, bucket) pairs deduped per partition (a partition-local
    * Set, bounded by min(rows, buckets)), the union collects once,
    * and the driver groups. No exchange means AQE cannot split the
    * query into per-stage jobs either — exactly one job regardless of
    * table count. Single-bucket tables skip the scan like
    * `touchedBuckets` (nothing to prune). */
  def touchedBucketsMulti(
      parts: Seq[(DataFrame, DataFrame => Seq[Column], Int)]): Seq[Set[Int]] = {
    import org.apache.spark.sql.Encoders
    val need = parts.zipWithIndex.filter { case ((_, _, b), _) => b > 1 }
    if (need.isEmpty) return parts.map(_ => Set(0))
    val tagged = need.map { case ((df, keys, b), idx) =>
      df.select(lit(idx).as("_1"), bucketCol(keys(df), b).as("_2"))
        .as[(Int, Int)](Encoders.tuple(Encoders.scalaInt, Encoders.scalaInt))
        .mapPartitions(it => it.toSet.iterator)(
          Encoders.tuple(Encoders.scalaInt, Encoders.scalaInt))
    }.reduce(_ union _)
    val byTable = tagged.collect().groupBy(_._1)
    parts.zipWithIndex.map { case ((_, _, b), idx) =>
      if (b == 1) Set(0)
      else byTable.get(idx).map(_.map(_._2).toSet).getOrElse(Set.empty[Int])
    }
  }
}
