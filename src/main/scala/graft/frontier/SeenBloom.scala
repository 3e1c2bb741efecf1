package graft.frontier

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** The partitioned URL-seen Bloom set (north_star: "partitioned
  * Bloom/cuckoo-filter URL-seen set, salted-hash partitioned by
  * canonical-URL hash to kill skew at 10^10-URL scale").
  *
  * Layout: `buckets` blooms keyed by `uh48 & (buckets-1)` — uh48 is a
  * tabulation hash, so bucket populations are uniform regardless of
  * host skew (the salted-hash partitioning). Each snapshot stores the
  * bloom table `(bucket int, bloom binary)`; per iteration only the
  * buckets that received fresh uh48s are rewritten (bloom insertion is
  * monotone — no rebuild), so maintenance is O(new urls), and at
  * 10^10 urls the table is ~`10^10 * 1.2 bytes` split across buckets
  * that each fit comfortably in an executor.
  *
  * The bloom is strictly a PREFILTER: positives (including false
  * positives) still pay the exact anti-join, so the seen set stays
  * byte-exact (SURVEY §7 risk 4). Negatives are definitely new. */
object SeenBloom {

  def bucketOf(uh48: Long, buckets: Int): Int = (uh48 & (buckets - 1)).toInt

  private def ser(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
  private def deser(b: Array[Byte]): BloomFilter = BloomFilter.readFrom(new ByteArrayInputStream(b))

  /** Build the bloom table from scratch (init / compaction). */
  def build(uh48s: Dataset[java.lang.Long], buckets: Int, expectedPerBucket: Long, fpp: Double): DataFrame = {
    val spark = uh48s.sparkSession
    import spark.implicits._
    uh48s.map(h => (bucketOf(h, buckets), h.longValue()))
      .toDF("bucket", "uh48")
      .repartition(col("bucket"))
      .groupByKey(r => r.getInt(0))(org.apache.spark.sql.Encoders.scalaInt)
      .mapGroups { (bucket, rows) =>
        val bf = BloomFilter.create(math.max(expectedPerBucket, 1000L), fpp)
        rows.foreach(r => bf.putLong(r.getLong(1)))
        (bucket, ser(bf))
      }
      .toDF("bucket", "bloom")
  }

  /** Incrementally add fresh uh48s. ONE cogroup on the bucket key (the
    * r3 shape was distinct + anti-join + semi-join + outer-join +
    * mapGroups — five shuffling operators whose job/stage fixed costs
    * dominated the micro loop's write barrier).
    *
    * `deltaOnly = true` emits ONLY the touched buckets' rebuilt blooms
    * (the bloom LSM-delta the iteration writes forward — untouched
    * buckets are not even copied, making bloom maintenance O(new urls)
    * I/O like every other state chain); `false` passes untouched
    * buckets through, returning the complete table. */
  def update(bloomTable: DataFrame, fresh: Dataset[java.lang.Long], buckets: Int,
             expectedPerBucket: Long, fpp: Double, deltaOnly: Boolean = false): DataFrame = {
    val spark = bloomTable.sparkSession
    import spark.implicits._
    val freshKeyed = fresh.map(h => (bucketOf(h, buckets), h.longValue()))
    val bloomKeyed = bloomTable.as[(Int, Array[Byte])].groupByKey(_._1)
    freshKeyed.groupByKey(_._1).cogroup(bloomKeyed) { (bucket, hs, blooms) =>
      val pending = hs.map(_._2).toArray
      val existing = blooms.buffered.headOption
      if (pending.isEmpty) {
        if (deltaOnly || existing.isEmpty) Iterator.empty
        else Iterator.single((bucket, existing.get._2)) // untouched pass-through
      } else {
        val bf = existing.map(b => deser(b._2))
          .getOrElse(BloomFilter.create(math.max(expectedPerBucket, 1000L), fpp))
        pending.foreach(bf.putLong)
        Iterator.single((bucket, ser(bf)))
      }
    }.toDF("bucket", "bloom")
  }

  /** Tag candidates with bloom membership via cogroup on the bucket key:
    * each task deserializes each of its buckets' blooms ONCE (nothing is
    * broadcast at 10^10 scale — blooms and candidates co-shuffle).
    * Returns (request, maybeSeen). */
  def tagged(candidates: Dataset[FrontierRequest], bloomTable: DataFrame, buckets: Int): Dataset[(FrontierRequest, Boolean)] = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val bloomKeyed = bloomTable.as[(Int, Array[Byte])].groupByKey(_._1)
    val candKeyed = candidates.groupByKey(c => bucketOf(c.uh48, buckets))
    candKeyed.cogroup(bloomKeyed) { (_, cands, blooms) =>
      val bf = blooms.buffered.headOption.map(b => deser(b._2))
      cands.map(c => (c, bf.exists(_.mightContainLong(c.uh48))))
    }
  }
}
