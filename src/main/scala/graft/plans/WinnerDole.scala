package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, BoundReference, GenericInternalRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types._

/** A2 winner selection as a WHOLE-OPERATOR custom plan (the doledb
  * population step): per-firstIp bounded top-k in winner-tree order
  * (Spider.cpp:3461-3497 key order; MAX_WINNER_NODES cap Spider.cpp:60),
  * emitted directly as dole rows with `seq_in_ip` = winner rank and the
  * per-row ipMaxSpiders cap already applied (Spider.cpp:4xxx dole loop).
  *
  * Why a custom operator instead of groupBy().agg(WinnerTopK): Spark
  * always splits a TypedImperativeAggregate into partial+final, which
  * hands EVERY per-IP heap through serialize/deserialize even when the
  * child is already hash-partitioned by first_ip — measured at ~2x the
  * r3 schedule kernel's aggregate cost. This exec instead requires
  * ClusteredDistribution(first_ip) + child sorted by first_ip (a
  * single-key RADIX sort), streams each IP group through ONE reused
  * bounded heap (O(k) state — skew-safe like the aggregate: a 10^7-row
  * IP never buffers), and writes winners straight to UnsafeRows. No
  * object codec, no posexplode, no per-group allocation.
  *
  * Output is byte-identical to the groupBy(WinnerTopK)+posexplode+filter
  * pipeline (proven by A2WinnerDoleSpec cross-check and the a2/crawl
  * driver oracles).
  *
  * Child must provide columns: first_ip:int, uh48:long, url:string,
  * priority:int, ufn:int, spider_time_ms:long, hop_count:int, ip_max:int,
  * was_indexed_in:boolean, flags:long, site_hash32:int, dom_hash32:int.
  */
case class WinnerDolePlan(k: Int, maxWinners: Int, emitWake: Boolean,
                          override val output: Seq[Attribute],
                          child: LogicalPlan) extends UnaryNode {
  // keep every child column alive (resolved by name at execution time;
  // default references=∅ would invite column pruning under this node)
  override def references: AttributeSet = child.outputSet
  override protected def withNewChildInternal(newChild: LogicalPlan): WinnerDolePlan =
    copy(child = newChild)
}

object WinnerDole {
  /** FetchTask-shaped output schema. */
  private val outSchema: Seq[(String, DataType)] = Seq(
    "uh48" -> LongType, "first_ip" -> IntegerType, "url" -> StringType,
    "priority" -> IntegerType, "ufn" -> IntegerType,
    "spider_time_ms" -> LongType, "hop_count" -> IntegerType,
    "seq_in_ip" -> IntegerType, "was_indexed" -> BooleanType,
    "req_flags" -> LongType, "site_hash32" -> IntegerType,
    "dom_hash32" -> IntegerType)

  /** Wrap `scored` (must carry the 12 input columns) in the dole
    * operator; registers the planning strategy on the session once. */
  def apply(scored: DataFrame, k: Int, maxWinners: Int): DataFrame =
    build(scored, k, maxWinners, emitWake = false)

  /** Wake-emitting variant (the waiting-tree maintenance pass, A3):
    * the child additionally carries `eligible:boolean` (row may be doled
    * NOW) and `next_lb:long` (a lower bound on the row's next spider
    * time that stays valid until the IP is touched). Besides the winner
    * rows, each scanned IP emits ONE sentinel row with seq_in_ip = -1
    * and spider_time_ms = min(next_lb) over ALL its rows — the per-IP
    * next-eligible entry the scheduler's due-IP prefilter consumes next
    * iteration (Spider.cpp:2503-2724 addToWaitingTree /
    * :3160 populateDoledbFromWaitingTree). */
  def wake(scored: DataFrame, k: Int, maxWinners: Int): DataFrame =
    build(scored, k, maxWinners, emitWake = true)

  private def build(scored: DataFrame, k: Int, maxWinners: Int, emitWake: Boolean): DataFrame = {
    val spark = scored.sparkSession
    register(spark)
    val out = outSchema.map { case (n, t) => AttributeReference(n, t, nullable = false)() }
    GraftShim.ofRows(spark, WinnerDolePlan(k, maxWinners, emitWake, out, GraftShim.logicalPlan(scored)))
  }

  def register(spark: SparkSession): Unit = synchronized {
    GraftShim.registerStrategy(spark, WinnerDoleStrategy)
  }
}

object WinnerDoleStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case WinnerDolePlan(k, maxWinners, emitWake, out, child) =>
      WinnerDoleExec(k, maxWinners, emitWake, out, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class WinnerDoleExec(k: Int, maxWinners: Int, emitWake: Boolean,
                          override val output: Seq[Attribute],
                          child: SparkPlan) extends UnaryExecNode {

  private def ipAttr: Attribute = child.output.find(_.name == "first_ip").get

  // one exchange total in the schedule plan: the frontier is already
  // repartitioned by first_ip for the reply join, which satisfies this
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(ipAttr)))
  // single-key int sort → radix-sortable SortExec
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(ipAttr, Ascending)))
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOut = child.output
    def idx(n: String): Int = childOut.indexWhere(_.name == n)
    val ipI = idx("first_ip"); val uhI = idx("uh48"); val urlI = idx("url")
    val priI = idx("priority"); val ufnI = idx("ufn")
    val timeI = idx("spider_time_ms"); val hopI = idx("hop_count")
    val ipMaxI = idx("ip_max"); val wasI = idx("was_indexed_in")
    val flagsI = idx("flags"); val siteI = idx("site_hash32"); val domI = idx("dom_hash32")
    val eligI = if (emitWake) idx("eligible") else -1
    val lbI = if (emitWake) idx("next_lb") else -1
    val kLoc = k; val maxW = maxWinners; val wake = emitWake
    val outTypes = output.zipWithIndex.map { case (a, i) => BoundReference(i, a.dataType, a.nullable) }

    child.execute().mapPartitions({ iter =>
      val proj = UnsafeProjection.create(outTypes)
      val outRow = new GenericInternalRow(12)
      val heap = new WinnerHeap(kLoc)

      new Iterator[InternalRow] {
        private var nextRow: InternalRow = null  // staged output
        private var pending: InternalRow = null  // first row of the NEXT group (copied)
        private var groupIp = 0                  // ip of the group held in `winners`
        private var winners: Array[WinnerItem] = null
        private var pos = 0
        private var exhausted = false
        private var groupMinLb = Long.MaxValue
        private var sentinelPending = false

        private def insert(row: InternalRow): Unit = {
          val pri = row.getInt(priI)
          val hp = row.getInt(hopI)
          val t = row.getLong(timeI)
          val uh = row.getLong(uhI)
          if (heap.size < kLoc || heap.rootStrictlyWorse(pri, hp, t, uh)) {
            heap.insert(new WinnerItem(
              uh, row.getUTF8String(urlI).clone(), // sorter reuses row buffers
              pri, row.getInt(ufnI), t, hp, row.getInt(ipMaxI),
              row.getBoolean(wasI), row.getLong(flagsI),
              row.getInt(siteI), row.getInt(domI)))
          }
        }

        /** Consume the next contiguous first_ip group into `winners`.
          * Returns false when the input is exhausted. */
        private def fillGroup(): Boolean = {
          if (pending == null && !iter.hasNext) return false
          val first = if (pending != null) pending else iter.next()
          pending = null
          groupIp = first.getInt(ipI)
          groupMinLb = Long.MaxValue
          consume(first)
          var more = true
          while (more && iter.hasNext) {
            val row = iter.next()
            if (row.getInt(ipI) != groupIp) { pending = row.copy(); more = false }
            else consume(row)
          }
          winners = heap.sorted; pos = 0; heap.clear()
          sentinelPending = wake
          true
        }

        /** In wake mode only ELIGIBLE rows compete for the dole, but
          * every row's next_lb feeds the group's next-eligible minimum
          * (an ineligible row is exactly what determines when the IP
          * wakes up). */
        private def consume(row: InternalRow): Unit = {
          if (wake) {
            val lb = row.getLong(lbI)
            if (lb < groupMinLb) groupMinLb = lb
            if (row.getBoolean(eligI)) insert(row)
          } else insert(row)
        }

        /** Stage the next output row: winners best-first with the
          * per-row ipMaxSpiders cap (`pos < least(ip_max, maxWinners)`)
          * applied to each winner's OWN ip_max, exactly like the
          * groupBy(WinnerTopK)+posexplode+filter pipeline. */
        private def stage(): Unit = {
          while (nextRow == null && !exhausted) {
            if (winners == null) {
              if (!fillGroup()) { exhausted = true; return }
            }
            while (nextRow == null && pos < winners.length) {
              val it = winners(pos)
              val p = pos
              pos += 1
              if (p < math.min(it.ipMax, maxW)) {
                outRow.update(0, it.uh48); outRow.update(1, groupIp)
                outRow.update(2, it.url); outRow.update(3, it.priority)
                outRow.update(4, it.ufn); outRow.update(5, it.timeMs)
                outRow.update(6, it.hop); outRow.update(7, p)
                outRow.update(8, it.wasIndexed); outRow.update(9, it.reqFlags)
                outRow.update(10, it.siteHash32); outRow.update(11, it.domHash32)
                nextRow = proj(outRow)
              }
            }
            if (nextRow == null && pos >= winners.length) {
              if (sentinelPending) {
                // the per-IP waiting-tree entry: seq_in_ip = -1,
                // spider_time_ms = min(next_lb) over the whole group
                sentinelPending = false
                outRow.update(0, 0L); outRow.update(1, groupIp)
                outRow.update(2, org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8)
                outRow.update(3, 0); outRow.update(4, 0)
                outRow.update(5, groupMinLb); outRow.update(6, 0)
                outRow.update(7, -1); outRow.update(8, false)
                outRow.update(9, 0L); outRow.update(10, 0); outRow.update(11, 0)
                nextRow = proj(outRow)
              }
              winners = null
            }
          }
        }

        override def hasNext: Boolean = { stage(); nextRow != null }
        override def next(): InternalRow = {
          stage()
          if (nextRow == null) throw new NoSuchElementException
          val r = nextRow
          nextRow = null
          r
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): WinnerDoleExec =
    copy(child = newChild)
}
