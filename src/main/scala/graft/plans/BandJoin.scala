package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution,
  ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning,
  UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan,
  SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.internal.SQLConf

/** Whole-operator custom plan #3: the BAND JOIN — the inner range join
  * `rightVal BETWEEN leftVal*loFactor AND leftVal*hiFactor`, executed
  * as a per-bin SORT-MERGE SWEEP instead of the composed shape's
  * per-bin hash join + post-filter (`q_join_range_binned`,
  * `ops/Joins.scala`).
  *
  * Distribution contract (shared with the composition — it is the
  * correct 100-TB shape): the caller bins both sides by value
  * (`GraftFunctions.bandJoin` builds the bin columns — the left row
  * replicated into every fixed-width bin its band overlaps, the right
  * row keyed by its single home bin), and a matching pair meets exactly
  * once, in the right row's home bin. This node then requires each side
  * hash-clustered on its bin and sorted (bin, value) —
  * EnsureRequirements plans the exchanges and spill-aware sorts, AQE
  * still coalesces/splits them — and the exec replaces the hash join:
  *
  *  - the right cursor advances through each bin ONCE, appending rows
  *    with value ≤ the current left's hi bound to a window buffer and
  *    pruning rows below the current lo bound from its head (both
  *    bounds are monotone in the left's value, which is the sort key);
  *  - every buffered row IS a match — the BETWEEN predicate is
  *    enforced by the buffer bounds, so there is no candidate
  *    over-emission and no post-join filter;
  *  - memory is O(max rows inside one band) per partition — the band
  *    occupancy, strictly smaller than the hash join's O(rows per bin)
  *    build side (bin width ≥ band width by construction).
  *
  * Contract: bin columns BIGINT, value columns DOUBLE,
  * 0 ≤ loFactor ≤ hiFactor, values non-negative (multiplicative bands
  * flip for negative values; such rows match nothing). NULL values on
  * either side never match (SQL BETWEEN semantics).
  *
  * At 100 TB: one shuffle per side on the bin key (the range join's
  * inherent cost — same movement as the composition), then linear merge
  * work per partition; a skewed bin costs its own band occupancy,
  * never |bin|² hash-probe emission.
  */
case class BandJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftBin: Attribute,
    leftVal: Attribute,
    rightBin: Attribute,
    rightVal: Attribute,
    loFactor: Double,
    hiFactor: Double) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): BandJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[BandJoinPlan]] as [[BandJoinBroadcastExec]] when the right
  * side's estimated size clears the session's broadcast threshold
  * (`spark.sql.autoBroadcastJoinThreshold`, same knob and semantics as
  * the built-in join selection — -1 disables), else as the shuffled
  * sort-merge sweep [[BandJoinExec]] (r10 verdict item #5: a bounded
  * right side paid two hash exchanges where the composed broadcast form
  * paid none). Injected declaratively by `graft.GraftExtensions` and
  * idempotently by the imperative builder
  * (`org.apache.spark.sql.graft.GraftFunctions.bandJoin`). */
object BandJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: BandJoinPlan =>
      val threshold = SQLConf.get.autoBroadcastJoinThreshold
      val exec =
        if (threshold > 0 && p.right.stats.sizeInBytes <= threshold)
          BandJoinBroadcastExec(planLater(p.left), planLater(p.right),
            p.leftBin, p.leftVal, p.rightBin, p.rightVal,
            p.loFactor, p.hiFactor)
        else
          BandJoinExec(planLater(p.left), planLater(p.right), p.leftBin,
            p.leftVal, p.rightBin, p.rightVal, p.loFactor, p.hiFactor)
      exec :: Nil
    case _ => Nil
  }
}

/** The band index over a broadcast side: all valid right rows sorted
  * (bin, value), with the distinct home bins and their row-range
  * starts for O(log bins) lookup. (`BroadcastExchangeExec` hard-codes
  * the transform result to `Array[InternalRow] | HashedRelation`, so
  * the index cannot ship pre-built the HashedRelation way; instead it
  * is memoized PER JVM keyed by the broadcast id — built once per
  * executor, not once per task.) */
class BandIndex(
    val bins: Array[Long],
    val starts: Array[Int],
    val values: Array[Double],
    val rows: Array[InternalRow]) extends Serializable {
  /** Row range [start, end) of `bin`, or null when absent. */
  def lookup(bin: Long): (Int, Int) = {
    val i = java.util.Arrays.binarySearch(bins, bin)
    if (i < 0) null
    else (starts(i), if (i + 1 < bins.length) starts(i + 1) else rows.length)
  }
}

object BandJoinBroadcastExec {
  /** Per-JVM LRU of built indexes keyed by broadcast id: the first
    * task of an executor builds, the other ~core-count tasks reuse.
    * Bounded so long sessions running many broadcast band joins don't
    * pin dead broadcasts' indexes. */
  private val idxCache =
    new java.util.LinkedHashMap[Long, BandIndex](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Long, BandIndex]): Boolean = size > 16
    }

  private[plans] def index(bcastId: Long, rows: => Array[InternalRow],
      binIdx: Int, valIdx: Int): BandIndex =
    // SINGLE-FLIGHT: the build runs inside the lock so an executor's
    // worth of concurrently-starting tasks (all missing the same
    // fresh key) wait for ONE sort instead of racing ~core-count
    // duplicate sorts — measured 7.8 s vs 1.0 s on a deliberately
    // oversized side at local[32]
    idxCache.synchronized {
      Option(idxCache.get(bcastId)).getOrElse {
        val built = build(rows, binIdx, valIdx)
        idxCache.put(bcastId, built)
        built
      }
    }

  private def build(rs: Array[InternalRow], binIdx: Int,
      valIdx: Int): BandIndex = {
    val sorted = rs
      .filterNot(r => r.isNullAt(binIdx) || r.isNullAt(valIdx))
      .sortBy(r => (r.getLong(binIdx), r.getDouble(valIdx)))
    val bins = scala.collection.mutable.ArrayBuffer.empty[Long]
    val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < sorted.length) {
      val b = sorted(i).getLong(binIdx)
      if (bins.isEmpty || bins.last != b) { bins += b; starts += i }
      i += 1
    }
    new BandIndex(bins.toArray, starts.toArray,
      sorted.map(_.getDouble(valIdx)), sorted)
  }
}

/** Broadcast small-side band join: the right side ships whole
  * (IdentityBroadcastMode — EnsureRequirements plans the
  * BroadcastExchange), is indexed by home bin ONCE PER EXECUTOR (see
  * [[BandJoinBroadcastExec.index]]), and every left row
  * binary-searches its home bin for the first value ≥ its lo bound
  * and emits until > hi. Same exactly-once contract as the sweep (a
  * pair meets only in the right row's home bin, so the caller's
  * left-side bin replication cannot double-emit) and the same
  * NULL/negative semantics. */
case class BandJoinBroadcastExec(
    left: SparkPlan,
    right: SparkPlan,
    leftBin: Attribute,
    leftVal: Attribute,
    rightBin: Attribute,
    rightVal: Attribute,
    loFactor: Double,
    hiFactor: Double) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"))

  private def ordinal(attrs: Seq[Attribute], a: Attribute,
      side: String): Int = {
    val i = attrs.indexWhere(_.exprId == a.exprId)
    require(i >= 0, s"band-join $side column ${a.name} not in child output")
    i
  }

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(UnspecifiedDistribution, BroadcastDistribution(IdentityBroadcastMode))

  /** Left streams through untouched — partitioning and order intact. */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BandJoinBroadcastExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lbIdx = ordinal(left.output, leftBin, "left bin")
    val lvIdx = ordinal(left.output, leftVal, "left value")
    val rbIdx = ordinal(right.output, rightBin, "right bin")
    val rvIdx = ordinal(right.output, rightVal, "right value")
    val (loF, hiF) = (loFactor, hiFactor)
    val outAttrs = output
    val numOutputRows = longMetric("numOutputRows")
    val bRows = right.executeBroadcast[Array[InternalRow]]()
    left.execute().mapPartitions { lIter =>
      val idx = BandJoinBroadcastExec.index(bRows.id, bRows.value,
        rbIdx, rvIdx)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      lIter.flatMap { l =>
        if (l.isNullAt(lbIdx) || l.isNullAt(lvIdx) ||
            l.getDouble(lvIdx) < 0) Iterator.empty
        else idx.lookup(l.getLong(lbIdx)) match {
          case null => Iterator.empty
          case (start, end) =>
            val lv = l.getDouble(lvIdx)
            val lo = lv * loF
            val hi = lv * hiF
            // first index in the bin's range with value >= lo
            var a = start; var b = end
            while (a < b) {
              val m = (a + b) >>> 1
              if (idx.values(m) < lo) a = m + 1 else b = m
            }
            Iterator.range(a, end)
              .takeWhile(i => idx.values(i) <= hi)
              .map { i => numOutputRows += 1; proj(joined(l, idx.rows(i))) }
        }
      }
    }
  }
}

case class BandJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftBin: Attribute,
    leftVal: Attribute,
    rightBin: Attribute,
    rightVal: Attribute,
    loFactor: Double,
    hiFactor: Double) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"),
    "maxBandBuffer" -> SQLMetrics.createSizeMetric(sparkContext,
      "peak band-window buffer rows"))

  /** Both children clustered on their bin: EnsureRequirements inserts
    * the two hash exchanges AND aligns partition counts, so
    * `zipPartitions` pairs co-binned partitions. */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftBin)),
      ClusteredDistribution(Seq(rightBin)))

  /** (bin, value) ascending on both sides — the sweep's precondition;
    * EnsureRequirements adds spill-aware SortExecs. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftBin, Ascending), SortOrder(leftVal, Ascending)),
      Seq(SortOrder(rightBin, Ascending), SortOrder(rightVal, Ascending)))

  /** Rows stream out in left order with left's clustering intact. */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BandJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    def ordinal(attrs: Seq[Attribute], a: Attribute, side: String): Int = {
      val i = attrs.indexWhere(_.exprId == a.exprId)
      require(i >= 0, s"band-join $side column ${a.name} not in child output")
      i
    }
    val lbIdx = ordinal(left.output, leftBin, "left bin")
    val lvIdx = ordinal(left.output, leftVal, "left value")
    val rbIdx = ordinal(right.output, rightBin, "right bin")
    val rvIdx = ordinal(right.output, rightVal, "right value")
    val (loF, hiF) = (loFactor, hiFactor)
    val outAttrs = output
    val numOutputRows = longMetric("numOutputRows")
    val maxBandBuffer = longMetric("maxBandBuffer")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      // right cursor; skips rows that can never match (null bin/value)
      def advance(): InternalRow = {
        var n: InternalRow = null
        while (n == null && rIter.hasNext) {
          n = rIter.next()
          if (n.isNullAt(rbIdx) || n.isNullAt(rvIdx)) n = null
        }
        n
      }
      var rRow: InternalRow = advance()
      // window buffer: current bin's right rows with value inside the
      // CURRENT left band — value-ascending, appended once per bin
      // pass (copy() required: the child iterator reuses its buffer)
      val buf = new java.util.ArrayDeque[InternalRow]()
      var curBin = Long.MinValue
      var curBinValid = false
      var peak = 0L
      lIter.flatMap { l =>
        if (l.isNullAt(lbIdx) || l.isNullAt(lvIdx) ||
            l.getDouble(lvIdx) < 0) Iterator.empty
        else {
          val lbin = l.getLong(lbIdx)
          val lv = l.getDouble(lvIdx)
          val lo = lv * loF
          val hi = lv * hiF
          if (!curBinValid || lbin != curBin) {
            buf.clear(); curBin = lbin; curBinValid = true
          }
          while (rRow != null && rRow.getLong(rbIdx) < lbin) rRow = advance()
          while (rRow != null && rRow.getLong(rbIdx) == lbin &&
              rRow.getDouble(rvIdx) <= hi) {
            buf.addLast(rRow.copy())
            rRow = advance()
          }
          while (!buf.isEmpty && buf.peekFirst.getDouble(rvIdx) < lo)
            buf.pollFirst()
          if (buf.size > peak) { peak = buf.size; maxBandBuffer.set(peak) }
          numOutputRows += buf.size
          // safe to iterate the live deque: it only mutates on the NEXT
          // outer element, after this inner iterator is exhausted
          import scala.jdk.CollectionConverters._
          buf.iterator.asScala.map(r => proj(joined(l, r)))
        }
      }
    }
  }
}
