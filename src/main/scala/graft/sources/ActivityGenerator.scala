package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic synthetic activity SOURCE — the reference solution's
  * first component (SURVEY §0 #1: a data generator emitting customer
  * activity) realized Spark-natively as a DataSource V2 `TableProvider`
  * instead of an external script: `spark.read.format("graft-events")
  * .option("rows", N).option("seed", s)` scales out like any other
  * table.
  *
  * Every column is a pure function of `(seed, event_id)` through the
  * SAME portable 60-bit md5 integer as [[graft.Det.md5int60]], so
  *   - the data is identical for any partition count / cluster size
  *     (ids are range-split; no RNG state crosses partitions), and
  *   - a DuckDB oracle can REGENERATE the rows exactly
  *     (`range(lo, hi)` + the md5 ladder) — the source is hash-graded
  *     like any relational op, not merely smoke-tested.
  *
  * Scale design: generation is embarrassingly parallel over id ranges
  * (`parts` input partitions, each O(rows/parts) with zero input I/O);
  * column pruning reaches the generator (pruned columns are never
  * computed — `SupportsPushDownRequiredColumns`); and `event_id` range
  * predicates narrow the generated id window itself
  * (`SupportsPushDownFilters`) — the moral equivalent of partition
  * pruning, so `WHERE event_id >= N-k` touches O(k) work no matter how
  * large the virtual table is. Range filters are also kept as residuals
  * (conservative: the scan never claims more than it proves).
  */
class ActivityGenerator extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-events"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ActivityGenerator.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GenTable(properties)
}

object ActivityGenerator {
  val Schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("props", StringType, nullable = false)))

  val Types: Array[String] =
    Array("click", "error", "purchase", "signup", "view")

  /** 2024-01-01T00:00:00Z in epoch micros — the corpus's own epoch. */
  val BaseMicros: Long = 1704067200000000L

  private val Md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** The portable 60-bit hash (first 15 hex chars of md5), exactly
    * [[graft.Det.md5int60]] / its DuckDB mirror, computed JVM-side. */
  def h60(seed: Long, id: Long): Long = {
    val md = Md5.get()
    md.reset()
    val d = md.digest(s"$seed:$id".getBytes("UTF-8"))
    // first 15 hex chars = 60 bits: 7 full bytes + the high nibble of
    // the 8th
    var acc = 0L
    var i = 0
    while (i < 7) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    (acc << 4) | ((d(7) & 0xf0L) >> 4)
  }
}

private class GenTable(props: util.Map[String, String])
    extends Table with SupportsRead {
  private def opt(k: String, d: Long): Long =
    Option(props.get(k)).map(_.toLong).getOrElse(d)
  override def name(): String = "graft_events_generator"
  override def schema(): StructType = ActivityGenerator.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(opt("rows", 10000L), opt("seed", 42L),
      opt("users", 500L), opt("parts", 8L).toInt)
}

private class GenScanBuilder(rows: Long, seed: Long, users: Long, parts: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit
    with SupportsPushDownAggregates {
  private var required: StructType = ActivityGenerator.Schema
  private var lo = 0L
  private var hi = rows
  private var pushed: Array[Filter] = Array.empty
  private var countPushed = false

  /** COUNT(*) with no grouping is pure window arithmetic — `hi − lo` —
    * so it pushes COMPLETELY into the source and never generates a
    * row: the generator's analogue of a parquet footer count. Only
    * legal because the range filters above are fully handled (an
    * un-pushed predicate would make the arithmetic overcount). */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall(_.isInstanceOf[CountStar])
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (!supportCompletePushDown(agg)) return false
    countPushed = true
    required = StructType(agg.aggregateExpressions.zipWithIndex.map {
      case (_, i) => StructField(s"count_$i", LongType, nullable = false)
    })
    true
  }

  override def pruneColumns(s: StructType): Unit = required = s

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ranges, rest) = filters.partition {
      case GreaterThan("event_id", _: Long) => true
      case GreaterThanOrEqual("event_id", _: Long) => true
      case LessThan("event_id", _: Long) => true
      case LessThanOrEqual("event_id", _: Long) => true
      case EqualTo("event_id", _: Long) => true
      case IsNotNull("event_id") => true
      case _ => false
    }
    ranges.foreach {
      case GreaterThan("event_id", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("event_id", v: Long) => lo = math.max(lo, v)
      case LessThan("event_id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("event_id", v: Long) => hi = math.min(hi, v + 1)
      case EqualTo("event_id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _ => // IsNotNull: event_id is generated non-null by contract
    }
    pushed = ranges
    // range predicates are FULLY handled: every id in the narrowed
    // [lo, hi) window satisfies them by construction (boundary math
    // property-swept in GeneratorSourceSpec), so Spark plans no
    // residual Filter for them — which in turn unlocks limit pushdown.
    // Anything else stays a residual.
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** LIMIT pushes into the generator as a window truncation: the first
    * `limit` ids of the (already filter-narrowed) window are exactly
    * the rows a limit over this scan may keep. Returns true — the
    * source emits at most `limit` rows (Spark still applies its own
    * limit above, which is then a no-op). */
  override def pushLimit(limit: Int): Boolean = {
    hi = math.min(hi, lo + limit.toLong)
    true
  }

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"graft-events rows=[$lo,$hi) seed=$seed pushed=${pushed.length}" +
        (if (countPushed) " count-only" else "")
    override def planInputPartitions(): Array[InputPartition] =
      if (countPushed) Array(CountPartition(math.max(0L, hi - lo),
        required.length))
      else GenScanBuilder.split(lo, hi, parts, seed, users)
    override def createReaderFactory(): PartitionReaderFactory =
      new GenReaderFactory(required)
    /** Streaming face: the id space doubles as a REPLAYABLE offset log
      * (the Event Hubs / Kafka shape the reference ingested from) — an
      * offset is just the next unread event_id, so a restarted query
      * resumes from the checkpoint and re-emits nothing, and any
      * offset range replays bit-identically (generation is a pure
      * function of (seed, id)). */
    override def toMicroBatchStream(chk: String): MicroBatchStream =
      new GenMicroBatchStream(lo, hi, parts, seed, users, required)
  }
}

private object GenScanBuilder {
  def split(lo: Long, hi: Long, parts: Int, seed: Long,
      users: Long): Array[InputPartition] = {
    val span = math.max(0L, hi - lo)
    val n = math.max(1L, math.min(parts.toLong, math.max(1L, span)))
    (0L until n).map { p =>
      GenPartition(lo + span * p / n, lo + span * (p + 1) / n,
        seed, users): InputPartition
    }.toArray
  }
}

private case class GenOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

private class GenMicroBatchStream(lo: Long, hi: Long, parts: Int,
    seed: Long, users: Long, required: StructType)
    extends MicroBatchStream {
  override def initialOffset(): Offset = GenOffset(lo)
  override def latestOffset(): Offset = GenOffset(hi)
  override def deserializeOffset(json: String): Offset =
    GenOffset(json.trim.toLong)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    GenScanBuilder.split(start.asInstanceOf[GenOffset].pos,
      end.asInstanceOf[GenOffset].pos, parts, seed, users)
  override def createReaderFactory(): PartitionReaderFactory =
    new GenReaderFactory(required)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private case class GenPartition(lo: Long, hi: Long, seed: Long, users: Long)
    extends InputPartition

/** Single-partition payload of a completely-pushed COUNT(*). */
private case class CountPartition(count: Long, nCols: Int)
    extends InputPartition

private class GenReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = p match {
    case CountPartition(n, cols) =>
      new PartitionReader[InternalRow] {
        private var emitted = false
        override def next(): Boolean = { val r = !emitted; emitted = true; r }
        override def get(): InternalRow =
          new GenericInternalRow(Array.fill[Any](cols)(n))
        override def close(): Unit = ()
      }
    case gp: GenPartition => rowReader(gp)
  }

  private def rowReader(gp: GenPartition): PartitionReader[InternalRow] = {
    new PartitionReader[InternalRow] {
      private var id = gp.lo - 1
      // pruned columns are never computed: resolve each required field
      // to its generator once, outside the per-row loop; the md5 is
      // computed at most ONCE per row (shared across hash-derived
      // columns), and not at all when only event_id/ts are required
      private val needsHash = required.fieldNames.exists(
        n => n != "event_id" && n != "ts")
      private val gens: Array[(Long, Long) => Any] = required.fields.map { f =>
        f.name match {
          case "event_id" => (i: Long, _: Long) => i
          case "ts" => (i: Long, _: Long) =>
            ActivityGenerator.BaseMicros + i * 1000000L
          case "user_id" => (_: Long, h: Long) => h % gp.users
          case "event_type" => (_: Long, h: Long) => UTF8String.fromString(
            ActivityGenerator.Types(((h / gp.users) % 5L).toInt))
          case "value" => (_: Long, h: Long) =>
            (h % 1000000L).toDouble / 100.0
          case "props" => (_: Long, h: Long) => UTF8String.fromString(
            "{\"k\": " + (h % 100L) + "}")
          case other => sys.error(s"unknown column $other")
        }
      }
      override def next(): Boolean = { id += 1; id < gp.hi }
      override def get(): InternalRow = {
        val h = if (needsHash) ActivityGenerator.h60(gp.seed, id) else 0L
        val vals = new Array[Any](gens.length)
        var i = 0
        while (i < gens.length) { vals(i) = gens(i)(id, h); i += 1 }
        new GenericInternalRow(vals)
      }
      override def close(): Unit = ()
    }
  }
}
