package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 WRITE path — a stats-collecting sink (`format("graft-stats")`):
  * consumes a DataFrame through the full V2 write protocol and records
  * row/byte totals per declared sink name, writing no data. The
  * pipeline-benchmarking complement of [[ActivityGenerator]]'s read
  * path: "how much would this stage ship" without paying a store.
  *
  * The aggregation is CLUSTER-CORRECT, not a JVM-local shortcut: each
  * partition's [[StatsWriter]] accumulates locally and returns its
  * totals as the `WriterCommitMessage`; only `StatsBatchWrite.commit`
  * on the DRIVER folds the messages and publishes to [[StatsSink]]'s
  * registry. A speculative/retried task's discarded attempt is ignored
  * automatically because its message never reaches commit — the same
  * exactly-once contract a real table sink relies on. `abort` publishes
  * nothing.
  */
class StatsSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-stats"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(Nil) // schema comes from the written query
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new StatsTable(schema,
      Option(properties.get("name")).getOrElse("default"))
}

object StatsSink {
  /** (rows, bytes) per sink name, published at driver commit time. */
  private val totals =
    scala.collection.concurrent.TrieMap.empty[String, (Long, Long)]
  def get(name: String): Option[(Long, Long)] = totals.get(name)
  def clear(name: String): Unit = totals.remove(name)
  private[sources] def add(name: String, rows: Long, bytes: Long): Unit = {
    val _ = totals.updateWith(name) {
      case Some((r, b)) => Some((r + rows, b + bytes))
      case None => Some((rows, bytes))
    }
  }
}

private class StatsTable(schema: StructType, name: String)
    extends Table with SupportsWrite {
  override def name(): String = s"graft_stats_sink_$name"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE, TableCapability.ACCEPT_ANY_SCHEMA)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new StatsBatchWrite(name, info.schema())
        override def toStreaming: StreamingWrite =
          new StatsStreamingWrite(name, info.schema())
      }
    }
}

/** Streaming face: each epoch's partition totals fold in the driver's
  * per-epoch commit — same exactly-once shape as the batch path, per
  * micro-batch. A replayed epoch (restart before commit) re-publishes
  * only once because the sink's registry is fed from commit, never
  * from the writers. */
private class StatsStreamingWrite(name: String, schema: StructType)
    extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    // a named top-level factory: an anonymous one would capture this
    // (non-serializable) StreamingWrite and fail task serialization
    StatsStreamingFactory(schema)
  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    var rows = 0L
    var bytes = 0L
    messages.foreach { case StatsCommit(r, b) => rows += r; bytes += b }
    StatsSink.add(name, rows, bytes)
  }
  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = ()
}

private case class StatsCommit(rows: Long, bytes: Long)
    extends WriterCommitMessage

private class StatsBatchWrite(name: String, schema: StructType)
    extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new StatsWriterFactory(schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    var rows = 0L
    var bytes = 0L
    messages.foreach { case StatsCommit(r, b) => rows += r; bytes += b }
    StatsSink.add(name, rows, bytes)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private case class StatsStreamingFactory(schema: StructType)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new StatsWriterFactory(schema).createWriter(partitionId, taskId)
}

private class StatsWriterFactory(schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private var bytes = 0L
      private val sizers: Array[InternalRow => Long] =
        schema.fields.zipWithIndex.map { case (f, i) =>
          f.dataType match {
            case StringType => (r: InternalRow) =>
              if (r.isNullAt(i)) 0L else r.getUTF8String(i).numBytes().toLong
            case BinaryType => (r: InternalRow) =>
              if (r.isNullAt(i)) 0L else r.getBinary(i).length.toLong
            case dt => (_: InternalRow) =>
              dt.defaultSize.toLong
          }
        }
      override def write(record: InternalRow): Unit = {
        rows += 1
        var i = 0
        while (i < sizers.length) { bytes += sizers(i)(record); i += 1 }
      }
      override def commit(): WriterCommitMessage = StatsCommit(rows, bytes)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
