package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState` (SURVEY §2.I's
  * stateful late-data demo — not a t2 query; exercised against
  * MemoryStream in ScalaTest).
  *
  * Scale note: state is partitioned by user_id (one shuffle), and the
  * state store holds one 8-byte counter per user — the shape that holds
  * at 100 TB with RocksDB state backend + watermark-based eviction.
  */
object StatefulOps {

  case class UserState(count: Long)

  /** Running per-user event count, updated per micro-batch. */
  def runningCounts(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val typed: Dataset[(Long, String)] =
      events.selectExpr("user_id", "event_type").as[(Long, String)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[UserState, (Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid, rows, state) =>
          val prev = state.getOption.map(_.count).getOrElse(0L)
          val next = prev + rows.size
          state.update(UserState(next))
          Iterator((uid, next))
      }
      .toDF("user_id", "running_count")
  }
}
