package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-key running aggregates on the `transformWithState` arbitrary-state
  * operator (Spark 4's successor to mapGroupsWithState: typed state
  * handles, TTL, timers, RocksDB-backed).
  *
  * The processor keeps one fixed-size ValueState record per user — (count,
  * sum, max) — and emits the refreshed stat row for every key touched in a
  * micro-batch (Update mode). State size is O(distinct keys), sharded by
  * the stream's hash partitioning, and a production deployment bounds it
  * with a TTL on the state handle; RocksDB spills cold keys off-heap, so
  * the operator holds at any key cardinality the state store's disk can
  * carry — the 100 TB posture for streaming aggregation.
  *
  * Batch equivalence (RunningStatsSpec): after processing a bounded stream,
  * the latest emission per key must equal the batch groupBy aggregate.
  */
object RunningStats {

  case class UserEvent(user_id: Long, value: Double)
  case class Stats(n: Long, sum: Double, mx: Double)
  case class UserStat(user_id: Long, n: Long, sum_value: Double, max_value: Double)

  class Processor extends StatefulProcessor[Long, UserEvent, UserStat] {
    @transient private var state: ValueState[Stats] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Stats]("stats", Encoders.product[Stats], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[UserEvent], timers: TimerValues): Iterator[UserStat] = {
      var s = if (state.exists()) state.get() else Stats(0L, 0.0, Double.NegativeInfinity)
      rows.foreach { e =>
        s = Stats(s.n + 1, s.sum + e.value, math.max(s.mx, e.value))
      }
      state.update(s)
      Iterator.single(UserStat(key, s.n, s.sum, s.mx))
    }
  }

  def runningStats(events: Dataset[UserEvent]): Dataset[UserStat] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
  }
}
