package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization via flatMapGroupsWithState — the
  * extension point for session semantics `session_window` can't express
  * (here: per-session aggregates beyond count, emitted only when the
  * session closes). State is keyed by user_id → shards horizontally
  * across executors; the event-time timeout (watermark-driven) bounds
  * state lifetime exactly like the built-in session window's gap.
  *
  * Batch equivalence (StatefulSessionsSpec): run over a bounded stream,
  * the emitted sessions must match the batch session_window aggregation.
  */
object StatefulSessions {

  case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Timestamp, lastUs: Long, cnt: Long, sum: Double)
  case class SessionOut(user_id: Long, start: Timestamp, cnt: Long, sum_value: Double)

  val GapUs: Long = 30L * 60 * 1000 * 1000

  /** Microsecond event time — Timestamp.getTime is millis-only; the test
    * data carries µs and the built-in session_window compares at full
    * precision.
    */
  private def micros(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Sessionize a (possibly unordered-within-batch) event stream. Events
    * inside a batch are sorted per key; sessions close when a gap > 30 min
    * appears or on event-time timeout past the watermark.
    */
  def sessionize(events: Dataset[SessionEvent], watermark: String = "10 minutes")
      : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId, batch, state: GroupState[List[SessionState]]) =>
          if (state.hasTimedOut) {
            // Watermark passed every open session's horizon → emit all.
            val out = state.getOption.getOrElse(Nil).map(s =>
              SessionOut(userId, s.start, s.cnt, s.sum))
            state.remove()
            out.iterator
          } else {
            val sorted = batch.toSeq.sortBy(e => micros(e.ts))
            var open = state.getOption.getOrElse(Nil)
            var closed = List.empty[SessionState]
            sorted.foreach { e =>
              val t = micros(e.ts)
              open match {
                case cur :: rest if t < cur.lastUs + GapUs =>
                  open = cur.copy(
                    lastUs = math.max(cur.lastUs, t),
                    cnt = cur.cnt + 1, sum = cur.sum + e.value) :: rest
                case cur :: rest =>
                  closed = cur :: closed
                  open = SessionState(e.ts, t, 1, e.value) :: rest
                case Nil =>
                  open = SessionState(e.ts, t, 1, e.value) :: Nil
              }
            }
            state.update(open)
            // Keep state alive until the watermark passes the open
            // session's gap horizon (timeout must sit above the current
            // watermark or Spark rejects it; timeouts are millis).
            open.headOption.foreach { cur =>
              state.setTimeoutTimestamp(
                math.max((cur.lastUs + GapUs) / 1000L + 1,
                  state.getCurrentWatermarkMs() + 1))
            }
            closed.reverseIterator.map(s =>
              SessionOut(userId, s.start, s.cnt, s.sum))
          }
      }
  }

  /** Batch reference: the same aggregate via the built-in session window. */
  def batchReference(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("start"),
        col("cnt"), col("sum_value"))
}
