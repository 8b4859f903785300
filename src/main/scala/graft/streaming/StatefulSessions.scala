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
  * Sessions are merged by interval overlap, so out-of-order events within
  * the watermark are handled exactly like the built-in: a late event can
  * extend a session backward or bridge two open sessions into one.
  * Emission happens ONLY when the watermark passes a session's close
  * horizon (end + gap) — never on gap observation, since a late event
  * could still reopen it.
  *
  * Batch equivalence (StatefulSessionsSpec): run over a bounded stream,
  * the emitted sessions must match the batch session_window aggregation.
  */
object StatefulSessions {

  case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Timestamp, startUs: Long, lastUs: Long, cnt: Long, sum: Double)
  case class SessionOut(user_id: Long, start: Timestamp, cnt: Long, sum_value: Double)

  val GapUs: Long = 30L * 60 * 1000 * 1000

  /** Microsecond event time — Timestamp.getTime is millis-only; the test
    * data carries µs and the built-in session_window compares at full
    * precision.
    */
  private def micros(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** An event's window [t, t+gap) overlaps session [start, last+gap). */
  private def overlaps(t: Long, s: SessionState): Boolean =
    t + GapUs > s.startUs && t < s.lastUs + GapUs

  def sessionize(events: Dataset[SessionEvent], watermark: String = "10 minutes")
      : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId, batch, state: GroupState[List[SessionState]]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L

          var sessions = state.getOption.getOrElse(Nil)
          batch.foreach { e =>
            val t = micros(e.ts)
            val (hit, miss) = sessions.partition(s => overlaps(t, s))
            // The event joins every overlapping session — and thereby
            // bridges them into one (mirrors built-in session merging).
            val merged = hit.foldLeft(
              SessionState(e.ts, t, t, 1, e.value)) { (acc, s) =>
              SessionState(
                if (s.startUs < acc.startUs) s.start else acc.start,
                math.min(acc.startUs, s.startUs),
                math.max(acc.lastUs, s.lastUs),
                acc.cnt + s.cnt,
                acc.sum + s.sum)
            }
            sessions = merged :: miss
          }

          // Close (emit) every session the watermark has passed; a later
          // event can no longer touch it.
          val (ripe, open) = sessions.partition(s => s.lastUs + GapUs <= wmUs)
          if (open.isEmpty) state.remove()
          else {
            state.update(open)
            val nextClose = open.map(s => (s.lastUs + GapUs) / 1000L + 1).min
            state.setTimeoutTimestamp(math.max(nextClose, state.getCurrentWatermarkMs() + 1))
          }
          ripe.sortBy(_.startUs).iterator
            .map(s => SessionOut(userId, s.start, s.cnt, s.sum))
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
