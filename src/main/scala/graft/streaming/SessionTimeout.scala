package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Timer-driven session close on `transformWithState`: the streaming twin
  * of [[graft.ops.Behavior.sessionizeGap]]. A per-user session accumulates
  * until `gapMs` of processing-time silence, then a registered timer fires
  * and emits the closed session — the session_window built-in can only
  * close a session when the WATERMARK passes it, i.e. when later data
  * arrives; a timer closes it on wall-clock silence, which is what a
  * live-serving feature store needs ("user went quiet → flush").
  *
  * State discipline at scale: exactly one ValueState record and at most
  * one live timer per active user (each batch deletes the previous timer
  * before registering the next — timers are per-key-unbounded otherwise).
  * A TTL of 10× the gap backstops the state store against keys whose
  * close emission is lost to a crash between timer fire and commit:
  * RocksDB reaps them instead of holding them forever. State size is
  * O(active users in the last gap), not O(all users ever).
  */
object SessionTimeout {

  case class UserEvent(user_id: Long, value: Double)
  case class SessionAcc(n: Long, sum: Double, timerMs: Long)
  case class ClosedSession(user_id: Long, n_ev: Long, sum_value: Double)

  class Processor(gapMs: Long, ttlMs: Long = -1L)
      extends StatefulProcessor[Long, UserEvent, ClosedSession] {
    @transient private var state: ValueState[SessionAcc] = _

    // TTL defaults to 10× the gap; overridable because a BOUNDED drive
    // with a tiny gap (the deterministic batch-clock harness below) must
    // not let the backstop reap live state between two adjacent batches
    private def effectiveTtl: Long = if (ttlMs > 0) ttlMs else gapMs * 10

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionAcc](
        "session", Encoders.product[SessionAcc],
        TTLConfig(Duration.ofMillis(effectiveTtl)))

    override def handleInputRows(
        key: Long, rows: Iterator[UserEvent],
        tv: TimerValues): Iterator[ClosedSession] = {
      var s = if (state.exists()) state.get() else SessionAcc(0L, 0.0, -1L)
      rows.foreach(e => s = SessionAcc(s.n + 1, s.sum + e.value, s.timerMs))
      if (s.timerMs > 0) getHandle.deleteTimer(s.timerMs)
      val expiry = tv.getCurrentProcessingTimeInMs() + gapMs
      getHandle.registerTimer(expiry)
      state.update(SessionAcc(s.n, s.sum, expiry))
      Iterator.empty
    }

    override def handleExpiredTimer(
        key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[ClosedSession] = {
      // TTL may have reaped the state, or the timer may be a stale one the
      // delete raced — only the timer recorded in state closes the session
      if (!state.exists()) return Iterator.empty
      val s = state.get()
      if (s.timerMs != info.getExpiryTimeInMs) return Iterator.empty
      state.clear()
      Iterator.single(ClosedSession(key, s.n, s.sum))
    }
  }

  /** Closed sessions, Append mode — a row leaves the operator only when
    * its session is final, so downstream sinks never see retractions.
    *
    * Operational note: in ProcessingTime mode the engine schedules
    * micro-batches continuously (input or not) so due timers fire; with
    * the default always-on trigger that is a busy loop of empty batches.
    * Production deployments pace it with `Trigger.ProcessingTime(...)` at
    * the timer granularity they need — timer latency then quantizes to
    * the trigger interval, which is the right trade at scale.
    */
  def closedSessions(
      events: Dataset[UserEvent], gapMs: Long = 1000L,
      ttlMs: Long = -1L): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new Processor(gapMs, ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
