package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** EVENT-time timer-driven sessionization on `transformWithState` — the
  * watermark-correct streaming twin of the batch
  * [[graft.ops.Behavior.sessionizeGap]], and the event-time complement of
  * the processing-time [[SessionTimeout]]: a user's events buffer per key,
  * and gap-separated sessions are emitted when the WATERMARK passes their
  * close point (last event + gap) — i.e. when no non-late arrival can
  * extend them, which is the only moment a session is provably final.
  *
  * Determinism (what makes the end-to-end drive DuckDB-oracle-checkable):
  * buffered events are sorted by (ts, vc) before the gap split, sums are
  * integral cents, and a session is emitted exactly once, on the first
  * timer firing with watermark ≥ its close point. The session partition
  * of a sorted multiset is a pure function of that multiset, and the
  * watermark trajectory is a pure function of the feed's batch structure
  * — so the union of emissions is exactly {gap-sessions of the accepted
  * multiset closed by the final watermark}, which batch SQL can state.
  *
  * Timer discipline: ONE live timer per key, at (earliest buffered ts) +
  * gap — a lower bound on every session's close point, so no close is
  * missed; each firing emits ALL ripe sessions, retains the open tail,
  * and re-arms at the tail's earliest ts + gap. State per key is the
  * open-tail buffer only (closed sessions leave the store immediately);
  * an idle key holds nothing once its tail closes.
  */
object SessionEventTime {

  /** `ts` stays a Timestamp so the input Dataset keeps the watermark
    * column; ms arithmetic uses `ts.getTime` (micros → ms truncation,
    * the same granularity the watermark itself tracks).
    */
  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, vc: Long)
  case class SessionMeta(timerMs: Long)
  case class ClosedSession(user_id: Long, start_ms: Long, n_ev: Long, sum_cents: Long)

  class Processor(gapMs: Long)
      extends StatefulProcessor[Long, SessionEvent, ClosedSession] {
    @transient private var buf: ListState[SessionEvent] = _
    @transient private var meta: ValueState[SessionMeta] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[SessionEvent](
        "buf", Encoders.product[SessionEvent], TTLConfig.NONE)
      meta = getHandle.getValueState[SessionMeta](
        "meta", Encoders.product[SessionMeta], TTLConfig.NONE)
    }

    private def rearm(earliestTs: Long): Unit = {
      // 1 ms early: whether timer expiry is inclusive or strict w.r.t. the
      // watermark, a session closing EXACTLY at the final watermark still
      // gets its firing (the ripeness check inside the handler is what
      // decides emission — an early no-op firing just re-arms).
      val expiry = earliestTs + gapMs - 1
      if (meta.exists()) {
        val old = meta.get().timerMs
        if (old == expiry) return
        getHandle.deleteTimer(old)
      }
      getHandle.registerTimer(expiry)
      meta.update(SessionMeta(expiry))
    }

    override def handleInputRows(
        key: Long, rows: Iterator[SessionEvent],
        tv: TimerValues): Iterator[ClosedSession] = {
      val arrivals = rows.toArray
      if (arrivals.isEmpty) return Iterator.empty
      buf.appendList(arrivals)
      val earliest = buf.get().map(_.ts.getTime).min
      rearm(earliest)
      Iterator.empty
    }

    override def handleExpiredTimer(
        key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[ClosedSession] = {
      if (!meta.exists() || meta.get().timerMs != info.getExpiryTimeInMs)
        return Iterator.empty // stale timer the delete raced
      val wm = tv.getCurrentWatermarkInMs()
      val evs = buf.get().toArray.sortBy(e => (e.ts.getTime, e.vc))
      if (evs.isEmpty) { meta.clear(); return Iterator.empty }

      // gap split over the sorted buffer: session boundaries first, then
      // emit the closed prefix. Close points (last ts + gap) are strictly
      // increasing across a user's sessions, so the closed set is always
      // a PREFIX and the retained tail a suffix.
      val bounds = ArrayBuffer(0)
      var i = 1
      while (i < evs.length) {
        if (evs(i).ts.getTime - evs(i - 1).ts.getTime >= gapMs) bounds += i
        i += 1
      }
      bounds += evs.length
      val sessions = bounds.sliding(2).map { case ArrayBuffer(s, e) => (s, e) }.toArray
      val (closed, open) = sessions.partition { case (_, e) => evs(e - 1).ts.getTime + gapMs <= wm }
      val out = closed.iterator.map { case (s, e) =>
        ClosedSession(key, evs(s).ts.getTime, (e - s).toLong, evs.slice(s, e).map(_.vc).sum)
      }

      if (open.isEmpty) { buf.clear(); meta.clear() }
      else {
        val rem = evs.drop(open.head._1)
        buf.put(rem)
        meta.clear() // rearm registers fresh
        rearm(rem.head.ts.getTime)
      }
      out
    }
  }

  /** Closed sessions in Append mode — a session row leaves the operator
    * only when the watermark proves it final.
    */
  def closedSessions(
      events: Dataset[SessionEvent], gapMs: Long): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new Processor(gapMs), TimeMode.EventTime(), OutputMode.Append())
  }
}
