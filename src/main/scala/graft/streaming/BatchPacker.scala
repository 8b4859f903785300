package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-key fixed-size batch assembly on `transformWithState` — the
  * ListState-shaped problem done with real ListState: values accumulate
  * per user until exactly `b` are pending, then a packed group is emitted
  * and the remainder stays buffered. This is the streaming face of
  * training-batch assembly ([[graft.ops.Packing]] is the batch face): an
  * unbounded stream becomes a stream of fixed-size, deterministically-
  * numbered groups per key.
  *
  * State discipline: the pending buffer is strictly < b elements after
  * every batch (ListState.put rewrites it), plus one Long group counter —
  * bounded state per key regardless of stream length. Intra-micro-batch
  * arrivals are sorted by event_id before appending, so emissions are
  * deterministic for an in-order source however the input is chunked
  * (BatchPackerSpec pins stream ≡ batch packing across splits).
  */
object BatchPacker {

  case class UserEvent(user_id: Long, event_id: Long, value: Double)
  case class Packed(
      user_id: Long, group_id: Long, n: Int, sum_value: Double,
      first_event: Long, last_event: Long)

  class Processor(b: Int) extends StatefulProcessor[Long, UserEvent, Packed] {
    @transient private var pending: ListState[UserEvent] = _
    @transient private var nGroups: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      pending = getHandle.getListState[UserEvent](
        "pending", Encoders.product[UserEvent], TTLConfig.NONE)
      nGroups = getHandle.getValueState[Long](
        "ngroups", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long, rows: Iterator[UserEvent], tv: TimerValues): Iterator[Packed] = {
      val arrivals = rows.toArray.sortBy(_.event_id)
      val buf = pending.get().toArray ++ arrivals
      var g = if (nGroups.exists()) nGroups.get() else 0L
      val out = ArrayBuffer.empty[Packed]
      var i = 0
      while (buf.length - i >= b) {
        val grp = buf.slice(i, i + b)
        // fixed slice order ⇒ sum_value is a pure function of the group
        out += Packed(key, g, b, grp.map(_.value).sum,
          grp.head.event_id, grp.last.event_id)
        g += 1
        i += b
      }
      val rem = buf.drop(i)
      // the store rejects empty list writes — an empty tail is a clear()
      if (rem.isEmpty) pending.clear() else pending.put(rem)
      nGroups.update(g)
      out.iterator
    }
  }

  def packStream(events: Dataset[UserEvent], b: Int = 4): Dataset[Packed] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new Processor(b), TimeMode.None(), OutputMode.Append())
  }
}
