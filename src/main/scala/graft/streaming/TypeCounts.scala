package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Per-key sub-keyed running counts on `transformWithState` — the
  * MapState-shaped problem done with real MapState: one map per user from
  * event_type to its lifetime count. Only the sub-keys touched by a
  * micro-batch are read/written (point lookups, not a whole-map rewrite),
  * which is exactly what MapState buys over a ValueState[Map] when the
  * sub-key universe per key is wide and updates are sparse.
  *
  * Count-merge is commutative and associative, so the final state is
  * independent of arrival order and batch chunking — the streamed result
  * is batch-equivalent by construction (TypeCountsSpec pins stream ≡
  * batch groupBy count across splits). State per key is bounded by the
  * sub-key cardinality.
  */
object TypeCounts {

  case class TypedEvent(user_id: Long, event_type: String)
  case class TypeCount(user_id: Long, event_type: String, n: Long)

  class Processor extends StatefulProcessor[Long, TypedEvent, TypeCount] {
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long](
        "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[TypedEvent], tv: TimerValues): Iterator[TypeCount] = {
      val delta = rows.foldLeft(Map.empty[String, Long]) { (m, e) =>
        m.updated(e.event_type, m.getOrElse(e.event_type, 0L) + 1L)
      }
      // sorted emission order keeps the per-batch output deterministic
      delta.toSeq.sortBy(_._1).iterator.map { case (ty, d) =>
        val n = (if (counts.containsKey(ty)) counts.getValue(ty) else 0L) + d
        counts.updateValue(ty, n)
        TypeCount(key, ty, n)
      }
    }
  }

  def typeCounts(events: Dataset[TypedEvent]): Dataset[TypeCount] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
  }
}
