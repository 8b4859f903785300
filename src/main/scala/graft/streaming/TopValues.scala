package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-key bounded top-K values on `transformWithState` — the ListState-
  * shaped problem (a small per-key collection, not a scalar), kept here as
  * a ValueState[Seq] because the collection is BOUNDED at K and rewritten
  * wholesale each batch: one state read + one write per touched key,
  * versus ListState's per-element append still needing the read-sort-trim
  * cycle to hold the top-K invariant.
  *
  * Semantics are deliberately order-free — the top-K multiset of values
  * is independent of arrival order across batches and partitions — so the
  * streamed result is deterministic and batch-equivalent by construction
  * (TopValuesSpec pins stream ≡ batch window top-K). State per key is K
  * doubles; at any user cardinality the store holds O(K·users), RocksDB-
  * sharded like every other stateful operator here.
  */
object TopValues {

  case class UserEvent(user_id: Long, value: Double)
  case class TopState(vals: Seq[Double])
  case class TopK(user_id: Long, n_top: Int, sum_top: Double)

  class Processor(k: Int) extends StatefulProcessor[Long, UserEvent, TopK] {
    @transient private var state: ValueState[TopState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[TopState](
        "topk", Encoders.product[TopState], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[UserEvent], tv: TimerValues): Iterator[TopK] = {
      val prev = if (state.exists()) state.get().vals else Seq.empty[Double]
      // sorted-desc order also fixes the emission's double-sum order, so
      // sum_top is a pure function of the value multiset
      val top = (prev ++ rows.map(_.value)).sorted(Ordering[Double].reverse).take(k)
      state.update(TopState(top))
      Iterator.single(TopK(key, top.size, top.sum))
    }
  }

  def topValues(events: Dataset[UserEvent], k: Int = 5): Dataset[TopK] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new Processor(k), TimeMode.None(), OutputMode.Update())
  }
}
