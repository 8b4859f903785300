package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming CDC apply on `transformWithState`: maintain the CURRENT
  * value of a keyed table from an ordered upsert/delete change feed —
  * the materialized-view half of a change-data-capture pipeline (the
  * feed-derivation half is the batch [[graft.ops.Merge]] /
  * `snapshot_diff` family).
  *
  * Semantics: ops carry a strictly-increasing per-key sequence number
  * (a CDC log's LSN). The processor applies ops in seq order and
  * IGNORES any op at-or-below the applied high-water mark — so replayed
  * or duplicated feed segments (the at-least-once delivery every real
  * CDC transport has) are idempotent by construction, not by luck.
  * A delete tombstones the key but keeps its op count; a later upsert
  * revives it. One fixed-size ValueState record per key, RocksDB-backed
  * — the same O(live keys) state posture as [[RunningStats]].
  *
  * Within one micro-batch a key's ops arrive unordered (shuffled rows),
  * so the handler sorts the key's batch slice by seq first — bounded by
  * one key's volume within one batch, never by history.
  *
  * Batch equivalence (driven end-to-end by `stream_cdc_apply`): after a
  * bounded multi-batch feed, the latest emission per key ≡ the batch
  * "latest op wins, tombstones drop" reduction the DuckDB oracle states.
  */
object CdcApply {

  case class CdcOp(user_id: Long, seq: Long, is_del: Boolean, vc: Long)
  case class KeyState(seq: Long, vc: Long, n_ops: Long, deleted: Boolean)
  case class CdcRow(user_id: Long, seq: Long, n_ops: Long, vc: Long, deleted: Boolean)

  class Processor extends StatefulProcessor[Long, CdcOp, CdcRow] {
    @transient private var state: ValueState[KeyState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[KeyState](
        "cdc", Encoders.product[KeyState], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[CdcOp], timers: TimerValues): Iterator[CdcRow] = {
      var s =
        if (state.exists()) state.get()
        else KeyState(Long.MinValue, 0L, 0L, deleted = true)
      rows.toSeq.sortBy(_.seq).foreach { op =>
        if (op.seq > s.seq) { // LSN high-water mark: replays are no-ops
          s =
            if (op.is_del) KeyState(op.seq, 0L, s.n_ops + 1, deleted = true)
            else KeyState(op.seq, op.vc, s.n_ops + 1, deleted = false)
        }
      }
      state.update(s)
      Iterator.single(CdcRow(key, s.seq, s.n_ops, s.vc, s.deleted))
    }
  }

  def applyCdc(ops: Dataset[CdcOp]): Dataset[CdcRow] = {
    import ops.sparkSession.implicits._
    ops
      .groupByKey(_.user_id)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
  }
}
