package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Structured Streaming forms of the temporal operators (basis's reactive
  * core → readStream). Each transform here is the streaming twin of a
  * batch operator in [[graft.ops.Temporal]] — Spark's batch/streaming
  * unification means the same expressions run in both modes; the batch
  * twins are what the DuckDB oracle checks, these forms add watermarks +
  * state and are exercised by StreamingSpec via MemoryStream.
  *
  * State scale: every stateful op keys its state by (window/session, key)
  * — state stores partition by the grouping key, so a 1000-executor
  * cluster shards state horizontally; the watermark bounds state size.
  */
object Streams {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  /** Tumbling 1-hour counts/sums per event_type (twin: streamTumbling). */
  def tumblingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        // Decimal sum internally, DOUBLE in the final projection — same
        // output-typing rule as the batch twin (Temporal.streamTumbling).
        sum(dec(col("value"))).cast(DecimalType(38, 2)).cast(DoubleType).as("sv"))
      .select(col("window.start").as("ws"), col("event_type"), col("cnt"), col("sv"))

  /** Sliding 1-hour/15-min counts (twin: streamSliding). */
  def slidingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("cnt"))

  /** 30-minute-gap session counts per user (twin: streamSession).
    * session_window sits directly in the groupBy — required for session
    * merging (SURVEY.md §2.4 trap).
    */
  def sessionCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"), col("session_window.start").as("ss"), col("cnt"))

  /** First event per (user, type) — streaming dropDuplicates with
    * watermarked state (twin: streamDedup keeps min event_id; feeding in
    * event order makes these agree).
    */
  def dedupFirstEvent(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicates("user_id", "event_type")

  /** Stream-stream interval join (twin: [[graft.ops.Temporal.joinInterval]]):
    * for each click, purchases by the same user in (click.ts, click.ts +
    * 30 min]. Both inputs are watermarked and the join carries the
    * range condition, so Spark bounds the join state on BOTH sides: a
    * buffered click can stop matching once the purchase watermark passes
    * click.ts + 30 min, a buffered purchase once the click watermark
    * passes its ts — state is the recent horizon, not the stream history.
    * Inner join + range + dual watermark is exactly the supported
    * append-mode shape; StreamingSpec proves row equality with the batch
    * twin on the same data.
    */
  def clickPurchaseJoin(
      clicks: DataFrame, purchases: DataFrame,
      watermark: String = "10 minutes"): DataFrame = {
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("a_user"), col("ts").as("a_ts"))
      .withWatermark("a_ts", watermark)
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id").as("b_user"), col("ts").as("b_ts"))
      .withWatermark("b_ts", watermark)
    c.join(p,
        col("a_user") === col("b_user") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL '30' MINUTE"))
      .select(col("click_id"), col("purchase_id"))
  }

  /** LEFT-OUTER stream-stream interval join: [[clickPurchaseJoin]]'s
    * pairs PLUS one `(click_id, -1)` row per click that never matched —
    * emitted only once the global watermark proves no future purchase
    * can land in the click's 30-minute window (Spark evicts the buffered
    * click and emits the null-padded row at that point; the -1 coalesce
    * keeps the output column int64-clean for the oracle hash).
    *
    * On a BOUNDED feed the last clicks only release if something later
    * advances BOTH sides' event time — and it must do so through each
    * side's own watermark node. (Filtering a neutral-typed fence row in
    * after the watermark node does NOT work: Catalyst pushes the
    * deterministic type filter below `EventTimeWatermark`, so the fence
    * never reaches the node and the side's watermark stays pinned to its
    * last real row — measured as exactly the newest click stranded in
    * state. [[graft.streaming.StreamDrive.streamOuterJoin]] instead
    * injects sentinel-keyed rows of each REAL type, which survive any
    * filter placement, and drops the sentinels from the sink.)
    */
  def clickPurchaseJoinLeft(
      clicks: DataFrame, purchases: DataFrame,
      watermark: String = "10 minutes"): DataFrame = {
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("a_user"),
        col("ts").as("a_ts"))
      .withWatermark("a_ts", watermark)
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id").as("b_user"),
        col("ts").as("b_ts"))
      .withWatermark("b_ts", watermark)
    c.join(p,
        col("a_user") === col("b_user") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL '30' MINUTE"),
        "left_outer")
      .select(col("click_id"),
        coalesce(col("purchase_id"), lit(-1L)).as("purchase_id"))
  }

  /** basis stream input port over files: each new parquet block dropped
    * into `dir` becomes a micro-batch (schema declared, never inferred —
    * streaming sources require it anyway).
    */
  def parquetStreamSource(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** basis "reference" input port: a stream node joining against a static
    * table — Spark's stream-static join. The static plan is re-executed
    * per micro-batch, but a plain file-backed DataFrame pins its file
    * listing at creation: rows added to the directory later are NOT picked
    * up (use a table format with a refreshable snapshot for truly
    * slowly-changing references). Join strategy is left to Catalyst's
    * size-based choice — a forced broadcast would fail outright on a
    * large reference.
    */
  def withReference(stream: DataFrame, reference: DataFrame, key: Seq[String]): DataFrame =
    stream.join(reference, key, "left")

  /** basis `accumulator`: append-only union of all stream batches into a
    * parquet directory — one materialized "block" per micro-batch, which
    * is exactly the DataBlock immutability model at rest.
    */
  def accumulator(events: DataFrame, path: String, checkpoint: String): StreamingQuery =
    events.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()
}
