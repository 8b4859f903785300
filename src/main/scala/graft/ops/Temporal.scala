package graft.ops

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Relational.{dbl, dec}

/** Temporal operators (SURVEY.md §2.2): event-time windowing (the batch
  * twins of the Structured Streaming forms — Spark's batch/streaming
  * unification means the same `window`/`session_window` expressions run
  * under `readStream` with a watermark, see graft.streaming), plus as-of /
  * interval joins and key-dedup.
  */
object Temporal {

  /** Tumbling 1-hour event-time window. */
  def streamTumbling(t: Tables): DataFrame =
    t.events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        dbl(sum(dec(col("value"))).cast(DecimalType(38, 2))).as("sv"))
      .select(col("window.start").as("ws"), col("event_type"), col("cnt"), col("sv"))
      .orderBy("ws", "event_type")

  /** Sliding 1-hour window every 15 min — each event lands in 4 windows
    * (TimeWindowing expands via explode before the aggregate).
    */
  def streamSliding(t: Tables): DataFrame =
    t.events
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("cnt"))
      .orderBy("ws")

  /** Session windows with a 30-min gap. `session_window` MUST appear
    * directly in the groupBy — projecting it first and grouping by `.start`
    * skips session merging and yields one session per event (§2.4 trap).
    */
  def streamSession(t: Tables): DataFrame =
    t.events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"), col("session_window.start").as("ss"), col("cnt"))
      .orderBy("user_id", "ss")

  /** First-event-per-key — batch twin of streaming
    * `dropDuplicates("user_id","event_type")` + watermark.
    */
  def streamDedup(t: Tables): DataFrame =
    t.events
      .groupBy("user_id", "event_type")
      .agg(min(col("event_id")).as("first_id"))
      .orderBy("user_id", "event_type")

  /** basis `dedupe_keep_latest`: one row per key, latest by (ts, event_id).
    * A single window per key partition — one shuffle, no join.
    */
  def dedupKeepLatest(t: Tables): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts").desc, col("event_id").desc)
    t.events
      .select(
        col("user_id"), col("event_type"), col("event_id"), col("ts"),
        row_number().over(w).as("rn"))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id", "ts")
      .orderBy("user_id", "event_type")
  }

  /** As-of join: for each purchase, the latest signup at-or-before its ts.
    * Ties (two signups for one user at the identical microsecond) break
    * deterministically on the signup's unique event_id DESC — §2.4 rule —
    * in all three implementations (rewrite / cogroup / native) and the
    * oracle SQL.
    * Spark has no native ASOF JOIN; the exact rewrite is an equi-join on
    * the key + range theta, then keep the latest right row per left row.
    * Scale note: the join shuffles both sides on `user_id` once, and the
    * window reuses that partitioning (event_id is unique per left row, so
    * partitioning by the finer event_id is satisfied by user_id locality
    * only after the join — Catalyst inserts the re-shuffle on event_id;
    * both are key-parallel, no global sort.
    */
  def joinAsof(t: Tables): DataFrame = {
    val p = t.events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val s = t.events.filter(col("event_type") === "signup")
      .select(
        col("event_id").as("s_event_id"), col("user_id").as("s_user"),
        col("ts").as("s_ts"), col("value").as("s_value"))
    val w = Window.partitionBy("event_id").orderBy(col("s_ts").desc, col("s_event_id").desc)
    p.join(s, col("user_id") === col("s_user") && col("ts") >= col("s_ts"))
      .select(
        col("event_id"), col("user_id"), col("s_ts"),
        dbl(dec(col("s_value"))).as("s_value"),
        row_number().over(w).as("rn"))
      .filter(col("rn") === 1)
      .select("event_id", "user_id", "s_ts", "s_value")
      .orderBy("event_id")
  }

  /** LEFT-OUTER as-of: [[joinAsof]] that KEEPS purchases with no prior
    * signup (null match columns) — merge_asof's actual default, and the
    * last join-shape the as-of family lacked (backward/forward/nearest/
    * tolerance/grouped/native are all inner). Same single-shuffle plan
    * with the join made `left`; the ranked window then sees exactly one
    * all-null row for unmatched purchases (rn = 1 trivially), so no
    * second pass distinguishes matched from unmatched.
    */
  def joinAsofLeft(t: Tables): DataFrame = {
    val p = t.events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val s = t.events.filter(col("event_type") === "signup")
      .select(
        col("event_id").as("s_event_id"), col("user_id").as("s_user"),
        col("ts").as("s_ts"), col("value").as("s_value"))
    val w = Window.partitionBy("event_id").orderBy(col("s_ts").desc, col("s_event_id").desc)
    p.join(s, col("user_id") === col("s_user") && col("ts") >= col("s_ts"), "left")
      .select(
        col("event_id"), col("user_id"), col("s_ts"),
        dbl(dec(col("s_value"))).as("s_value"),
        (col("s_ts").isNotNull).as("matched"),
        row_number().over(w).as("rn"))
      .filter(col("rn") === 1)
      .select("event_id", "user_id", "s_ts", "s_value", "matched")
      .orderBy("event_id")
  }

  /** [[joinAsof]] with a TOLERANCE bound (pandas merge_asof's `tolerance`,
    * the last as-of parameter the family lacked): the prior signup only
    * matches if it happened within 24 h of the purchase — stale context
    * is worse than none. Same plan as joinAsof with one extra integer-µs
    * range conjunct; at scale the tolerance also CAPS the join fan-out
    * per left row (only in-window rights survive), so it is cheaper than
    * the unbounded form, never dearer.
    */
  def joinAsofTolerance(t: Tables, toleranceUs: Long = 86400000000L): DataFrame = {
    val p = t.events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val s = t.events.filter(col("event_type") === "signup")
      .select(
        col("event_id").as("s_event_id"), col("user_id").as("s_user"),
        col("ts").as("s_ts"), col("value").as("s_value"))
    val w = Window.partitionBy("event_id").orderBy(col("s_ts").desc, col("s_event_id").desc)
    p.join(s, col("user_id") === col("s_user") && col("ts") >= col("s_ts") &&
        unix_micros(col("ts")) - unix_micros(col("s_ts")) <= toleranceUs)
      .select(
        col("event_id"), col("user_id"), col("s_ts"),
        dbl(dec(col("s_value"))).as("s_value"),
        row_number().over(w).as("rn"))
      .filter(col("rn") === 1)
      .select("event_id", "user_id", "s_ts", "s_value")
      .orderBy("event_id")
  }

  /** Forward as-of: each signup matched to its user's FIRST purchase at
    * or after it — time-to-conversion, the mirror of [[joinAsof]]'s
    * look-back. Same plan shape (one user_id-keyed join + per-left-row
    * top-1 window), only the range direction and sort flip; the native
    * sorted-merge path ([[AsofGrouped]]) handles this direction by
    * reversing its scan order the same way.
    */
  def joinAsofForward(t: Tables): DataFrame = {
    val s = t.events.filter(col("event_type") === "signup")
      .select(col("event_id"), col("user_id"), col("ts"))
    val p = t.events.filter(col("event_type") === "purchase")
      .select(
        col("event_id").as("p_event_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value").as("p_value"))
    val w = Window.partitionBy("event_id").orderBy(col("p_ts").asc, col("p_event_id").asc)
    s.join(p, col("user_id") === col("p_user") && col("ts") <= col("p_ts"))
      .select(
        col("event_id"), col("user_id"), col("p_ts"),
        dbl(dec(col("p_value"))).as("p_value"),
        row_number().over(w).as("rn"))
      .filter(col("rn") === 1)
      .select("event_id", "user_id", "p_ts", "p_value")
      .orderBy("event_id")
  }

  /** Nearest as-of: each purchase matched to the signup minimizing the
    * absolute event-time distance, either direction — completing the
    * as-of family (backward [[joinAsof]], forward [[joinAsofForward]],
    * nearest). Distance is exact integer µs (abs of unix_micros — no
    * float rounding at the tie boundary), ties break to the earlier
    * signup then id. Same user-keyed join + per-left-row top-1 shape;
    * the native scale path extends [[AsofGrouped]]'s sorted scan to
    * compare the two bracketing candidates.
    */
  def joinAsofNearest(t: Tables): DataFrame = {
    val p = t.events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val s = t.events.filter(col("event_type") === "signup")
      .select(
        col("event_id").as("s_event_id"), col("user_id").as("s_user"),
        col("ts").as("s_ts"), col("value").as("s_value"))
    val dist = abs(unix_micros(col("ts")) - unix_micros(col("s_ts")))
    val w = Window.partitionBy("event_id")
      .orderBy(dist.asc, col("s_ts").asc, col("s_event_id").asc)
    p.join(s, col("user_id") === col("s_user"))
      .select(
        col("event_id"), col("user_id"), col("s_ts"),
        dbl(dec(col("s_value"))).as("s_value"),
        row_number().over(w).as("rn"))
      .filter(col("rn") === 1)
      .select("event_id", "user_id", "s_ts", "s_value")
      .orderBy("event_id")
  }

  /** Interval join rewritten as a time-bucket equi-join — the range-join
    * scale pattern. With bucket width = range width (30 min), a purchase
    * in (click.ts, click.ts + 30 min] can only live in the click's bucket
    * or the next one, so each click joins on exactly two (user, bucket)
    * keys and the exact range predicate filters the residual. The join
    * key carries the time dimension → no per-user row explosion when a
    * user has events spread over a long horizon (the plain equi-key join
    * pairs every click with every purchase of that user first).
    * Registered with the same oracle as join_interval.
    */
  /** The single source of truth for the interval width — the bucketed
    * rewrite's 2-bucket candidate claim is only valid while bucket width
    * == range width, so both derive from this constant.
    */
  private val IntervalMinutes = 30L
  private val IntervalUs = IntervalMinutes * 60 * 1000 * 1000

  def joinIntervalBucketed(t: Tables): DataFrame = {
    val W = IntervalUs
    val a = t.events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("a_user"), col("ts").as("a_ts"))
      .withColumn("bucket",
        explode(array(expr(s"unix_micros(a_ts) div $W"), expr(s"unix_micros(a_ts) div $W + 1"))))
    val b = t.events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("b_user"), col("ts").as("b_ts"))
      .withColumn("b_bucket", expr(s"unix_micros(b_ts) div $W"))
    a.join(b, col("a_user") === col("b_user") && col("bucket") === col("b_bucket"))
      .filter(
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr(s"INTERVAL '$IntervalMinutes' MINUTE"))
      .select("click_id", "purchase_id")
      .orderBy("click_id", "purchase_id")
  }

  /** Interval join: purchases within (click.ts, click.ts + 30 min]. Equi
    * key + conjunctive range predicates → hash/SMJ join with residual, not
    * a nested loop.
    */
  def joinInterval(t: Tables): DataFrame = {
    val a = t.events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("a_user"), col("ts").as("a_ts"))
    val b = t.events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("b_user"), col("ts").as("b_ts"))
    a.join(b,
        col("a_user") === col("b_user") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL '30' MINUTE"))
      .select("click_id", "purchase_id")
      .orderBy("click_id", "purchase_id")
  }

  /** First-touch funnel: per user, earliest ts of each stage (one
    * partial+final agg — no window, no self-join), then ordered-stage
    * counts. NULL-safe by construction: a missing stage makes the `<`
    * comparison NULL and the row counts 0 for that depth. Single-row
    * audit output; shuffle volume is #users then 1.
    */
  def funnelConversion(t: Tables): DataFrame = {
    val stages = t.events
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "view", col("ts"))).as("t_view"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
    stages.select(
      count(lit(1)).as("users"),
      sum(when(col("t_click").isNotNull, 1).otherwise(0)).cast("long").as("clicked"),
      sum(when(col("t_click") < col("t_view"), 1).otherwise(0)).cast("long").as("click_then_view"),
      sum(when(col("t_click") < col("t_view") && col("t_view") < col("t_purchase"), 1)
        .otherwise(0)).cast("long").as("full_funnel"))
  }
}
