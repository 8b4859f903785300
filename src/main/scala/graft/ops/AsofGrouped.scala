package graft.ops

import java.sql.Timestamp

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Relational.{dbl, dec}

/** Linear-time as-of join (the 100 TB path for [[Temporal.joinAsof]]).
  *
  * The declared join+window rewrite is exact but materializes every
  * (purchase × earlier-signup) pair before keeping the latest — O(p·s)
  * per user. This form cogroups both sides on the key (one shuffle each),
  * sorts the right side once per group, and binary-searches each probe:
  * O(p·log s) per user, no intermediate pair blow-up. Same results
  * (AsofGroupedSpec proves row equality against the declared plan).
  *
  * Skew note: a single pathological key becomes a single group; at
  * cluster scale, pre-split hot keys by coarse time bucket (the split
  * bucket joins the same way) or use [[Skew.saltedJoin]]-style salting on
  * the range condition's time bucket.
  */
object AsofGrouped {

  /** Contract-shaped as-of via the native physical operator
    * ([[graft.plans.AsOfJoinExec]]): one sorted-merge pass, O(1) state per
    * partition — the plan a purpose-built engine would run.
    */
  def joinAsofNative(t: Tables): DataFrame = {
    val p = t.events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val s = t.events.filter(col("event_type") === "signup")
      .select(
        col("event_id").as("s_event_id"), col("user_id").as("s_user"),
        col("ts").as("s_ts"), col("value").as("s_value"))
    graft.plans.AsOf.asofJoin(p, s, "user_id", "s_user", "ts", "s_ts",
        rightTieBreak = Some("s_event_id"))
      .select(col("event_id"), col("user_id"), col("s_ts"), dbl(dec(col("s_value"))).as("s_value"))
      .orderBy("event_id")
  }

  /** Forward as-of ([[Temporal.joinAsofForward]]'s contract — first
    * purchase at-or-after each signup) on the native operator's forward
    * direction: same sorted merge, the lookahead row doubles as the match.
    */
  def joinAsofForwardNative(t: Tables): DataFrame = {
    val s = t.events.filter(col("event_type") === "signup")
      .select(col("event_id"), col("user_id"), col("ts"))
    val p = t.events.filter(col("event_type") === "purchase")
      .select(
        col("event_id").as("p_event_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value").as("p_value"))
    graft.plans.AsOf.asofJoin(s, p, "user_id", "p_user", "ts", "p_ts",
        rightTieBreak = Some("p_event_id"), direction = "forward")
      .select(col("event_id"), col("user_id"), col("p_ts"), dbl(dec(col("p_value"))).as("p_value"))
      .orderBy("event_id")
  }

  /** Nearest as-of ([[Temporal.joinAsofNearest]]'s contract — signup
    * minimizing exact |µs| distance, ties to earlier then smaller id) on
    * the native operator: the merge holds the two bracketing candidates
    * and picks per-probe — still one pass, O(1) state.
    */
  def joinAsofNearestNative(t: Tables): DataFrame = {
    val p = t.events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val s = t.events.filter(col("event_type") === "signup")
      .select(
        col("event_id").as("s_event_id"), col("user_id").as("s_user"),
        col("ts").as("s_ts"), col("value").as("s_value"))
    graft.plans.AsOf.asofJoin(p, s, "user_id", "s_user", "ts", "s_ts",
        rightTieBreak = Some("s_event_id"), direction = "nearest")
      .select(col("event_id"), col("user_id"), col("s_ts"), dbl(dec(col("s_value"))).as("s_value"))
      .orderBy("event_id")
  }

  case class Probe(event_id: Long, user_id: Long, ts: Timestamp)
  case class Quote(user_id: Long, s_event_id: Long, s_ts: Timestamp, s_value: Double)
  case class Matched(event_id: Long, user_id: Long, s_ts: Timestamp, s_value: Double)

  def joinAsofGrouped(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val p = t.events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts")).as[Probe]
    val s = t.events.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("s_event_id"),
        col("ts").as("s_ts"), col("value").as("s_value")).as[Quote]

    // Timestamp.getTime is millis-only — the data carries microseconds and
    // the declared/oracle semantics compare at full precision, so all
    // ordering/search runs on µs (a sub-millisecond future signup must NOT
    // match).
    def micros(t: Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

    // Sort ascending by (ts, event_id): the rightmost quote with ts ≤ probe
    // is then the max-event_id one among equal timestamps — the §2.4
    // deterministic tie-break, same pick as the rewrite's window.
    val matched = p.groupByKey(_.user_id).cogroup(s.groupByKey(_.user_id)) {
      (_, probes, quotes) =>
        val qs = quotes.toArray.sortBy(q => (micros(q.s_ts), q.s_event_id))
        if (qs.isEmpty) Iterator.empty
        else {
          val times = qs.map(q => micros(q.s_ts))
          probes.flatMap { pr =>
            // rightmost quote with s_ts <= probe ts
            var lo = 0; var hi = times.length // invariant: times(lo-1) <= t < times(hi)
            val target = micros(pr.ts)
            while (lo < hi) {
              val mid = (lo + hi) >>> 1
              if (times(mid) <= target) lo = mid + 1 else hi = mid
            }
            if (lo == 0) None
            else {
              val q = qs(lo - 1)
              Some(Matched(pr.event_id, pr.user_id, q.s_ts, q.s_value))
            }
          }
        }
    }

    matched.toDF()
      .select(col("event_id"), col("user_id"), col("s_ts"), dbl(dec(col("s_value"))).as("s_value"))
      .orderBy("event_id")
  }
}
