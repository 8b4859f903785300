package graft.ops

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distinct-audience analytics over the event stream: EXACT mergeable
  * distinct counts via roaring-style bitmap pre-aggregation, and pairwise
  * audience-overlap (intersection / Jaccard) between event segments.
  *
  * Why bitmaps and not HLL: [[graft.ops.Dedup]]'s HLL surface
  * (`agg_hll_mergeable`) answers the same rollup question approximately
  * with O(kB) state per group; the bitmap answer here is EXACT and still
  * mergeable (bitmap OR is the union), at the cost of state proportional
  * to the id-space density. For bounded integer id spaces (user ids,
  * account ids — the common audience case) this is the production shape:
  * per-day per-bucket bitmaps persist as a tiny pre-aggregate, and every
  * later rollup (weekly/monthly/all-time actives) is a bitmap OR over the
  * pre-aggregate, never a rescan of raw events. Both are DuckDB-oracled
  * against plain COUNT(DISTINCT ...) — the bitmap path must be
  * value-identical, not approximately right.
  *
  * Scale shape: the pre-aggregate shuffles (day, bucket) keys with
  * partial `bitmap_construct_agg` running map-side, so the shuffle volume
  * is #days × #occupied-buckets × 4 KiB regardless of row count; the
  * all-time rollup shuffles only the pre-aggregate. Nothing here ever
  * carries raw user ids past the first partial aggregate.
  */
object Audience {

  /** Exact distinct users per day PLUS the exact all-days rollup, both
    * computed from ONE shared per-(day, bucket) bitmap pre-aggregate:
    *
    *   - `bitmap_bit_position(user_id)` / `bitmap_bucket_number(user_id)`
    *     split the id space into 32768-bit buckets;
    *   - per (day, bucket): `bitmap_construct_agg` — the stored sketch;
    *   - per day: buckets partition the id space, so daily distinct =
    *     Σ_bucket `bitmap_count` (pure addition, no re-scan);
    *   - all days: per-bucket `bitmap_or_agg` across days (set union),
    *     then the same Σ `bitmap_count`.
    *
    * The day key is emitted as its ISO string so the 'ALL' rollup row can
    * share the column (both engines render DATE→VARCHAR as yyyy-MM-dd).
    */
  def aggBitmapDistinct(t: Tables): DataFrame = {
    val prep = t.events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(
        col("ts").cast(DateType).cast(StringType).as("day"),
        expr("bitmap_bucket_number(user_id)").as("bucket"),
        expr("bitmap_bit_position(user_id)").as("pos"))
    // The stored pre-aggregate: one bitmap per (day, bucket).
    val perDayBucket = prep
      .groupBy("day", "bucket")
      .agg(expr("bitmap_construct_agg(pos)").as("bm"))
    val perDay = perDayBucket
      .groupBy("day")
      .agg(sum(expr("bitmap_count(bm)")).cast(LongType).as("n_users"))
    val allDays = perDayBucket
      .groupBy("bucket")
      .agg(expr("bitmap_or_agg(bm)").as("bm"))
      .agg(sum(expr("bitmap_count(bm)")).cast(LongType).as("n_users"))
      .select(lit("ALL").as("day"), col("n_users"))
    perDay.unionAll(allDays).orderBy("day")
  }

  /** Every calendar grain from ONE bitmap pre-aggregate: the per-(day,
    * bucket) sketch table is built once from the raw events, then each
    * grain (day / ISO-Monday week / month / all-time) is an OR-merge of
    * the SKETCH rows — the raw events are scanned exactly once no matter
    * how many rollup grains ship, which is the whole point of mergeable
    * pre-aggregation at 100 TB (contrast: a COUNT DISTINCT per grain is
    * one full rescan each). The grain fan-out explodes over the
    * day×bucket sketch table (≤ days × buckets rows), never the events.
    */
  def aggBitmapRollup(t: Tables): DataFrame = {
    val perDayBucket = t.events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(
        col("ts").cast(DateType).as("day"),
        expr("bitmap_bucket_number(user_id)").as("bucket"),
        expr("bitmap_bit_position(user_id)").as("pos"))
      .groupBy("day", "bucket")
      .agg(expr("bitmap_construct_agg(pos)").as("bm"))
    perDayBucket
      .select(col("bucket"), col("bm"), explode(array(
        struct(lit("1_day").as("grain"),
          col("day").cast(StringType).as("period")),
        struct(lit("2_week").as("grain"),
          date_trunc("week", col("day")).cast(DateType).cast(StringType).as("period")),
        struct(lit("3_month").as("grain"),
          date_trunc("month", col("day")).cast(DateType).cast(StringType).as("period")),
        struct(lit("4_total").as("grain"), lit("ALL").as("period"))))
        .as("g"))
      .groupBy(col("g.grain").as("grain"), col("g.period").as("period"), col("bucket"))
      .agg(expr("bitmap_or_agg(bm)").as("bm"))
      .groupBy("grain", "period")
      .agg(sum(expr("bitmap_count(bm)")).cast(LongType).as("n_users"))
      .orderBy("grain", "period")
  }

  /** The [[graft.plans.BitmapDistinctRewrite]] optimizer rule driven
    * through the correctness gate: a plain per-day
    * `COUNT(DISTINCT user_id)` aggregate is analyzed, the rule is
    * applied to its logical plan (exactly what the injected extension
    * does for every query in an extensions session), and the REWRITTEN
    * plan executes. The DuckDB oracle states the plain count-distinct —
    * the transparent rewrite must be value-identical, including the
    * null-user rows the filter keeps out of the count but not out of
    * the groups.
    */
  def aggCountDistinctRewrite(t: Tables): DataFrame = {
    val base = t.events
      .filter(col("ts").isNotNull)
      .groupBy(col("ts").cast(DateType).as("day"))
      .agg(count_distinct(col("user_id")).as("n_users"))
      .orderBy("day")
    org.apache.spark.sql.GraftPlanBridge.ofRows(
      t.spark, graft.plans.BitmapDistinctRewrite(base.queryExecution.analyzed))
  }

  /** Pairwise audience overlap between event-type segments: for every
    * unordered pair (a < b) of event types, the EXACT number of users
    * seen in both, plus the Jaccard overlap |A∩B| / |A∪B|.
    *
    * Shape: one distinct over (user, type) — the only pass that touches
    * raw events — then a self-join keyed on user whose output is bounded
    * by Σ_user |types(u)|², i.e. vocabulary-squared per user, never
    * rows-squared. The per-type margins are a vocabulary-sized table and
    * broadcast onto the pair counts. This is the co-occurrence matrix
    * every segment-overlap / cross-sell dashboard runs at 100 TB, and the
    * same plan holds: shuffle keys are user ids once, then type pairs.
    */
  def segmentOverlap(t: Tables): DataFrame = {
    val ut = t.events
      .filter(col("user_id").isNotNull && col("event_type").isNotNull)
      .select(col("user_id"), col("event_type")).distinct()
    val margins = ut.groupBy(col("event_type"))
      .agg(count(lit(1)).cast(LongType).as("n"))
    val pairs = ut.as("a")
      .join(ut.as("b"), Seq("user_id"))
      .filter(col("a.event_type") < col("b.event_type"))
      .groupBy(
        col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).cast(LongType).as("n_both"))
    pairs
      .join(broadcast(margins.withColumnRenamed("event_type", "type_a")
        .withColumnRenamed("n", "n_a")), Seq("type_a"))
      .join(broadcast(margins.withColumnRenamed("event_type", "type_b")
        .withColumnRenamed("n", "n_b")), Seq("type_b"))
      .select(
        col("type_a"), col("type_b"), col("n_a"), col("n_b"), col("n_both"),
        round(col("n_both").cast(DoubleType) /
          (col("n_a") + col("n_b") - col("n_both")), 6).as("jaccard"))
      .orderBy("type_a", "type_b")
  }
}
