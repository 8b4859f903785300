package graft.ops

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Relational.{dbl, dec}

/** Window-function operators (SURVEY.md §2.2). Each WindowExec runs
  * per-partition after a shuffle on the PARTITION BY keys — embarrassingly
  * parallel at scale as long as no single key's partition outgrows an
  * executor (the global-ORDER-BY windows in ntile/range are the only
  * single-partition shapes, and they're bounded probe queries).
  * Deterministic tie-breaks (trailing unique key in every ORDER BY) keep
  * results hash-stable across engines (§2.4).
  */
object Windows {

  def winRowNumber(t: Tables): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(dec(col("c_acctbal")).desc, col("c_custkey").asc)
    t.customer
      .select(col("c_custkey"), col("c_mktsegment"), row_number().over(w).as("rn"))
      .filter(col("rn") <= 10)
      .orderBy("c_mktsegment", "rn")
  }

  def winRankDense(t: Tables): DataFrame = {
    val w = Window.partitionBy("p_brand").orderBy("p_size")
    t.part
      .select(
        col("p_brand"), col("p_size"),
        rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"))
      .orderBy("p_brand", "p_size", "rk")
      .limit(1000)
  }

  def winLagLead(t: Tables): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t.events
      .select(
        col("user_id"), col("event_id"),
        lag(col("event_id"), 1).over(w).as("prev_id"),
        lead(col("event_id"), 1).over(w).as("next_id"))
      .orderBy("user_id", "event_id")
      .limit(3000)
  }

  def winRunningSum(t: Tables): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.orders
      .select(
        col("o_custkey"), col("o_orderkey"),
        dbl(sum(dec(col("o_totalprice"))).over(w).cast(DecimalType(38, 2))).as("run"))
      .orderBy("o_custkey", "o_orderkey")
      .limit(3000)
  }

  /** Moving average as windowed SUM/COUNT (§2.4: no built-in AVG). */
  def winSlidingAvg(t: Tables): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(-2, Window.currentRow)
    t.orders
      .select(
        col("o_custkey"), col("o_orderkey"),
        round(sum(dec(col("o_totalprice"))).over(w).cast(DoubleType)
          / count(lit(1)).over(w), 4).as("mavg"))
      .orderBy("o_custkey", "o_orderkey")
      .limit(3000)
  }

  /** RANGE frame over a DECIMAL(18,2) ordering — near_cnt = how many
    * orders have a total within 1000.00 below this one's.
    *
    * The naive plan (`Window.orderBy(scaled).rangeBetween(-100000, 0)`,
    * kept as [[winRangeFrameGlobal]]) moves the WHOLE table into one
    * WindowExec partition — a single-executor sort at scale. A value-range
    * frame is really a self-join by value: bucket the scaled key by the
    * frame width W, probe buckets b-1 and b (a right row's single bucket
    * can match at most one probe — no double counting), keep |v - v2| in
    * range, count per row. Everything is an equi-join + partial/final agg
    * on unique keys: parallel at any scale, and WindowScaleSpec proves
    * row-for-row equality with the built-in frame.
    *
    * (The Scala `rangeBetween` only takes Long offsets, hence the exactly-
    * equivalent scaled-long key `decimal(18,2) × 100`: same total order,
    * same peer groups, 1000.00 PRECEDING = 100000 scaled units.)
    */
  def winRangeFrame(t: Tables): DataFrame = {
    val W = 100000L
    val v = t.orders.select(
      col("o_orderkey"),
      (dec(col("o_totalprice")) * 100).cast(LongType).as("s"))
    val bucket = (col("s") / W).cast(LongType) // s >= 0: truncation = floor
    val probes = v.select(col("o_orderkey"), col("s"),
      explode(array(bucket - 1, bucket)).as("b"))
    val build = v.select((col("s") / W).cast(LongType).as("b"), col("s").as("s2"))
    probes.join(build, "b")
      .filter(col("s2") >= col("s") - W && col("s2") <= col("s"))
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("near_cnt"))
      .orderBy("o_orderkey")
      .limit(2000)
  }

  /** The built-in global-window form — reference semantics for
    * WindowScaleSpec; NOT registered (single-partition WindowExec).
    */
  def winRangeFrameGlobal(t: Tables): DataFrame = {
    val scaled = (dec(col("o_totalprice")) * 100).cast(LongType)
    val w = Window.orderBy(scaled).rangeBetween(-100000L, Window.currentRow)
    t.orders
      .select(col("o_orderkey"), count(lit(1)).over(w).as("near_cnt"))
      .orderBy("o_orderkey")
      .limit(2000)
  }

  /** Global ntile/cume_dist/percent_rank WITHOUT a global window: the
    * two-pass range-partitioned rank. Pass 1 range-shuffles on the (unique)
    * order key and ranks within each partition; pass 2 turns per-partition
    * counts (one row per partition — tiny) into cumulative offsets and
    * broadcasts them back, so global rank = offset + local rank. ntile /
    * cume_dist / percent_rank are then pure arithmetic on (rank, n). Any
    * contiguous range partitioning yields the same ranks, so the result
    * does not depend on sampled boundaries. Requires a unique order key
    * (c_custkey here) — with duplicate keys cume_dist peers could split
    * across partition boundaries.
    *
    * The single-partition built-in form is kept as [[winNtileCumeGlobal]]
    * for the differential test; this is what's registered.
    */
  def winNtileCume(t: Tables): DataFrame = {
    val parts = 32
    val keyed = t.customer.select(col("c_custkey"))
      .repartitionByRange(parts, col("c_custkey"))
      .withColumn("pid", spark_partition_id())
    val wLocal = Window.partitionBy("pid").orderBy("c_custkey")
    val local = keyed.withColumn("lrn", row_number().over(wLocal))
    // ≤ `parts` rows: the global window over them is a 32-row sort, and
    // the cross-joined total is a 1-row broadcast — driver-scale state.
    val wOff = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy("pid").agg(count(lit(1)).as("cnt"))
      .select(col("pid"), coalesce(sum("cnt").over(wOff), lit(0L)).as("off"))
    val total = local.groupBy().agg(count(lit(1)).as("n"))
    val rk = (col("off") + col("lrn")).as("rk")
    val ranked = local.join(broadcast(offsets), "pid")
      .crossJoin(broadcast(total))
      .select(col("c_custkey"), rk, col("n"))
    // NTILE(4): first (n mod 4) buckets get ceil(n/4) rows, the rest floor.
    // `/` on Columns is double division — floor() recovers integral div
    // (exact for counts < 2^53).
    val qL = floor(col("n") / 4)
    val r = col("n") % 4
    val thresh = (qL + 1) * r
    val quart = when(col("n") < 4, col("rk"))
      .when(col("rk") <= thresh, floor((col("rk") - 1) / (qL + 1)) + 1)
      .otherwise(r + floor((col("rk") - 1 - thresh) / qL) + 1)
    ranked
      .select(
        col("c_custkey"),
        quart.cast(IntegerType).as("quart"),
        // unique order key ⇒ no peers ⇒ cume_dist = rk/n exactly
        round(col("rk").cast(DoubleType) / col("n"), 6).as("cd"),
        round(when(col("n") === 1, lit(0.0))
          .otherwise((col("rk") - 1).cast(DoubleType) / (col("n") - 1)), 6).as("pr"))
      .orderBy("c_custkey")
      .limit(1000)
  }

  /** The built-in global-window form — reference semantics for
    * WindowScaleSpec; NOT registered (single-partition WindowExec).
    */
  def winNtileCumeGlobal(t: Tables): DataFrame = {
    val w = Window.orderBy("c_custkey")
    t.customer
      .select(
        col("c_custkey"),
        ntile(4).over(w).as("quart"),
        round(cume_dist().over(w), 6).as("cd"),
        round(percent_rank().over(w), 6).as("pr"))
      .orderBy("c_custkey")
      .limit(1000)
  }

  /** last_value needs the explicit full frame — the default frame
    * (unbounded-preceding..current-row) would silently yield running-last.
    */
  def winFirstLast(t: Tables): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t.events
      .select(
        col("user_id"), col("event_id"),
        first(col("event_type")).over(w).as("first_ev"),
        last(col("event_type")).over(wFull).as("last_ev"))
      .orderBy("user_id", "event_id")
      .limit(3000)
  }

  /** nth_value over the full frame: each row sees its customer's
    * second-ever order price (NULL for single-order customers).
    */
  def winNthValue(t: Tables): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t.orders
      .select(
        col("o_custkey"), col("o_orderkey"),
        dbl(nth_value(dec(col("o_totalprice")), 2).over(w)).as("second_price"))
      .orderBy("o_custkey", "o_orderkey")
      .limit(3000)
  }

  /** Top-3 per group via row_number — the basis `latest` stream operator
    * generalized; one shuffle on the group key, no global sort.
    */
  def topkPerGroup(t: Tables): DataFrame = {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(dec(col("c_acctbal")).desc, col("c_custkey").asc)
    t.customer
      .select(
        col("c_nationkey"), col("c_custkey"),
        dbl(dec(col("c_acctbal"))).as("bal"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .select("c_nationkey", "c_custkey", "bal")
      .orderBy(asc("c_nationkey"), desc("bal"), asc("c_custkey"))
  }
}
