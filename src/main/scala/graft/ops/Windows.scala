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

  /** RANGE frame over a DECIMAL(18,2) ordering. The Scala `rangeBetween`
    * API only takes Long offsets, so we order by the exactly-equivalent
    * scaled-long key (`decimal(18,2) × 100`): same total order, same peer
    * groups, and `1000.00 PRECEDING` becomes `100000` scaled units.
    */
  def winRangeFrame(t: Tables): DataFrame = {
    val scaled = (dec(col("o_totalprice")) * 100).cast(LongType)
    val w = Window.orderBy(scaled).rangeBetween(-100000L, Window.currentRow)
    t.orders
      .select(col("o_orderkey"), count(lit(1)).over(w).as("near_cnt"))
      .orderBy("o_orderkey")
      .limit(2000)
  }

  def winNtileCume(t: Tables): DataFrame = {
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
