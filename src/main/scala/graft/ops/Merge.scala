package graft.ops

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Relational.dbl

/** Batch MERGE / dimension-maintenance operators — the CDC shapes every
  * warehouse engine ships (`MERGE INTO` upsert; slowly-changing-dimension
  * type 2 versioning). Both are pure joins + conditional projection here:
  * a full outer join on the key IS the merge, and Catalyst plans it as one
  * key shuffle (dims broadcast when small) — the same plan at 100 TB,
  * with no driver-side row handling anywhere.
  */
object Merge {

  /** MERGE-INTO upsert semantics over the customer dimension: the update
    * feed is each ordering customer's exact order-total sum (decimal
    * cents), applied as the new account balance; customers without orders
    * keep their current balance ("when not matched by source" carry), and
    * update keys absent from the dim would insert (exercised by the outer
    * side staying FULL, though this feed is FK-closed by construction —
    * fk_check audits that). One key shuffle; the conditional projection is
    * the merge.
    */
  def mergeUpsert(t: Tables): DataFrame = {
    val updates = t.orders
      .groupBy(col("o_custkey").as("u_key"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("u_bal"))
    t.customer
      .select(col("c_custkey"), col("c_name"),
        col("c_acctbal").cast(DecimalType(18, 2)).as("c_bal"))
      .join(updates, col("c_custkey") === col("u_key"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("u_key")).as("custkey"),
        col("c_name").as("name"),
        dbl(coalesce(col("u_bal"), col("c_bal"))).as("acctbal"),
        when(col("c_custkey").isNull, lit("insert"))
          .when(col("u_key").isNull, lit("carry"))
          .otherwise(lit("update")).as("action"))
      .orderBy("custkey")
  }

  /** Slowly-changing-dimension TYPE 2 over the customer segment: the
    * incoming snapshot reassigns every customer with a negative balance to
    * the 'DELINQUENT' segment (a deterministic attribute-change feed).
    * Change detection is the same single key join; changed keys emit BOTH
    * the closed old version (version 1, is_current = false) and the opened
    * new one (version 2, is_current = true), unchanged keys emit their
    * version-1 row still current. The two-row emission is a map-side
    * explode over the join output — shuffle count stays one.
    */
  def mergeScd2(t: Tables): DataFrame = {
    val snapshot = t.customer.select(
      col("c_custkey").as("s_key"),
      when(col("c_acctbal") < 0, lit("DELINQUENT"))
        .otherwise(col("c_mktsegment")).as("s_seg"))
    t.customer
      .select(col("c_custkey"), col("c_mktsegment"))
      .join(snapshot, col("c_custkey") === col("s_key"))
      .select(col("c_custkey"), col("c_mktsegment"), col("s_seg"),
        (col("s_seg") =!= col("c_mktsegment")).as("changed"))
      .select(col("c_custkey"), explode(when(col("changed"),
          array(
            struct(col("c_mktsegment").as("segment"), lit(1).as("version"), lit(false).as("is_current")),
            struct(col("s_seg").as("segment"), lit(2).as("version"), lit(true).as("is_current"))))
        .otherwise(array(
          struct(col("c_mktsegment").as("segment"), lit(1).as("version"), lit(true).as("is_current")))))
        .as("r"))
      .select(col("c_custkey"), col("r.segment").as("segment"),
        col("r.version").as("version"), col("r.is_current").as("is_current"))
      .orderBy("c_custkey", "version")
  }

  /** Point-in-time dimensional read over a versioned history — the query
    * side of SCD2 ([[mergeScd2]] builds versions; this READS them as-of
    * a date): for each of three probe dates, every customer's then-
    * current order priority (their latest order at or before the probe)
    * plus the version count to that point. The PIT read is what every
    * "report as of last quarter-end" warehouse query runs; restated as
    * one aggregate per (probe, customer) with a total-order max_by
    * struct — (date, orderkey) breaks same-day ties identically on both
    * engines — instead of a per-probe window pass. Probes broadcast onto
    * the fact; one shuffle keyed (probe, customer).
    */
  def scd2PointInTime(t: Tables): DataFrame = {
    val probes = t.spark.range(1).select(explode(array(
      lit("1995-06-30"), lit("1996-12-31"), lit("1998-03-31"))).as("probe"))
      .select(col("probe").cast(DateType).as("probe_date"))
    t.orders
      .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull)
      .select(col("o_custkey").as("custkey"),
        col("o_orderdate").cast(DateType).as("odate"),
        col("o_orderkey"), col("o_orderpriority"))
      .join(broadcast(probes), col("odate") <= col("probe_date"))
      .groupBy("probe_date", "custkey")
      .agg(
        count(lit(1)).cast(LongType).as("n_versions"),
        max(struct(col("odate"), col("o_orderkey"), col("o_orderpriority")))
          .getField("o_orderpriority").as("priority"))
      .orderBy("probe_date", "custkey")
  }

  /** Snapshot DIFF — the inverse of [[mergeUpsert]]: given two generations
    * of a keyed table, DERIVE the change feed (insert / update / delete
    * rows) that turns v1 into v2. This is how a pipeline without upstream
    * CDC manufactures one (nightly snapshot diffing), and at 100 TB it is
    * a single co-partitioned full outer join on the key — with both
    * generations written bucketed on the key (join_bucketed's layout), it
    * runs with no Exchange at all. Unchanged rows are dropped INSIDE the
    * join's projection, so the emitted feed is proportional to the churn,
    * not the table.
    *
    * v2 is derived deterministically from orders (drop every 11th key,
    * bump price on every 7th, re-key every 13th as inserts) and the
    * oracle constructs the identical v2 — so the check exercises all
    * three change paths non-vacuously. Comparisons are null-safe
    * (`<=>`): a NULL attribute is a value, not a wildcard.
    */
  def snapshotDiff(t: Tables): DataFrame = {
    val v1 = t.orders.select(
      col("o_orderkey").as("k"),
      (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"),
      col("o_orderstatus").as("st"))
    val v2 = v1.filter(col("k") % 11 =!= 0)
      .withColumn("cents",
        when(col("k") % 7 === 0, col("cents") + 500L).otherwise(col("cents")))
      // insert keys offset by 10^12 — beyond any SF's orderkey range
      // (6M × SF), so derived keys can never collide with real ones
      .unionAll(v1.filter(col("k") % 13 === 0)
        .select((col("k") + 1000000000000L).as("k"), col("cents"), col("st")))
    val o = v1.select(col("k"), col("cents").as("old_cents"), col("st").as("old_st"))
    val n = v2.select(col("k"), col("cents").as("new_cents"), col("st").as("new_st"))
    o.withColumn("in_old", lit(true))
      .join(n.withColumn("in_new", lit(true)), Seq("k"), "full_outer")
      .withColumn("change",
        when(col("in_old").isNull, "insert")
          .when(col("in_new").isNull, "delete")
          .when(col("old_cents") <=> col("new_cents") &&
            col("old_st") <=> col("new_st"), "none")
          .otherwise("update"))
      .filter(col("change") =!= "none")
      .select(col("k"), col("change"), col("old_cents"), col("new_cents"))
      .orderBy("change", "k")
  }
}
