package graft.ops

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Point-in-time feature retrieval — the feature-store join that makes
  * training data leakage-free: for each (entity, as-of date) probe, the
  * aggregate of that entity's fact history STRICTLY up to the probe date
  * (here: order count and lifetime spend per customer). A feature row
  * computed with any later fact is label leakage; a missing entity must
  * surface as an explicit zero, not a dropped row.
  *
  * The naive formulation is a per-probe range join (probe × all earlier
  * facts — quadratic in history) or a correlated subquery per probe (the
  * DuckDB oracle states exactly that, which is why it is the oracle and
  * not the plan). The scale formulation is the UNION-TAG sweep: facts
  * and probes union into one stream, ONE shuffle on the entity key, and
  * a single chronological window pass computes running (count, sum) that
  * each probe row reads off at its position in the order — O(n log n)
  * per entity, history scanned once for ALL probe dates at once. Probe
  * rows sort AFTER fact rows on the same date (tag ascending), giving
  * the inclusive `fact_date <= probe_date` convention exactly.
  */
object FeatureStore {

  /** As-of probe dates a training-set builder would use. */
  val ProbeDates = Seq("1996-01-01", "1998-07-01", "2000-01-01")

  private val ProbeMod = 13 // entity subset: c_custkey % 13 == 0

  /** (customer, as-of date) → orders-so-far and spend-so-far (cents). */
  def featurePitJoin(t: Tables): DataFrame = {
    val facts = t.orders
      // only probe entities can emit rows, so their history is the only
      // history the sweep needs — the filter cuts the shuffled/windowed
      // volume by the probe fraction and is result-identical (each
      // entity's window reads nothing from other entities)
      .filter(col("o_custkey") % ProbeMod === 0)
      .select(col("o_custkey").as("c_custkey"),
        to_date(col("o_orderdate")).as("d"),
        round(col("o_totalprice") * 100).cast(LongType).as("cents"),
        lit(0).as("tag"))
    val probeDates = ProbeDates.map(d => lit(d).cast(DateType))
    val probes = t.customer
      .filter(col("c_custkey") % ProbeMod === 0)
      .select(col("c_custkey"), explode(array(probeDates: _*)).as("d"),
        lit(0L).as("cents"), lit(1).as("tag"))
    val w = Window.partitionBy("c_custkey")
      .orderBy(col("d"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    facts.unionByName(probes)
      .withColumn("n_orders", sum(lit(1) - col("tag")).over(w).cast(LongType))
      .withColumn("spend_cents", sum(col("cents")).over(w))
      .filter(col("tag") === 1)
      .select(col("c_custkey"), col("d").as("asof_date"),
        col("n_orders"), col("spend_cents"))
      .orderBy("c_custkey", "asof_date")
  }
}
