package graft.ops

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Relational.dec

/** Pareto frontier (skyline) per order-priority class: the orders no
  * other same-priority order beats on BOTH price and recency — "best
  * trade-off" queries (maximize `o_totalprice`, maximize `o_orderdate`).
  * A point is dominated iff some point is ≥ on both dimensions and
  * strictly greater on at least one; duplicates of a frontier point all
  * survive (neither strictly dominates the other).
  *
  * The naive formulation is the quadratic NOT EXISTS self-join — which is
  * exactly what the DuckDB oracle states, so the oracle independently
  * checks this plan's two non-obvious moves:
  *
  * 1. **Sort, don't pair.** Within a sort by price, dominance collapses
  *    to two window frames over ONE sorted pass: a point is dominated iff
  *    the max date among STRICTLY-higher-price rows is ≥ its own
  *    (`rangeBetween(1, ∞)` over integral cents) or the max date among
  *    SAME-price rows is strictly greater (`rangeBetween(0, 0)` — the tie
  *    group). O(n log n) per group instead of O(n²) pairs.
  * 2. **Local frontiers first.** Phase 1 computes the same frontier
  *    within (priority, hash-bucket of the key): embarrassingly parallel,
  *    no data-sized partition anywhere. Local filtering is LOSSLESS for
  *    the global skyline — if q dominates p, then q's own bucket-frontier
  *    survivor chain ends at an undominated q' that (dominance is
  *    transitive and strict, so chains terminate) still dominates p.
  *    Phase 2 re-runs the frontier per priority over the survivors only —
  *    at 100 TB the phase-2 input is the union of tiny per-bucket
  *    frontiers, not the table. This is the standard distributed-skyline
  *    shape (local skyline → merge), and SkylineSpec pins two-phase ≡
  *    single-pass ≡ brute force.
  *
  * Prices ride as integral cents (exact for DECIMAL(18,2); also what lets
  * `rangeBetween(1, …)` mean "strictly greater"), dates as epoch micros.
  */
object Skyline {

  /** One frontier pass: drop every row dominated within its
    * `partCols`-group. Expects `cents` (sort dimension) and `dl` (the
    * other dimension, larger = better) columns. `private[graft]` so
    * SkylineSpec exercises the REAL pass on synthetic tie/duplicate
    * cases instead of a copy that could drift.
    */
  private[graft] def frontier(df: DataFrame, partCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(col("cents"))
    val maxdGt = max(col("dl")).over(w.rangeBetween(1, Window.unboundedFollowing))
    val maxdEq = max(col("dl")).over(w.rangeBetween(Window.currentRow, Window.currentRow))
    df.withColumn("maxd_gt", maxdGt)
      .withColumn("maxd_eq", maxdEq)
      .filter(!(coalesce(col("maxd_gt") >= col("dl"), lit(false)) ||
        col("maxd_eq") > col("dl")))
      .drop("maxd_gt", "maxd_eq")
  }

  def skylinePareto(t: Tables): DataFrame = {
    val base = t.orders
      .filter(col("o_totalprice").isNotNull && col("o_orderdate").isNotNull)
      .select(
        col("o_orderpriority"), col("o_orderkey"),
        (dec(col("o_totalprice")) * 100).cast("long").as("cents"),
        col("o_orderdate"),
        // the non-sort dimension only needs ORDER comparisons (max, >=),
        // which timestamps support directly — no epoch conversion, and it
        // works for TIMESTAMP and TIMESTAMP_NTZ alike
        col("o_orderdate").as("dl"))
    val local = frontier(
      base.withColumn("bucket", pmod(hash(col("o_orderkey")), lit(32))),
      Seq("o_orderpriority", "bucket")).drop("bucket")
    frontier(local, Seq("o_orderpriority"))
      .select(
        col("o_orderpriority"), col("o_orderkey"),
        (col("cents") / lit(100.0)).as("price"),
        col("o_orderdate"))
      .orderBy(asc("o_orderpriority"), desc("price"), asc("o_orderkey"))
  }
}
