package graft.ops

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Item-item co-occurrence recommendation mining — the "customers who
  * bought X also bought Y" primitive behind every collaborative-filter
  * candidate generator. Unlike [[Assoc]] (≤64 brands, single-long bitmask)
  * this runs at ITEM granularity where the vocabulary is unbounded, so the
  * plan is built around the only safe invariant at 100 TB: basket WIDTH is
  * bounded (an order touches a handful of items) even when item count and
  * order count are not.
  *
  * Plan shape (the basket subtree executes once; the only second touch
  * of the fact is a column-pruned count-distinct for the order total):
  *
  *   1. distinct (order, item) → sorted per-order item array: ONE shuffle
  *      on the order key; the aggregate buffer is basket-width bounded.
  *   2. directed pair emission IN-ROW (`transform` × `filter` over the
  *      array) restricted to probe items on the antecedent side — the
  *      probe predicate lands before the pair stream exists, so emission
  *      is Σ_order |probe∩basket|·(|basket|−1), never rows².
  *   3. pair aggregate: ONE shuffle keyed (item_a, item_b) carrying counts
  *      only (map-side partial counts make the shuffle rows ≤ distinct
  *      pair count per partition). Margin rows ((a, −1) and (−1, b)
  *      per basket member) ride the SAME emission stream and aggregate —
  *      the Assoc.basketAssoc discipline — so the fact subtree executes
  *      once, not once per derived frame.
  *   4. margins attach as two item-keyed windows over the aggregate
  *      output (pair-table-sized, never fact-sized); the rank window
  *      below reuses the n_a window's partitioning.
  *
  * Ordering is deterministic across engines: lift is ONE IEEE division of
  * two exactly-representable BIGINT products (both ≪ 2^53), so Spark and
  * DuckDB compute bit-identical doubles; ties break on the candidate id.
  */
object Rec {

  private val ProbeMod = 7 // probe antecedent subset: p_partkey % 7 == 0
  private val MinCo = 3 // minimum co-order count for a recommendation
  private val TopN = 3 // recommendations kept per probe item

  /** Top-3 "also bought" items per probe part, scored by lift over the
    * order-basket co-occurrence matrix.
    */
  def recItemCooccur(t: Tables): DataFrame = {
    // per-order sorted item array — ONE shuffle on the order key, buffer
    // bounded by basket width
    val basketArr = t.lineitem
      .select(col("l_orderkey"), col("l_partkey"))
      .distinct()
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("items"))
    // Pairs and BOTH margin orientations come out of ONE emission stream
    // over the baskets (the Assoc.basketAssoc discipline — deriving them
    // as separate frames re-executed the 600k-row distinct+aggregate
    // subtree per frame): directed probe pairs plus (item, −1) and
    // (−1, item) margin rows per basket member. The probe filter lands
    // INSIDE the pair emission, so non-probe antecedents never produce
    // pair rows.
    val counted = basketArr
      .select(explode(expr(
        s"""concat(
           |  flatten(transform(
           |    filter(items, a -> a % $ProbeMod = 0),
           |    a -> transform(filter(items, b -> b != a),
           |                   b -> named_struct('item_a', a, 'item_b', b)))),
           |  transform(items, a -> named_struct('item_a', a, 'item_b', CAST(-1 AS BIGINT))),
           |  transform(items, a -> named_struct('item_a', CAST(-1 AS BIGINT), 'item_b', a)),
           |  array(named_struct('item_a', CAST(-1 AS BIGINT), 'item_b', CAST(-1 AS BIGINT))))"""
          .stripMargin)).as("p"))
      .select(col("p.item_a").as("item_a"), col("p.item_b").as("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).cast(LongType).as("n_ab"))
    // margins ride the SAME aggregate as windows over its item keys (the
    // (a, −1) / (−1, b) rows), so `counted` — and the fact subtree under
    // it — executes exactly once. The order total rides the same stream
    // too, as one (−1, −1) row per basket: its count IS the distinct
    // order count (every basket is one distinct l_orderkey), and pulling
    // it out below re-uses `counted`'s pair Exchange (ReusedExchange)
    // instead of re-scanning the fact for a count-distinct — the r16
    // probe timed that separate scan at ~0.3 s of pure duplication.
    // Window ORDER is n_b FIRST, then n_a: the LAST window's
    // hashpartitioning(item_a) is then exactly what the rank window
    // below requires, so the pair table crosses one Exchange fewer (the
    // r16 plan audit caught n_a→n_b ordering forcing a third pair-table
    // exchange for the rank).
    val wA = Window.partitionBy("item_a")
    val wB = Window.partitionBy("item_b")
    val totals = counted
      .filter(col("item_a") === -1 && col("item_b") === -1)
      .select(col("n_ab").as("n_orders"))
    val scored = counted
      .withColumn("n_b", max(when(col("item_a") === -1, col("n_ab"))).over(wB))
      .withColumn("n_a", max(when(col("item_b") === -1, col("n_ab"))).over(wA))
      .filter(col("item_a") >= 0 && col("item_b") >= 0 && col("n_ab") >= MinCo)
      .crossJoin(broadcast(totals))
      // exact BIGINT products; ONE IEEE division → cross-engine stable
      .withColumn("lift",
        (col("n_ab") * col("n_orders")).cast(DoubleType) /
          (col("n_a") * col("n_b")).cast(DoubleType))
    val w = Window.partitionBy("item_a")
      .orderBy(col("lift").desc, col("item_b"))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= TopN)
      .select(
        col("item_a"), col("item_b"), col("n_a"), col("n_b"), col("n_ab"),
        round(col("lift"), 6).as("lift"),
        col("rn").cast(IntegerType).as("rank"))
      .orderBy("item_a", "rank")
  }
}
