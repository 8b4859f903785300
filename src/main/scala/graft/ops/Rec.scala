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
  * Plan shape (the fact is scanned once, shuffled twice, both times on
  * keys that shrink the data):
  *
  *   1. distinct (order, item) → sorted per-order item array: ONE shuffle
  *      on the order key; the aggregate buffer is basket-width bounded.
  *   2. directed pair emission IN-ROW (`transform` × `filter` over the
  *      array) restricted to probe items on the antecedent side — the
  *      probe predicate lands before the pair stream exists, so emission
  *      is Σ_order |probe∩basket|·(|basket|−1), never rows².
  *   3. pair aggregate: ONE shuffle keyed (item_a, item_b) carrying counts
  *      only (map-side partial counts make the shuffle rows ≤ distinct
  *      pair count per partition).
  *   4. margins join back on the item key. At this scale they broadcast;
  *      at 100 TB the same plan degrades gracefully to a shuffle join
  *      keyed by item — the pair table, not the fact, is the big side.
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
    val baskets = t.lineitem
      .select(col("l_orderkey"), col("l_partkey"))
      .distinct()
    // per-order sorted item array — basket-width bounded buffer
    val basketArr = baskets
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("items"))
    // directed (probe → candidate) pairs emitted in-row; the probe filter
    // is applied INSIDE the emission so non-probe antecedents never
    // produce pair rows
    val pairs = basketArr
      .select(explode(expr(
        s"""flatten(transform(
           |  filter(items, a -> a % $ProbeMod = 0),
           |  a -> transform(filter(items, b -> b != a),
           |                 b -> named_struct('item_a', a, 'item_b', b))))"""
          .stripMargin)).as("p"))
      .select(col("p.item_a").as("item_a"), col("p.item_b").as("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).cast(LongType).as("n_ab"))
      .filter(col("n_ab") >= MinCo)
    // margins: distinct orders containing each item; total basket count
    val itemOrders = baskets
      .groupBy("l_partkey")
      .agg(count(lit(1)).cast(LongType).as("n_item"))
    val totals = basketArr.agg(count(lit(1)).cast(LongType).as("n_orders"))
    val scored = pairs
      .join(broadcast(itemOrders.select(col("l_partkey").as("item_a"),
        col("n_item").as("n_a"))), Seq("item_a"))
      .join(broadcast(itemOrders.select(col("l_partkey").as("item_b"),
        col("n_item").as("n_b"))), Seq("item_b"))
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
