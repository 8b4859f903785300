package graft.ops

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Market-basket association mining over the order fact: support,
  * confidence, and lift for unordered brand pairs co-occurring in an
  * order — the first (and in practice dominant) level of an Apriori-style
  * rule miner, restated as pure relational algebra.
  *
  * Scale shape: the raw fact is touched exactly once, to produce the
  * distinct (order, brand) incidence table (brand arrives via a BROADCAST
  * join against the part dimension — the fact never shuffles for the
  * dimension lookup). The pair generation self-joins the incidence table
  * on the order key, so its output is Σ_order |brands(o)|² — bounded by
  * basket width squared per order (TPC-H baskets are ≤7 lines), never
  * rows². Margins are a vocabulary-sized aggregate and broadcast back
  * onto vocabulary²-bounded pair counts. Every division happens once, in
  * the final projection, on exact BIGINT counts (both engines divide the
  * same integers in IEEE double and round to 6 dp — bit-identical).
  */
object Assoc {

  /** Brand-pair association rules with a minimum pair support of
    * `minPairs` orders. Emits one row per unordered pair (brand_a <
    * brand_b): margin counts, joint count, joint support, the two
    * directed confidences, and lift.
    */
  def basketAssoc(t: Tables, minPairs: Int = 5): DataFrame = {
    val brandOf = broadcast(
      t.part.select(col("p_partkey").as("l_partkey"), col("p_brand")))
    val ob = t.lineitem
      .select("l_orderkey", "l_partkey")
      .join(brandOf, "l_partkey")
      .select(col("l_orderkey"), col("p_brand"))
      .distinct()
    val nOrders = ob.select(
      countDistinct(col("l_orderkey")).cast(LongType).as("n_orders"))
    val margins = ob.groupBy(col("p_brand"))
      .agg(count(lit(1)).cast(LongType).as("n"))
    val pairs = ob.as("a")
      .join(ob.as("b"), Seq("l_orderkey"))
      .filter(col("a.p_brand") < col("b.p_brand"))
      .groupBy(
        col("a.p_brand").as("brand_a"),
        col("b.p_brand").as("brand_b"))
      .agg(count(lit(1)).cast(LongType).as("n_ab"))
      .filter(col("n_ab") >= minPairs)
    pairs
      .join(broadcast(margins.select(
        col("p_brand").as("brand_a"), col("n").as("n_a"))), Seq("brand_a"))
      .join(broadcast(margins.select(
        col("p_brand").as("brand_b"), col("n").as("n_b"))), Seq("brand_b"))
      .crossJoin(broadcast(nOrders))
      .select(
        col("brand_a"), col("brand_b"),
        col("n_a"), col("n_b"), col("n_ab"),
        round(col("n_ab").cast(DoubleType) / col("n_orders"), 6).as("support"),
        round(col("n_ab").cast(DoubleType) / col("n_a"), 6).as("conf_a_b"),
        round(col("n_ab").cast(DoubleType) / col("n_b"), 6).as("conf_b_a"),
        round(col("n_ab").cast(DoubleType) * col("n_orders") /
          (col("n_a") * col("n_b")), 6).as("lift"))
      .orderBy("brand_a", "brand_b")
  }
}
