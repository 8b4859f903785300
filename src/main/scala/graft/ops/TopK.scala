package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import Relational.dec

/** Per-group top-k as a bounded-buffer AGGREGATION — the 100 TB scale path
  * for [[Windows.topkPerGroup]]'s window formulation.
  *
  * The window path shuffles EVERY row on the group key and sorts each
  * group to rank it; at 100 TB that is a full-table shuffle whose sort
  * cost pays for rows the query then throws away (all but k per group).
  * This path instead folds rows into a k-bounded sorted buffer per group
  * with map-side partial aggregation (Spark plans a typed Aggregator as
  * ObjectHashAggregate partial → shuffle → final), so the shuffle carries
  * at most #groups × k entries — the OUTPUT size, not the input size.
  * The window and aggregate forms return identical rows (same DuckDB
  * oracle as `topk_per_group`; WindowScaleSpec pins equality), so at
  * scale the choice is purely a physical one.
  *
  * Ordering is total by construction — (balance cents DESC, custkey ASC)
  * — so ties cannot make the result engine- or partitioning-dependent
  * (SURVEY.md §2.4). Balances ride as integral cents (exact for
  * DECIMAL(18,2) inputs); the final projection divides back to the
  * oracle's DOUBLE.
  */
object TopK {

  /** Sorted-insert top-k Aggregator over (sortValue, tieKey) pairs.
    * Buffer = best-first sorted Seq capped at k; reduce is an insertion
    * into a ≤k list (O(k) — k is a query constant, not data-sized), merge
    * folds one ≤k list into another. Both sides of every merge are
    * bounded, so executor memory per group is O(k) no matter how many
    * rows a group holds.
    */
  final class TopKAgg(k: Int)
      extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
    private def better(a: (Long, Long), b: (Long, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    private def insert(buf: Seq[(Long, Long)], in: (Long, Long)): Seq[(Long, Long)] =
      if (buf.lengthCompare(k) >= 0 && !better(in, buf.last)) buf
      else {
        val (pre, post) = buf.span(e => better(e, in))
        (pre ++ (in +: post)).take(k)
      }
    override def zero: Seq[(Long, Long)] = Nil
    override def reduce(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] =
      insert(b, a)
    override def merge(
        x: Seq[(Long, Long)], y: Seq[(Long, Long)]): Seq[(Long, Long)] =
      y.foldLeft(x)(insert)
    override def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = r
    override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
      ExpressionEncoder[Seq[(Long, Long)]]()
    override def outputEncoder: Encoder[Seq[(Long, Long)]] =
      ExpressionEncoder[Seq[(Long, Long)]]()
  }

  /** Top-3 customers by account balance per nation — identical contract
    * (and oracle) to `topk_per_group`, computed via the bounded-buffer
    * aggregate instead of a ranked window.
    */
  def topkGroupAgg(t: Tables): DataFrame = {
    val topk = udaf(new TopKAgg(3))
    t.customer
      .select(
        col("c_nationkey"),
        (dec(col("c_acctbal")) * 100).cast("long").as("cents"),
        col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(topk(col("cents"), col("c_custkey")).as("tk"))
      .select(col("c_nationkey"), explode(col("tk")).as("e"))
      .select(
        col("c_nationkey"),
        col("e._2").as("c_custkey"),
        (col("e._1") / lit(100.0)).as("bal"))
      .orderBy(asc("c_nationkey"), desc("bal"), asc("c_custkey"))
  }
}
