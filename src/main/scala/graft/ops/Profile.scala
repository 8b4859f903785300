package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling — the data-quality audit every ingestion pipeline runs
  * before trusting a feed: per-column row count, null count, distinct
  * count, and min/max rendered as strings (one schema for heterogeneous
  * column types).
  *
  * ONE pass over the table computes every column's aggregates side by side
  * (partial+final, shuffle volume = one row of aggregates per partition —
  * a multi-pass per-column loop would scan the table once per column);
  * the wide row is then unpivoted to the long (column, stats) form with a
  * stack projection, which is free. Exact-count distinct keeps the oracle
  * checkable; the 100 TB variant swaps in approx_count_distinct per column
  * with the same plan shape.
  */
object Profile {

  /** Columns chosen to cover int, string, and date renderings that are
    * byte-identical across engines (decimals deliberately excluded — their
    * string forms differ; cast or scale them first, as vec_quantize does).
    */
  private val OrdersColumns =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate")

  def profileOrders(t: Tables): DataFrame = profileOf(t.orders, OrdersColumns)

  def profileOf(df: DataFrame, columns: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = columns.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(count(lit(1)).as("n"), aggs: _*)
    val stackArgs = columns
      .map(c => s"'$c', `${c}__nulls`, `${c}__nd`, `${c}__min`, `${c}__max`")
      .mkString(", ")
    wide.selectExpr(
      "n",
      s"stack(${columns.size}, $stackArgs) AS (column_name, n_null, n_distinct, min_s, max_s)")
      .select(col("column_name"), col("n"), col("n_null"), col("n_distinct"),
        col("min_s"), col("max_s"))
      .orderBy("column_name")
  }
}
