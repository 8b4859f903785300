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

  /** Referential-integrity audit across the schema's foreign keys: child
    * row count, orphaned-row count (left anti join against the parent
    * key), and the orphan fraction. Each relationship is one anti join
    * shuffled on the key — at 100 TB the parent key side is either
    * broadcast (dims) or the same shuffle any fact-dim join pays; child
    * rows never carry more than the key column through the check.
    */
  def fkCheck(t: Tables): DataFrame = {
    def rel(name: String, child: DataFrame, childKey: String,
        parent: DataFrame, parentKey: String): DataFrame = {
      val orphans = child.select(col(childKey))
        .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      child.agg(count(lit(1)).as("n_rows"))
        .crossJoin(orphans)
        .select(
          lit(name).as("relationship"), col("n_rows"), col("n_orphans"),
          round(col("n_orphans").cast("double") / col("n_rows"), 6).as("orphan_frac"))
    }
    rel("lineitem.l_orderkey->orders", t.lineitem, "l_orderkey", t.orders, "o_orderkey")
      .unionAll(rel("orders.o_custkey->customer", t.orders, "o_custkey", t.customer, "c_custkey"))
      .unionAll(rel("events.user_id->customer", t.events, "user_id", t.customer, "c_custkey"))
      .orderBy("relationship")
  }

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
