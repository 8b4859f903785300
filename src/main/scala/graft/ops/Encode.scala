package graft.ops

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Leave-one-out target encoding — the feature-engineering staple that
  * replaces a categorical column with the mean of the target over the
  * OTHER rows of the same category, so a row never sees its own label
  * (the standard target-leakage guard).
  *
  * The naive formulation is a per-row window over the category; the
  * scale formulation used here never windows at all: one
  * category-grained aggregate (category cardinality ≪ row count, so the
  * aggregate output is broadcast-sized), broadcast-joined back onto the
  * fact, and the leave-one-out correction `(sum − own) / (n − 1)` is a
  * pure projection. The fact is scanned twice but shuffled ZERO times —
  * at 100 TB both scans are map-only stages against the same cached
  * columnar footprint, which beats one shuffle of the full fact by an
  * order of magnitude.
  *
  * Exactness: the target is integral cents, so `sum − own` and `n − 1`
  * are exact BIGINTs and the encoding is ONE IEEE division both engines
  * compute bit-identically before the 6 dp rounding.
  */
object Encode {

  private val ProbeMod = 101 // emitted rows: o_orderkey % 101 == 0

  /** LOO-encode `o_orderpriority` with the mean order value (cents) of
    * the other orders sharing the priority; singleton categories encode
    * NULL rather than divide by zero.
    */
  def targetEncoding(t: Tables): DataFrame = {
    val cents = round(col("o_totalprice") * 100).cast(LongType)
    val fact = t.orders.select(
      col("o_orderkey"), col("o_orderpriority"), cents.as("cents"))
    val catStats = fact.groupBy("o_orderpriority")
      .agg(sum(col("cents")).as("cat_sum"),
        count(lit(1)).cast(LongType).as("cat_n"))
    fact
      .filter(col("o_orderkey") % ProbeMod === 0)
      .join(broadcast(catStats), Seq("o_orderpriority"))
      .select(
        col("o_orderkey"), col("o_orderpriority"), col("cents"),
        when(col("cat_n") > 1,
          round((col("cat_sum") - col("cents")).cast(DoubleType) /
            (col("cat_n") - 1).cast(DoubleType), 6)).as("loo_enc"))
      .orderBy("o_orderkey")
  }
}
