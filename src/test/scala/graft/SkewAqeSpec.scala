package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew

/** The automatic skew path must actually EXERCISE AQE's skew split —
  * a green oracle alone would also pass if the thresholds never fired
  * and the hot key ran as one giant task.
  */
class SkewAqeSpec extends AnyFunSuite with SparkSessionFixture {

  private val sf = "/root/testdata/sf0.001"

  test("AQE splits the skewed partition (skew=true in the executed join)") {
    val df = Skew.joinSkewAqe(spark, sf)
    df.collect() // AQE decides skew handling as stages execute
    val p = df.queryExecution.executedPlan.toString()
    val finalPlan = p.split("== Initial Plan ==").head
    assert(finalPlan.contains("isFinalPlan=true"), p)
    assert(finalPlan.contains("skew=true"),
      s"AQE skew split did not fire — thresholds no longer match test scale:\n$p")
  }

  test("skew split is value-invisible: equals a plain-session recompute") {
    import org.apache.spark.sql.functions._
    val got = Skew.joinSkewAqe(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val t = Tables(spark, sf)
    val fact = t.lineitem.select(
      when(col("l_orderkey") % 100 < 90, lit(0L))
        .otherwise(col("l_orderkey") % 100).as("skew_key"),
      col("l_quantity"))
    val dim = spark.range(0, 100)
      .select(col("id").as("skew_key"),
        concat(lit("grp_"), (col("id") % 7).cast("string")).as("dim_label"))
    val want = fact.join(dim, "skew_key")
      .groupBy("skew_key", "dim_label")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(18,2)"))
          .cast("decimal(38,2)").cast("double").as("sum_qty"))
      .collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty && got == want)
  }
}
