package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Aggregates

/** percentile_approx carries a rank-ε guarantee (accuracy = 1/ε): the
  * sketch's answer for quantile p is some element whose true rank lies in
  * [p−ε, p+ε]. Cross-engine hashes can't check a merge-order-dependent
  * sketch (rows-only driver check, like HLL), so this spec pins the
  * guarantee itself: every approx value must sit inside the exact
  * [p−ε, p+ε] VALUE envelope, and the approx quantiles must be monotone.
  */
class ApproxQuantileSpec extends AnyFunSuite with SparkSessionFixture {

  test("approx p50/p90 within the exact rank-ε envelope, monotone") {
    import org.apache.spark.sql.functions._
    val t = Tables(spark, "/root/testdata/sf0.01")
    val eps = 1.0 / 1000 // accuracy used by the operator
    val envelope = t.lineitem.groupBy("l_returnflag").agg(
      percentile(col("l_extendedprice").cast("double"), lit(0.5 - eps)).as("lo50"),
      percentile(col("l_extendedprice").cast("double"), lit(0.5 + eps)).as("hi50"),
      percentile(col("l_extendedprice").cast("double"), lit(0.9 - eps)).as("lo90"),
      percentile(col("l_extendedprice").cast("double"), lit(0.9 + eps)).as("hi90"))
    val got = Aggregates.aggApproxQuantile(t)
      .join(envelope, "l_returnflag").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (a50, a90) = (r.getAs[Double]("approx_p50"), r.getAs[Double]("approx_p90"))
      assert(a50 <= a90, s"approx quantiles not monotone: $r")
      assert(a50 >= r.getAs[Double]("lo50") && a50 <= r.getAs[Double]("hi50"),
        s"p50 outside ε-envelope: $r")
      assert(a90 >= r.getAs[Double]("lo90") && a90 <= r.getAs[Double]("hi90"),
        s"p90 outside ε-envelope: $r")
    }
  }
}
