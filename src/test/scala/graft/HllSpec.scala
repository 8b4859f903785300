package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the mergeable-HLL surface (`agg_hll_mergeable`), the
  * guarantees a rows-only driver check can't state:
  *
  *  - merge law: estimate(union of per-day sketches) equals the estimate
  *    of one sketch over all rows EXACTLY — HLL register merge is a max,
  *    commutative and associative, so pre-aggregation loses nothing;
  *  - partition-order independence: the same equality holds after an
  *    adversarial repartition (the property that makes day sketches safe
  *    to build on a cluster);
  *  - accuracy: the estimate sits within the standard HLL ε envelope of
  *    the exact distinct (lgK=12 ⇒ σ ≈ 1.04/√4096 ≈ 1.6%; we assert 5% —
  *    3σ — on the real corpus).
  */
class HllSpec extends AnyFunSuite with SparkSessionFixture {

  test("union of day sketches == direct sketch, within ε of exact, order-independent") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val t = Tables(spark, dir)
      val row = ops.Aggregates.aggHllMergeable(t).head()
      val estUnion = row.getAs[Long]("est_union")
      val estDirect = row.getAs[Long]("est_direct")
      val exact = row.getAs[Long]("exact_total")
      assert(estUnion == estDirect,
        s"merge law violated at $dir: union=$estUnion direct=$estDirect")
      assert(math.abs(estUnion - exact).toDouble / exact <= 0.05,
        s"estimate outside 3-sigma envelope at $dir: est=$estUnion exact=$exact")
      // Sum of daily exacts must be >= total distinct (users active on
      // several days are counted once in the rollup) — the rollup is
      // doing real cross-day dedup work, not summing.
      assert(row.getAs[Long]("sum_day_users") >= exact)

      // Order independence: a skewed repartition must not move the
      // estimate by a single count.
      val ev = t.events.filter(col("user_id").isNotNull)
        .select(col("user_id")).repartition(13, col("user_id") % 7)
      val est2 = ev.agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))))
        .head().getLong(0)
      assert(est2 == estDirect, s"repartition moved the estimate at $dir")
    }
  }
}
