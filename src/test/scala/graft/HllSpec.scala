package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the mergeable-HLL surface (`agg_hll_mergeable`), the
  * guarantees a rows-only driver check can't state:
  *
  *  - merge law: estimate(union of per-day sketches) agrees with the
  *    estimate of one sketch over all rows — register merge is a
  *    commutative max, so pre-aggregation loses nothing. Agreement is
  *    asserted to 0.5% rather than exact equality: identical registers
  *    can read out through different estimators (a dense streaming
  *    sketch uses HIP, a union result the composite estimator), which
  *    differ by a few counts past the sparse→dense transition;
  *  - partition-order stability: the same agreement after an adversarial
  *    repartition (the property that makes day sketches safe to build on
  *    a cluster);
  *  - accuracy: the estimate sits within the standard HLL ε envelope of
  *    the exact distinct (lgK=12 ⇒ σ ≈ 1.04/√4096 ≈ 1.6%; we assert 5% —
  *    3σ — on the real corpus).
  */
class HllSpec extends AnyFunSuite with SparkSessionFixture {

  private def relDiff(a: Long, b: Long): Double =
    math.abs(a - b).toDouble / math.max(math.max(a, b), 1L)

  test("union of day sketches == direct sketch, within ε of exact, order-independent") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val t = Tables(spark, dir)
      val row = ops.Aggregates.aggHllMergeable(t).head()
      val estUnion = row.getAs[Long]("est_union")
      val estDirect = row.getAs[Long]("est_direct")
      val exact = row.getAs[Long]("exact_total")
      assert(relDiff(estUnion, estDirect) <= 0.005,
        s"merge law violated at $dir: union=$estUnion direct=$estDirect")
      assert(math.abs(estUnion - exact).toDouble / exact <= 0.05,
        s"estimate outside 3-sigma envelope at $dir: est=$estUnion exact=$exact")
      // Sum of daily exacts must be >= total distinct (users active on
      // several days are counted once in the rollup) — the rollup is
      // doing real cross-day dedup work, not summing.
      assert(row.getAs[Long]("sum_day_users") >= exact)

      // Order stability: a skewed repartition must not move the estimate
      // beyond estimator tolerance.
      val ev = t.events.filter(col("user_id").isNotNull)
        .select(col("user_id")).repartition(13, col("user_id") % 7)
      val est2 = ev.agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))))
        .head().getLong(0)
      assert(relDiff(est2, estDirect) <= 0.005,
        s"repartition moved the estimate at $dir: $est2 vs $estDirect")
    }
  }
}
