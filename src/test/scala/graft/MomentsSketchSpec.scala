package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MomentsSketch

/** Moments-sketch quantile rollup laws: the merge must be EXACT (that is
  * the sketch's whole value at scale), and the Cornish–Fisher estimate
  * must sit within its documented error band of the true percentile.
  */
class MomentsSketchSpec extends AnyFunSuite with SparkSessionFixture {

  private lazy val t = Tables(spark, "/root/testdata/sf0.001")

  test("merged grains equal a direct single-pass recompute (exact merge law)") {
    val rows = MomentsSketch.aggQuantileMoments(t).collect()
    val all = rows.find(_.getString(0) == "all").get
    // direct recompute of the all-time moments, one pass, no day grain
    val direct = t.events
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select((round(col("value") * 100).cast("long") - MomentsSketch.Anchor)
        .cast("decimal(12,0)").as("x"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).cast("decimal(38,0)").as("s1"),
        sum(col("x") * col("x")).cast("decimal(38,0)").as("s2"),
        sum(col("x") * col("x") * col("x")).cast("decimal(38,0)").as("s3"))
      .collect().head
    assert(all.getLong(2) == direct.getLong(0)) // n survives the day-grain merge
    // mean from merged partials == mean from the direct pass (exact ints)
    val meanDirect = MomentsSketch.Anchor +
      direct.getDecimal(1).doubleValue() / direct.getLong(0)
    assert(math.abs(all.getDouble(3) - meanDirect) < 1e-6)
    // the SECOND and THIRD moments merge exactly too: recompute std and
    // skew from the direct one-pass sums and compare at output precision
    val n = direct.getLong(0).toDouble
    val mu = direct.getDecimal(1).doubleValue() / n
    val r2 = direct.getDecimal(2).doubleValue() / n
    val r3 = direct.getDecimal(3).doubleValue() / n
    val m2 = math.max(r2 - mu * mu, 0.0)
    val m3 = r3 - 3 * mu * r2 + 2 * mu * mu * mu
    assert(math.abs(all.getDouble(4) - math.sqrt(m2)) < 1e-4,
      s"std merge drift: ${all.getDouble(4)} vs ${math.sqrt(m2)}")
    assert(math.abs(all.getDouble(5) - m3 / math.pow(m2, 1.5)) < 1e-4,
      s"skew merge drift: ${all.getDouble(5)} vs ${m3 / math.pow(m2, 1.5)}")
  }

  test("Cornish-Fisher estimates sit within 0.5 sigma of exact percentiles") {
    val all = MomentsSketch.aggQuantileMoments(t).collect()
      .find(_.getString(0) == "all").get
    val (std, q50est, q90est) =
      (all.getDouble(4), all.getDouble(6), all.getDouble(7))
    val exact = t.events
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(round(col("value") * 100).cast("long").as("c"))
      .stat.approxQuantile("c", Array(0.5, 0.9), 0.0) // relErr 0 = exact
    assert(math.abs(q50est - exact(0)) <= 0.5 * std,
      s"q50 est $q50est vs exact ${exact(0)} (std $std)")
    assert(math.abs(q90est - exact(1)) <= 0.5 * std,
      s"q90 est $q90est vs exact ${exact(1)} (std $std)")
  }

  test("every grain row is finite and internally consistent") {
    val rows = MomentsSketch.aggQuantileMoments(t).collect()
    assert(rows.map(_.getString(0)).toSet == Set("day", "week", "all"))
    val dayN = rows.filter(_.getString(0) == "day").map(_.getLong(2)).sum
    val allN = rows.find(_.getString(0) == "all").get.getLong(2)
    assert(dayN == allN) // day partials partition the corpus
    rows.foreach { r =>
      assert(!r.getDouble(4).isNaN && r.getDouble(4) >= 0.0) // std
      assert(!r.getDouble(6).isNaN && !r.getDouble(7).isNaN)
      assert(r.getDouble(6) <= r.getDouble(7)) // q50 ≤ q90 (positive skew or not)
    }
  }
}
