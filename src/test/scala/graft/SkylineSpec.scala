package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import ops.Skyline

/** Pareto-frontier operator: the two-phase (local bucket frontiers →
  * merge) plan must equal the quadratic dominance definition exactly —
  * including duplicate frontier points, which strict dominance keeps.
  */
class SkylineSpec extends AnyFunSuite with SparkSessionFixture {

  private lazy val t = Tables(spark, "/root/testdata/sf0.001")

  /** Driver-side brute-force skyline over collected (group, key, c, d). */
  private def brute(rows: Seq[(String, Long, Long, Long)]): Set[(String, Long)] = {
    def dominated(b: (String, Long, Long, Long)): Boolean =
      rows.exists(a => a._1 == b._1 && a._3 >= b._3 && a._4 >= b._4 &&
        (a._3 > b._3 || a._4 > b._4))
    rows.filterNot(dominated).map(r => (r._1, r._2)).toSet
  }

  test("skyline_pareto == driver brute force at sf0.001") {
    val input = t.orders
      .filter(col("o_totalprice").isNotNull && col("o_orderdate").isNotNull)
      .select(col("o_orderpriority"), col("o_orderkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"),
        unix_micros(col("o_orderdate").cast("timestamp")))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val expected = brute(input)
    val got = Skyline.skylinePareto(t)
      .select("o_orderpriority", "o_orderkey").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("duplicate frontier points all survive; dominated duplicates all drop") {
    import spark.implicits._
    // group g: (10, 10) twice (both frontier — neither strictly dominates
    // the other), (10, 5) dominated by them, (5, 20) frontier, (5, 20)
    // duplicated (both survive), (4, 19) dominated.
    val df = Seq(
      ("g", 1L, 10L, 10L), ("g", 2L, 10L, 10L), ("g", 3L, 10L, 5L),
      ("g", 4L, 5L, 20L), ("g", 5L, 5L, 20L), ("g", 6L, 4L, 19L))
      .toDF("o_orderpriority", "o_orderkey", "cents", "dlv")
      .withColumn("dl", timestamp_micros(col("dlv"))).drop("dlv")
    // run both frontier phases exactly as the operator composes them,
    // through the REAL (private[graft]) pass — no mirrored copy to drift
    val local = Skyline.frontier(
      df.withColumn("bucket", pmod(hash(col("o_orderkey")), lit(32))),
      Seq("o_orderpriority", "bucket")).drop("bucket")
    val result = Skyline.frontier(local, Seq("o_orderpriority"))
      .select("o_orderkey").as[Long].collect().toSet
    assert(result === Set(1L, 2L, 4L, 5L))
  }

  test("local-frontier phase is lossless: two-phase == single-pass at sf0.001") {
    val base = t.orders
      .filter(col("o_totalprice").isNotNull && col("o_orderdate").isNotNull)
      .select(col("o_orderpriority"), col("o_orderkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents"),
        col("o_orderdate").as("dl"))
    val single = Skyline.frontier(base, Seq("o_orderpriority"))
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val twoPhase = Skyline.skylinePareto(t)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(twoPhase === single)
  }
}
