package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{AsofGrouped, Skew, Temporal}

/** The alternative scale-path implementations must be drop-in equal to
  * their reference plans.
  */
class ScalePathsSpec extends AnyFunSuite with SparkSessionFixture {

  test("cogroup as-of join == declared join+window rewrite (sf0.01)") {
    val t = Tables(spark, "/root/testdata/sf0.01")
    val grouped = AsofGrouped.joinAsofGrouped(t).collect().map(_.toString).toSeq
    val declared = Temporal.joinAsof(t).collect().map(_.toString).toSeq
    assert(grouped.size == declared.size)
    assert(grouped == declared)
  }

  test("native sorted-merge as-of operator == declared plan (sf0.01)") {
    val t = Tables(spark, "/root/testdata/sf0.01")
    val native = graft.ops.AsofGrouped.joinAsofNative(t)
    val declared = Temporal.joinAsof(t)
    // The custom physical operator must actually be in the executed plan.
    native.collect()
    assert(native.queryExecution.executedPlan.toString().contains("AsOfJoin"),
      native.queryExecution.executedPlan.toString())
    assert(native.collect().map(_.toString).toSeq ==
      declared.collect().map(_.toString).toSeq)
  }

  test("native forward as-of == declared forward rewrite (sf0.01)") {
    val t = Tables(spark, "/root/testdata/sf0.01")
    val native = AsofGrouped.joinAsofForwardNative(t)
    native.collect()
    assert(native.queryExecution.executedPlan.toString().contains("AsOfJoin"))
    assert(native.collect().map(_.toString).toSeq ==
      Temporal.joinAsofForward(t).collect().map(_.toString).toSeq)
  }

  test("native nearest as-of == declared nearest rewrite (sf0.01)") {
    val t = Tables(spark, "/root/testdata/sf0.01")
    val native = AsofGrouped.joinAsofNearestNative(t)
    native.collect()
    assert(native.queryExecution.executedPlan.toString().contains("AsOfJoin"))
    assert(native.collect().map(_.toString).toSeq ==
      Temporal.joinAsofNearest(t).collect().map(_.toString).toSeq)
  }

  test("as-of direction tie-breaks on crafted equal-ts/equal-distance data") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, to_timestamp}
    def ts(s: String) = to_timestamp(col(s))
    // Left probes at t=10 and t=20 (µs-precision timestamps).
    val left = Seq((1L, 100L, "1970-01-01 00:00:10"), (2L, 100L, "1970-01-01 00:00:20"))
      .toDF("l_id", "key", "lt").withColumn("lt", ts("lt"))
    // Right: two rows tied at t=10 (ids 7,8), two tied at t=30 (ids 3,4),
    // and one at t=0 (id 9) — so probe t=20 sits exactly 10 s from both
    // the t=10 group and the t=30 group.
    val right = Seq(
      (9L, 100L, "1970-01-01 00:00:00"),
      (7L, 100L, "1970-01-01 00:00:10"), (8L, 100L, "1970-01-01 00:00:10"),
      (3L, 100L, "1970-01-01 00:00:30"), (4L, 100L, "1970-01-01 00:00:30"))
      .toDF("r_id", "rkey", "rt").withColumn("rt", ts("rt"))
    def run(dir: String) = graft.plans.AsOf
      .asofJoin(left, right, "key", "rkey", "lt", "rt", Some("r_id"), dir)
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // Backward: equal-ts tie → GREATEST id (probe@10 → id 8).
    assert(run("backward") == Seq((1L, 8L), (2L, 8L)))
    // Forward: at-or-after, equal-ts tie → SMALLEST id (probe@10 → id 7).
    assert(run("forward") == Seq((1L, 7L), (2L, 3L)))
    // Nearest: probe@10 dist-0 → id 7 (smallest in group); probe@20 is
    // equidistant from t=10 and t=30 → earlier ts wins → id 7.
    assert(run("nearest") == Seq((1L, 7L), (2L, 7L)))
  }

  test("bucketed interval join == range-predicate interval join (sf0.01)") {
    val t = Tables(spark, "/root/testdata/sf0.01")
    val bucketed = Temporal.joinIntervalBucketed(t).collect().map(_.toString).toSeq
    val declared = Temporal.joinInterval(t).collect().map(_.toString).toSeq
    assert(bucketed.nonEmpty && bucketed == declared)
  }

  test("bloom-pruned semi join == plain semi join, and the prune bites") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val got = graft.ops.Bloom.bloomSemiJoin(t).collect().map(_.toString).toSeq
    val keys = t.orders.filter(col("o_totalprice") > 450000.0).select("o_orderkey")
    val ref = t.lineitem
      .join(keys, t.lineitem("l_orderkey") === keys("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        graft.ops.Relational.dbl(sum(graft.ops.Relational.dec(col("l_quantity")))
          .cast(org.apache.spark.sql.types.DecimalType(38, 2))).as("sum_qty"))
      .orderBy("l_returnflag").collect().map(_.toString).toSeq
    assert(got == ref)
    // the bloom pass must be a superset of true matches and a real prune
    val (pruned, _) = graft.ops.Bloom.prunedProbe(t, 450000.0, 20)
    val trueMatches = t.lineitem
      .join(keys, t.lineitem("l_orderkey") === keys("o_orderkey"), "left_semi")
    val nPruned = pruned.count()
    assert(nPruned >= trueMatches.count(), "bloom must never drop a true match")
    assert(nPruned < t.lineitem.count() / 2, "bloom should prune most non-matching rows")
    // false-positive rate sanity at m=2^20, k=2
    assert(nPruned <= (trueMatches.count() * 1.1).toLong + 100)
  }

  test("salted join == plain join (orders x customer)") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val left = t.orders.withColumnRenamed("o_custkey", "custkey")
    val right = t.customer.withColumnRenamed("c_custkey", "custkey")
    val plain = left.join(right, Seq("custkey"))
      .select("o_orderkey", "c_name").collect().map(_.toString).sorted.toSeq
    val salted = Skew.saltedJoin(left, right, Seq("custkey"), buckets = 7)
      .select("o_orderkey", "c_name").collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
  }

  test("salted join spreads a hot key across buckets") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val left = t.orders.withColumn("custkey", lit(1L)) // 100% skew: one key
    val salts = left.withColumn(
      "__salt", pmod(xxhash64(struct(left.columns.map(col): _*)), lit(7L)).cast("int"))
      .select(countDistinct(col("__salt"))).head.getLong(0)
    assert(salts == 7, s"hot key should spread over all 7 salt buckets, got $salts")
  }
}
