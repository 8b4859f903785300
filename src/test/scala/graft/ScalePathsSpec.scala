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

  test("bucketed interval join == range-predicate interval join (sf0.01)") {
    val t = Tables(spark, "/root/testdata/sf0.01")
    val bucketed = Temporal.joinIntervalBucketed(t).collect().map(_.toString).toSeq
    val declared = Temporal.joinInterval(t).collect().map(_.toString).toSeq
    assert(bucketed.nonEmpty && bucketed == declared)
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
