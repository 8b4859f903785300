package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Merge
import graft.sources.Layouts

/** Semantics of the batch MERGE operators and round-trip fidelity of the
  * driver-checkable storage-layout queries.
  */
class MergeLayoutSpec extends AnyFunSuite with SparkSessionFixture {

  private lazy val t = Tables(spark, "/root/testdata/sf0.001")

  test("merge_upsert: actions partition the key space correctly") {
    val m = Merge.mergeUpsert(t).cache()
    val custWithOrders = t.orders.select("o_custkey").distinct().count()
    val allCust = t.customer.count()
    val byAction = m.groupBy("action").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byAction.getOrElse("update", 0L) == custWithOrders)
    assert(byAction.getOrElse("carry", 0L) == allCust - custWithOrders)
    // the orders FK is closed over customers, so no inserts on this data
    assert(byAction.getOrElse("insert", 0L) == 0L)
    assert(m.count() == allCust)
  }

  test("merge_upsert: updated balances equal the order-total sums") {
    val m = Merge.mergeUpsert(t).filter(col("action") === "update")
    val sums = t.orders.groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("s"))
    val bad = m.join(sums, col("custkey") === col("o_custkey"))
      .filter(col("acctbal") =!= col("s")).count()
    assert(bad == 0)
  }

  test("merge_scd2: one current row per key; changed keys carry history") {
    val s = Merge.mergeScd2(t).cache()
    val allCust = t.customer.count()
    val changed = t.customer.filter(col("c_acctbal") < 0).count()
    assert(changed > 0, "fixture must contain negative balances")
    assert(s.count() == allCust + changed)
    val currents = s.filter(col("is_current")).groupBy("c_custkey").count()
      .filter(col("count") =!= 1).count()
    assert(currents == 0)
    val v2 = s.filter(col("version") === 2)
    assert(v2.count() == changed)
    assert(v2.filter(col("segment") =!= "DELINQUENT").count() == 0)
  }

  test("layout queries equal the same aggregates over the original tables") {
    val viaLayout = Layouts.layoutPartitioned(spark, t.sfDir)
      .collect().map(_.toSeq).toSet
    val direct = t.events
      .filter(col("value").isNotNull && col("event_type").isNotNull)
      .filter(to_date(col("ts")) >= lit("2024-01-10").cast("date") &&
        to_date(col("ts")) <= lit("2024-01-19").cast("date"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_ev"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))
      .collect().map(_.toSeq).toSet
    assert(viaLayout == direct && direct.nonEmpty)

    val viaZ = Layouts.layoutZorder(spark, t.sfDir).collect().map(_.toSeq).toSet
    val directZ = t.orders
      .filter(col("o_custkey") < 500 && col("o_totalprice") > 100000.0)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("sum_cents"))
      .collect().map(_.toSeq).toSet
    assert(viaZ == directZ && directZ.nonEmpty)
  }

  test("join_bucketed equals the plain join over the original tables") {
    val viaBucket = Layouts.joinBucketed(spark, t.sfDir).collect().map(_.toSeq).toSet
    val direct = t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("sum_cents"))
      .collect().map(_.toSeq).toSet
    assert(viaBucket == direct && direct.nonEmpty)
  }

  test("layout materialization is memoized on the dataset stamp") {
    val first = Layouts.layoutZorder(spark, t.sfDir).collect().map(_.toSeq).toSet
    // second call must reuse the on-disk layout (same JVM memo) and agree
    val second = Layouts.layoutZorder(spark, t.sfDir).collect().map(_.toSeq).toSet
    assert(first == second)
  }
}
