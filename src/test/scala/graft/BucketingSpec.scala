package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Bucketing

/** Bucketed layout must remove the shuffle from co-located joins and
  * keep results identical to the unbucketed plan.
  */
class BucketingSpec extends AnyFunSuite with SparkSessionFixture {

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // A stale warehouse dir from a previous JVM isn't in this catalog —
    // remove the location too or CREATE TABLE fails with
    // LOCATION_ALREADY_EXISTS.
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
    if (loc.isDirectory) loc.listFiles().foreach(_.delete())
    if (loc.exists()) loc.delete()
  }

  /** Idempotent setup so each test stands alone regardless of run order. */
  private def ensureBucketedTables(): Unit =
    if (!spark.catalog.tableExists("orders_b") || !spark.catalog.tableExists("customer_b")) {
      val t = Tables(spark, "/root/testdata/sf0.001")
      dropTable("orders_b")
      dropTable("customer_b")
      Bucketing.writeBucketed(
        t.orders.withColumnRenamed("o_custkey", "custkey"), "orders_b", "custkey", 4)
      Bucketing.writeBucketed(
        t.customer.withColumnRenamed("c_custkey", "custkey"), "customer_b", "custkey", 4)
    }

  test("co-bucketed join runs with zero exchanges and identical results") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    ensureBucketedTables()

    val joined = Bucketing.table(spark, "orders_b")
      .join(Bucketing.table(spark, "customer_b").hint("merge"), Seq("custkey"))
      .select("o_orderkey", "c_name")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")

    val plain = t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_name")
      .collect().map(_.toString).sorted.toSeq
    assert(joined.collect().map(_.toString).sorted.toSeq == plain)
  }

  test("bucketed aggregation on the bucket key avoids the shuffle") {
    ensureBucketedTables()
    val agg = Bucketing.table(spark, "orders_b")
      .groupBy("custkey").agg(count(lit(1)).as("n"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange hashpartitioning"), s"agg on bucket key must not shuffle:\n$plan")
  }
}
