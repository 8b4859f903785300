package graft

import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join pruning: InjectRuntimeFilter must actually
  * land `might_contain` on the fact side's scan (plan pin), and the
  * pruning must be value-invisible (plain-session equality; the DuckDB
  * oracle re-checks at the driver gate).
  */
class RuntimeFilterSpec extends AnyFunSuite with SparkSessionFixture {

  private val sf = "/root/testdata/sf0.001"

  test("might_contain lands on the fact scan and is value-invisible") {
    val df = ops.RuntimeFilters.joinBloomRuntime(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"),
      s"runtime bloom filter did not fire:\n$plan")
    // value invisibility vs the same join on the plain session
    import org.apache.spark.sql.functions._
    val t = Tables(spark, sf)
    val want = t.lineitem
      .join(t.orders.filter(col("o_totalprice") > 450000.0)
        .select("o_orderkey"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        ops.Relational.dbl(sum(ops.Relational.dec(col("l_quantity")))
          .cast(org.apache.spark.sql.types.DecimalType(38, 2))).as("sum_qty"))
      .orderBy("l_returnflag")
      .collect().map(_.toString).toSeq
    val got = df.collect().map(_.toString).toSeq
    assert(got.nonEmpty && got == want)
  }
}
