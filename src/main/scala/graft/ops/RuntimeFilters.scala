package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning driven end-to-end — the row-level
  * sibling of dynamic partition pruning (`join_dpp`): when a shuffle
  * join's small side carries a selective filter, Catalyst's
  * InjectRuntimeFilter builds a bloom filter over the small side's join
  * keys at RUNTIME and pushes `might_contain` into the big side's SCAN,
  * so fact rows that cannot match never reach the shuffle. At 100 TB
  * this is the difference between shuffling the whole fact table and
  * shuffling the ~1% that survives the dim filter — for joins where the
  * key is NOT a partition column (where DPP can't help).
  *
  * The session clone pins the test-scale thresholds the same way the
  * AQE skew demo does (`Skew.joinSkewAqe`): the defaults
  * (application side > 10 GB) are sized for real clusters, so at driver
  * SFs the rule would never fire — the THRESHOLDS are scaled down, the
  * rule and plan shape are the production ones. Broadcast is disabled
  * in the clone so the join actually shuffles (a broadcast join needs
  * no runtime filter — the whole small side ships anyway).
  * RuntimeFilterSpec pins that `might_contain` landed in the fact
  * scan's filters; the DuckDB oracle pins the filter is
  * value-invisible.
  */
object RuntimeFilters {

  private[graft] def bloomSession(spark: SparkSession): SparkSession =
    graft.util.Sessions.forContext(spark, "bloom") { ss =>
      ss.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // production default: app side must scan > 10 GB for the filter
      // to pay for itself; 0 keeps the RULE exercised at test SFs
      ss.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      ss.conf.set("spark.sql.session.timeZone", "UTC")
    }

  /** Selective-dim shuffle join: orders > 450k total price (~10% of
    * orders) ⋈ lineitem on the non-partition key l_orderkey, reduced to
    * per-returnflag totals. The bloom filter prunes lineitem rows at the
    * scan, before the join shuffle.
    */
  def joinBloomRuntime(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = bloomSession(spark)
    val t = graft.Tables(ss, sfDir)
    val o = t.orders
      .filter(col("o_totalprice") > 450000.0)
      .select(col("o_orderkey"))
    t.lineitem
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_items"),
        Relational.dbl(sum(Relational.dec(col("l_quantity")))
          .cast(org.apache.spark.sql.types.DecimalType(38, 2))).as("sum_qty"))
      .orderBy("l_returnflag")
  }
}
