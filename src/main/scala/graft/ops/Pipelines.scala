package graft.ops

import graft.Tables
import graft.pipeline.Pipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Relational.{dbl, dec}

/** A declared query composed THROUGH the pipeline graph API
  * ([[graft.pipeline.Pipeline]]) — proves the basis-style node layer
  * yields oracle-exact relational results: the Pipeline only wires
  * DataFrame transformations, so Catalyst sees one fused plan.
  */
object Pipelines {

  def pipelineRevenueBySegment(t: Tables): DataFrame =
    new Pipeline()
      .source("orders")(s => Tables(s, t.sfDir).orders)
      .source("customer")(s => Tables(s, t.sfDir).customer)
      .node("big_orders", "orders")(in =>
        in("orders").filter(col("o_totalprice") > 150000.0))
      .node("enriched", "big_orders", "customer")(in =>
        in("big_orders").join(in("customer"),
          col("o_custkey") === col("c_custkey")))
      .node("by_segment", "enriched")(in =>
        in("enriched")
          .groupBy("c_mktsegment")
          .agg(
            count(lit(1)).as("n"),
            dbl(sum(dec(col("o_totalprice"))).cast(DecimalType(38, 2))).as("rev"))
          .orderBy("c_mktsegment"))
      .produce(t.spark, "by_segment")
}
