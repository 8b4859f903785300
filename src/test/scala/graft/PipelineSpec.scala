package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Pipeline

class PipelineSpec extends AnyFunSuite with SparkSessionFixture {

  private val sfDir = "/root/testdata/sf0.001"

  private def buildPipeline(buildCount: AtomicInteger): Pipeline =
    new Pipeline()
      .source("orders")(s => Tables(s, sfDir).orders)
      .source("customer")(s => Tables(s, sfDir).customer)
      .node("big_orders", "orders") { in =>
        buildCount.incrementAndGet()
        in("orders").filter(col("o_totalprice") > 100000.0)
      }
      .node("enriched", "big_orders", "customer") { in =>
        in("big_orders").join(in("customer"),
          col("o_custkey") === col("c_custkey"))
      }
      .node("by_segment", "enriched") { in =>
        in("enriched").groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      }
      .node("double_use", "big_orders", "by_segment") { in =>
        in("by_segment").crossJoin(broadcast(
          in("big_orders").agg(count(lit(1)).as("total"))))
      }

  test("demand-driven produce composes the upstream DAG") {
    val p = buildPipeline(new AtomicInteger)
    val seg = p.produce(spark, "by_segment")
    val direct = Tables(spark, sfDir).orders
      .filter(col("o_totalprice") > 100000.0)
      .join(Tables(spark, sfDir).customer, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    assert(seg.collect().map(_.toString).sorted.toSeq ==
      direct.collect().map(_.toString).sorted.toSeq)
  }

  test("each node resolves once per produce (diamond dependency)") {
    val counter = new AtomicInteger
    buildPipeline(counter).produce(spark, "double_use")
    assert(counter.get == 1, "big_orders must be composed once, not per consumer")
  }

  test("cycle and missing-node are build-time errors") {
    val p = new Pipeline()
      .node("a", "b")(in => in("b"))
      .node("b", "a")(in => in("a"))
    intercept[IllegalArgumentException](p.produce(spark, "a"))
    intercept[IllegalArgumentException](p.produce(spark, "nope"))
  }

  test("materialize writes a block once and skips recomputation") {
    val dir = Files.createTempDirectory("graft-pipe").toString
    val counter = new AtomicInteger
    val p = buildPipeline(counter)
    val first = p.materialize(spark, "big_orders", dir).count()
    assert(counter.get == 1)
    val second = p.materialize(spark, "big_orders", dir).count()
    assert(counter.get == 1, "existing block must not recompute")
    assert(first == second && first > 0)
  }

  test("pipeline_observe: CollectMetrics delivers the mid-plan audit exactly") {
    val t = Tables(spark, sfDir)
    val (df, obs) = ops.Pipelines.pipelineObserveWith(t)
    val out = df.collect() // the action that fires the observation
    assert(out.nonEmpty)
    val m = obs.get
    // direct recomputation of the observed point (post-filter grain)
    val direct = t.orders
      .filter(col("o_orderstatus") =!= "P")
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("s"))
      .head()
    assert(m("n_rows") == direct.getAs[Long]("n"), m)
    assert(m("sum_cents") == direct.getAs[Long]("s"), m)
    // and the observation is value-invisible: result ≡ the plain aggregate
    val plain = t.orders.filter(col("o_orderstatus") =!= "P")
      .select(col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
      .orderBy("o_orderstatus").collect()
    assert(out.toSeq == plain.toSeq)
  }
}
