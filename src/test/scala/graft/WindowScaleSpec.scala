package graft

import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Windows

/** The global-window operators (ntile/cume_dist/percent_rank, value-range
  * frame) are re-planned as two-pass range-partitioned rank / bucketed
  * self-join for scale. These tests pin (a) row-for-row equality with the
  * built-in single-partition window forms, and (b) that the registered
  * plans really contain no empty-partition-spec WindowExec over the data
  * (the 32-row offset table's window is driver-scale and exempt).
  */
class WindowScaleSpec extends AnyFunSuite with SparkSessionFixture {

  private def t(sf: String) = Tables(spark, s"/root/testdata/$sf")

  test("win_ntile_cume scaled == built-in global window (sf0.01)") {
    val a = Windows.winNtileCume(t("sf0.01")).collect().map(_.toString).toSeq
    val b = Windows.winNtileCumeGlobal(t("sf0.01")).collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("win_range_frame bucketed == built-in global window (sf0.01)") {
    val a = Windows.winRangeFrame(t("sf0.01")).collect().map(_.toString).toSeq
    val b = Windows.winRangeFrameGlobal(t("sf0.01")).collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("topk_group_agg == topk_per_group window form (sf0.01), via a windowless plan") {
    val agg = ops.TopK.topkGroupAgg(t("sf0.01"))
    val win = Windows.topkPerGroup(t("sf0.01"))
    assert(agg.collect().map(_.toString).toSeq ==
      win.collect().map(_.toString).toSeq)
    // the point of the aggregate form: no WindowExec anywhere — rows fold
    // into k-bounded buffers with map-side partial aggregation, so the
    // shuffle carries #groups × k entries, not the table
    val plan = agg.queryExecution.executedPlan
    assert(plan.collect { case w: WindowExec => w }.isEmpty, plan)
    val planStr = plan.toString
    assert(planStr.contains("ObjectHashAggregate"), planStr)
  }

  test("registered plans: no whole-table single-partition WindowExec") {
    // win_range_frame's WindowExec must be partitioned (by the overlap-
    // replicated range pid) — never an empty partition spec over the data;
    // win_ntile_cume may window only over the per-partition count table
    // (partitioned by pid upstream, ≤ 32 rows) — so any empty-partition-
    // spec WindowExec must sit above an aggregate, never over the scan.
    val rangePlan = Windows.winRangeFrame(t("sf0.001")).queryExecution.executedPlan
    assert(rangePlan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }.isEmpty,
      rangePlan)

    val ntilePlan = Windows.winNtileCume(t("sf0.001")).queryExecution.executedPlan
    val unpartitioned = ntilePlan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    unpartitioned.foreach { w =>
      val overAggregate = w.exists {
        case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
        case _ => false
      }
      assert(overAggregate,
        s"global WindowExec must only rank the tiny per-partition count table:\n$w")
    }

    // abc_analysis: rank, cumulative revenue AND grand total all come from
    // globalRankCum's memoized per-range partials — every WindowExec in
    // the plan must be partitioned (by the range pid); an empty partition
    // spec would mean the single-executor cumulative sort came back.
    val abcPlan = ops.Aggregates.abcAnalysis(t("sf0.001"))
      .queryExecution.executedPlan
    assert(abcPlan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }.isEmpty,
      s"abc_analysis regained a single-partition WindowExec:\n$abcPlan")
  }

  test("globalRankCum cum/total equal the single-partition definition (sf0.01)") {
    import org.apache.spark.sql.functions._
    val spend = t("sf0.01").orders
      .groupBy(col("o_custkey").as("k"))
      .agg(sum(expr("CAST(o_totalprice * 100 AS BIGINT)")).as("v"))
    val (ranked, n, tot) = Windows.globalRankCum(spend, "k", "v")
    val got = ranked.select("k", "rk", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val w = org.apache.spark.sql.expressions.Window.orderBy("k")
      .rowsBetween(Long.MinValue, 0)
    val want = spend
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("k")).cast("long"))
      .withColumn("cum", sum("v").over(w))
      .select("k", "rk", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.sameElements(want))
    assert(n == want.length)
    assert(tot == want.map(_._3).max)
  }

  test("globalCums (N columns) equals the single-partition definition (sf0.01)") {
    import org.apache.spark.sql.functions._
    val spend = t("sf0.01").orders
      .groupBy(col("o_custkey").as("k"))
      .agg(
        sum(expr("CAST(o_totalprice * 100 AS BIGINT)")).as("a"),
        count(lit(1)).cast("long").as("b"))
    val got = Windows.globalCums(spend, "k", Seq("a", "b"))
      .select("k", "cum_a", "cum_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val w = org.apache.spark.sql.expressions.Window.orderBy("k")
      .rowsBetween(Long.MinValue, 0)
    val want = spend
      .withColumn("cum_a", sum("a").over(w))
      .withColumn("cum_b", sum("b").over(w))
      .select("k", "cum_a", "cum_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.sameElements(want))
    // and the consumer's plan carries no single-partition WindowExec
    val ksPlan = ops.FeatureStats.statsKsTest(t("sf0.001"))
      .queryExecution.executedPlan
    assert(ksPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }.isEmpty, s"stats_ks_test regained a single-partition WindowExec:\n$ksPlan")
  }

  test("globalCums fails loudly on empty values and NULL partial sums") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((1L, Some(2L)), (2L, None), (3L, Some(5L)))
      .toDF("k", "v")
    intercept[IllegalArgumentException] {
      Windows.globalCums(df, "k", Seq.empty)
    }
    // an all-NULL range partial must error, not silently unbox to 0 and
    // skew every downstream cumulative offset
    val allNull = Seq((1L, Option.empty[Long]), (2L, Option.empty[Long]))
      .toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Windows.globalCums(allNull, "k", Seq("v")).collect()
    }
    assert(e.getMessage.contains("NULL"))
  }
}
