package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{FeatureStore, Prefs, Rollup}

/** Batch-2 properties for the round: incremental rollup (history scanned
  * never, result exact), point-in-time features (one-pass sweep equals the
  * correlated definition, leakage-free), preference pairs, and the
  * schema-evolution read.
  */
class RollupPitSpec extends AnyFunSuite with SparkSessionFixture {

  private val sf = "/root/testdata/sf0.001"
  private def t = Tables(spark, sf)

  test("rollup_incremental equals full recompute and scans events once") {
    val df = Rollup.rollupIncremental(t)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = t.events
      .filter(col("value").isNotNull && col("event_type").isNotNull && col("ts").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(round(col("value") * 100).cast("long")).as("s"))
      .orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.sameElements(want), "merged rollup diverged from full recompute")
    // the plan reads the raw events table exactly once (the block days);
    // history arrives via the materialized partial store only
    // AQE prints Final + Initial sections; count raw-table scans in the
    // final one only. The single scan must carry the pushed split-date
    // filter — history days never leave the parquet reader.
    val plan = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==")(0)
    val scans = "events\\.parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected exactly one raw events scan, found $scans in:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(ts,"),
      s"split-date filter not pushed to the events scan:\n$plan")
    assert(plan.contains("rollup_store"), "partial store not read")
  }

  test("feature_pit_join equals the correlated as-of definition") {
    val got = FeatureStore.featurePitJoin(t).collect()
      .map(r => ((r.getLong(0), r.getDate(1).toString), (r.getLong(2), r.getLong(3))))
      .toMap
    val orders = t.orders.select(col("o_custkey"),
      to_date(col("o_orderdate")).as("d"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2)))
    val custs = t.customer.filter(col("c_custkey") % 13 === 0)
      .select("c_custkey").collect().map(_.getLong(0))
    assert(custs.nonEmpty && got.nonEmpty)
    for (c <- custs; pd <- FeatureStore.ProbeDates) {
      val hist = orders.filter(o => o._1 == c && o._2 <= pd)
      val want = (hist.length.toLong, hist.map(_._3).sum)
      assert(got((c, pd)) == want, s"PIT mismatch for ($c, $pd): ${got((c, pd))} vs $want")
    }
    // every (probe customer × date) present — zero-history rows included
    assert(got.size == custs.length * FeatureStore.ProbeDates.size)
  }

  test("pair_preference emits strict-margin extrema per group") {
    val rows = Prefs.pairPreference(t).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("chosen_ttr") > r.getAs[Long]("rejected_ttr"))
      assert(r.getAs[Long]("margin_milli") ==
        r.getAs[Long]("chosen_ttr") - r.getAs[Long]("rejected_ttr"))
      assert(r.getAs[Long]("chosen_id") != r.getAs[Long]("rejected_id"))
      assert(r.getAs[Long]("n_docs") >= 2)
    }
  }

  test("ts_forecast_linear matches a driver-side OLS recompute") {
    val got = graft.ops.Forecast.tsForecastLinear(t).collect()
    assert(got.nonEmpty)
    val daily = t.events.filter(col("event_type").isNotNull)
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast("date")).as("x"))
      .agg(count(lit(1)).cast("long").as("y"))
      .collect().map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2)))
    daily.groupBy(_._1).foreach { case (et, pts) =>
      val n = pts.length.toLong
      val (sx, sy) = (pts.map(_._2).sum, pts.map(_._3).sum)
      val sxy = pts.map(p => p._2 * p._3).sum
      val sxx = pts.map(p => p._2 * p._2).sum
      val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
      val icept = (sy.toDouble - slope * sx.toDouble) / n.toDouble
      val lastX = pts.map(_._2).max
      val rows = got.filter(_.getString(0) == et)
      assert(rows.length == 7, s"$et: expected 7 forecast rows")
      rows.foreach { r =>
        val x = r.getAs[Long]("x")
        assert(x > lastX && x <= lastX + 7)
        val wantY = BigDecimal(icept + slope * x)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(r.getAs[Double]("yhat") - wantY) < 1e-9,
          s"$et x=$x: ${r.getAs[Double]("yhat")} vs $wantY")
      }
    }
  }

  test("graph_clustering_coeff: coeff = 2·tri / deg·(deg−1), NULL below degree 2") {
    val rows = graft.ops.Graph.graphClusteringCoeff(t).collect()
    assert(rows.nonEmpty)
    assert(rows.exists(r => !r.isNullAt(r.fieldIndex("coeff"))),
      "degenerate fixture: no node reaches degree 2")
    rows.foreach { r =>
      val (deg, tri) = (r.getAs[Long]("degree"), r.getAs[Long]("n_tri"))
      if (deg < 2) {
        assert(r.isNullAt(r.fieldIndex("coeff")))
        assert(tri == 0, "triangle through a node of degree < 2")
      } else {
        val want = BigDecimal(2.0 * tri / (deg * (deg - 1)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getAs[Double]("coeff") == want)
        assert(r.getAs[Double]("coeff") <= 1.0 + 1e-9)
      }
    }
  }

  test("funnel_time_to_convert picks the exact rank-selected percentiles") {
    val rows = graft.ops.Behavior.funnelTimeToConvert(t).collect()
    assert(rows.nonEmpty)
    // driver brute force over the same pairing
    val ev = t.events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val firstClick = ev.filter(_._2 == "click").groupBy(_._1)
      .view.mapValues(_.map(_._3).min).toMap
    val latencies = ev.filter(_._2 == "purchase")
      .flatMap { case (u, _, ts) =>
        firstClick.get(u).filter(ts > _).map(c => (u, c, ts))
      }
      .groupBy { case (u, c, _) => (u, c) }
      .map { case ((u, c), hits) => (u, c, hits.map(_._3).min - c) }
    val byDay = latencies.groupBy { case (_, c, _) =>
      java.time.Instant.ofEpochSecond(c / 1000000)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
    }
    rows.foreach { r =>
      val day = r.getDate(0).toString
      val sorted = byDay(day).toSeq.sortBy { case (u, _, l) => (l, u) }.map(_._3)
      val n = sorted.length
      assert(r.getAs[Long]("n_conv") == n)
      assert(r.getAs[Long]("median_latency_us") == sorted((n + 1) / 2 - 1))
      assert(r.getAs[Long]("p90_latency_us") == sorted((n * 9 + 9) / 10 - 1))
    }
    assert(rows.length == byDay.size)
  }

  test("cohort_ltv cumulative spend is consistent and complete") {
    val rows = graft.ops.Behavior.cohortLtv(t).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Int]("cohort_year")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("age_years"))
      assert(sorted.head.getAs[Int]("age_years") == 0,
        "a cohort must start at age 0 (its own first order)")
      var cum = 0L
      sorted.foreach { r =>
        cum += r.getAs[Long]("spend_cents")
        assert(r.getAs[Long]("cum_spend_cents") == cum)
      }
    }
    // total spend across all cohort cells equals the fact total
    val total = rows.map(_.getAs[Long]("spend_cents")).sum
    val want = t.orders.select(
      round(col("o_totalprice") * 100).cast("long").as("c"))
      .agg(sum("c")).collect()(0).getLong(0)
    assert(total == want, s"cohort cells lost spend: $total vs $want")
  }

  test("dq_freshness lags are anchored at the table high-water mark") {
    val rows = graft.ops.Profile.dqFreshness(t).collect()
    assert(rows.nonEmpty)
    val lags = rows.map(_.getAs[Long]("lag_us"))
    assert(lags.forall(_ >= 0))
    assert(lags.min == 0, "the newest type must lag zero behind itself")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("is_stale") ==
        (r.getAs[Long]("lag_us") > 6L * 3600 * 1000000))
    }
  }

  test("source_schema_evolution surfaces the added column as NULL for gen-1") {
    val df = graft.sources.Layouts.sourceSchemaEvolution(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val nSupp = rows.map(_.getAs[Long]("n_supp")).sum
    val nBal = rows.map(_.getAs[Long]("n_with_bal")).sum
    val total = t.supplier.count()
    val even = t.supplier.filter(col("s_suppkey") % 2 === 0).count()
    assert(nSupp == total, s"union lost rows: $nSupp vs $total")
    assert(nBal == even, s"balance column present on wrong generation: $nBal vs $even")
    assert(nBal < nSupp, "degenerate fixture: no gen-1 rows")
  }
}
