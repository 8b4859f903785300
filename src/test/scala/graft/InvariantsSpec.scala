package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Aggregates, Relational, Temporal, Text, TextAnalysis}

/** Cross-operator invariants (SURVEY.md §5.2): algebraic relationships
  * that must hold between operators regardless of data — a second,
  * independent correctness net beside the DuckDB oracle.
  */
class InvariantsSpec extends AnyFunSuite with SparkSessionFixture {

  private lazy val t = Tables(spark, "/root/testdata/sf0.001")

  test("dedup_keep_latest is idempotent") {
    val once = Temporal.dedupKeepLatest(t)
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts").desc, col("event_id").desc)
    val twice = once
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"),
        row_number().over(w).as("rn"))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id", "ts")
      .orderBy("user_id", "event_type")
    assert(once.collect().map(_.toString).toSeq == twice.collect().map(_.toString).toSeq)
  }

  test("as-of join never matches a future signup") {
    val p = t.events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts").as("p_ts"))
    val violations = Temporal.joinAsof(t)
      .join(p, "event_id")
      .filter(col("s_ts") > col("p_ts"))
      .count()
    assert(violations == 0)
  }

  test("interval join matches lie strictly inside (0, 30min]") {
    val ev = t.events.select(col("event_id"), col("ts"))
    val bad = Temporal.joinInterval(t)
      .join(ev.withColumnRenamed("event_id", "click_id").withColumnRenamed("ts", "c_ts"), "click_id")
      .join(ev.withColumnRenamed("event_id", "purchase_id").withColumnRenamed("ts", "p_ts"), "purchase_id")
      .filter(col("p_ts") <= col("c_ts") ||
        col("p_ts") > col("c_ts") + expr("INTERVAL '30' MINUTE"))
      .count()
    assert(bad == 0)
  }

  test("jaccard similarity bounded in [0,1]") {
    assert(Text.simJaccard(t).filter(col("jac") < 0 || col("jac") > 1).count() == 0)
    assert(TextAnalysis.simShingle(t).filter(col("jac") < 0 || col("jac") > 1).count() == 0)
  }

  test("union_all count additivity") {
    val n = Relational.setUnionAll(t).count()
    val c = t.customer.filter(col("c_nationkey") === 1).count()
    val s = t.supplier.filter(col("s_nationkey") === 1).count()
    assert(n == c + s)
  }

  test("tumbling windows partition the event stream exactly") {
    val agg = Temporal.streamTumbling(t)
    assert(agg.agg(sum("cnt")).head.getLong(0) == t.events.count())
    // sv leaves the engine as DOUBLE (output-typing rule); per-window sums
    // are exact decimals cast at the end, so the float re-sum is compared
    // with a relative tolerance.
    val svTotal = agg.agg(sum("sv")).head.getDouble(0)
    val direct = t.events
      .agg(sum(col("value").cast(DecimalType(18, 2))).cast("double")).head.getDouble(0)
    assert(math.abs(svTotal - direct) <= 1e-9 * math.abs(direct))
  }

  test("sliding windows cover each event exactly 4 times") {
    // 1-hour window sliding every 15 min → every event lands in 4 windows.
    val total = Temporal.streamSliding(t).agg(sum("cnt")).head.getLong(0)
    assert(total == 4 * t.events.count())
  }

  test("session windows partition each user's events exactly") {
    assert(Temporal.streamSession(t).agg(sum("cnt")).head.getLong(0) == t.events.count())
  }

  test("grouping-sets grand total equals table count") {
    val gs = ops.Aggregates.aggGroupingSets(t)
    val grand = gs.filter(col("l_returnflag").isNull && col("l_linestatus").isNull)
      .select("cnt").head.getLong(0)
    assert(grand == t.lineitem.count())
  }

  test("window running-sum final value equals the group sum") {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lastRun = t.orders
      .select(col("o_custkey"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w).as("run"))
      .groupBy("o_custkey").agg(max("run").as("final_run"))
    val grp = t.orders.groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("total"))
    val bad = lastRun.join(grp, "o_custkey")
      .filter(col("final_run") =!= col("total")).count()
    assert(bad == 0)
  }

  test("ts_interpolate: observed hours exact, gaps strictly between neighbors, edges carried") {
    import graft.ops.Reshape
    val rows = Reshape.tsInterpolate(t).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_._1)
    byUser.values.foreach { us =>
      val sorted = us.sortBy(_._2.getTime)
      // edges: the grid starts and ends at observed hours by construction
      assert(sorted.head._4 && sorted.last._4)
      // every interpolated value lies within [min, max] of its user's
      // observed values (convexity of linear interpolation + edge carry)
      val obs = sorted.filter(_._4).map(_._3)
      val (lo, hi) = (obs.min, obs.max)
      sorted.filterNot(_._4).foreach { case (_, _, v, _) =>
        assert(v >= lo - 1e-9 && v <= hi + 1e-9)
      }
    }
    val gaps = rows.count(!_._4)
    info(s"grid rows: ${rows.length}, interpolated gaps: $gaps")
    assert(gaps > 0, "fixture must contain hour gaps or the op proves nothing")
  }

  test("win_rolling_corr: bounded in [-1,1], and 10-row frames match aggCorr's formula") {
    import graft.ops.Windows
    val rows = Windows.winRollingCorr(t).collect()
      .map(r => (r.getLong(3), if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    assert(rows.nonEmpty)
    rows.foreach { case (_, c) =>
      c.foreach(v => assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9, s"corr out of range: $v")) }
    // degenerate single-row frames are NULL (zero variance), full frames mostly defined
    val firstRows = rows.filter(_._1 == 1L)
    assert(firstRows.forall(_._2.isEmpty), "n=1 frames must yield NULL correlation")
    assert(rows.exists(r => r._1 == 10L && r._2.isDefined))
  }

  test("skew/kurt are anchor-invariant and match a driver-side recompute") {
    // Central moments are shift-invariant: any anchor must give the same
    // rounded answer (the anchor exists only for 2^53 magnitude headroom).
    def rows(anchor: Int): Seq[(String, Long, Double, Double)] =
      Aggregates.aggSkewKurt(t, anchor).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    val a = rows(245)
    assert(a == rows(0) && a == rows(100))
    // Independent recompute: driver-side two-pass central moments over
    // the same integer-dollar quantization.
    val vals = t.events
      .filter(col("value").isNotNull && col("event_type").isNotNull)
      .select(col("event_type"), round(col("value")).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2.toDouble)).toMap
    a.foreach { case (typ, n, skew, kurt) =>
      val xs = vals(typ)
      assert(n == xs.length)
      val mean = xs.sum / n
      def cm(p: Int) = xs.map(x => math.pow(x - mean, p)).sum / n
      val (m2, m3, m4) = (cm(2), cm(3), cm(4))
      assert(math.abs(skew - m3 / math.pow(m2, 1.5)) < 1e-4, s"skew($typ)")
      assert(math.abs(kurt - (m4 / (m2 * m2) - 3)) < 1e-4, s"kurt($typ)")
    }
  }

  test("dq_check: every rule checks all rows; failure path is non-vacuous") {
    val rows = ops.Profile.dqCheck(t)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val n = t.orders.count()
    assert(rows.map(_._1).sorted == Seq("domain:o_orderstatus",
      "not_null:o_custkey", "range:o_orderdate", "range:o_totalprice",
      "unique:o_orderkey").sorted)
    rows.foreach { case (rule, checked, failed) =>
      assert(checked == n, rule)
      assert(failed >= 0 && failed <= checked, rule)
    }
    val byRule = rows.map(r => r._1 -> r._3).toMap
    // the synthetic feed is clean on keys but trips the range rules —
    // a gate whose every rule passes verifies nothing about failures
    assert(byRule("not_null:o_custkey") == 0)
    assert(byRule("unique:o_orderkey") == 0)
    assert(byRule("domain:o_orderstatus") == 0)
    assert(byRule("range:o_totalprice") > 0)
    assert(byRule("range:o_orderdate") > 0)
  }

  test("snapshot_diff: change counts match the derived-v2 construction exactly") {
    val rows = ops.Merge.snapshotDiff(t)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val keys = t.orders.select("o_orderkey").collect().map(_.getLong(0)).toSeq
    assert(rows.count(_._2 == "delete") == keys.count(_ % 11 == 0))
    assert(rows.count(_._2 == "insert") == keys.count(_ % 13 == 0))
    assert(rows.count(_._2 == "update") == keys.count(k => k % 7 == 0 && k % 11 != 0))
    // all three change paths are non-vacuous on this feed
    assert(Set("insert", "update", "delete").forall(c => rows.exists(_._2 == c)))
    // a key appears at most once per change type (1:1 keyed join)
    assert(rows.distinct.size == rows.size)
  }

  test("seq_pattern: counts match a driver-side rescan of each user's sequence") {
    val got = ops.Behavior.seqPattern(t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val seqs = t.events
      .filter(col("user_id").isNotNull && col("event_type").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")),
        col("event_id"), substring(col("event_type"), 1, 1))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .groupBy(_._1).view
      .mapValues(_.map(_._2).sortBy(e => (e._1, e._2)).map(_._3).mkString).toMap
    assert(got.nonEmpty)
    got.foreach { case (uid, nEv, nFunnel) =>
      val s = seqs(uid)
      assert(nEv == s.length, s"n_ev($uid)")
      assert(nFunnel == "cv*p".r.findAllIn(s).size, s"n_funnel($uid)")
    }
    // the funnel fires somewhere, else the pattern path is untested
    assert(got.exists(_._3 > 0))
  }

  test("text_pii_scrub: every row has planted hits, and no PII survives the scrub") {
    val rows = ops.Text.textPiiScrub(t)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (text, nEmail, nPhone) =>
      assert(nEmail >= 1 && nPhone >= 1)
      assert(text.contains("<EMAIL>") && text.contains("<PHONE>"))
      assert(!text.contains("@example.com"))
      assert(!text.contains("555 0100"))
    }
  }

  test("agg_bitmap_distinct: bitmap path equals direct COUNT DISTINCT") {
    val viaBitmap = graft.ops.Audience.aggBitmapDistinct(t)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = t.events.filter(col("user_id").isNotNull && col("ts").isNotNull)
    val direct = ev
      .groupBy(col("ts").cast("date").cast("string").as("day"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = ev.select(countDistinct(col("user_id"))).head().getLong(0)
    assert(viaBitmap == direct + ("ALL" -> total))
  }

  test("agg_salted_twolevel: identical for any bucket count (physical rewrite)") {
    val base = graft.ops.Skew.aggSaltedTwolevel(t, 1).collect().map(_.toString).toSeq
    Seq(4, 64).foreach { b =>
      assert(graft.ops.Skew.aggSaltedTwolevel(t, b)
        .collect().map(_.toString).toSeq == base)
    }
  }

  test("segment_overlap: intersections bounded by margins, jaccard in (0,1]") {
    graft.ops.Audience.segmentOverlap(t).collect().foreach { r =>
      val (nA, nB, nBoth) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val j = r.getDouble(5)
      assert(nBoth <= math.min(nA, nB) && nBoth >= 0)
      assert(j > 0 == nBoth > 0 && j <= 1.0)
    }
  }

  test("basket_assoc: lift consistent with its margin/joint counts") {
    val nOrders = t.lineitem.select(countDistinct(col("l_orderkey"))).head().getLong(0)
    val rows = graft.ops.Assoc.basketAssoc(t, minPairs = 1).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nA, nB, nAb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nAb <= math.min(nA, nB))
      val lift = r.getDouble(8)
      val expect = nAb.toDouble * nOrders / (nA.toDouble * nB)
      assert(math.abs(lift - expect) < 1e-6)
    }
  }

  test("agg_bootstrap_ci: proper intervals that cover the observed mean") {
    graft.ops.FeatureStats.aggBootstrapCi(t).collect().foreach { r =>
      val (n, mean, lo, hi) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(n > 0 && lo < hi)
      // 95% CI from 50 replicates over a ~400-row type covers the point
      // estimate on this data by a wide margin (widths are ~±5% of mean)
      assert(lo <= mean && mean <= hi)
    }
  }

  test("stats_ks_test: D matches a driver-side recompute of the EDF supremum") {
    val r = graft.ops.FeatureStats.statsKsTest(t).head()
    val (n1, n2, dNum) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val docs = t.documents.filter(col("n_chars").isNotNull)
      .select(col("n_chars"), col("lang")).collect()
      .map(x => (x.getLong(0), x.getString(1) == "en"))
    assert(n1 == docs.count(_._2) && n2 == docs.count(!_._2))
    val support = docs.map(_._1).distinct.sorted
    val best = support.map { v =>
      val f1 = docs.count(d => d._2 && d._1 <= v).toLong
      val f2 = docs.count(d => !d._2 && d._1 <= v).toLong
      math.abs(f1 * n2 - f2 * n1)
    }.max
    assert(dNum == best)
  }

  test("dq_kanonymity: flags match the counts and fire non-vacuously") {
    val rows = ops.Profile.dqKAnonymity(t).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    // at sf0.001 (150 customers over ~125 quasi-id classes) small AND
    // single-bucket classes must both exist — the audit is not vacuous
    assert(rows.exists(_._3), "no k-violation found")
    assert(rows.exists(_._4), "no l-violation found")
    rows.foreach { case (size, ld, kv, lv) =>
      assert(ld >= 1L && ld <= size)
      assert(kv == (size < 10L) && lv == (ld < 2L))
    }
  }
}
