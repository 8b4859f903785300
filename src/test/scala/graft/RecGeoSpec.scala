package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Encode, Geo, Rec, Sampling}

/** Properties for the round's new operator families: co-occurrence
  * recommendations, grid-blocked spatial join, DPP star join, LOO target
  * encoding, and contrastive negative sampling. Each blocked/broadcast
  * formulation is pinned against the brute-force DEFINITION at sf0.001 —
  * the candidate-completeness claims are theorems about the blocking, so
  * equality on one dataset plus the structural assertions is a real gate.
  */
class RecGeoSpec extends AnyFunSuite with SparkSessionFixture {

  private val sf = "/root/testdata/sf0.001"
  private def t = Tables(spark, sf)

  test("rec_item_cooccur equals the driver brute-force definition") {
    val got = Rec.recItemCooccur(t).collect()
    assert(got.nonEmpty, "no recommendations at sf0.001")
    // brute force: baskets → directed pair counts → lift → top-3
    val baskets = t.lineitem.select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = baskets.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nOrders = byOrder.size.toLong
    val itemN = baskets.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairCounts = collection.mutable.Map.empty[(Long, Long), Long]
    byOrder.values.foreach { items =>
      for (a <- items if a % 7 == 0; b <- items if b != a)
        pairCounts((a, b)) = pairCounts.getOrElse((a, b), 0L) + 1
    }
    val want = pairCounts.toSeq
      .filter(_._2 >= 3)
      .map { case ((a, b), nab) =>
        (a, b, nab, nab.toDouble * nOrders / (itemN(a) * itemN(b)))
      }
      .groupBy(_._1)
      .flatMap { case (_, cands) =>
        cands.sortBy { case (_, b, _, lift) => (-lift, b) }.take(3).zipWithIndex
          .map { case ((a, b, nab, lift), i) => (a, b, nab, lift, i + 1) }
      }.toSet
    val gotSet = got.map(r =>
      (r.getAs[Long]("item_a"), r.getAs[Long]("item_b"), r.getAs[Long]("n_ab"),
        r.getAs[Double]("lift"), r.getAs[Int]("rank"))).toSet
    val wantRounded = want.map { case (a, b, nab, lift, rk) =>
      (a, b, nab, BigDecimal(lift).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble, rk)
    }
    assert(gotSet == wantRounded,
      s"diff: ${(gotSet diff wantRounded).take(3)} / ${(wantRounded diff gotSet).take(3)}")
  }

  test("geo_grid_join equals the quadratic definition (grid is candidate-complete)") {
    val got = Geo.geoGridJoin(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force over the same deterministic coordinates
    val fold = graft.util.HexFold.u32(col("h"))
    def coords(tag: String) = t.customer
      .select(col("c_custkey"),
        md5(concat(lit(tag), col("c_custkey").cast("string")).cast("binary")).as("h"))
      .select(col("c_custkey"), fold.as("f"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val lat = coords("lat:").view.mapValues(f => f % 180000000L - 90000000L).toMap
    val lon = coords("lon:").view.mapValues(f => f % 360000000L - 180000000L).toMap
    val keys = lat.keys.toSeq.sorted
    val want = (for {
      a <- keys; b <- keys if a < b
      dlat = lat(a) - lat(b); dlon = lon(a) - lon(b)
      d2 = dlat * dlat + dlon * dlon if d2 <= 25000000000000L
    } yield (a, b, d2)).toSet
    assert(want.nonEmpty, "degenerate fixture: no pairs within radius")
    assert(got == want, s"grid join missed/invented pairs: got ${got.size}, want ${want.size}")
  }

  test("join_dpp prunes fact partitions at runtime via dynamicpruning") {
    val df = graft.sources.Layouts.joinDpp(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty, "DPP join produced no rows")
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("dynamicpruning"),
      s"fact scan carries no dynamic partition filter:\n$plan")
  }

  test("feature_target_encoding is leave-one-out exact") {
    val got = Encode.targetEncoding(t).collect()
    assert(got.nonEmpty)
    val all = t.orders.select(col("o_orderkey"), col("o_orderpriority"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byCat = all.groupBy(_._2)
    got.foreach { r =>
      val (key, cat, cents) = (r.getAs[Long]("o_orderkey"),
        r.getAs[String]("o_orderpriority"), r.getAs[Long]("cents"))
      val others = byCat(cat).filter(_._1 != key)
      // probe rows have unique keys, so "other rows" = category minus self
      val want = BigDecimal(others.map(_._3).sum.toDouble / others.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("loo_enc") - want) < 1e-9,
        s"order $key: got ${r.getAs[Double]("loo_enc")}, want $want")
    }
  }

  test("sample_negatives: pool-gated, cross-source, deterministic") {
    val a = Sampling.sampleNegatives(t).collect()
    val b = Sampling.sampleNegatives(t).collect()
    assert(a.nonEmpty && a.sameElements(b), "non-deterministic negatives")
    val srcOf = t.documents.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    a.foreach { r =>
      val (probe, neg) = (r.getAs[Long]("doc_id"), r.getAs[Long]("neg_id"))
      assert(probe % 7 == 0 && neg != probe)
      assert(srcOf(neg) != srcOf(probe), s"same-source negative $neg for $probe")
      assert(r.getAs[Int]("rank") >= 1 && r.getAs[Int]("rank") <= 3)
    }
    // recompute the fixed-size pool independently, then pin the EXACT
    // per-probe yield: min(3, eligible candidates) — a sampler that
    // under-produces (over-aggressive filter, window bug) fails here
    val pool = t.documents
      .select(col("doc_id"), col("source"),
        graft.util.HexFold.u32(md5(concat(lit("pool:"),
          col("doc_id").cast("string")).cast("binary"))).as("pg"))
      .orderBy(col("pg").asc, col("doc_id").asc)
      .limit(Sampling.NegativePoolSize)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val negIds = a.map(_.getAs[Long]("neg_id")).toSet
    assert(negIds.subsetOf(pool.map(_._1).toSet),
      "a negative came from outside the fixed pool")
    val perProbe = a.groupBy(_.getAs[Long]("doc_id")).view.mapValues(_.length).toMap
    val probes = t.documents.filter(col("doc_id") % 7 === 0)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    probes.foreach { case (p, src) =>
      val eligible = pool.count { case (id, s) => id != p && s != src }
      assert(perProbe.getOrElse(p, 0) == math.min(3, eligible),
        s"probe $p: got ${perProbe.getOrElse(p, 0)}, eligible $eligible")
    }
  }
}
