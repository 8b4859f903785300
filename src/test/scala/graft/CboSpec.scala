package graft

import org.scalatest.funsuite.AnyFunSuite

/** Statistics-driven join planning: ANALYZE'd catalog stats +
  * `spark.sql.cbo.*` must actually REBUILD the deliberately pessimal
  * written join order (plan-level pin), while staying value-invisible
  * (shared oracle, re-checked here against join_multiway).
  */
class CboSpec extends AnyFunSuite with SparkSessionFixture {

  private val sf = "/root/testdata/sf0.001"
  private val tables = Seq("customer", "orders", "lineitem", "nation", "region")

  private def leafOrder(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[String] =
    p.collectLeaves().map(_.toString)
      .map(s => tables.find(s.contains).getOrElse("?"))

  test("ANALYZE collects real stats (row counts land in the catalog)") {
    val db = ops.Cbo.statsDb(spark, sf)
    // stats-less file relations estimate from size; ANALYZE records an
    // exact row count in the catalog, which is what the reorder plans from
    val desc = spark.sql(s"DESCRIBE TABLE EXTENDED $db.lineitem").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(desc.exists { case (k, v) => k == "Statistics" && v.contains("rows") },
      s"no row-count statistics in the catalog: ${desc.mkString("; ")}")
  }

  test("the cost-based reorder fires on the pessimal written order") {
    val db = ops.Cbo.statsDb(spark, sf)
    val sqlText = ops.Cbo.cboSql(db)
    // stats-less planning (parent session, cbo off) keeps the written
    // fact-fact-first order
    val off = spark.sql(sqlText).queryExecution.optimizedPlan
    assert(leafOrder(off) == tables,
      s"stats-less plan no longer follows the written order: ${leafOrder(off)}")
    // the CBO session rebuilds the tree from row counts + NDVs
    val on = ops.Cbo.cboSession(spark).sql(sqlText).queryExecution.optimizedPlan
    assert(leafOrder(on) != leafOrder(off),
      s"CBO reorder did not fire (both plans join as ${leafOrder(on)})")
  }

  test("the reorder is value-invisible (same rows as join_multiway)") {
    val got = ops.Cbo.joinMultiwayCbo(spark, sf)
      .collect().map(_.toString).toSeq
    val want = Registry.all("join_multiway")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(got.nonEmpty && got == want)
  }

  test("stale per-stamp stats databases are swept; quoted paths rejected") {
    val db = ops.Cbo.statsDb(spark, sf) // ensure the current stamp's db exists
    val sfTag = ops.Cbo.hash8(sf)
    // plant a sibling db wearing an OLD stamp of the same dataset dir
    val stale = s"graft_cbo_${sfTag}_deadbeef"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $stale")
    ops.Cbo.sweepStaleDbs(spark, sfTag, keep = db)
    val dbs = spark.catalog.listDatabases().collect().map(_.name).toSet
    assert(!dbs.contains(stale), "stale per-stamp stats db survived the sweep")
    assert(dbs.contains(db), "the sweep must keep the CURRENT stamp's db")
    // another dataset's dbs are out of scope: a different sfTag prefix
    val other = "graft_cbo_ffffffff_aaaaaaaa"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $other")
    ops.Cbo.sweepStaleDbs(spark, sfTag, keep = db)
    val dbs2 = spark.catalog.listDatabases().collect().map(_.name).toSet
    assert(dbs2.contains(other), "sweep crossed into another dataset's dbs")
    spark.sql(s"DROP DATABASE IF EXISTS $other CASCADE")
    // a path with a single quote would break out of the LOCATION literal
    val e = intercept[IllegalArgumentException] {
      ops.Cbo.statsDb(spark, "/tmp/it's-a-trap")
    }
    assert(e.getMessage.contains("single quote"))
  }
}
