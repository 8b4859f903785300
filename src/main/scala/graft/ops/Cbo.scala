package graft.ops

import scala.collection.concurrent.TrieMap

import org.apache.spark.SparkContext
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Statistics-driven join planning (CBO) demonstrated end-to-end: the
  * engine registers the driver parquet as EXTERNAL catalog tables (no
  * data copy), runs `ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL
  * COLUMNS` once per dataset, and executes a deliberately badly-ordered
  * multiway join under `spark.sql.cbo.enabled` +
  * `spark.sql.cbo.joinReorder.enabled` — Catalyst's cost-based reorder
  * then rebuilds the join tree from the collected row counts and column
  * NDVs instead of trusting the written order.
  *
  * Why this matters at 100 TB: every other join in this engine either
  * broadcasts an OBVIOUSLY small side or shuffles on the written order —
  * fine when the author knows the sizes. With hundreds of tables whose
  * sizes shift daily, the written order is wrong somewhere, and a
  * fact-fact-first join that should have been dim-first is the
  * difference between a plan that runs and one that doesn't. ANALYZE is
  * a once-per-snapshot scan (the same class of maintenance as
  * compaction), after which every query on the table plans from real
  * statistics. CboSpec pins that the reorder actually FIRED (the
  * optimized join tree differs from the stats-less plan and from the
  * written order); the DuckDB oracle pins that it is value-invisible.
  *
  * The session clone ([[graft.util.Sessions]] memo) isolates the CBO
  * confs; the catalog (SharedState) is deliberately shared so the
  * analyzed tables and their stats are visible to it. The db memo is
  * keyed by the SparkContext object itself (never an identity-hash
  * string — reusable after GC), with stopped-context entries swept on
  * access.
  */
object Cbo {

  /** Tables the CBO query touches — the TPC-H star around lineitem. */
  private val CboTables = Seq("customer", "orders", "lineitem", "nation", "region")

  private val dbMemo =
    new java.util.HashMap[SparkContext, TrieMap[String, String]]()

  /** One-time per (context, dataset): external-table registration +
    * ANALYZE. Returns the database name holding the analyzed tables.
    * The ANALYZE pass scans each table once (table-level row count +
    * per-column min/max/NDV/null counts) — the once-per-snapshot cost a
    * deployment pays to make every later plan statistics-driven.
    */
  private[graft] def statsDb(spark: SparkSession, sfDir: String): String = {
    val perCtx = dbMemo.synchronized {
      dbMemo.entrySet().removeIf(e => e.getKey.isStopped)
      var m = dbMemo.get(spark.sparkContext)
      if (m == null) {
        m = TrieMap.empty[String, String]
        dbMemo.put(spark.sparkContext, m)
      }
      m
    }
    val stamp = graft.util.DatasetStamp.stamp(sfDir, "orders")
    perCtx.getOrElseUpdate(s"$sfDir:$stamp", {
      val db = "graft_cbo_" +
        java.lang.Long.toHexString(
          java.util.UUID.nameUUIDFromBytes(s"$sfDir:$stamp".getBytes("UTF-8"))
            .getMostSignificantBits).take(12)
      spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
      CboTables.foreach { t =>
        spark.sql(
          s"CREATE TABLE IF NOT EXISTS $db.$t USING parquet LOCATION '$sfDir/$t.parquet'")
        spark.sql(s"ANALYZE TABLE $db.$t COMPUTE STATISTICS FOR ALL COLUMNS")
      }
      db
    })
  }

  /** Session clone with cost-based optimization on ([[graft.util.Sessions]]
    * memo). Clones share the SparkContext and catalog (where the stats
    * live) but keep their own SQLConf, so CBO stays invisible to every
    * other query in the JVM.
    */
  private[graft] def cboSession(spark: SparkSession): SparkSession =
    graft.util.Sessions.forContext(spark, "cbo") { ss =>
      ss.conf.set("spark.sql.cbo.enabled", "true")
      ss.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      ss.conf.set("spark.sql.session.timeZone", "UTC")
    }

  /** The multiway join written in a deliberately PESSIMAL order — fact ⋈
    * fact first (customer⋈orders⋈lineitem builds the full 600k-row
    * join before any dimension filter bites), dims last, no broadcast
    * hints, region's ASIA filter at the very end. Exactly the shape a
    * naive author writes; the reorder must fix it from statistics.
    * Identical SELECT list / expression tree to `join_multiway`'s SQL
    * form, so the two share one oracle.
    */
  private[graft] def cboSql(db: String): String =
    s"""SELECT n.n_name, COUNT(*) AS cnt,
       |       CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
       |FROM $db.customer c
       |JOIN $db.orders o ON c.c_custkey = o.o_custkey
       |JOIN $db.lineitem l ON l.l_orderkey = o.o_orderkey
       |JOIN $db.nation n ON c.c_nationkey = n.n_nationkey
       |JOIN $db.region r ON n.n_regionkey = r.r_regionkey
       |WHERE r.r_name = 'ASIA'
       |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin

  /** `join_multiway` under statistics-driven planning — same answer,
    * different (better) join tree. Shares join_multiway's oracle.
    */
  def joinMultiwayCbo(spark: SparkSession, sfDir: String): DataFrame = {
    val db = statsDb(spark, sfDir)
    cboSession(spark).sql(cboSql(db))
  }
}
