package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** COLUMN-LEVEL CBO statistics from the manifest alone (round 16): each
  * data file records per-column null counts and a 128-register HLL NDV
  * sketch; the scan unions them over exactly the planned files and
  * surfaces (distinctCount, nullCount, min, max) through DSv2 column
  * statistics. Pins:
  *
  *   - the optimizer's per-attribute stats carry sane values (NDV
  *     within HLL error, exact null counts, exact integral min/max)
  *     with NO external ANALYZE;
  *   - Spark's cost-based join REORDER fires on manifest tables from
  *     the reported stats alone — and provably from them (suppressing
  *     the scan's stats suppresses the reorder).
  */
class ManifestCboSpec extends AnyFunSuite with SparkSessionFixture {

  import spark.implicits._

  private val Fmt = "graft.sources.ManifestTable"

  private def freshDir(): String =
    Files.createTempDirectory("graft_cbo").toString

  private def read(dir: String, reportStats: Boolean = true): DataFrame = {
    val r = spark.read.format(Fmt).option("path", dir)
    (if (reportStats) r else r.option("reportStats", "false")).load()
  }

  test("per-column statistics reach the optimizer without ANALYZE") {
    val dir = freshDir()
    spark.range(0, 10000).select(
      col("id"),
      (col("id") % 100).as("k"),
      when(col("id") % 4 === 0, lit(null).cast("long"))
        .otherwise(col("id") * 2).as("v"),
      concat(lit("s"), col("id") % 37).as("s"))
      .coalesce(4)
      .write.format(Fmt).option("path", dir).mode("append").save()
    val stats = read(dir).queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(10000)))
    val byName = stats.attributeStats.map { case (a, cs) => a.name -> cs }
    def ndvOf(c: String): BigInt = byName(c).distinctCount.get
    // HLL-128 ≈ 9% standard error — accept 30%
    assert((ndvOf("id") - 10000).abs <= 3000, s"id ndv ${ndvOf("id")}")
    assert((ndvOf("k") - 100).abs <= 30, s"k ndv ${ndvOf("k")}")
    assert((ndvOf("s") - 37).abs <= 12, s"s ndv ${ndvOf("s")}")
    assert(byName("v").nullCount.contains(BigInt(2500)), "exact null count")
    assert(byName("k").nullCount.contains(BigInt(0)))
    assert(byName("id").min.contains(0L) && byName("id").max.contains(9999L))
    assert(byName("k").min.contains(0L) && byName("k").max.contains(99L))
    // suppressed stats leave the optimizer blind (the control)
    assert(read(dir, reportStats = false)
      .queryExecution.optimizedPlan.stats.rowCount.isEmpty)
  }

  test("CBO join reorder fires on manifest tables from reported stats alone") {
    val factDir = freshDir()
    val bigDir = freshDir()
    val smallDir = freshDir()
    spark.range(0, 50000).select(
      col("id").as("f_id"),
      (col("id") % 1000).as("k1"),
      (col("id") % 10).as("k2"))
      .coalesce(2).write.format(Fmt).option("path", factDir)
      .mode("append").save()
    spark.range(0, 1000).select(col("id").as("bk"),
      concat(lit("b"), col("id")).as("bval"))
      .coalesce(1).write.format(Fmt).option("path", bigDir)
      .mode("append").save()
    spark.range(0, 10).select(col("id").as("sk"),
      concat(lit("s"), col("id")).as("sval"))
      .coalesce(1).write.format(Fmt).option("path", smallDir)
      .mode("append").save()

    def query(reportStats: Boolean) =
      read(factDir, reportStats)
        .join(read(bigDir, reportStats), col("k1") === col("bk"))
        .join(read(smallDir, reportStats).where(col("sk") < 2),
          col("k2") === col("sk"))
        .groupBy("bval").agg(count(lit(1)))

    // the bottom (first-executed) join's non-fact side: reorder moves
    // the FILTERED TINY dim under the fact first, though the query
    // wrote the big dim first
    def bottomJoinRefs(p: LogicalPlan): Set[String] = {
      val joins = p.collect { case j: Join => j }
      joins.last.right.output.map(_.name).toSet
    }
    withSQLConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val reordered = bottomJoinRefs(query(reportStats = true)
        .queryExecution.optimizedPlan)
      assert(reordered.contains("sk") && !reordered.contains("bk"),
        s"CBO must join the filtered tiny dim first, bottom join = $reordered")
      // the control: identical query, stats suppressed — no rowCounts,
      // reorder cannot fire, the written order survives
      val blind = bottomJoinRefs(query(reportStats = false)
        .queryExecution.optimizedPlan)
      assert(blind.contains("bk"),
        s"without reported stats the written order must survive, got $blind")
    }
    // values are order-independent (sanity)
    val r = query(reportStats = true).collect()
    // k2 = k1 % 10, so sk < 2 keeps exactly the 200 k1 groups with
    // k1 % 10 < 2, 50 fact rows each
    assert(r.length == 200 && r.map(_.getLong(1)).sum == 10000L)
  }

  private def withSQLConf[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
