package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSv2 statistics reported from the engine's own sources — the feature
  * that lets the optimizer BROADCAST a manifest-side dimension without a
  * hint. A stats-less DSv2 relation defaults to
  * `spark.sql.defaultSizeInBytes` (huge), so every join against it
  * becomes a full shuffle; the manifest records per-file row counts and
  * byte sizes at commit time, and [[graft.sources.ManifestScan]] sums
  * them POST zone-map skipping.
  *
  * Plan assertions use `queryExecution.sparkPlan` (the cost-based
  * physical plan BEFORE adaptive re-planning), so they observe the
  * statistics-driven choice itself, not an AQE runtime rescue.
  */
class ManifestStatsSpec extends AnyFunSuite with SparkSessionFixture {

  import spark.implicits._

  private val Fmt = "graft.sources.ManifestTable"

  private def freshDir(): String =
    Files.createTempDirectory("graft_manifest_stats").toString

  private def planOf(df: DataFrame): SparkPlan = df.queryExecution.sparkPlan

  private def hasNode(p: SparkPlan, name: String): Boolean =
    p.toString.contains(name)

  /** The broadcast assertions depend on the session's join confs; the
    * fixture session is SHARED across the whole suite run and other
    * specs legitimately flip these mid-run — pin them for the duration
    * so this spec's plan shapes are its own.
    */
  private def withJoinDefaults[A](body: => A): A = {
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "10485760",
      "spark.sql.join.preferSortMergeJoin" -> "true")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** A fact side big enough that Spark would never broadcast IT
    * (spark.range reports 8 B/row — 4M rows ≈ 32 MB > the 10 MB
    * threshold), planned but never executed: plan-shape tests are free.
    */
  private def bigFact: DataFrame =
    spark.range(0, 4L * 1000 * 1000).select(
      (col("id") % 1000).as("k"), col("id").as("payload"))

  test("manifest dim with reported stats broadcasts without a hint") { withJoinDefaults {
    val dir = freshDir()
    spark.range(0, 1000).select(col("id").as("k"), (col("id") % 7).as("v"))
      .coalesce(2)
      .write.format(Fmt).option("path", dir).mode("append").save()

    val dim = spark.read.format(Fmt).option("path", dir).load()
    val joined = bigFact.join(dim, "k")
    val plan = planOf(joined)
    assert(hasNode(plan, "BroadcastHashJoin"),
      s"expected a statistics-driven broadcast, got:\n$plan")
    assert(!hasNode(plan, "SortMergeJoin"))
  } }

  test("control: stats suppressed -> defaultSizeInBytes -> no broadcast") { withJoinDefaults {
    val dir = freshDir()
    spark.range(0, 1000).select(col("id").as("k"), (col("id") % 7).as("v"))
      .coalesce(2)
      .write.format(Fmt).option("path", dir).mode("append").save()

    val dim = spark.read.format(Fmt).option("path", dir)
      .option("reportStats", "false").load()
    val plan = planOf(bigFact.join(dim, "k"))
    assert(hasNode(plan, "SortMergeJoin"),
      s"stats-less control should shuffle, got:\n$plan")
    assert(!hasNode(plan, "BroadcastHashJoin"))
  } }

  test("reported stats are exact and shrink with zone-map skipping") {
    val dir = freshDir()
    // DETERMINISTIC file boundaries: eight separate 1000-row appends
    // (range sampling would make the per-file id spans run-dependent)
    (0 until 8).foreach { i =>
      spark.range(i * 1000L, (i + 1) * 1000L)
        .select(col("id"), (col("id") % 7).as("v")).coalesce(1)
        .write.format(Fmt).option("path", dir).mode("append").save()
    }

    def relationStats(df: DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.computeStats()
      }.head

    val full = spark.read.format(Fmt).option("path", dir).load()
    val fullStats = relationStats(full)
    assert(fullStats.rowCount.contains(BigInt(8000)),
      s"row count should come from the manifest, got $fullStats")
    val fullBytes = fullStats.sizeInBytes

    // a 1/8-range predicate prunes 7 of 8 files at PLAN time, and the
    // reported statistics must describe the one survivor, not the table
    val slice = full.filter(col("id") >= 2000L && col("id") < 3000L)
    val sliceStats = relationStats(slice)
    assert(sliceStats.rowCount.contains(BigInt(1000)),
      s"post-skip row count should be the surviving file's, got $sliceStats")
    assert(sliceStats.sizeInBytes * 4 < fullBytes,
      s"post-skip bytes ($sliceStats) should be far below the table's ($fullBytes)")
  }

  test("legacy stat-less manifest lines fall back to on-disk size") {
    val dir = freshDir()
    spark.range(0, 100).select(col("id"), (col("id") % 3).as("v"))
      .coalesce(1)
      .write.format(Fmt).option("path", dir).mode("append").save()
    // strip the #rows entry from every line, simulating a pre-stats
    // manifest written by an older engine build
    val d = java.nio.file.Paths.get(dir)
    val mf = d.resolve("manifest-1.json")
    val lines = Files.readAllLines(mf)
    val legacy = new java.util.ArrayList[String]()
    lines.forEach { l =>
      legacy.add(l.replaceAll(";?#rows=\\d+:\\d+", ""))
    }
    Files.write(mf, legacy)

    val df = spark.read.format(Fmt).option("path", dir).load()
    val stats = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.computeStats()
    }.head
    // rows unknown (no manifest stat), but bytes come from the file
    assert(stats.rowCount.isEmpty)
    assert(stats.sizeInBytes > 0 &&
      stats.sizeInBytes < BigInt(Long.MaxValue) / 2,
      s"expected on-disk fallback size, got ${stats.sizeInBytes}")
    assert(df.count() == 100L) // reading still works
  }

  test("aggregate pushdown: count/min/max answered from the manifest, zero files read") {
    val dir = freshDir()
    Seq[(java.lang.Long, Long, String)]((5L, 50L, "a"), (1L, 10L, "b"), (null, 99L, "c"))
      .toDF("k", "v", "s").coalesce(1)
      .write.format(Fmt).option("path", dir).mode("append").save()
    Seq[(java.lang.Long, Long, String)]((9L, 90L, "d"))
      .toDF("k", "v", "s")
      .write.format(Fmt).option("path", dir).mode("append").save()

    val t = spark.read.format(Fmt).option("path", dir).load()
    val agg = t.agg(
      expr("count(*)").as("n"), expr("min(k)").as("mn"),
      expr("max(k)").as("mx"), expr("max(v)").as("mv"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("graft-manifest-agg"),
      s"expected the manifest-stats aggregate scan, got:\n$plan")
    assert(agg.as[(Long, java.lang.Long, java.lang.Long, java.lang.Long)].head() ==
      ((4L, 1L, 9L, 99L)), "pushed aggregate values must be exact (nulls ignored)")

    // an all-null integral column answers NULL, still from the manifest
    val dir2 = freshDir()
    Seq[(java.lang.Long, Long)]((null, 1L), (null, 2L)).toDF("k", "v").coalesce(1)
      .write.format(Fmt).option("path", dir2).mode("append").save()
    val agg2 = spark.read.format(Fmt).option("path", dir2).load()
      .agg(expr("min(k)").as("mn"), expr("count(*)").as("n"))
    assert(agg2.queryExecution.executedPlan.toString.contains("graft-manifest-agg"))
    val r2 = agg2.head()
    assert(r2.isNullAt(0) && r2.getLong(1) == 2L)

    // DATE bounds answer from the epoch-day zone maps, zero files read
    val dir3 = freshDir()
    Seq((1L, java.sql.Date.valueOf("1996-03-05")),
      (2L, java.sql.Date.valueOf("1996-11-20")),
      (3L, java.sql.Date.valueOf("1996-01-17")))
      .toDF("id", "d").coalesce(1)
      .write.format(Fmt).option("path", dir3).mode("append").save()
    val agg3 = spark.read.format(Fmt).option("path", dir3).load()
      .agg(expr("min(d)").as("mn"), expr("max(d)").as("mx"),
        expr("count(*)").as("n"))
    assert(agg3.queryExecution.executedPlan.toString.contains("graft-manifest-agg"),
      "date MIN/MAX should answer from the manifest")
    assert(agg3.as[(java.sql.Date, java.sql.Date, Long)].head() ==
      ((java.sql.Date.valueOf("1996-01-17"), java.sql.Date.valueOf("1996-11-20"), 3L)))
  }

  test("GROUP BY the partition column answers from the manifest, zero files read") {
    val dir = freshDir()
    spark.range(0, 900)
      .select((col("id") % 3).as("g"), col("id").as("v")).coalesce(1)
      .repartition(col("g"))
      .write.format(Fmt).option("path", dir)
      .option("partitionCol", "g").mode("append").save()

    val t = spark.read.format(Fmt).option("path", dir).load()
    val agg = t.groupBy("g").agg(
      expr("count(*)").as("n"), expr("min(v)").as("mn"), expr("max(v)").as("mx"))
    assert(agg.queryExecution.executedPlan.toString.contains("graft-manifest-agg"),
      s"expected the manifest-stats grouped scan, got:\n${agg.queryExecution.executedPlan}")
    val rows = agg.orderBy("g")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows == Seq(
      (0L, 300L, 0L, 897L), (1L, 300L, 1L, 898L), (2L, 300L, 2L, 899L)),
      s"grouped pushdown values must be exact, got $rows")

    // a second append to one group merges that group's files exactly
    Seq((1L, 5000L)).toDF("g", "v").coalesce(1)
      .write.format(Fmt).option("path", dir)
      .option("partitionCol", "g").mode("append").save()
    val again = spark.read.format(Fmt).option("path", dir).load()
      .groupBy("g").agg(expr("count(*)").as("n"), expr("max(v)").as("mx"))
    assert(again.queryExecution.executedPlan.toString.contains("graft-manifest-agg"))
    assert(again.filter(col("g") === 1L).as[(Long, Long, Long)].head() ==
      ((1L, 301L, 5000L)))

    // grouping by a NON-partition column refuses (falls back to the scan)
    val byV = spark.read.format(Fmt).option("path", dir).load()
      .groupBy("v").agg(expr("count(*)").as("n"))
    assert(!byV.queryExecution.executedPlan.toString.contains("graft-manifest-agg"))
    assert(byV.count() == 901L)
  }

  test("aggregate pushdown refuses whenever the manifest can't answer exactly") {
    val dir = freshDir()
    Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("k", "v", "s").coalesce(1)
      .write.format(Fmt).option("path", dir).mode("append").save()
    def planOfAgg(df: DataFrame): String = df.queryExecution.executedPlan.toString
    val t = spark.read.format(Fmt).option("path", dir).load()

    // string MIN: bounds not recorded → full scan, still correct
    val sMin = t.agg(expr("min(s)").as("m"))
    assert(!planOfAgg(sMin).contains("graft-manifest-agg"))
    assert(sMin.as[String].head() == "a")
    // COUNT(col): null counts not recorded → full scan
    assert(!planOfAgg(t.agg(expr("count(k)").as("n"))).contains("graft-manifest-agg"))
    // a WHERE clause survives as a residual filter → no aggregate offer
    val filtered = t.filter(col("v") > 15L).agg(expr("count(*)").as("n"))
    assert(!planOfAgg(filtered).contains("graft-manifest-agg"))
    assert(filtered.as[Long].head() == 1L)
    // pending equality deletes: the manifest still counts the dead rows
    graft.sources.ManifestTable.deleteKeys(dir, "k", Seq(1L))
    val t2 = spark.read.format(Fmt).option("path", dir).load()
    val afterDel = t2.agg(expr("count(*)").as("n"), expr("min(k)").as("m"))
    assert(!planOfAgg(afterDel).contains("graft-manifest-agg"))
    assert(afterDel.as[(Long, Long)].head() == ((1L, 2L)))
  }

  test("RangeGen reports exact post-pushdown statistics") { withJoinDefaults {
    def statsOf(df: DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.computeStats()
      }.head

    val base = spark.read.format("graft.sources.RangeGen")
      .option("start", 0).option("end", 100000).option("slices", 8).load()
    assert(statsOf(base).rowCount.contains(BigInt(100000)))

    val clamped = base.filter(col("id") >= 60000L && col("id") < 61000L)
    val s = statsOf(clamped)
    assert(s.rowCount.contains(BigInt(1000)),
      s"pushed range should clamp the reported rows, got $s")

    // and the clamped dim broadcasts with no hint
    val plan = planOf(bigFact.join(
      clamped.select(col("id").as("k"), col("val_cents")), "k"))
    assert(hasNode(plan, "BroadcastHashJoin"),
      s"clamped RangeGen dim should broadcast from stats, got:\n$plan")
  } }
}
