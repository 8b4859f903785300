package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned join on the manifest store: two tables partitioned
  * on the same column, both scans reporting
  * `KeyGroupedPartitioning(identity(col))`
  * (`.option("reportPartitioning", true)`), joined with ZERO Exchange on
  * either side under `spark.sql.sources.v2.bucketing.enabled` — the
  * Iceberg SPJ shape, the two-big-tables case where at 100 TB the
  * alternative is shuffling both facts. The `join_manifest_spj` query
  * pins the VALUES through the DuckDB oracle; this spec pins the plan
  * physics both ways (no shuffle with bucketing on; two shuffles in the
  * control) and the conservative fallbacks (a keyless file or a
  * single-`@`-violating layout reports UnknownPartitioning, never a wrong
  * grouping).
  */
class ManifestSpjSpec extends AnyFunSuite with SparkSessionFixture {

  import spark.implicits._

  private val Fmt = "graft.sources.ManifestTable"

  /** k = 0..9, `rows` rows round-robined over k, one file per k. */
  private def keyedStore(rows: Long, payloadName: String): String = {
    val dir = Files.createTempDirectory("graft_manifest_spj").toString
    spark.range(0, rows)
      .select((col("id") % 10).as("k"), col("id").as(payloadName))
      .repartition(col("k"))
      .write.format(Fmt).option("path", dir)
      .option("partitionCol", "k").mode("append").save()
    dir
  }

  private def readSpj(dir: String): DataFrame =
    spark.read.format(Fmt).option("path", dir)
      .option("reportPartitioning", "true")
      .option("reportStats", "false")
      .load()

  /** Count Exchange nodes in the POST-EnsureRequirements plan —
    * `sparkPlan` predates exchange insertion, so it would count 0 either
    * way; the AQE wrapper's initial plan is where the shuffles (or their
    * SPJ-elided absence) are actually visible.
    */
  private def shuffles(df: DataFrame): Int =
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).size

  private def withBucketing[A](on: Boolean)(body: => A): A = {
    val key = "spark.sql.sources.v2.bucketing.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, on.toString)
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("co-partitioned manifest tables join with zero Exchange") { withBucketing(true) {
    val a = keyedStore(1000, "pa")
    val b = keyedStore(500, "pb")
    val joined = readSpj(a).join(readSpj(b), "k")
    assert(shuffles(joined) == 0,
      s"SPJ should plan no Exchange, got:\n${joined.queryExecution.sparkPlan}")
    // values: each a-row of key k joins the b-rows of key k: 100 * 50 * 10
    assert(joined.count() == 100L * 50L * 10L)
    // spot-check a key group joined against the RIGHT partner file
    val k3 = readSpj(a).join(readSpj(b), "k").filter(col("k") === 3L)
      .agg(sum("pa").as("sa"), sum("pb").as("sb"))
      .as[(Long, Long)].head()
    val expA = (3L until 1000L by 10L).sum * 50L
    val expB = (3L until 500L by 10L).sum * 100L
    assert(k3 == ((expA, expB)), s"mis-grouped partition pair: $k3")
  } }

  test("control: bucketing off (or partitioning unreported) shuffles both sides") {
    val a = keyedStore(1000, "pa")
    val b = keyedStore(500, "pb")
    withBucketing(false) {
      assert(shuffles(readSpj(a).join(readSpj(b), "k")) == 2)
    }
    withBucketing(true) {
      // not opted in -> UnknownPartitioning -> normal shuffle planning
      def plain(d: String) = spark.read.format(Fmt).option("path", d)
        .option("reportStats", "false").load()
      assert(shuffles(plain(a).join(plain(b), "k")) == 2)
    }
  }

  test("a keyless file makes the layout non-reportable, never mis-grouped") { withBucketing(true) {
    val a = keyedStore(1000, "pa")
    val b = keyedStore(500, "pb")
    // an unpartitioned append leaves one file with no @k field
    Seq((3L, 7777L)).toDF("k", "pb").coalesce(1)
      .write.format(Fmt).option("path", b).mode("append").save()
    val joined = readSpj(a).join(readSpj(b), "k")
    assert(shuffles(joined) == 2,
      "a keyless file must fall back to UnknownPartitioning")
    assert(joined.count() == 100L * 50L * 10L + 100L)
  } }

  /** k spans [0, rows) — high-cardinality, one file per value impossible:
    * the bucket layout's case.
    */
  private def bucketStore(rows: Long, payloadName: String, buckets: Int): String = {
    val dir = Files.createTempDirectory("graft_manifest_spjb").toString
    spark.range(0, rows)
      .select(col("id").as("k"), (col("id") * 3).as(payloadName))
      .repartition(expr(s"pmod(k, $buckets)"))
      .write.format(Fmt).option("path", dir)
      .option("bucketCol", "k").option("bucketCount", buckets.toString)
      .mode("append").save()
    dir
  }

  private def readBucketed(dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")
    spark.read
      .option("reportPartitioning", "true")
      .option("reportStats", "false")
      .table(s"graft_cat.`$dir`")
  }

  test("bucketed layouts SPJ on a high-cardinality key via the catalog's bucket function") {
    withBucketing(true) {
      val a = bucketStore(1000, "pa", 8)
      val b = bucketStore(500, "pb", 8)
      val joined = readBucketed(a).join(readBucketed(b), "k")
      assert(shuffles(joined) == 0,
        s"bucket-SPJ should plan no Exchange, got:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() == 500L)
      val sums = joined.agg(sum("pa").as("sa"), sum("pb").as("sb"))
        .as[(Long, Long)].head()
      val exp = (0L until 500L).map(_ * 3).sum
      assert(sums == ((exp, exp)), s"mis-bucketed join: $sums")
    }
  }

  test("bucket transform without a function catalog falls back to shuffling, never wrong") {
    withBucketing(true) {
      val a = bucketStore(300, "pa", 4)
      val b = bucketStore(200, "pb", 4)
      // format() route: no FunctionCatalog to resolve bucket() against
      def plain(d: String) = spark.read.format(Fmt).option("path", d)
        .option("reportPartitioning", "true")
        .option("reportStats", "false").load()
      val joined = plain(a).join(plain(b), "k")
      assert(joined.count() == 200L)
    }
  }

  test("a point lookup on a bucketed column opens only its bucket's files") {
    val dir = bucketStore(1000, "pa", 8)
    def planned(df: DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.scan
      }.head.asInstanceOf[org.apache.spark.sql.connector.read.Batch]
        .planInputPartitions().length
    val t = spark.read.format(Fmt).option("path", dir).load()
    val all = planned(t)
    assert(all >= 8, s"expected >= 8 bucket files, got $all")
    // k = 42 hashes to one bucket; zone maps can't help (each file's
    // value range spans the table), the bucket field can
    assert(planned(t.filter(col("k") === 42L)) < all / 2,
      "bucket-field pruning should cut the planned files")
    assert(t.filter(col("k") === 42L).count() == 1L)
    // IN probes union their buckets
    assert(planned(t.filter(col("k").isin(1L, 2L, 3L))) < all)
    assert(t.filter(col("k").isin(1L, 2L, 3L)).count() == 3L)
  }

  test("groupBy on the partition key aggregates with zero Exchange under SPJ") {
    withBucketing(true) {
      val a = keyedStore(1000, "pa")
      // KeyGroupedPartitioning satisfies the aggregate's clustering too:
      // sum-per-key needs no shuffle when files are already key-grouped.
      // min/max (not count/min over the GROUP col alone) so the manifest
      // agg pushdown doesn't swallow the aggregate before the plan forms
      val agg = readSpj(a).groupBy("k").agg(sum("pa").as("s"))
      assert(shuffles(agg) == 0,
        s"partition-key aggregation should not shuffle, got:\n${agg.queryExecution.executedPlan}")
      val r = agg.filter(col("k") === 3L).as[(Long, Long)].head()
      assert(r == ((3L, (3L until 1000L by 10L).sum)))
    }
  }

  test("SPJ survives multiple files per key (grouped splits)") { withBucketing(true) {
    val a = keyedStore(1000, "pa")
    // second append: every key gets a SECOND file in store a
    val dirA = a
    spark.range(1000, 1200)
      .select((col("id") % 10).as("k"), col("id").as("pa"))
      .repartition(col("k"))
      .write.format(Fmt).option("path", dirA)
      .option("partitionCol", "k").mode("append").save()
    val b = keyedStore(500, "pb")
    val joined = readSpj(dirA).join(readSpj(b), "k")
    assert(shuffles(joined) == 0,
      s"grouped co-keyed splits should still SPJ, got:\n${joined.queryExecution.sparkPlan}")
    assert(joined.count() == (100L + 20L) * 50L * 10L)
  } }
}
