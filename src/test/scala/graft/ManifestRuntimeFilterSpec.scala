package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.connector.read.{Batch, SupportsRuntimeFiltering}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.{BatchScanExec, DataSourceV2ScanRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, In}
import org.scalatest.funsuite.AnyFunSuite

/** Runtime file pruning on the manifest store
  * ([[graft.sources.ManifestScan]] as `SupportsRuntimeFiltering`): the
  * join-key set a dimension produces AT RUNTIME prunes fact FILES the way
  * a static predicate prunes them at plan time — dynamic partition
  * pruning for the engine's own table format. The
  * `join_manifest_runtime_filter` query pins the VALUES through the
  * shared DuckDB oracle; this spec pins the PHYSICS: the handed-down
  * filter set really shrinks the planned partitions (zone maps, partition
  * fields, and blooms all participate), and the end-to-end join really
  * carries a dynamicpruning subquery on the scan.
  */
class ManifestRuntimeFilterSpec extends AnyFunSuite with SparkSessionFixture {

  import spark.implicits._

  private val Fmt = "graft.sources.ManifestTable"

  /** 8 deterministic files: file i holds ids [1000i, 1000(i+1)). */
  private def rangeStore(): String = {
    val dir = Files.createTempDirectory("graft_manifest_rtf").toString
    (0 until 8).foreach { i =>
      spark.range(i * 1000L, (i + 1) * 1000L)
        .select(col("id"), (col("id") % 7).as("v")).coalesce(1)
        .write.format(Fmt).option("path", dir).mode("append").save()
    }
    dir
  }

  private def scanOf(df: DataFrame): SupportsRuntimeFiltering =
    df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.head.asInstanceOf[SupportsRuntimeFiltering]

  private def partitionsAfter(
      df: DataFrame,
      filters: Array[org.apache.spark.sql.sources.Filter]): Int = {
    val scan = scanOf(df)
    scan.filter(filters)
    scan.asInstanceOf[Batch].planInputPartitions().length
  }

  test("a runtime IN filter re-plans against zone maps") {
    val dir = rangeStore()
    val df = spark.read.format(Fmt).option("path", dir).load()
    assert(partitionsAfter(df, Array.empty) == 8)
    // ids 2500 and 6500 live in files 2 and 6
    assert(partitionsAfter(df, Array(In("id", Array(2500L, 6500L)))) == 2)
    assert(partitionsAfter(df, Array(EqualTo("id", 100L))) == 1)
    // a key outside every file's range plans nothing
    assert(partitionsAfter(df, Array(In("id", Array(99999L)))) == 0)
  }

  test("runtime filtering composes with static pushed filters") {
    val dir = rangeStore()
    // static filter keeps files 0..3; runtime IN keeps {1, 6} -> file 1
    val df = spark.read.format(Fmt).option("path", dir).load()
      .filter(col("id") < 4000L)
    assert(partitionsAfter(df, Array.empty) == 4)
    assert(partitionsAfter(df, Array(In("id", Array(1500L, 6500L)))) == 1)
  }

  test("string runtime probes prune via per-file blooms") {
    val dir = Files.createTempDirectory("graft_manifest_rtf_bloom").toString
    (0 until 4).foreach { i =>
      spark.range(i * 100L, (i + 1) * 100L)
        .select(col("id"), concat(lit("u"), col("id")).as("tag")).coalesce(1)
        .write.format(Fmt).option("path", dir)
        .option("bloomCols", "tag").mode("append").save()
    }
    val df = spark.read.format(Fmt).option("path", dir).load()
    assert(partitionsAfter(df, Array.empty) == 4)
    // "u250" only exists in file 2's bloom
    assert(partitionsAfter(df, Array(In("tag", Array[Any]("u250")))) == 1)
  }

  test("end-to-end: DPP prunes fact files from a broadcast dim's keys") {
    val dir = Files.createTempDirectory("graft_manifest_rtf_e2e").toString
    // 10 month-partitioned files, k = 0..9
    spark.range(0, 10000)
      .select((col("id") % 10).as("k"), col("id").as("payload"))
      .repartition(col("k"))
      .write.format(Fmt).option("path", dir)
      .option("partitionCol", "k").mode("append").save()

    // fact stats suppressed: a 10k-row test fact would otherwise be the
    // BROADCAST side itself, and a broadcast fact can't be runtime-pruned
    // (the pruning subquery would depend on its own consumer)
    val fact = spark.read.format(Fmt).option("path", dir)
      .option("reportStats", "false").load()
    // the matching k-set {1, 4, 7} is only knowable after the dim filter
    val dim = spark.range(0, 10)
      .select(col("id").as("dk"), (col("id") % 3).as("cls"))
    val joined = fact.join(broadcast(dim.filter(col("cls") === 1)),
      fact("k") === col("dk"))
    // collect() THIS dataset: count() would execute a sibling
    // QueryExecution, and inspecting the never-executed original would
    // force its pruning subquery without a result
    val n = joined.collect().length
    assert(n == 3000, s"3 of 10 key groups should survive, got $n")

    val finalPlan = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // AQE query stages are leaf nodes wrapping their stage plan — a plain
    // collect never descends into them
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p.collect { case x => x }.flatMap {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          q +: allNodes(q.plan)
        case x => Seq(x)
      }
    val factScans = allNodes(finalPlan).collect {
      case b: BatchScanExec if b.scan.description().contains("graft-manifest") => b
    }
    assert(factScans.nonEmpty, s"no manifest BatchScan in:\n$finalPlan")
    val b = factScans.head
    assert(b.runtimeFilters.nonEmpty,
      s"expected a dynamicpruning runtime filter on the fact scan, got:\n$finalPlan")
    assert(b.inputRDD.getNumPartitions == 3,
      s"runtime filter should plan exactly the 3 matching files, " +
        s"got ${b.inputRDD.getNumPartitions}")
  }
}
