package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.connector.read.Batch
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestTable

/** File-grain LIMIT pushdown on the manifest scan
  * ([[graft.sources.ManifestScanBuilder]] as `SupportsPushDownLimit`):
  * `LIMIT n` plans a prefix of files whose recorded row counts reach n.
  * PARTIAL pushdown — Spark keeps the Limit operator — so over-delivery
  * is always safe; this spec pins the planned-file truncation AND the
  * provability guards (pending equality deletes or stat-less legacy
  * lines disable the truncation rather than under-deliver rows).
  */
class ManifestLimitSpec extends AnyFunSuite with SparkSessionFixture {

  private val Fmt = "graft.sources.ManifestTable"

  private def rangeStore(): String = {
    val dir = Files.createTempDirectory("graft_manifest_limit").toString
    (0 until 8).foreach { i =>
      spark.range(i * 1000L, (i + 1) * 1000L)
        .select(col("id"), (col("id") % 7).as("v")).coalesce(1)
        .write.format(Fmt).option("path", dir).mode("append").save()
    }
    dir
  }

  private def plannedFiles(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.head.asInstanceOf[Batch].planInputPartitions().length

  test("LIMIT plans a file prefix covering n rows, not the table") {
    val dir = rangeStore()
    val t = spark.read.format(Fmt).option("path", dir).load()
    assert(plannedFiles(t.limit(2500)) == 3,
      "2500 rows need exactly 3 of the 1000-row files")
    assert(plannedFiles(t.limit(1)) == 1)
    assert(plannedFiles(t.limit(100000)) == 8)
    // the retained Limit still truncates exactly
    assert(t.limit(2500).count() == 2500L)
    assert(t.limit(1).count() == 1L)
  }

  test("pending equality deletes disable the truncation (never under-deliver)") {
    val dir = rangeStore()
    ManifestTable.deleteKeys(dir, "id", Seq(0L, 1L, 2L))
    val t = spark.read.format(Fmt).option("path", dir).load()
    assert(plannedFiles(t.limit(2500)) == 8,
      "recorded counts exceed live rows under deletes: plan everything")
    assert(t.limit(2500).count() == 2500L)
  }

  test("a stat-less legacy line disables the truncation") {
    val dir = rangeStore()
    // strip #rows from the manifest, simulating a pre-stats writer
    val mf = java.nio.file.Paths.get(dir).resolve("manifest-8.json")
    val legacy = new java.util.ArrayList[String]()
    Files.readAllLines(mf).forEach { l =>
      legacy.add(l.replaceAll(";?#rows=\\d+:\\d+", ""))
    }
    Files.write(mf, legacy)
    val t = spark.read.format(Fmt).option("path", dir).load()
    assert(plannedFiles(t.limit(2500)) == 8)
    assert(t.limit(2500).count() == 2500L)
  }
}
