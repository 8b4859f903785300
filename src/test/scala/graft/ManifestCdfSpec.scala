package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ManifestCdf, ManifestTable}

/** [[ManifestCdf.changes]] — the change data feed derived from the
  * immutable manifests. The registry query proves the three legs against
  * DuckDB; this spec pins the protocol edges the aggregate can't see.
  */
class ManifestCdfSpec extends AnyFunSuite with SparkSessionFixture {

  import spark.implicits._

  private val Fmt = "graft.sources.ManifestTable"

  private def freshStore(): String = {
    val dir = Files.createTempDirectory("graft_manifest_cdf").toString
    Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("k", "s", "v")
      .coalesce(1).write.format(Fmt).option("path", dir).mode("append").save()
    dir
  }

  test("merge reads as a delete+insert pair; join on key gives before/after") {
    val dir = freshStore()
    ManifestTable.mergeKeys(spark, dir, "k",
      Seq((2L, "B", 200L), (9L, "I", 900L)).toDF("k", "s", "v"))      // v2

    val ch = ManifestCdf.changes(spark, dir, 1, 2)
    val rows = ch.select("k", "s", "v", ManifestCdf.ChangeTypeCol,
      ManifestCdf.CommitVersionCol)
      .as[(Long, String, Long, String, Int)].collect().toSet
    assert(rows == Set(
      (2L, "b", 20L, "delete", 2),   // before-image of the matched key
      (2L, "B", 200L, "insert", 2),  // after-image
      (9L, "I", 900L, "insert", 2))) // novel key: insert only
  }

  test("re-deleting a dead key erases nothing and emits nothing") {
    val dir = freshStore()
    ManifestTable.deleteKeys(dir, "k", Seq(2L))                        // v2
    ManifestTable.deleteKeys(dir, "k", Seq(2L, 3L))                    // v3
    val ch = ManifestCdf.changes(spark, dir, 1, 3)
      .select("k", ManifestCdf.ChangeTypeCol, ManifestCdf.CommitVersionCol)
      .as[(Long, String, Int)].collect().toSet
    // v2 erased k=2; v3's re-request of 2 was already dead — only 3 goes
    assert(ch == Set((2L, "delete", 2), (3L, "delete", 3)))
  }

  test("a version that removes files fails the feed loudly") {
    val dir = freshStore()
    ManifestTable.deleteKeys(dir, "k", Seq(1L))                        // v2
    ManifestTable.compactDeletes(spark, dir)                           // v3: rewrite
    // (1, 2] is still readable...
    assert(ManifestCdf.changes(spark, dir, 1, 2).count() == 1L)
    // ...but any range crossing the compaction is rejected
    val e = intercept[IllegalStateException] {
      ManifestCdf.changes(spark, dir, 2, 3).count()
    }
    assert(e.getMessage.contains("change feed"))
  }

  test("empty change range yields an empty frame in the CDF schema") {
    val dir = freshStore()
    Seq((4L, "d", 40L)).toDF("k", "s", "v")
      .write.format(Fmt).option("path", dir).mode("append").save()     // v2
    // a version with ONLY a 0-row marker commits no change rows
    ManifestTable.commitBatch(spark, dir, 7L,
      Seq.empty[(Long, String, Long)].toDF("k", "s", "v"))             // v3
    val ch = ManifestCdf.changes(spark, dir, 2, 3)
    assert(ch.count() == 0L)
    assert(ch.columns.contains(ManifestCdf.ChangeTypeCol) &&
      ch.columns.contains(ManifestCdf.CommitVersionCol))
  }
}
