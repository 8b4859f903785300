package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestTable

/** MERGE/upsert lifecycle on the manifest table: one-version atomicity
  * (the merge's delete never kills its own inserts — the sequencing rule),
  * matched keys replaced exactly once, novel keys inserted, history
  * intact, fold + vacuum behavior, and schema/key validation.
  */
class ManifestMergeSpec extends AnyFunSuite with SparkSessionFixture {

  import spark.implicits._

  private val Fmt = "graft.sources.ManifestTable"

  private def freshTable(): String = {
    val dir = Files.createTempDirectory("graft_manifest_merge").toString
    (1L to 20L).map(i => (i, s"row$i", i * 10L)).toDF("id", "s", "v")
      .write.format(Fmt).option("path", dir).mode("append").save()
    dir
  }

  private def readAll(dir: String, version: Option[Int] = None): Seq[(Long, String, Long)] = {
    val r = spark.read.format(Fmt).option("path", dir)
    version.foreach(v => r.option("version", v))
    r.load().as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
  }

  test("matched keys are replaced exactly once; untouched rows intact") {
    val dir = freshTable()
    val updates = Seq((3L, "row3x", 999L), (7L, "row7x", 777L))
      .toDF("id", "s", "v")
    val v = ManifestTable.mergeKeys(spark, dir, "id", updates)
    assert(v == 2)
    val rows = readAll(dir)
    assert(rows.size == 20, "merge of existing keys must not change the count")
    assert(rows.map(_._1) == (1L to 20L), "exactly one row per key")
    assert(rows.find(_._1 == 3L).contains((3L, "row3x", 999L)))
    assert(rows.find(_._1 == 7L).contains((7L, "row7x", 777L)))
    assert(rows.find(_._1 == 5L).contains((5L, "row5", 50L)))
  }

  test("novel keys insert (WHEN NOT MATCHED); mixed batch does both") {
    val dir = freshTable()
    val updates = Seq((20L, "row20x", 1L), (21L, "row21", 210L), (25L, "row25", 250L))
      .toDF("id", "s", "v")
    ManifestTable.mergeKeys(spark, dir, "id", updates)
    val rows = readAll(dir)
    assert(rows.size == 22)
    assert(rows.find(_._1 == 20L).contains((20L, "row20x", 1L)))
    assert(rows.find(_._1 == 21L).contains((21L, "row21", 210L)))
    assert(rows.find(_._1 == 25L).contains((25L, "row25", 250L)))
  }

  test("one-version atomicity: exactly one new snapshot; history pre-merge intact") {
    val dir = freshTable()
    ManifestTable.mergeKeys(spark, dir, "id",
      Seq((1L, "x", 0L)).toDF("id", "s", "v"))
    assert(ManifestTable.currentManifest(dir).get._1 == 2,
      "a merge commits ONE version (delete + inserts together)")
    assert(readAll(dir, Some(1)).find(_._1 == 1L).contains((1L, "row1", 10L)))
  }

  test("sequencing: a later plain delete still covers merged rows; an earlier one does not") {
    val dir = freshTable()
    ManifestTable.mergeKeys(spark, dir, "id",
      Seq((4L, "merged4", 44L)).toDF("id", "s", "v"))
    // the merge's own delete must NOT have removed its insert
    assert(readAll(dir).find(_._1 == 4L).contains((4L, "merged4", 44L)))
    // a NEW delete after the merge covers the merged row (later line)
    ManifestTable.deleteKeys(dir, "id", Seq(4L))
    assert(!readAll(dir).exists(_._1 == 4L))
  }

  test("compactDeletes folds the merged state physically; values unchanged") {
    val dir = freshTable()
    ManifestTable.mergeKeys(spark, dir, "id",
      Seq((2L, "row2x", 222L)).toDF("id", "s", "v"))
    val before = readAll(dir)
    ManifestTable.compactDeletes(spark, dir)
    assert(readAll(dir) == before)
    val lines = ManifestTable.currentManifest(dir).get._2
    assert(ManifestTable.deleteEntriesOf(lines).isEmpty,
      "the folded snapshot carries no delete entries")
    ManifestTable.vacuum(dir)
    assert(readAll(dir) == before, "vacuum keeps every referenced file readable")
  }

  test("validation: schema mismatch and non-integral keys fail loudly") {
    val dir = freshTable()
    intercept[IllegalArgumentException] {
      ManifestTable.mergeKeys(spark, dir, "id",
        Seq((1L, "x")).toDF("id", "s"))
    }
    intercept[IllegalArgumentException] {
      ManifestTable.mergeKeys(spark, dir, "s",
        Seq((1L, "x", 0L)).toDF("id", "s", "v"))
    }
  }
}
