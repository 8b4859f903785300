package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestTable

/** Copy-on-write predicate delete ([[ManifestTable.deleteMatching]]):
  * DELETE WHERE <any predicate> as an explicit O(affected files)
  * maintenance call. The `source_manifest_delete_cow` query pins the
  * values through the DuckDB oracle; this spec pins the physics —
  * survivor files pass into the new version BY REFERENCE (same names,
  * same bytes), only may-match candidates rewrite, NULL-predicate rows
  * survive (SQL DELETE semantics), an untranslatable predicate degrades
  * to a full rewrite but never a wrong result, and the refusal/no-op
  * edges hold.
  */
class ManifestCowDeleteSpec extends AnyFunSuite with SparkSessionFixture {

  import spark.implicits._

  private val Fmt = "graft.sources.ManifestTable"

  /** 8 deterministic files: file i holds ids [1000i, 1000(i+1)). */
  private def rangeStore(): String = {
    val dir = Files.createTempDirectory("graft_manifest_cow").toString
    (0 until 8).foreach { i =>
      spark.range(i * 1000L, (i + 1) * 1000L)
        .select(col("id"), (col("id") % 7).as("v")).coalesce(1)
        .write.format(Fmt).option("path", dir).mode("append").save()
    }
    dir
  }

  private def dataFiles(dir: String, version: Int): Set[String] =
    ManifestTable.manifestAt(dir, Some(version)).get._2
      .filterNot(ManifestTable.isDeleteEntry)
      .map(l => ManifestTable.parseEntry(l)._1).toSet

  test("only may-match files rewrite; survivors pass by reference") {
    val dir = rangeStore() // 8 appends -> current version 8
    val preFiles = dataFiles(dir, 8)
    val newV = ManifestTable.deleteMatching(spark, dir,
      col("id") >= 2000L && col("id") < 4000L)
    assert(newV == 9)
    val postFiles = dataFiles(dir, 9)
    // 6 of 8 files survive by name (bytes untouched); files 2 and 3 gone
    assert((preFiles intersect postFiles).size == 6,
      s"expected 6 by-reference survivors, pre=$preFiles post=$postFiles")
    val t = spark.read.format(Fmt).option("path", dir).load()
    assert(t.count() == 6000L)
    assert(t.filter(col("id") >= 2000L && col("id") < 4000L).count() == 0L)
    // prior snapshot intact
    assert(spark.read.format(Fmt).option("path", dir)
      .option("version", "8").load().count() == 8000L)
  }

  test("NULL-predicate rows survive (DELETE removes only TRUE rows)") {
    val dir = Files.createTempDirectory("graft_manifest_cow_null").toString
    Seq[(Long, java.lang.Long)]((1L, 5L), (2L, null), (3L, 50L))
      .toDF("k", "v").coalesce(1)
      .write.format(Fmt).option("path", dir).mode("append").save()
    ManifestTable.deleteMatching(spark, dir, col("v") > 10L)
    val rest = spark.read.format(Fmt).option("path", dir).load()
      .select("k").as[Long].collect().sorted.toSeq
    assert(rest == Seq(1L, 2L), "the NULL-v row must survive")
  }

  test("untranslatable predicate degrades to full rewrite, never wrong rows") {
    val dir = rangeStore()
    val preFiles = dataFiles(dir, 8)
    val newV = ManifestTable.deleteMatching(spark, dir, pmod(col("id"), lit(2L)) === 0L)
    val postFiles = dataFiles(dir, newV)
    assert((preFiles intersect postFiles).isEmpty,
      "no pruning metadata applies to a modulo predicate: all files rewrite")
    val t = spark.read.format(Fmt).option("path", dir).load()
    assert(t.count() == 4000L)
    assert(t.filter(pmod(col("id"), lit(2L)) === 0L).count() == 0L)
  }

  test("no-match predicate returns the current version, no empty commit") {
    val dir = rangeStore()
    assert(ManifestTable.deleteMatching(spark, dir, col("id") > 999999L) == 8)
    assert(ManifestTable.currentManifest(dir).get._1 == 8)
  }

  test("refused while equality-delete entries are pending") {
    val dir = rangeStore()
    ManifestTable.deleteKeys(dir, "id", Seq(5L))
    val e = intercept[IllegalArgumentException] {
      ManifestTable.deleteMatching(spark, dir, col("id") < 10L)
    }
    assert(e.getMessage.contains("compactDeletes first"))
  }
}
