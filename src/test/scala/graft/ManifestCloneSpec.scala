package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestTable

/** Zero-copy shallow clone ([[ManifestTable.cloneTable]]): branch a table
  * as pure metadata. The `source_manifest_clone` query pins the values;
  * this spec pins the zero-copy physics (shared inodes, no data bytes
  * moved), the full divergence contract (appends and deletes on either
  * side never leak to the other), vacuum independence (retention on the
  * source cannot break the clone), delete-entry preservation, and the
  * create-only refusal.
  */
class ManifestCloneSpec extends AnyFunSuite with SparkSessionFixture {

  import spark.implicits._

  private val Fmt = "graft.sources.ManifestTable"

  private def freshDir(): String =
    Files.createTempDirectory("graft_manifest_clone").toString

  private def writeStore(dir: String, from: Long, to: Long): Unit =
    spark.range(from, to)
      .select(col("id"), (col("id") % 7).as("v")).coalesce(2)
      .write.format(Fmt).option("path", dir).mode("append").save()

  test("clone shares inodes — zero data bytes moved") {
    val src = freshDir()
    writeStore(src, 0, 1000)
    val dst = freshDir() + "/clone"
    assert(ManifestTable.cloneTable(src, dst) == 1)
    assert(spark.read.format(Fmt).option("path", dst).load().count() == 1000L)
    val name = ManifestTable.dataEntries(
      ManifestTable.currentManifest(src).get._2)
      .map(l => ManifestTable.parseEntry(l)._1).head
    val srcIno = Files.getAttribute(Paths.get(src).resolve(name), "unix:ino")
    val dstIno = Files.getAttribute(Paths.get(dst).resolve(name), "unix:ino")
    assert(srcIno == dstIno, "clone must hard-link, not copy")
  }

  test("full divergence: writes and deletes on either side never leak") {
    val src = freshDir()
    writeStore(src, 0, 1000)
    val dst = freshDir() + "/clone"
    ManifestTable.cloneTable(src, dst)
    // append to the clone; delete on the source
    writeStore(dst, 1000, 1500)
    ManifestTable.deleteKeys(src, "id", (0L until 100L).toSeq)
    assert(spark.read.format(Fmt).option("path", dst).load().count() == 1500L)
    assert(spark.read.format(Fmt).option("path", src).load().count() == 900L)
  }

  test("pending delete entries clone with their scoping intact") {
    val src = freshDir()
    writeStore(src, 0, 1000)
    ManifestTable.deleteKeys(src, "id", (0L until 250L).toSeq)
    val dst = freshDir() + "/clone"
    ManifestTable.cloneTable(src, dst)
    assert(spark.read.format(Fmt).option("path", dst).load().count() == 750L)
  }

  test("vacuum on the source cannot break the clone (shared inodes survive)") {
    val src = freshDir()
    writeStore(src, 0, 1000)
    val dst = freshDir() + "/clone"
    ManifestTable.cloneTable(src, dst)
    // truncating overwrite on the source, then expire its history: the
    // source's old names unlink, the clone's links keep the inodes alive
    spark.range(0, 10).select(col("id"), (col("id") % 7).as("v"))
      .coalesce(1)
      .write.format(Fmt).option("path", src).mode("overwrite").save()
    ManifestTable.vacuum(src)
    assert(spark.read.format(Fmt).option("path", src).load().count() == 10L)
    assert(spark.read.format(Fmt).option("path", dst).load().count() == 1000L,
      "source retention must never corrupt the clone")
  }

  test("clone refuses to overwrite an existing table") {
    val src = freshDir()
    writeStore(src, 0, 100)
    val dst = freshDir()
    writeStore(dst, 0, 10)
    val e = intercept[IllegalArgumentException] {
      ManifestTable.cloneTable(src, dst)
    }
    assert(e.getMessage.contains("already has a committed manifest"))
  }
}
