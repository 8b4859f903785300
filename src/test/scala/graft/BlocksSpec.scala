package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Blocks

/** Keyed upsert (latest-wins, idempotent replay) and small-file
  * compaction.
  */
class BlocksSpec extends AnyFunSuite with SparkSessionFixture {

  import spark.implicits._

  test("upsert is latest-wins on the key, updates win version ties, replay is idempotent") {
    val existing = Seq((1L, "a", 10L), (2L, "b", 10L), (3L, "c", 10L))
      .toDF("id", "v", "ver")
    val updates = Seq((2L, "b2", 11L), (3L, "c-stale", 9L), (4L, "d", 10L), (1L, "a-tie", 10L))
      .toDF("id", "v", "ver")

    val merged = Blocks.upsert(existing, updates, Seq("id"), "ver")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(merged.toSeq === Seq(
      (1L, "a-tie", 10L), // tie on ver -> update wins
      (2L, "b2", 11L),    // newer version wins
      (3L, "c", 10L),     // stale update loses
      (4L, "d", 10L)))    // insert

    // replaying the same update block changes nothing
    val replayed = Blocks.upsert(
      Blocks.upsert(existing, updates, Seq("id"), "ver"), updates, Seq("id"), "ver")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(replayed.toSeq === merged.toSeq)
  }

  test("compact rewrites many small files into few with tight sort ranges") {
    val dir = Files.createTempDirectory("graft-compact").toString
    val t = Tables(spark, "/root/testdata/sf0.001")
    t.orders.repartition(32).write.parquet(s"$dir/small")
    val smallFiles = new java.io.File(s"$dir/small").listFiles().count(_.getName.endsWith(".parquet"))
    assert(smallFiles >= 16, s"setup should fragment ($smallFiles files)")

    Blocks.compact(spark, s"$dir/small", s"$dir/compacted", 4, "o_orderkey")
    val bigFiles = new java.io.File(s"$dir/compacted").listFiles().count(_.getName.endsWith(".parquet"))
    assert(bigFiles <= 4)
    assert(spark.read.parquet(s"$dir/compacted").count() === t.orders.count())
    // sorted layout: key ranges across files don't overlap
    val ranges = spark.read.parquet(s"$dir/compacted")
      .select(col("o_orderkey").as("k"), input_file_name().as("f"))
      .groupBy("f").agg(min("k").as("mn"), max("k").as("mx"))
      .orderBy("mn").collect()
    ranges.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) <= b.getLong(1), "file key ranges disjoint")
      case _ =>
    }
  }
}
