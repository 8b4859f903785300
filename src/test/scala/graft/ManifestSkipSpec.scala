package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Zone-map file skipping and vacuum/retention on the manifest table —
  * the two lifecycle features layered on the commit protocol
  * (ManifestTableSpec owns the protocol itself).
  *
  * The skip assertions go through the PUBLIC read path: a DSv2 batch
  * scan's RDD has one partition per planned input partition, so
  * `df.rdd.getNumPartitions` observes exactly what the zone maps pruned
  * — no reaching into connector internals.
  */
class ManifestSkipSpec extends AnyFunSuite with SparkSessionFixture {

  import spark.implicits._

  private val Fmt = "graft.sources.ManifestTable"

  private def freshDir(): String =
    Files.createTempDirectory("graft_manifest_skip").toString

  private def listNames(dir: String): Seq[String] = {
    val s = Files.list(Paths.get(dir))
    try s.iterator().asScala.map(_.getFileName.toString).toList
    finally s.close()
  }

  test("range predicate prunes files by manifest min/max; results are exact") {
    val dir = freshDir()
    spark.range(0, 8000).select(col("id"), (col("id") % 7).as("v"))
      .repartitionByRange(8, col("id"))
      .write.format(Fmt).option("path", dir).mode("append").save()

    val base = spark.read.format(Fmt).option("path", dir).load()
    assert(base.rdd.getNumPartitions == 8)

    val filtered = base.filter(col("id") >= 2000L && col("id") < 3000L)
    // 8 disjoint 1000-id files → the predicate overlaps exactly one
    assert(filtered.rdd.getNumPartitions < 8,
      "zone maps pruned nothing — stats missing or skip logic inert")
    assert(filtered.agg(count(lit(1)), sum(col("v"))).as[(Long, Long)].head() ==
      (1000L, (2000L until 3000L).map(_ % 7).sum))

    // equality probe must keep exactly the one candidate file
    assert(base.filter(col("id") === 4321L).rdd.getNumPartitions == 1)
  }

  test("a column with only nulls records no stats and never skips") {
    val dir = freshDir()
    Seq[(java.lang.Long, String)]((null, "a"), (null, "b"))
      .toDF("id", "s").coalesce(1)
      .write.format(Fmt).option("path", dir).mode("append").save()
    val back = spark.read.format(Fmt).option("path", dir).load()
      .filter(col("id") > 5L)
    // file survives planning (no stats ⇒ no skip); residual filter
    // correctly yields zero rows
    assert(back.rdd.getNumPartitions == 1)
    assert(back.count() == 0L)
  }

  test("overwrite truncates into a new version; vacuum expires the old one") {
    val dir = freshDir()
    spark.range(0, 100).select(col("id"), lit("v1").as("tag"))
      .repartition(4)
      .write.format(Fmt).option("path", dir).mode("append").save()
    spark.range(0, 50).select(col("id"), lit("v2").as("tag"))
      .repartition(2)
      .write.format(Fmt).option("path", dir).mode("overwrite").save()

    // both snapshots live pre-vacuum
    def at(v: Int) = spark.read.format(Fmt)
      .option("path", dir).option("version", v).load()
    assert(at(1).count() == 100L)
    assert(at(2).count() == 50L)
    assert(listNames(dir).count(_.startsWith("manifest-")) == 2)

    val (manifestsGone, filesGone) = graft.sources.ManifestTable.vacuum(dir)
    assert(manifestsGone == 1)
    assert(filesGone == 4, "v1's four data files should be expired")

    // live snapshot reads exactly; expired version raises with the name
    val current = spark.read.format(Fmt).option("path", dir).load()
    assert(current.agg(count(lit(1)), sum(col("id"))).as[(Long, Long)].head() ==
      (50L, (0L until 50L).sum))
    val e = intercept[Exception](at(1).count())
    assert(e.getMessage.contains("no version 1"))
    // directory holds only the live manifest + its files
    val names = listNames(dir)
    assert(names.count(_.startsWith("manifest-")) == 1)
    assert(names.count(n => n.startsWith("data-") && n.endsWith(".rows")) == 2)
  }
}
