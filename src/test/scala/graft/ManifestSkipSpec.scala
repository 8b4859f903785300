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

    // an IN key-probe (the DELETE/merge read shape) keeps only the files
    // whose [min,max] can hold SOME listed key
    val probed = base.filter(col("id").isin(100L, 4321L))
    assert(probed.rdd.getNumPartitions == 2,
      s"IN probe over 2 distant keys should plan 2 files, planned ${probed.rdd.getNumPartitions}")
    assert(probed.count() == 2L)
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
    assert(names.count(n => n.startsWith("data-") && (n.endsWith(".rows") || n.endsWith(".parquet"))) == 2)
  }

  test("partitioned layout: one file per value, pruned by partition field") {
    val dir = freshDir()
    import spark.implicits._
    // 4 partition values, pre-clustered → exactly 4 files
    spark.range(0, 4000)
      .select(col("id"), (col("id") % 4).as("p"), (col("id") * 3).as("v"))
      .repartition(col("p"))
      .write.format(Fmt).option("path", dir)
      .option("partitionCol", "p").mode("append").save()

    val names = listNames(dir)
    assert(names.count(n => n.startsWith("data-") && (n.endsWith(".rows") || n.endsWith(".parquet"))) == 4,
      s"pre-clustered 4-value write should stage 4 files, got: $names")
    // every data line carries the first-class @p field
    val lines = graft.sources.ManifestTable.currentManifest(dir).get._2
    assert(lines.forall(_.contains("@p=")), s"missing @p fields in: $lines")

    val base = spark.read.format(Fmt).option("path", dir).load()
    assert(base.rdd.getNumPartitions == 4)
    // equality predicate plans exactly the one file of that value
    val one = base.filter(col("p") === 2L)
    assert(one.rdd.getNumPartitions == 1)
    assert(one.count() == 1000L)
    // range predicate keeps exactly the two matching partitions
    val two = base.filter(col("p") >= 2L)
    assert(two.rdd.getNumPartitions == 2)
    assert(two.count() == 2000L)
    // values are exact through the partition-routed round trip
    assert(base.agg(sum(col("v"))).as[Long].head() ==
      (0L until 4000L).map(_ * 3).sum)
  }

  test("partitioned writes declare their distribution: unclustered input still lands one file per value") {
    val dir = freshDir()
    // spark.range spreads every p value across all input partitions; the
    // write's RequiresDistributionAndOrdering clustering must insert the
    // value shuffle itself — without it this stages #values x #tasks files
    spark.range(0, 3000)
      .select(col("id"), (col("id") % 3).as("p"))
      .write.format(Fmt).option("path", dir)
      .option("partitionCol", "p").mode("append").save()
    val files = listNames(dir).count(n => n.startsWith("data-") && (n.endsWith(".rows") || n.endsWith(".parquet")))
    assert(files == 3,
      s"declared clustering should land exactly 3 files from unclustered input, got $files")
    assert(spark.read.format(Fmt).option("path", dir).load().count() == 3000L)
  }

  test("partitioned layout: NULL partition values never prune, decode as null") {
    val dir = freshDir()
    import spark.implicits._
    Seq[(java.lang.Long, Long)]((1L, 10L), (null, 20L), (2L, 30L), (null, 40L))
      .toDF("p", "v").coalesce(1)
      .write.format(Fmt).option("path", dir)
      .option("partitionCol", "p").mode("append").save()

    val base = spark.read.format(Fmt).option("path", dir).load()
    assert(base.count() == 4L)
    // null-partition file has no @p field → survives every partition
    // predicate; the residual filter still removes its rows
    val sel = base.filter(col("p") === 1L)
    assert(sel.count() == 1L)
    assert(sel.rdd.getNumPartitions == 2,
      "the 1-value file plus the conservative NULL file")
    assert(base.filter(col("p").isNull).agg(sum("v")).as[Long].head() == 60L)
  }

  test("string blooms: equality/IN probes plan only candidate files") {
    val dir = freshDir()
    import spark.implicits._
    spark.range(0, 8000)
      .select(col("id"), concat(lit("key_"), col("id")).as("s"))
      .repartition(8)
      .write.format(Fmt).option("path", dir)
      .option("bloomCols", "s").mode("append").save()

    val base = spark.read.format(Fmt).option("path", dir).load()
    assert(base.rdd.getNumPartitions == 8)
    // a single-key probe: the one holding file, plus (rare) FP files
    val one = base.filter(col("s") === "key_4321")
    assert(one.rdd.getNumPartitions <= 2,
      s"bloom should prune ~7 of 8 files, planned ${one.rdd.getNumPartitions}")
    assert(one.count() == 1L)
    // an IN probe unions candidates, never loses a real match
    val in3 = base.filter(col("s").isin("key_1", "key_2", "key_3"))
    assert(in3.rdd.getNumPartitions <= 4)
    assert(in3.count() == 3L)
    // a definitively-absent key usually plans ZERO files; correctness
    // never depends on it (the residual filter yields zero rows anyway)
    assert(base.filter(col("s") === "definitely_not_present").count() == 0L)

    // control: no blooms recorded → string probes plan every file
    val dir2 = freshDir()
    spark.range(0, 8000)
      .select(col("id"), concat(lit("key_"), col("id")).as("s"))
      .repartition(8)
      .write.format(Fmt).option("path", dir2).mode("append").save()
    val ctl = spark.read.format(Fmt).option("path", dir2).load()
      .filter(col("s") === "key_4321")
    assert(ctl.rdd.getNumPartitions == 8)
    assert(ctl.count() == 1L)
  }

  test("bloomCols validation and zone-map coexistence") {
    val dir = freshDir()
    import spark.implicits._
    intercept[Exception] {
      Seq((1L, "a")).toDF("k", "s")
        .write.format(Fmt).option("path", dir)
        .option("bloomCols", "k").mode("append").save() // integral → zone maps
    }
    // blooms and zone maps coexist on one line; parseEntry skips the
    // bloom piece, parseBlooms recovers it
    Seq((1L, "a"), (2L, "b")).toDF("k", "s").coalesce(1)
      .write.format(Fmt).option("path", dir)
      .option("bloomCols", "s").mode("append").save()
    val line = graft.sources.ManifestTable.currentManifest(dir).get._2.head
    val (_, stats) = graft.sources.ManifestTable.parseEntry(line)
    assert(stats.contains("k") && stats.contains("#rows"))
    val blooms = graft.sources.ManifestTable.parseBlooms(line)
    assert(blooms.contains("s"))
    assert(graft.sources.ManifestTable.bloomMightContain(blooms("s"), "a"))
    assert(!graft.sources.ManifestTable.bloomMightContain(blooms("s"), "zzz_absent"))
  }

  test("z-ordered layout prunes on BOTH dimensions; sorted control on one") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col => c}
    // 64×64 grid, 4096 rows, 16 files
    val grid = spark.range(0, 4096).select(
      (c("id") % 64).as("x"), expr("id DIV 64").as("y"), c("id").as("v"))

    val zDir = freshDir()
    grid.withColumn("__z",
      graft.sources.ZOrder.interleaveNative(Seq(c("x"), c("y")), 6))
      .repartitionByRange(16, c("__z")).sortWithinPartitions("__z")
      .drop("__z")
      .write.format(Fmt).option("path", zDir).mode("append").save()

    val xDir = freshDir()
    grid.repartitionByRange(16, c("x")).sortWithinPartitions("x")
      .write.format(Fmt).option("path", xDir).mode("append").save()

    val z = spark.read.format(Fmt).option("path", zDir).load()
    val xs = spark.read.format(Fmt).option("path", xDir).load()
    def planned(df: org.apache.spark.sql.DataFrame): Int = df.rdd.getNumPartitions

    // an x-slice prunes on both layouts
    assert(planned(z.filter(c("x") < 8L)) <= 8, "z-layout should prune an x-slice")
    assert(planned(xs.filter(c("x") < 8L)) <= 4)
    // a y-slice prunes ONLY on the z layout — the point of z-ordering
    val zY = planned(z.filter(c("y") < 8L))
    val xY = planned(xs.filter(c("y") < 8L))
    assert(zY <= 8, s"z-layout y-slice should prune, planned $zY of 16")
    assert(xY == 16, s"x-sorted control has no y locality, planned $xY")
    // values are exact through either layout
    assert(z.filter(c("x") < 8L && c("y") < 8L).agg(sum("v")).as[Long].head() ==
      xs.filter(c("x") < 8L && c("y") < 8L).agg(sum("v")).as[Long].head())
  }

  test("compactSmallFiles: only small files rewrite; survivors pass by reference") {
    val dir = freshDir()
    import spark.implicits._
    spark.range(0, 5000).select(col("id"), (col("id") % 7).as("v"))
      .coalesce(1)
      .write.format(Fmt).option("path", dir).mode("append").save()   // 1 big
    spark.range(5000, 6000).select(col("id"), (col("id") % 7).as("v"))
      .repartition(8)
      .write.format(Fmt).option("path", dir).mode("append").save()   // 8 small

    val bigName = graft.sources.ManifestTable.manifestAt(dir, Some(1)).get
      ._2.map(graft.sources.ManifestTable.parseEntry(_)._1).head

    val v = graft.sources.ManifestTable.compactSmallFiles(spark, dir, 1000L, 2)
    assert(v == 3)
    val lines = graft.sources.ManifestTable.currentManifest(dir).get._2
      .map(graft.sources.ManifestTable.parseEntry(_)._1)
    assert(lines.contains(bigName), "the big file must survive BY REFERENCE")
    assert(lines.size == 3, s"1 survivor + 2 packed, got: $lines")

    val back = spark.read.format(Fmt).option("path", dir).load()
    assert(back.count() == 6000L)
    assert(back.agg(sum("v")).as[Long].head() ==
      (0L until 6000L).map(_ % 7).sum)
    // nothing qualified → no empty commit
    assert(graft.sources.ManifestTable.compactSmallFiles(spark, dir, 10L) == -1)
  }

  test("compactSmallFiles refuses under pending equality deletes") {
    val dir = freshDir()
    import spark.implicits._
    spark.range(0, 100).select(col("id"), (col("id") % 3).as("v"))
      .repartition(4)
      .write.format(Fmt).option("path", dir).mode("append").save()
    graft.sources.ManifestTable.deleteKeys(dir, "id", Seq(5L))
    val e = intercept[IllegalArgumentException] {
      graft.sources.ManifestTable.compactSmallFiles(spark, dir, 1000L)
    }
    assert(e.getMessage.contains("compactDeletes first"))
  }

  test("vacuum retention window keeps time travel inside the window") {
    val dir = freshDir()
    import spark.implicits._
    (1 to 4).foreach { i =>
      Seq((i.toLong, i * 10L)).toDF("k", "v")
        .coalesce(1).write.format(Fmt).option("path", dir).mode("append").save()
    }
    val (expiredManifests, _) = graft.sources.ManifestTable.vacuum(dir, keepVersions = 2)
    assert(expiredManifests == 2, "versions 1 and 2 expire")
    // inside the window: both versions still read exactly
    assert(spark.read.format(Fmt).option("path", dir)
      .option("version", "3").load().count() == 3L)
    assert(spark.read.format(Fmt).option("path", dir).load().count() == 4L)
    // outside: expired loudly
    intercept[Exception] {
      spark.read.format(Fmt).option("path", dir)
        .option("version", "1").load().count()
    }
  }

  test("partitionCol validation: missing or non-integral columns are rejected") {
    val dir = freshDir()
    import spark.implicits._
    intercept[Exception] {
      Seq((1L, "a")).toDF("k", "s")
        .write.format(Fmt).option("path", dir)
        .option("partitionCol", "nope").mode("append").save()
    }
    intercept[Exception] {
      Seq((1L, "a")).toDF("k", "s")
        .write.format(Fmt).option("path", dir)
        .option("partitionCol", "s").mode("append").save()
    }
  }
}
