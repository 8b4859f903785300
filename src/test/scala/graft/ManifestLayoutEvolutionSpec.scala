package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestTable

/** PARTITION-SPEC EVOLUTION (round 16 — the Iceberg spec-evolution
  * shape): `alterSetLayout` (and its SQL spelling, `ALTER TABLE … SET
  * TBLPROPERTIES`) re-declares the write layout for FUTURE writes as a
  * pure metadata commit. Pins:
  *
  *   - writes after the alter carry the NEW `@field`; old files keep
  *     theirs, and the scan prunes each file by what IT carries — a
  *     one-value slice on either dimension plans old-dim files on the
  *     old field and new-dim files on the new;
  *   - values are layout-invisible across the boundary;
  *   - truncating maintenance stages under the CURRENT layout (the
  *     Iceberg migration path: rewrites adopt the new spec);
  *   - invalid layouts reject loudly; the SQL TBLPROPERTIES spelling
  *     routes onto the same call.
  */
class ManifestLayoutEvolutionSpec extends AnyFunSuite with SparkSessionFixture {

  import spark.implicits._

  private val Fmt = "graft.sources.ManifestTable"

  private def freshDir(): String =
    Files.createTempDirectory("graft_layout_evo").toString

  private def read(dir: String): DataFrame =
    spark.read.format(Fmt).option("path", dir).load()

  private def planned(df: DataFrame): Int = df.rdd.getNumPartitions

  private def batch(lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi).select(
      col("id"), (col("id") % 4).as("p"), (col("id") % 5 + 100).as("q"),
      (col("id") * 3).as("v"))

  test("SET partitioning re-routes future writes; pruning spans both layouts") {
    val dir = freshDir()
    ManifestTable.createEmpty(dir, batch(0, 1).schema,
      Map("partitionCol" -> "p"))
    batch(0, 400).write.format(Fmt).option("path", dir)
      .mode("append").save() // 4 files, @p
    assert(ManifestTable.alterSetLayout(dir,
      Map("partitionCol" -> Some("q"))) == 3)
    assert(ManifestTable.tableLayout(dir) == Map("partitionCol" -> "q"))
    batch(400, 800).write.format(Fmt).option("path", dir)
      .mode("append").save() // 5 files, @q
    val ls = ManifestTable.currentManifest(dir).get._2
    val fields = ls.map(l => ManifestTable.parseEntry(l)._2.keys
      .filter(_.startsWith("@")).toSeq.sorted)
    assert(fields.count(_ == Seq("@p")) == 4, s"old files keep @p:\n$ls")
    assert(fields.count(_ == Seq("@q")) == 5, s"new files carry @q:\n$ls")
    // per-file pruning on BOTH dimensions: a p-slice prunes the old
    // files to 1 by the partition field (new files lack @p and their p
    // zone spans everything → all 5 plan); a q-slice mirrors it
    assert(planned(read(dir).filter(col("p") === 1L)) == 1 + 5)
    assert(planned(read(dir).filter(col("q") === 102L)) == 4 + 1)
    // values are layout-invisible
    assert(read(dir).count() == 800L)
    assert(read(dir).filter(col("p") === 1L).agg(sum("v")).as[Long].head() ==
      (0L until 800L).filter(_ % 4 == 1).map(_ * 3).sum)
    assert(read(dir).filter(col("q") === 102L).agg(sum("v")).as[Long].head() ==
      (0L until 800L).filter(_ % 5 == 2).map(_ * 3).sum)

    // truncating maintenance stages under the CURRENT layout: the
    // rewrite migrates every file to @q (Iceberg's spec-migration path)
    ManifestTable.compactSmallFiles(spark, dir, Long.MaxValue, 2)
    val after = ManifestTable.dataEntries(
      ManifestTable.currentManifest(dir).get._2)
    assert(after.nonEmpty && after.forall(l =>
      ManifestTable.parseEntry(l)._2.keys.filter(_.startsWith("@")).toSeq
        == Seq("@q")), s"maintenance must migrate to the current spec:\n$after")
    assert(planned(read(dir).filter(col("q") === 102L)) == 1)
    assert(read(dir).count() == 800L)
    assert(read(dir).filter(col("q") === 102L).agg(sum("v")).as[Long].head() ==
      (0L until 800L).filter(_ % 5 == 2).map(_ * 3).sum)
  }

  test("SQL TBLPROPERTIES spelling; invalid layouts reject loudly") {
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")
    val dir = freshDir()
    batch(0, 100).write.format(Fmt).option("path", dir)
      .mode("append").save() // unpartitioned v1
    spark.sql(s"ALTER TABLE graft_cat.`$dir` SET TBLPROPERTIES('partitionCol'='p')")
    assert(ManifestTable.tableLayout(dir) == Map("partitionCol" -> "p"))
    batch(100, 200).write.format(Fmt).option("path", dir)
      .mode("append").save()
    val withField = ManifestTable.dataEntries(
      ManifestTable.currentManifest(dir).get._2)
      .count(l => ManifestTable.parseEntry(l)._2.contains("@p"))
    assert(withField == 4, "post-alter appends are partitioned")
    assert(read(dir).count() == 200L)
    // UNSET drops the declaration; future writes land unpartitioned
    spark.sql(s"ALTER TABLE graft_cat.`$dir` UNSET TBLPROPERTIES('partitionCol')")
    assert(ManifestTable.tableLayout(dir).isEmpty)
    // rejections: non-integral partition column, unknown property,
    // bloom on a non-string column
    def rejects(body: => Any, needle: String): Unit = {
      val e = intercept[Exception](body)
      def chain(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Seq(Option(t.getMessage).getOrElse("")) ++ chain(t.getCause)
      assert(chain(e).exists(_.contains(needle)), e.getMessage)
    }
    rejects(ManifestTable.alterSetLayout(dir,
      Map("partitionCol" -> Some("nope"))), "not in")
    rejects(ManifestTable.alterSetLayout(dir,
      Map("whatever" -> Some("x"))), "not a layout property")
    rejects(ManifestTable.alterSetLayout(dir,
      Map("bucketCol" -> Some("id"))), "bucketCount")
  }
}
