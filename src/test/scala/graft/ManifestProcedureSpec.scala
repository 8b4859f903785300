package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestTable

/** The SQL `CALL` maintenance surface (GraftCatalog as a Spark 4
  * ProcedureCatalog): every procedure routes onto the exact Scala
  * maintenance call and returns its outcome as rows; unknown names and
  * malformed arguments fail loudly; SHOW/DESCRIBE work off the roster.
  */
class ManifestProcedureSpec extends AnyFunSuite with SparkSessionFixture {

  import spark.implicits._

  private val Fmt = "graft.sources.ManifestTable"

  private def freshDir(): String =
    Files.createTempDirectory("graft_proc_spec").toString

  private def ensureCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")

  test("CALL compact_deletes / compact_files / vacuum run the real maintenance") {
    ensureCatalog()
    val dir = freshDir()
    (0 until 3).foreach { i =>
      spark.range(i * 10L, i * 10L + 10L)
        .select(col("id"), concat(lit("s"), col("id")).as("s"))
        .coalesce(1)
        .write.format(Fmt).option("path", dir).mode("append").save()
    }
    ManifestTable.deleteKeys(dir, "id", Seq(0L, 15L))            // v4
    val v5 = spark.sql(s"CALL graft_cat.compact_deletes('$dir')")
      .as[Int].head()
    assert(v5 == 5)
    val v6 = spark.sql(s"CALL graft_cat.compact_files('$dir', 1000000)")
      .as[Int].head()
    assert(v6 == 6)
    // history through CALL: six retained versions, newest has 1 packed file
    val hist = spark.sql(s"CALL graft_cat.history('$dir')")
      .orderBy("version")
      .select("version", "n_data_files", "n_rows")
      .as[(Int, Long, Long)].collect().toSeq
    assert(hist.map(_._1) == (1 to 6))
    assert(hist.last == ((6, 1L, 28L)))
    // defaulted keep_versions: CALL vacuum(path) keeps only current
    val (mGone, _) = spark.sql(s"CALL graft_cat.vacuum('$dir')")
      .as[(Int, Int)].head()
    assert(mGone == 5)
    assert(spark.read.format(Fmt).option("path", dir).load().count() == 28L)
    // age-based form via CALL: wide window now sweeps nothing
    assert(spark.sql(s"CALL graft_cat.vacuum_older_than('$dir', ${86400000L})")
      .as[(Int, Int)].head() == ((0, 0)))
  }

  test("CALL clone branches the table; SHOW/DESCRIBE PROCEDURES surface the roster") {
    ensureCatalog()
    val dir = freshDir()
    spark.range(0, 7).select(col("id"), lit("x").as("s"))
      .write.format(Fmt).option("path", dir).mode("append").save()
    val dst = freshDir() + "/branch"
    assert(spark.sql(s"CALL graft_cat.clone('$dir', '$dst')").as[Int].head() == 1)
    assert(spark.read.format(Fmt).option("path", dst).load().count() == 7L)
    val shown = spark.sql("SHOW PROCEDURES IN graft_cat")
      .select("procedure_name").as[String].collect().toSet
    assert(shown == Set("vacuum", "vacuum_older_than", "compact_files",
      "compact_deletes", "clone", "history", "zorder", "rewrite_manifests"))
    val desc = spark.sql("DESCRIBE PROCEDURE graft_cat.vacuum")
      .collect().map(_.toString).mkString("\n")
    assert(desc.contains("vacuum"))
  }

  test("CALL zorder re-clusters: values identical, both dimensions prune, history intact") {
    ensureCatalog()
    val dir = freshDir()
    // x-sorted layout: 16 files each covering ALL y values — a y-slice
    // can prune nothing before the rewrite
    spark.range(0, 16000)
      .select((col("id") / 1000L).cast("long").as("x"),
        pmod(col("id") * 37L, lit(16L)).as("y"),
        (col("id") * 3L).as("v"))
      .orderBy("x")
      .repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.format(Fmt).option("path", dir).mode("append").save()
    val before = spark.read.format(Fmt).option("path", dir).load()
    val beforeFiles = before.rdd.getNumPartitions
    val ySliceBefore = before.filter(col("y") === 3L).rdd.getNumPartitions
    assert(ySliceBefore == beforeFiles, "x-sorted control: y prunes nothing")
    val sumBefore = before.agg(sum("v")).as[Long].head()

    val v = spark.sql(s"CALL graft_cat.zorder('$dir', 'x,y')").as[Int].head()
    assert(v == 2)
    val after = spark.read.format(Fmt).option("path", dir).load()
    assert(after.agg(sum("v")).as[Long].head() == sumBefore,
      "the rewrite must be value-invisible")
    assert(after.count() == 16000L)
    val ySliceAfter = after.filter(col("y") === 3L).rdd.getNumPartitions
    assert(ySliceAfter < beforeFiles / 2,
      s"z-clustering must make the y-slice prunable: $ySliceAfter of $beforeFiles")
    val xSliceAfter = after.filter(col("x") <= 3L).rdd.getNumPartitions
    assert(xSliceAfter < beforeFiles, "x still prunes on the z layout")
    // v1 still time-travels to the pre-rewrite bytes
    assert(spark.read.format(Fmt).option("path", dir)
      .option("version", "1").load().count() == 16000L)
  }

  test("CALL rewrite_manifests folds accreted children through SQL") {
    ensureCatalog()
    val dir = freshDir()
    val prev = ManifestTable.groupThreshold
    ManifestTable.groupThreshold = 4
    try {
      (0 until 6).foreach { i =>
        spark.range(i * 8L, i * 8L + 8L)
          .select(col("id"), (col("id") % 2).as("p"))
          .write.format(Fmt).option("path", dir)
          .option("partitionCol", "p").mode("append").save()
      } // 2 files per append; spills at 6 loose → multiple child sets
    } finally ManifestTable.groupThreshold = prev
    val lsB = ManifestTable.currentManifestShallow(dir).get._2
    val childrenB = lsB.count(ManifestTable.isGroupEntry)
    assert(childrenB > 2, s"expected accreted children, got:\n$lsB")
    val (v, b, a) = spark.sql(s"CALL graft_cat.rewrite_manifests('$dir')")
      .as[(Int, Int, Int)].head()
    assert(b == childrenB && a == 2,
      s"fold to one child per partition, got ($v, $b, $a)")
    val ls = ManifestTable.currentManifestShallow(dir).get._2
    assert(ls.count(ManifestTable.isGroupEntry) == 2)
    assert(spark.read.format(Fmt).option("path", dir).load()
      .agg(sum("id")).as[Long].head() == (0L until 48L).sum)
  }

  test("unknown procedures and bad arguments fail loudly") {
    ensureCatalog()
    // Spark wraps the catalog's error in FAILED_TO_LOAD_ROUTINE; our
    // roster message rides in the cause chain
    val e = intercept[Exception](spark.sql("CALL graft_cat.optimize('/x')"))
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(chain.contains("FAILED_TO_LOAD_ROUTINE"))
    assert(chain.contains("unknown procedure") && chain.contains("compact_files"),
      s"roster message missing from: $chain")
    val e2 = intercept[Exception](
      spark.sql("CALL graft_cat.vacuum('')").collect())
    assert(e2.getMessage.contains("non-empty"))
  }
}
