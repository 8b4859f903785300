package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestTable

/** The TWO-LEVEL manifest (round 15 — the Iceberg manifest-list shape):
  * once loose data lines pass [[ManifestTable.groupThreshold]], commits
  * fold them into child manifests grouped by partition identity, and the
  * list file carries one aggregated `+child` line per group. Pins:
  *
  *   - values and time travel are IDENTICAL through a spill (grouping is
  *     metadata layout, never visible in results);
  *   - a one-partition query opens ONLY its partition's children (the
  *     [[ManifestTable.childReads]] seam — the whole point at 10⁶ files);
  *   - commits stay O(new lines): the list file never re-inlines members;
  *   - deletes COMPOSE with grouping (round 16): a spill proceeds while
  *     delete entries are pending — snapshot-global tombstones apply
  *     positionlessly, prior-only scoping rides the [[ManifestTable
  *     .SeqStatKey]] commit sequence, which regrouping cannot disturb —
  *     so a table under a sustained GDPR delete stream still folds its
  *     metadata; deletes apply to grouped members and fold+re-spill via
  *     compaction;
  *   - vacuum refcounts children exactly like data files;
  *   - CDF reads identically across a spill boundary.
  */
class ManifestGroupSpec extends AnyFunSuite with SparkSessionFixture {

  import spark.implicits._

  private val Fmt = "graft.sources.ManifestTable"

  private def freshDir(): String =
    Files.createTempDirectory("graft_group").toString

  private def withThreshold[A](n: Int)(body: => A): A = {
    val prev = ManifestTable.groupThreshold
    ManifestTable.groupThreshold = n
    try body finally ManifestTable.groupThreshold = prev
  }

  private def shallow(dir: String): Seq[String] =
    ManifestTable.currentManifestShallow(dir).get._2

  private def read(dir: String): DataFrame =
    spark.read.format(Fmt).option("path", dir).load()

  /** 4 partition values × `appends` appends (1 file per value each). */
  private def partitionedStore(dir: String, appends: Int): Unit =
    (0 until appends).foreach { a =>
      spark.range(a * 400, (a + 1) * 400)
        .select(col("id"), (col("id") % 4).as("p"), (col("id") * 3).as("v"))
        .write.format(Fmt).option("path", dir)
        .option("partitionCol", "p").mode("append").save()
    }

  test("spilling is value-invisible; the list stays O(loose + children)") {
    withThreshold(8) {
      val dir = freshDir()
      partitionedStore(dir, 3) // 12 loose files → spill on the 3rd commit
      val ls = shallow(dir)
      val groups = ls.filter(ManifestTable.isGroupEntry)
      assert(groups.size == 4, s"one child per partition value, got:\n$ls")
      assert(ManifestTable.dataEntries(ls).isEmpty,
        s"all data lines should have spilled, got:\n$ls")
      // group lines carry EXACT partition bounds and summed row counts
      groups.foreach { g =>
        val (_, stats) = ManifestTable.parseEntry(g)
        val (lo, hi) = stats("@p")
        assert(lo == hi, s"partition hull must stay exact: $g")
        assert(stats(ManifestTable.RowStatKey)._1 == 300L, s"3×100 rows: $g")
      }
      // values identical through the spill; time travel intact
      assert(read(dir).count() == 1200L)
      assert(read(dir).agg(sum("v")).as[Long].head() ==
        (0L until 1200L).map(_ * 3).sum)
      assert(spark.read.format(Fmt).option("path", dir)
        .option("version", "1").load().count() == 400L)

      // a LATER commit carries children by reference — list grows by
      // the new loose lines only
      spark.range(1200, 1204)
        .select(col("id"), (col("id") % 4).as("p"), (col("id") * 3).as("v"))
        .write.format(Fmt).option("path", dir)
        .option("partitionCol", "p").mode("append").save()
      val ls2 = shallow(dir)
      assert(ls2.count(ManifestTable.isGroupEntry) == 4, "children unchanged")
      assert(ManifestTable.dataEntries(ls2).size == 4, "4 new loose files")
      assert(read(dir).count() == 1204L)
    }
  }

  test("a one-partition query opens only its partition's children") {
    withThreshold(8) {
      val dir = freshDir()
      partitionedStore(dir, 3) // 4 children, one per value
      val t = read(dir)
      val before = ManifestTable.childReads.get()
      val one = t.filter(col("p") === 2L)
      assert(one.count() == 300L)
      val opened = ManifestTable.childReads.get() - before
      assert(opened == 1L,
        s"a p=2 slice must parse ONLY p=2's child manifest, opened $opened")
      // an unfiltered scan reaches the remaining three (p=2's child is
      // already in the process-wide cache — children read once per JVM)
      val b2 = ManifestTable.childReads.get()
      assert(read(dir).count() == 1200L)
      assert(ManifestTable.childReads.get() - b2 == 3L)
      // zone-hull pruning works for non-partition columns too: ids are
      // append-clustered, so a tight id range excludes whole children
      // only when the hull misses — here every child spans all appends,
      // so the CONSERVATIVE direction is exercised: nothing wrongly drops
      assert(read(dir).filter(col("id") < 10L).count() == 10L)
    }
  }

  test("deletes: spill proceeds while pending, members still filtered, fold re-spills") {
    withThreshold(8) {
      val dir = freshDir()
      partitionedStore(dir, 3)
      ManifestTable.deleteKeys(dir, "id", (0L until 50L).toSeq)
      // a global tombstone reaches rows INSIDE children
      assert(read(dir).count() == 1150L)
      assert(read(dir).filter(col("id") < 50L).count() == 0L)
      // the GDPR regime: appends under a pending delete STILL spill
      // (round 16 — a sustained delete stream must not pin the manifest
      // flat at O(total files)); the delete entry stays on the shallow
      // list and keeps filtering the regrouped members
      (0 until 3).foreach { a =>
        spark.range(2000 + a * 100, 2100 + a * 100)
          .select(col("id"), (col("id") % 4).as("p"), (col("id") * 3).as("v"))
          .write.format(Fmt).option("path", dir)
          .option("partitionCol", "p").mode("append").save()
      }
      val pend = shallow(dir)
      assert(ManifestTable.dataEntries(pend).isEmpty,
        s"pending deletes must not block the spill, got:\n$pend")
      assert(pend.exists(ManifestTable.isDeleteEntry),
        "the delete entry itself stays on the top-level list")
      assert(read(dir).count() == 1450L)
      assert(read(dir).filter(col("id") < 50L).count() == 0L)
      // folding the deletes is a truncating rewrite — it re-spills
      ManifestTable.compactDeletes(spark, dir)
      val ls = shallow(dir)
      assert(ls.exists(ManifestTable.isGroupEntry),
        s"the fold's rewrite should re-spill, got:\n$ls")
      assert(!ls.exists(ManifestTable.isDeleteEntry))
      assert(read(dir).count() == 1450L)
      assert(read(dir).filter(col("id") < 50L).count() == 0L)
    }
  }

  test("prior-only delete scoping survives regrouping (commit sequence, not line order)") {
    val dir = freshDir()
    withThreshold(1000) {
      partitionedStore(dir, 3) // 12 loose files, below the raised threshold
      // a merge commits [prior-only delete, replacement rows] as ONE
      // version; its data lines sit AFTER its delete line
      val updates = spark.range(10, 20)
        .select(col("id"), (col("id") % 4).as("p"), lit(-7L).as("v"))
      ManifestTable.mergeKeys(spark, dir, "id", updates)
      val before = shallow(dir)
      assert(before.exists(l => ManifestTable.isDeleteEntry(l) &&
        ManifestTable.isPriorOnlyDelete(l)))
      // every data line is sequence-stamped at commit
      ManifestTable.dataEntries(before).foreach { l =>
        assert(ManifestTable.seqOf(ManifestTable.parseEntry(l)._2).isDefined,
          s"unstamped data line: $l")
      }
      assert(read(dir).count() == 1200L)
    }
    withThreshold(8) {
      // this append's commit folds EVERYTHING loose — pre-merge rows
      // (seq 1..3) and the merge's own replacement rows (seq 4) regroup
      // into the same partition children, shuffling line order past the
      // delete line. Scoping must hold: old id∈[10,20) rows stay
      // deleted, replacements stay exempt.
      spark.range(5000, 5004)
        .select(col("id"), (col("id") % 4).as("p"), (col("id") * 3).as("v"))
        .write.format(Fmt).option("path", dir)
        .option("partitionCol", "p").mode("append").save()
      val ls = shallow(dir)
      assert(ls.exists(ManifestTable.isGroupEntry),
        s"the append should have spilled despite the pending merge delete:\n$ls")
      assert(ls.exists(l => ManifestTable.isDeleteEntry(l) &&
        ManifestTable.isPriorOnlyDelete(l)),
        "the prior-only delete entry stays on the top-level list")
      assert(read(dir).count() == 1204L, "merge replaces, never duplicates")
      assert(read(dir).filter(col("id") === 15L).count() == 1L)
      assert(read(dir).filter(col("id") === 15L).select("v").as[Long].head() == -7L)
      assert(read(dir).filter(col("v") === -7L).count() == 10L)
      // and the fold still compacts away cleanly
      ManifestTable.compactDeletes(spark, dir)
      assert(!shallow(dir).exists(ManifestTable.isDeleteEntry))
      assert(read(dir).count() == 1204L)
      assert(read(dir).filter(col("id") === 15L).select("v").as[Long].head() == -7L)
    }
  }

  test("mergeKeys over a grouped store: prior-only delete reaches grouped members") {
    withThreshold(8) {
      val dir = freshDir()
      partitionedStore(dir, 3)
      val updates = spark.range(10, 20)
        .select(col("id"), (col("id") % 4).as("p"), lit(-7L).as("v"))
      ManifestTable.mergeKeys(spark, dir, "id", updates)
      assert(read(dir).count() == 1200L, "merge replaces, never duplicates")
      assert(read(dir).filter(col("id") === 15L).select("v").as[Long].head() == -7L)
      assert(read(dir).filter(col("v") === -7L).count() == 10L)
    }
  }

  test("rewriteManifests: one child per partition, pure metadata, deletes compose") {
    withThreshold(8) {
      val dir = freshDir()
      partitionedStore(dir, 6) // spills at commits 3 and 6 → 2 children per p
      val before = shallow(dir)
      assert(before.count(ManifestTable.isGroupEntry) == 8,
        s"expected two accreted child sets, got:\n$before")
      // a pending GDPR delete must not block the metadata fold
      ManifestTable.deleteKeys(dir, "id", (0L until 30L).toSeq)
      val dataFiles = Files.list(Paths.get(dir)).iterator().asScala
        .map(_.getFileName.toString).filter(_.startsWith("data-")).toSet
      val vBefore = ManifestTable.currentManifest(dir).get._1

      val (nv, b, a) = ManifestTable.rewriteManifests(dir)
      assert(b == 8 && a == 4, s"8 children must fold to 4, got ($b, $a)")
      assert(nv == vBefore + 1)
      val ls = shallow(dir)
      assert(ls.count(ManifestTable.isGroupEntry) == 4)
      assert(ManifestTable.dataEntries(ls).isEmpty, s"no loose lines:\n$ls")
      assert(ls.exists(ManifestTable.isDeleteEntry),
        "the pending delete entry survives the fold")
      // PURE metadata: the data file set is untouched
      val dataAfter = Files.list(Paths.get(dir)).iterator().asScala
        .map(_.getFileName.toString).filter(_.startsWith("data-")).toSet
      assert(dataAfter == dataFiles)
      // one-partition planning opens exactly ONE merged child (counted
      // FIRST, while the fresh children are still outside the cache)
      val c0 = ManifestTable.childReads.get()
      assert(read(dir).filter(col("p") === 1L).count() ==
        600L - 8L) // ids 0..29 ≡ 1 (mod 4): 8 of them erased in p=1
      assert(ManifestTable.childReads.get() - c0 == 1L,
        "a one-partition query must open exactly one merged child")
      // values identical (delete still applied)
      assert(read(dir).count() == 2370L) // 2400 - 30 erased
      assert(read(dir).filter(col("id") < 30L).count() == 0L)
      // CDF across the fold: no row-level change
      assert(graft.sources.ManifestCdf.changes(spark, dir, vBefore, nv)
        .count() == 0L)
      // time travel to the pre-fold version still expands old children
      assert(spark.read.format(Fmt).option("path", dir)
        .option("version", vBefore.toString).load().count() == 2370L)
      // idempotent: already-minimal layout returns unchanged
      assert(ManifestTable.rewriteManifests(dir) == ((nv, 4, 4)))
      // vacuum sweeps the superseded children, keeps the merged ones
      val oldChildren = before.filter(ManifestTable.isGroupEntry)
        .map(l => ManifestTable.parseEntry(l)._1.substring(1))
      val newChildren = ls.filter(ManifestTable.isGroupEntry)
        .map(l => ManifestTable.parseEntry(l)._1.substring(1))
      ManifestTable.vacuum(dir)
      oldChildren.foreach(c => assert(!Files.exists(Paths.get(dir, c)),
        s"superseded child $c must sweep"))
      newChildren.foreach(c => assert(Files.exists(Paths.get(dir, c)),
        s"merged child $c must survive"))
      assert(read(dir).count() == 2370L)
    }
  }

  test("vacuum refcounts children like data files") {
    withThreshold(8) {
      val dir = freshDir()
      partitionedStore(dir, 3)
      val childrenV3 = shallow(dir).filter(ManifestTable.isGroupEntry)
        .map(l => ManifestTable.parseEntry(l)._1.substring(1))
      assert(childrenV3.size == 4)
      // a truncating rewrite (bin-pack everything) re-spills new children
      ManifestTable.compactSmallFiles(spark, dir, Long.MaxValue, 2)
      val childrenV4 = shallow(dir).filter(ManifestTable.isGroupEntry)
        .map(l => ManifestTable.parseEntry(l)._1.substring(1))
      // old children still on disk (v3 still time-travels to them)
      childrenV3.foreach(c => assert(Files.exists(Paths.get(dir, c))))
      ManifestTable.vacuum(dir) // keep newest only
      childrenV3.foreach(c => assert(!Files.exists(Paths.get(dir, c)),
        s"expired child $c must sweep"))
      childrenV4.foreach(c => assert(Files.exists(Paths.get(dir, c)),
        s"live child $c must survive"))
      assert(read(dir).count() == 1200L)
      assert(read(dir).agg(sum("v")).as[Long].head() ==
        (0L until 1200L).map(_ * 3).sum)
    }
  }

  test("CDF reads identically across a spill boundary") {
    withThreshold(8) {
      val dir = freshDir()
      partitionedStore(dir, 3) // v3 spills
      val vSpill = ManifestTable.currentManifest(dir).get._1
      spark.range(5000, 5010)
        .select(col("id"), (col("id") % 4).as("p"), (col("id") * 3).as("v"))
        .write.format(Fmt).option("path", dir)
        .option("partitionCol", "p").mode("append").save()
      val vAfter = ManifestTable.currentManifest(dir).get._1
      // the spill version itself: inserts = that commit's NEW rows only
      // (prior loose lines re-appear inside children under the SAME
      // names, so the set diff cancels them)
      val spillChanges = graft.sources.ManifestCdf.changes(spark, dir, vSpill - 1, vSpill)
      assert(spillChanges.filter(col("_change_type") === "insert").count() == 400L)
      val after = graft.sources.ManifestCdf.changes(spark, dir, vSpill, vAfter)
      assert(after.filter(col("_change_type") === "insert").count() == 10L)
    }
  }
}
