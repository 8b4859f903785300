package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{AnnIndex, IvfPq}

class AnnIndexSpec extends AnyFunSuite with SparkSessionFixture {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val t = Tables(spark, sfDir)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("persisted serve is bit-identical to the in-memory IVF-ADC query") {
    val inMem = rows(IvfPq.ivfpqCosineTopk(t))
    val persisted = rows(AnnIndex.ivfpqPersistedTopk(t))
    assert(persisted == inMem,
      "persisted-index top-k diverged from the in-memory trained plan")
    assert(persisted.nonEmpty)
  }

  test("a fresh session serves from disk through a training-free path") {
    AnnIndex.build(t) // idempotent: committed artifact short-circuits
    assert(AnnIndex.committed(sfDir))
    // A brand-new session (fresh SQLConf + catalog on the shared context,
    // exactly what a restarted driver process constructs): the serve path
    // consumes ONLY loadOnly's parquet frames — loadOnly/serve contain no
    // call into Ivf/Pq training by construction, so this cannot Lloyd.
    val fresh = spark.newSession()
    val t2 = Tables(fresh, sfDir)
    val got = rows(AnnIndex.serve(t2, AnnIndex.loadOnly(fresh, sfDir)))
    val want = rows(IvfPq.ivfpqCosineTopk(t))
    assert(got == want, "fresh-session disk serve diverged from trained plan")
  }

  test("loadOnly refuses an uncommitted index instead of training") {
    val e = intercept[IllegalArgumentException] {
      AnnIndex.loadOnly(spark, "/root/testdata/does_not_exist")
    }
    assert(e.getMessage.contains("no committed ANN index"))
  }

  test("append serves planted twins at cosine 1.0 and is idempotent") {
    val got = rows(AnnIndex.ivfpqUpsertTopk(t))
    assert(got.nonEmpty)
    // every probe owning a twin (vec_id % 7 == 3) must rank it FIRST at
    // exact cosine 1.0 — cells mis-assigned, codes mis-encoded, or a
    // delta missing from the read path all break this
    val twinProbes = got.map(_._1).distinct.filter(_ % 7 == 3)
    assert(twinProbes.nonEmpty)
    twinProbes.foreach { a =>
      val top = got.filter(_._1 == a).head
      assert(top._2 == a + AnnIndex.TwinOffset && top._3 == 1.0,
        s"probe $a: expected its twin first at cos 1.0, got $top")
    }
    // non-twin probes see SOME twin ids only where the twin of a true
    // neighbor outranks — but never a duplicate (a_id, b_id) pair
    assert(got.size == got.distinct.size)
    // idempotence: a second run (Bench re-runs queries) must not append
    // a second copy — duplicated codes would double ADC scores
    val again = rows(AnnIndex.ivfpqUpsertTopk(t))
    assert(again == got, "second upsert run diverged — append not idempotent")
    assert(AnnIndex.readVersions(AnnIndex.upsertRoot(sfDir)) ==
      Seq("snap", "delta_twins"))
  }

  test("append encodes with FROZEN state: base artifact is byte-identical") {
    AnnIndex.ivfpqUpsertTopk(t) // ensures base + delta exist
    val upsertSnap = AnnIndex.upsertRoot(sfDir).resolve("snap")
    val mainSnap = AnnIndex.indexRoot(sfDir).resolve("snap")
    AnnIndex.build(t)
    // same trained state written at both roots: centroid/codebook tables
    // collect to identical rows (training is memoized per dataset stamp,
    // and append never touches them)
    def tbl(p: java.nio.file.Path): Seq[String] =
      spark.read.parquet(p.toString).collect().map(_.toString).toSeq.sorted
    assert(tbl(upsertSnap.resolve("centroids")) == tbl(mainSnap.resolve("centroids")))
    assert(tbl(upsertSnap.resolve("codebook")) == tbl(mainSnap.resolve("codebook")))
    // and the delta holds exactly the twin batch's ids
    val deltaIds = spark.read.parquet(
        AnnIndex.upsertRoot(sfDir).resolve("delta_twins").resolve("codes").toString)
      .select("vec_id").distinct().collect().map(_.getLong(0)).toSet
    val wantIds = AnnIndex.twinVectors(t).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(deltaIds == wantIds)
  }

  test("compactDeltas folds versions to one head; serving and idempotence survive") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("ann_compact").resolve("idx")
    AnnIndex.buildAt(t, root)
    AnnIndex.appendDelta(t, root, "delta_twins", AnnIndex.twinVectors(t))
    val vAll = ops.Ann.vectorsWithNorm(t).unionByName(AnnIndex.twinVectors(t))
    def serve(): Seq[(Long, Long, Double)] =
      rows(AnnIndex.serveOver(t, AnnIndex.loadOnlyAt(spark, root), vAll, 50, 5, 4))
    val before = serve()
    val live = AnnIndex.compactDeltas(spark, root)
    assert(live == Seq("folded_1"))
    assert(AnnIndex.readVersions(root) == Seq("folded_1"))
    // stale generations survive ONE compact cycle (in-flight readers'
    // grace window) — invisible to the read path, swept by the NEXT
    assert(Files.exists(root.resolve("snap")) &&
      Files.exists(root.resolve("delta_twins")),
      "grace window violated: stale dirs deleted at commit")
    assert(serve() == before, "serving changed across the fold")
    // the consumed-names memory survives the fold: a re-run of the
    // appending query after a compact must stay a no-op (a forgotten
    // name would re-append the batch and double its ADC scores)
    AnnIndex.appendDelta(t, root, "delta_twins", AnnIndex.twinVectors(t))
    assert(AnnIndex.readVersions(root) == Seq("folded_1"))
    assert(serve() == before, "post-compact re-append was not a no-op")
    // reserved generation names are rejected loudly, never
    // orphan-deleted — neither the live head nor a stale head still in
    // its grace window can be aliased by a delta
    val e = intercept[IllegalArgumentException] {
      AnnIndex.appendDelta(t, root, "folded_1", AnnIndex.twinVectors(t))
    }
    assert(e.getMessage.contains("bad delta name"))
    val e2 = intercept[IllegalArgumentException] {
      AnnIndex.appendDelta(t, root, "folded_99", AnnIndex.twinVectors(t))
    }
    assert(e2.getMessage.contains("bad delta name"))
    // the next compact is a pure sweep: nothing to fold, stale dirs gone
    assert(AnnIndex.compactDeltas(spark, root) == Seq("folded_1"))
    assert(!Files.exists(root.resolve("snap")) &&
      !Files.exists(root.resolve("delta_twins")), "sweep left stale dirs")
    assert(serve() == before, "serving changed across the sweep")
  }

  test("deleteIds tombstones twins logically, compact drops them physically") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("ann_delete").resolve("idx")
    AnnIndex.buildAt(t, root)
    AnnIndex.appendDelta(t, root, "delta_twins", AnnIndex.twinVectors(t))
    val vAll = ops.Ann.vectorsWithNorm(t).unionByName(AnnIndex.twinVectors(t))
    def serve(): Seq[(Long, Long, Double)] =
      rows(AnnIndex.serveOver(t, AnnIndex.loadOnlyAt(spark, root), vAll, 50, 5, 4))
    val before = serve()
    val delIds = AnnIndex.deletedTwinIds(t).collect().map(_.getLong(0)).toSet
    assert(delIds.nonEmpty)
    assert(before.exists(r => delIds(r._2)),
      "precondition: deleted-to-be twins must be served before the delete")
    AnnIndex.deleteIds(spark, root, "del_half_twins", AnnIndex.deletedTwinIds(t))
    val after = serve()
    // logically gone at once: no deleted id is ever served
    assert(!after.exists(r => delIds(r._2)), "tombstoned id served")
    // slot backfill is EXACT: the post-delete serve equals a control
    // index that NEVER contained the deleted twins — same candidates,
    // same ADC scores, same re-rank, so each freed slot holds the true
    // next neighbor
    val control = Files.createTempDirectory("ann_delete_ctl").resolve("idx")
    AnnIndex.buildAt(t, control)
    AnnIndex.appendDelta(t, control, "delta_surviving",
      AnnIndex.twinVectors(t)
        .join(AnnIndex.deletedTwinIds(t), Seq("vec_id"), "left_anti"))
    val want = rows(AnnIndex.serveOver(
      t, AnnIndex.loadOnlyAt(spark, control), vAll, 50, 5, 4))
    assert(after == want, "deleted index diverged from never-inserted control")
    // untouched probes byte-identical across the delete. "Untouched" is
    // defined against the control: a deleted id can sit in a probe's
    // RERANK CANDIDATE pool without reaching its top-k (deleting it then
    // legitimately frees a candidate slot and a better true neighbor
    // backfills), so the observable invariant is: probes the delete
    // provably cannot affect — before == control — serve identical rows
    // after it.
    val untouched = before.groupBy(_._1)
      .collect { case (a, rs) if rs == want.filter(_._1 == a) => a }.toSet
    assert(untouched.nonEmpty)
    assert(after.filter(r => untouched(r._1)) == before.filter(r => untouched(r._1)),
      "a probe the delete cannot affect changed across it")
    // idempotence: re-running the delete (Bench re-runs queries) is a no-op
    AnnIndex.deleteIds(spark, root, "del_half_twins", AnnIndex.deletedTwinIds(t))
    assert(serve() == after)
    // compact drops the ids PHYSICALLY and clears the tombstone list
    assert(AnnIndex.compactDeltas(spark, root) == Seq("folded_1"))
    val foldedIds = spark.read
      .parquet(root.resolve("folded_1").resolve("codes").toString)
      .select("vec_id").distinct().collect().map(_.getLong(0)).toSet
    assert(foldedIds.intersect(delIds).isEmpty, "compact left deleted ids on disk")
    assert(serve() == after, "serving changed across the physical drop")
    val m = AnnIndex.readMeta(root)
    assert(m.tombs.isEmpty && m.consumed.contains("del_half_twins"))
    // the name stays consumed past the fold: a post-compact re-delete is
    // a no-op (no new tombstone dir ever appears)
    AnnIndex.deleteIds(spark, root, "del_half_twins", AnnIndex.deletedTwinIds(t))
    assert(AnnIndex.readMeta(root).tombs.isEmpty)
    assert(serve() == after)
  }

  test("registered delete query: deleted twins gone, survivors still first") {
    val got = rows(AnnIndex.ivfpqDeleteTopk(t))
    assert(got.nonEmpty)
    val delIds = AnnIndex.deletedTwinIds(t).collect().map(_.getLong(0)).toSet
    assert(!got.exists(r => delIds(r._2)))
    // surviving twins (orig % 7 == 3 but % 14 != 3) still rank first at 1.0
    val survivors = got.map(_._1).distinct.filter(a => a % 7 == 3 && a % 14 != 3)
    assert(survivors.nonEmpty)
    survivors.foreach { a =>
      val top = got.filter(_._1 == a).head
      assert(top._2 == a + AnnIndex.TwinOffset && top._3 == 1.0,
        s"probe $a: expected surviving twin first at cos 1.0, got $top")
    }
    // deleted-twin probes keep a FULL top-k (the slot backfills)
    val k = got.groupBy(_._1).values.map(_.size).max
    got.map(_._1).distinct.filter(_ % 14 == 3).foreach { a =>
      assert(got.count(_._1 == a) == k, s"probe $a lost rows to the delete")
    }
    // Bench-idempotent: all three maintenance calls are consumed-name no-ops
    assert(rows(AnnIndex.ivfpqDeleteTopk(t)) == got)
  }

  test("the persisted codes table is partitioned by coarse cell") {
    AnnIndex.build(t)
    val snap = AnnIndex.indexRoot(sfDir).resolve("snap").resolve("codes")
    val cells = snap.toFile.listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("cell_id="))
    assert(cells.length > 1,
      s"expected cell_id=* partition directories, found: ${cells.mkString(",")}")
    // probed-cell restriction must reach the scan as partition pruning:
    // a single-cell filter plans strictly fewer input files than the full scan
    val all = spark.read.parquet(snap.toString)
    val one = all.filter(col("cell_id") === 0)
    def files(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.executedPlan.collectLeaves().map {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
            .map(_.files.size.toLong).sum
        case _ => 0L
      }.sum
    assert(files(one) < files(all), "cell filter did not prune partitions")
  }
}
