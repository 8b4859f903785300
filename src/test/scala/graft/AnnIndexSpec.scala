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
