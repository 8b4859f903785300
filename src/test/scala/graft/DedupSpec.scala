package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Text}

/** Property tests for the sketch-based dedup ops (no cross-engine oracle
  * possible — seeded hashes — so these assert the guarantees that matter).
  */
class DedupSpec extends AnyFunSuite with SparkSessionFixture {

  private lazy val t = Tables(spark, "/root/testdata/sf0.001")

  test("minhash LSH finds every exact-duplicate pair with jac = 1.0") {
    // Identical texts → identical token sets → identical signatures →
    // collide in every band. dedup_exact's groups are ground truth.
    // Only sf0.1 contains exact duplicates (sf0.001/sf0.01 have none).
    val t1 = Tables(spark, "/root/testdata/sf0.1")
    val groups = ops.Text.dedupExact(t1)
      .filter(col("dupes") >= 2)
      .count()
    assert(groups > 0, "test data should contain exact duplicates")
    val exactPairs = t1.documents
      .select(col("doc_id").as("a_id"), md5(col("text")).as("h"))
      .join(t1.documents.select(col("doc_id").as("b_id"), md5(col("text")).as("h")), "h")
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
    val found = Dedup.dedupMinhashLsh(t1)
      .filter(col("jac") === 1.0)
      .select("a_id", "b_id")
    assert(exactPairs.except(found).count() == 0,
      "every exact-duplicate pair must surface as an LSH candidate with jac 1.0")
  }

  test("minhash LSH output jaccard is within [minJaccard, 1]") {
    val bad = Dedup.dedupMinhashLsh(t, minJaccard = 0.5)
      .filter(col("jac") < 0.5 || col("jac") > 1.0)
      .count()
    assert(bad == 0)
  }

  test("minhash LSH is deterministic across runs") {
    val r1 = Dedup.dedupMinhashLsh(t).collect().map(_.toString).toSeq
    val r2 = Dedup.dedupMinhashLsh(t).collect().map(_.toString).toSeq
    assert(r1 == r2)
  }

  test("simhash: identical documents get identical signatures") {
    val sig = Dedup.simhashSignatures(t.documents)
    val conflicts = t.documents
      .select(col("doc_id"), md5(col("text")).as("h"))
      .join(sig, "doc_id")
      .groupBy("h")
      .agg(countDistinct(col("simhash")).as("nsig"))
      .filter(col("nsig") > 1)
      .count()
    assert(conflicts == 0)
  }

  test("simhash pairs respect the hamming bound") {
    val bad = Dedup.dedupSimhash(t, probeLimit = 30, maxHamming = 16)
      .filter(col("hamming") > 16 || col("hamming") < 0)
      .count()
    assert(bad == 0)
  }
}
