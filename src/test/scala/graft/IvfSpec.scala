package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Ivf, Vector}

class IvfSpec extends AnyFunSuite with SparkSessionFixture {

  private lazy val t = Tables(spark, "/root/testdata/sf0.001")

  test("every vector lands in exactly one cell") {
    val a = Ivf.assignments(t)
    assert(a.count() == t.embeddings.count())
    assert(a.groupBy("vec_id").count().filter(col("count") =!= 1).count() == 0)
    assert(a.filter(col("cell_id") >= Ivf.NumCells || col("cell_id") < 0).count() == 0)
  }

  test("nprobe = K reproduces brute-force top-k bit-for-bit") {
    // Probing every cell makes the candidate set the whole corpus, so IVF
    // must degrade to exactly the brute-force result (same re-rank
    // expression, same tie-breaks, same rounding).
    val ivf = Ivf.ivfCosineTopk(t, probeLimit = 50, k = 5, nprobe = Ivf.NumCells)
      .collect().map(_.toString).toSeq
    val brute = Vector.simCosineTopk(t).collect().map(_.toString).toSeq
    assert(ivf == brute)
  }

  test("ivf with small nprobe is a subset of the probed-cell space with exact cosines") {
    val ivf = Ivf.ivfCosineTopk(t, probeLimit = 20, k = 5, nprobe = 2)
    val brute = Vector.simCosineTopk(t)
      .select(col("a_id"), col("b_id"), col("cos").as("bcos"))
    // Any (a,b) pair IVF reports that brute force also ranked must carry
    // the identical cosine.
    assert(ivf.join(brute, Seq("a_id", "b_id"))
      .filter(col("cos") =!= col("bcos")).count() == 0)
    // Recall is data-dependent (near-random vectors); report it.
    val hit = brute.select("a_id", "b_id")
      .intersect(ivf.select("a_id", "b_id")).count()
    info(s"IVF nprobe=2 recall@5 vs brute force: $hit/${brute.count()}")
  }

  test("ivf is deterministic across runs") {
    val r1 = Ivf.ivfCosineTopk(t, 20, 5, 2).collect().map(_.toString).toSeq
    val r2 = Ivf.ivfCosineTopk(t, 20, 5, 2).collect().map(_.toString).toSeq
    assert(r1 == r2)
  }
}
