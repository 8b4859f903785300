package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Pq, Vector}

class PqSpec extends AnyFunSuite with SparkSessionFixture {

  private lazy val t = Tables(spark, "/root/testdata/sf0.001")

  test("every vector gets exactly one code per subspace, all in range") {
    val c = Pq.codes(t)
    val n = t.embeddings.count()
    assert(c.count() == n * Pq.NumSub)
    assert(c.groupBy("vec_id").count()
      .filter(col("count") =!= Pq.NumSub).count() == 0)
    assert(c.filter(col("code") < 0 || col("code") >= Pq.KSub).count() == 0)
    assert(c.select(countDistinct(col("sub_id"))).head().getLong(0) == Pq.NumSub)
  }

  test("pq top-k carries exact cosines and is deterministic") {
    val pq = Pq.pqCosineTopk(t, probeLimit = 20, k = 5)
    val brute = Vector.simCosineTopk(t)
      .select(col("a_id"), col("b_id"), col("cos").as("bcos"))
    // Every pair PQ reports that brute force also ranked must carry the
    // identical (re-ranked exact) cosine — ADC only selects candidates,
    // it never leaks approximate scores into the output.
    assert(pq.join(brute, Seq("a_id", "b_id"))
      .filter(col("cos") =!= col("bcos")).count() == 0)
    val r1 = Pq.pqCosineTopk(t, 20, 5).collect().map(_.toString).toSeq
    val r2 = Pq.pqCosineTopk(t, 20, 5).collect().map(_.toString).toSeq
    assert(r1 == r2)
  }

  test("ADC approximation error is bounded on the driver corpus") {
    // The ADC score is sum_j dot(a_j, centroid(code_j(b))) — its error vs
    // the exact dot is the quantization residual projected on the probe.
    // At 4 bits per 8-dim subspace (0.5 bit/dim) on NEAR-UNIFORM unit
    // vectors, rate-distortion puts the expected residual around half the
    // energy — this corpus is PQ's information-theoretic worst case, and
    // ~0.55 mean is the honest number (the clustered-corpus test below is
    // where reconstruction is tight). The 0.8 bound still catches a
    // broken codebook (wrong slice offsets, bad argmin), which pushes the
    // worst residual to ~1.0 (reconstruction orthogonal to the vector).
    val cb = Pq.codebook(t)
    val recon = Pq.codes(t, cb)
      .join(cb.withColumnRenamed("cell", "code"), Seq("sub_id", "code"))
      .groupBy("vec_id")
      .agg(transform(
        array_sort(collect_list(struct(col("sub_id"), col("c_se")))),
        s => s.getField("c_se")).as("parts"))
      .select(col("vec_id"), flatten(col("parts")).as("r_e"))
    val err = graft.ops.Ann.vectorsWithNorm(t)
      .join(recon, Seq("vec_id"))
      .select((Vector.dot(col("e"), col("e")) -
        Vector.dot(col("e"), col("r_e"))).as("resid"))
      .agg(max(abs(col("resid"))).as("worst"), avg(abs(col("resid"))).as("mean"))
      .head()
    info(f"ADC residual on unit vectors: worst=${err.getDouble(0)}%.4f mean=${err.getDouble(1)}%.4f")
    assert(err.getDouble(0) <= 0.8, "PQ reconstruction residual out of bounds")
  }

  test("recall@5 vs brute force on the driver corpus") {
    val brute = Vector.simCosineTopk(t).select("a_id", "b_id")
    val pq = Pq.pqCosineTopk(t).select("a_id", "b_id")
    val hit = brute.intersect(pq).count()
    val total = brute.count()
    val recall = hit.toDouble / total
    info(f"PQ recall@5 (rerank=${Pq.RerankDepth}) vs brute force: $hit/$total = $recall%.3f")
    // Near-uniform unit vectors are PQ's worst case (no cluster structure
    // for the codebooks to exploit); measured 0.740 at rerank=48. The
    // floor still catches a broken candidate ranking, which collapses
    // recall toward k/N ~ 0.01.
    assert(recall >= 0.6, f"PQ recall@5 $recall%.3f below floor")
  }

  test("pq on clustered data: recall >= 0.9") {
    // Same clustered-corpus shape as IvfSpec: 16 tight direction
    // clusters. Codebook cells align with cluster structure per subspace,
    // so ADC ranks same-cluster vectors on top and rerank recovers the
    // exact order.
    val dir = "/tmp/pq_synth"
    val rnd = new scala.util.Random(13)
    val centers = Array.fill(16, 64)(rnd.nextGaussian())
    val rows = (0 until 512).map { i =>
      val c = centers(i / 32)
      val v = c.map(x => (x + 0.15 * rnd.nextGaussian()).toFloat)
      (i.toLong, v.toSeq, s"c${i / 32}")
    }
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val ts = Tables(spark, dir)
    val brute = Vector.simCosineTopk(ts).select("a_id", "b_id")
    val pq = Pq.pqCosineTopk(ts).select("a_id", "b_id")
    val recall = brute.intersect(pq).count().toDouble / brute.count()
    info(f"clustered corpus PQ recall@5: $recall%.3f")
    assert(recall >= 0.9, f"PQ recall@5 $recall%.3f below the 0.9 bar on clustered data")
  }
}
