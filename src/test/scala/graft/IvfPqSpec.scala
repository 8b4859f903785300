package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Ivf, IvfPq, Pq, Vector}

class IvfPqSpec extends AnyFunSuite with SparkSessionFixture {

  private lazy val t = Tables(spark, "/root/testdata/sf0.001")

  test("ivfpq candidates are a subset of exhaustive-ADC candidates") {
    // Cell pruning only REMOVES candidates; every (probe, vector) pair
    // IVF-ADC scores must also exist in the exhaustive ADC scoring, with
    // the IDENTICAL adot (same codebook, same LUT — pruning never changes
    // a surviving score).
    val full = Pq.pqCosineTopk(t, probeLimit = 20, k = 5)
    val pruned = IvfPq.ivfpqCosineTopk(t, probeLimit = 20, k = 5)
    // Output contract: exact cosines only — same invariant as PqSpec.
    val brute = Vector.simCosineTopk(t)
      .select(col("a_id"), col("b_id"), col("cos").as("bcos"))
    assert(pruned.join(brute, Seq("a_id", "b_id"))
      .filter(col("cos") =!= col("bcos")).count() == 0)
    assert(full.count() > 0 && pruned.count() > 0)
  }

  test("scan volume: ADC scores ~nprobe/NumCells of the pair space") {
    val n = t.embeddings.count()
    val probeLimit = 20
    val probes = math.min(probeLimit.toLong, n)
    val fullPairs = probes * n // exhaustive ADC scores every (probe, vector)
    val prunedPairs = IvfPq.adcScoredPairs(t, probeLimit, nprobe = 4).count()
    val frac = prunedPairs.toDouble / fullPairs
    info(f"ADC-scored pairs: pruned=$prunedPairs full=$fullPairs frac=$frac%.3f (nprobe/K=${4.0 / Ivf.NumCells}%.3f)")
    // Trained cells are not equal-sized and probes prefer big cells, so
    // the fraction sits above nprobe/K=0.25 on uniform data; 0.6 still
    // proves real pruning (broken pruning = 1.0).
    assert(frac <= 0.6, f"cell pruning ineffective: scored fraction $frac%.3f")
    assert(prunedPairs > 0)
  }

  test("recall@5 vs brute force on the driver corpus") {
    // Recall <= min(IVF, PQ) by construction: candidates must survive
    // BOTH prunings. On the near-uniform driver corpus IVF at nprobe=4
    // floors at 0.55 (IvfSpec) and PQ at 0.6 (PqSpec); the intersection
    // measures ~0.5. The floor catches a broken composition (wrong cell
    // key, LUT join miss), which collapses recall toward k/N ~ 0.01.
    val brute = Vector.simCosineTopk(t).select("a_id", "b_id")
    val got = IvfPq.ivfpqCosineTopk(t).select("a_id", "b_id")
    val recall = brute.intersect(got).count().toDouble / brute.count()
    info(f"IVF-ADC recall@5 (nprobe=4/${Ivf.NumCells}, rerank=${Pq.RerankDepth}): $recall%.3f")
    assert(recall >= 0.4, f"IVF-ADC recall@5 $recall%.3f below the uniform-data floor")
  }

  test("nprobe = NumCells degenerates to exhaustive PQ exactly") {
    // With every cell probed the pruning is vacuous and the pipeline must
    // reproduce pqCosineTopk bit-for-bit — the composition adds a cell
    // key, never a different score.
    val full = Pq.pqCosineTopk(t, probeLimit = 20, k = 5)
    val all = IvfPq.ivfpqCosineTopk(t, probeLimit = 20, k = 5, nprobe = Ivf.NumCells)
    assert(full.exceptAll(all).count() == 0 && all.exceptAll(full).count() == 0)
  }

  test("ivfpq on clustered data: recall >= 0.85") {
    // Same 16-tight-cluster corpus shape as IvfSpec/PqSpec: coarse cells
    // align with clusters, PQ codes are tight within them, so the probe's
    // own cluster is always probed and ranked on top.
    val dir = "/tmp/ivfpq_synth"
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
    val got = IvfPq.ivfpqCosineTopk(ts).select("a_id", "b_id")
    val recall = brute.intersect(got).count().toDouble / brute.count()
    info(f"clustered corpus IVF-ADC recall@5: $recall%.3f")
    assert(recall >= 0.85, f"IVF-ADC recall@5 $recall%.3f below the clustered bar")
  }
}
