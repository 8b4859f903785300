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

  private def recallAt5(t: Tables, df: org.apache.spark.sql.DataFrame): Double = {
    val brute = Vector.simCosineTopk(t).select("a_id", "b_id")
    brute.intersect(df.select("a_id", "b_id")).count().toDouble / brute.count()
  }

  test("trained quantizer recall on the driver corpus: within noise of any partition") {
    // The driver embeddings are near-uniform on the sphere (pair cos max
    // ~0.5): there are no clusters to find, so EVERY 16-cell Voronoi
    // partition — trained or not — gives statistically identical recall
    // (measured ~0.65 at nprobe=4/16). The assertion pins that floor; the
    // clustered-corpus test below is where training has signal to exploit.
    val t01 = Tables(spark, "/root/testdata/sf0.01")
    val trained = recallAt5(t01, Ivf.ivfCosineTopk(t01, 50, 5, 4))
    val naive = recallAt5(t01, Ivf.ivfCosineTopk(t01, 50, 5, 4, Ivf.naiveCentroids(t01)))
    info(f"driver corpus recall@5 nprobe=4/16: trained=$trained%.3f untrained=$naive%.3f")
    assert(trained >= 0.55, f"trained recall@5 $trained%.3f below the uniform-data floor")
    assert(trained >= naive - 0.05, "training may not materially hurt recall")
  }

  test("trained quantizer on clustered data: recall >= 0.9, beats untrained") {
    // A corpus with real cluster structure (16 tight direction clusters,
    // the realistic shape of sentence/document embeddings): Lloyd training
    // recovers the clusters, so a query's own cell holds its neighbors and
    // nprobe=4 recall must clear 0.9. The untrained first-K quantizer
    // double-covers some clusters and misses others.
    val dir = "/tmp/ivf_synth"
    val rnd = new scala.util.Random(13)
    val centers = Array.fill(16, 64)(rnd.nextGaussian())
    // Clusters contiguous in id space: ids 0..31 are cluster 0, etc. —
    // so the untrained first-16-ids quantizer sees HALF of one cluster
    // and must miss the other 15 (the worst case training exists to fix).
    val rows = (0 until 512).map { i =>
      val c = centers(i / 32)
      val v = c.map(x => (x + 0.15 * rnd.nextGaussian()).toFloat)
      (i.toLong, v.toSeq, s"c${i / 32}")
    }
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val ts = Tables(spark, dir)
    val trained = recallAt5(ts, Ivf.ivfCosineTopk(ts, 50, 5, 4))
    val naive = recallAt5(ts, Ivf.ivfCosineTopk(ts, 50, 5, 4, Ivf.naiveCentroids(ts)))
    info(f"clustered corpus recall@5 nprobe=4/16: trained=$trained%.3f untrained=$naive%.3f")
    assert(trained >= 0.9, f"trained recall@5 $trained%.3f below the 0.9 bar")
    assert(trained >= naive, f"training must win on clustered data ($trained%.3f < $naive%.3f)")
  }

  test("quantizer memo invalidates on in-place dataset rewrite") {
    // The trained-quantizer cache keys on a dataset snapshot (file names +
    // mtimes + sizes), so rewriting a path in place must retrain, never
    // serve the previous corpus's centroids.
    val dir = "/tmp/ivf_memo_inval"
    import spark.implicits._
    def write(seed: Int): Unit = {
      val rnd = new scala.util.Random(seed)
      (0 until 256).map { i =>
        (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat).toSeq, s"c${i / 16}")
      }.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }
    def cents(): Seq[String] =
      Ivf.centroids(Tables(spark, dir)).select("cell_id", "c_e")
        .collect().map(_.toString).sorted.toSeq
    write(1)
    val c1 = cents()
    write(2)
    // Drop the Tables-layer plan memo (it holds the OLD write's file
    // listing — a separate, documented immutability assumption); what's
    // under test here is the quantizer memo specifically.
    Tables.sessionMemo(spark).clear()
    val c2 = cents()
    assert(c1 != c2, "stale centroids served after in-place dataset rewrite")
  }

  test("nprobe/recall curve is monotone and reaches 1.0 at nprobe = K") {
    // The operating curve a user tunes against: each probed cell adds
    // candidates, so recall@5 is nondecreasing in nprobe and exactly 1.0
    // at nprobe = K (candidate set = corpus ⇒ identical to brute force).
    // Same deterministic clustered corpus as the test above, but at its
    // OWN path: rewriting a path the session already scanned serves a
    // stale file listing (and would alias the quantizer memo).
    val dir = "/tmp/ivf_synth_curve"
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
    val curve = Seq(1, 2, 4, 8, 16).map { np =>
      np -> recallAt5(ts, Ivf.ivfCosineTopk(ts, 50, 5, np))
    }
    info("clustered-corpus recall@5 by nprobe: " +
      curve.map { case (np, r) => f"$np->$r%.3f" }.mkString(", "))
    curve.sliding(2).foreach { case Seq((np1, r1), (np2, r2)) =>
      assert(r2 >= r1, f"recall fell from $r1%.3f (nprobe=$np1) to $r2%.3f (nprobe=$np2)")
    }
    assert(curve.last._2 == 1.0, "nprobe = K must reproduce brute force exactly")
  }
}
