package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Ann, Cluster, Ivf}

/** Trained embedding-structure surfaces: k-means cluster profiles conserve
  * corpus mass and agree with the IVF assignment they derive from; the
  * power-iteration principal component satisfies the eigen residual bound,
  * dominates every coordinate direction, and reproduces bit-identically.
  */
class ClusterSpec extends AnyFunSuite with SparkSessionFixture {

  private lazy val t = Tables(spark, "/root/testdata/sf0.001")

  test("kmeans_clusters conserves corpus mass and matches Ivf assignment sizes") {
    val prof = Cluster.kmeansClusters(t).cache()
    val nVecs = t.embeddings.count()
    assert(prof.agg(sum("n_vecs")).head().getLong(0) === nVecs)
    assert(prof.filter(col("avg_cos") < -1.000001 || col("avg_cos") > 1.000001).count() === 0)
    val shares = prof.agg(sum("share")).head().getDouble(0)
    assert(math.abs(shares - 1.0) < 1e-3)
    // sizes must be exactly the quantizer assignment's cell histogram
    val fromIvf = Ivf.assignments(t).groupBy("cell_id").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    prof.select("cell_id", "n_vecs").collect().foreach { r =>
      assert(fromIvf(r.getInt(0)) === r.getLong(1))
    }
    prof.unpersist()
  }

  test("kmeans_clusters members are closer to their own centroid than corpus mean cosine") {
    // cohesion sanity: the weighted mean of per-cell avg_cos must beat the
    // global mean pairwise-to-centroid cosine under a RANDOM single-cell
    // assignment, proxied by assigning everything to cell 0
    val prof = Cluster.kmeansClusters(t)
    val weighted = prof.select(sum(col("avg_cos") * col("n_vecs")).as("w"), sum("n_vecs").as("n"))
      .select(col("w") / col("n")).head().getDouble(0)
    val quant = Ivf.centroids(t).filter(col("cell_id") === 0)
    val toCell0 = Ann.vectorsWithNorm(t).crossJoin(quant)
      .select(avg(graft.ops.Vector.dot(col("e"), col("c_e")) / (col("nrm") * col("c_nrm"))))
      .head().getDouble(0)
    assert(weighted > toCell0, s"trained cohesion $weighted must beat single-cell $toCell0")
  }

  test("vec_pca_power satisfies the eigen residual bound and dominates axes") {
    val (c, _) = Cluster.covarianceForSpec(t)
    val dim = c.length
    // recompute v/λ the way the query does (same driver arithmetic)
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var lambda = 0.0
    for (_ <- 1 to Cluster.PowerIters) {
      val w = Array.tabulate(dim)(i => (0 until dim).map(j => c(i)(j) * v(j)).sum)
      val nrm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / nrm); lambda = nrm
    }
    val res = Array.tabulate(dim)(i =>
      (0 until dim).map(j => c(i)(j) * v(j)).sum - lambda * v(i))
    val resNorm = math.sqrt(res.map(x => x * x).sum)
    assert(resNorm <= 0.05 * lambda,
      s"power iteration must converge: residual $resNorm vs λ=$lambda")
    // the top eigenvalue dominates the variance of every coordinate axis
    (0 until dim).foreach(i => assert(c(i)(i) <= lambda + 1e-9))
  }

  test("vec_pca_power output: projection variance matches evr and reruns are identical") {
    val out = Cluster.vecPcaPower(t).cache()
    assert(out.count() === t.embeddings.count())
    val evr = out.select("evr").head().getDouble(0)
    assert(evr > 0 && evr <= 1.0 + 1e-9)
    // empirical variance of proj / total variance ≈ evr (rounding + float
    // tolerance: projections are rounded to 1e-6)
    val (c, _) = Cluster.covarianceForSpec(t)
    val totalVar = (0 until c.length).map(i => c(i)(i)).sum
    val projVar = out.select(variance(col("proj"))).head().getDouble(0) *
      (out.count() - 1).toDouble / out.count()
    assert(math.abs(projVar / totalVar - evr) < 0.01,
      s"projection variance ratio ${projVar / totalVar} vs evr $evr")
    val a = out.collect().map(_.mkString("|")).toSeq
    val b = Cluster.vecPcaPower(t).collect().map(_.mkString("|")).toSeq
    assert(a === b)
    out.unpersist()
  }
}
