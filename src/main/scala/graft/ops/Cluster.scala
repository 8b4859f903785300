package graft.ops

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unsupervised structure over the embedding corpus: surfaced k-means
  * cluster profiles (the trained IVF coarse quantizer IS a k-means model —
  * here its clusters become the result instead of an index) and the top
  * principal component by distributed exact covariance + driver power
  * iteration.
  *
  * Both are engine-specific trained surfaces (seeded deterministic
  * training, like the ANN/sketch family) — no cross-engine SQL oracle
  * exists by construction; ClusterSpec pins determinism, mass
  * conservation, eigen residuals, and variance-dominance instead.
  *
  * Scale shape: the k-means pass reuses [[Ivf.assignments]] (one broadcast
  * of K centroids over the corpus, no shuffle beyond the per-cell
  * aggregate); the PCA Gram pass is the textbook distributed covariance —
  * one `mapPartitions` sweep accumulating d(d+1)/2 EXACT integer products
  * per partition (inputs quantized to micro-units first, so partial sums
  * are order-free integers — the same discipline the oracled ops use for
  * ln terms), one driver reduce over #partitions records, then O(d²)
  * driver power iteration. Nothing quadratic in rows anywhere; driver
  * state is d² longs per partition record — the same class as
  * RangePartitioner boundaries.
  */
object Cluster {

  /** Per-cluster profile of the trained Lloyd quantizer over the
    * embeddings: size, corpus share, and mean member-to-centroid cosine
    * (cohesion). Cosines round to micro-units BEFORE the per-cell sum, so
    * the aggregate is an exact integer reduction.
    */
  def kmeansClusters(t: Tables): DataFrame = {
    val quant = Ivf.centroids(t)
    val assigned = Ivf.assignments(t, quant)
    val total = assigned.select(count(lit(1)).cast(LongType).as("n_tot"))
    assigned
      .join(broadcast(quant), "cell_id")
      .withColumn(
        "cos_micro",
        round(Vector.dot(col("e"), col("c_e")) / (col("nrm") * col("c_nrm")) * lit(1e6))
          .cast(LongType))
      .groupBy("cell_id")
      .agg(
        count(lit(1)).cast(LongType).as("n_vecs"),
        sum("cos_micro").as("cos_sum"))
      .crossJoin(broadcast(total))
      .select(
        col("cell_id"), col("n_vecs"),
        round(col("n_vecs").cast(DoubleType) / col("n_tot"), 6).as("share"),
        round(col("cos_sum").cast(DoubleType) / col("n_vecs") / lit(1e6), 6).as("avg_cos"))
      .orderBy("cell_id")
  }

  val PowerIters = 60

  /** Exact integer second-moment statistics of the quantized corpus:
    * (n, Σx, upper-triangular Σx·xᵀ) in micro / micro² units.
    *
    * Magnitude: per-partition Gram entries accumulate |x|²·rows ≲
    * (5e6)²·1e5 ≈ 2.5e18 — inside int64 for any test SF with ~400×
    * headroom per 10× row growth; a deployment pushing partitions past
    * ~1e7 rows splits partitions (or widens to two-long accumulation),
    * it does not change the algorithm.
    */
  private def momentSums(t: Tables): (Long, Array[BigInt], Array[Array[BigInt]], Int) = {
    import t.spark.implicits._
    val q = Ann.vectorsWithNorm(t)
      .select(transform(col("e"), x => round(x * lit(1e6)).cast(LongType)).as("eq"))
      .as[Seq[Long]]
    val dim = q.head().size
    val parts = q.mapPartitions { it =>
      val s = new Array[Long](dim)
      val g = new Array[Long](dim * (dim + 1) / 2)
      var n = 0L
      it.foreach { row =>
        val x = row.toArray
        n += 1
        var i = 0
        var k = 0
        while (i < dim) {
          s(i) += x(i)
          var j = i
          while (j < dim) { g(k) += x(i) * x(j); k += 1; j += 1 }
          i += 1
        }
      }
      if (n == 0) Iterator.empty else Iterator.single((n, s, g))
    }.collect()
    val n = parts.map(_._1).sum
    val s = Array.fill(dim)(BigInt(0))
    val g = Array.fill(dim, dim)(BigInt(0))
    parts.foreach { case (_, ps, pg) =>
      var i = 0
      var k = 0
      while (i < dim) {
        s(i) += ps(i)
        var j = i
        while (j < dim) { g(i)(j) += pg(k); g(j)(i) = g(i)(j); k += 1; j += 1 }
        i += 1
      }
    }
    (n, s, g, dim)
  }

  /** Top principal component of the embeddings: covariance from the exact
    * integer moments (C_ij = Σxᵢxⱼ/n − μᵢμⱼ, derived on the driver from
    * the order-free sums, so C is bit-identical across runs), then
    * [[PowerIters]] power iterations from the all-ones start with the
    * leading component's sign pinned positive. Output is each vector's
    * centered projection onto the component plus the explained-variance
    * ratio — the 1-D curriculum/diversity coordinate a data pipeline
    * derives from an embedding column.
    */
  def vecPcaPower(t: Tables): DataFrame = {
    val (n, s, g, dim) = momentSums(t)
    val nd = n.toDouble
    val mu = s.map(_.toDouble / nd / 1e6)
    // covariance in UNIT² (micro² scaled back): exact-sum term minus mean
    // outer product
    val c = Array.tabulate(dim, dim) { (i, j) =>
      g(i)(j).toDouble / nd / 1e12 - mu(i) * mu(j)
    }
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var lambda = 0.0
    for (_ <- 1 to PowerIters) {
      val w = Array.tabulate(dim) { i =>
        var acc = 0.0
        var j = 0
        while (j < dim) { acc += c(i)(j) * v(j); j += 1 }
        acc
      }
      val nrm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / nrm)
      lambda = nrm
    }
    // sign convention: first coordinate with |v_i| > 1e-9 is positive
    val lead = v.indexWhere(x => math.abs(x) > 1e-9)
    if (lead >= 0 && v(lead) < 0) v = v.map(-_)
    val totalVar = (0 until dim).map(i => c(i)(i)).sum
    val evr = math.rint(lambda / totalVar * 1e6) / 1e6

    val vCol = array(v.toIndexedSeq.map(lit(_)): _*)
    val muDotV = (0 until dim).map(i => mu(i) * v(i)).sum
    Ann.vectorsWithNorm(t)
      .select(
        col("vec_id"),
        round(Vector.dot(col("e"), vCol) - lit(muDotV), 6).as("proj"),
        lit(evr).as("evr"))
      .orderBy("vec_id")
  }

  /** Driver-side covariance accessor for ClusterSpec (residual checks). */
  private[graft] def covarianceForSpec(t: Tables): (Array[Array[Double]], Long) = {
    val (n, s, g, dim) = momentSums(t)
    val nd = n.toDouble
    val mu = s.map(_.toDouble / nd / 1e6)
    (Array.tabulate(dim, dim) { (i, j) =>
      g(i)(j).toDouble / nd / 1e12 - mu(i) * mu(j)
    }, n)
  }
}
