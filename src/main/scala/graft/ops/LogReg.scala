package graft.ops

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed logistic regression by batch gradient descent — the
  * aggregate-then-step training loop every scale-out ML system uses:
  * each iteration is ONE partial+final aggregate over the data (no
  * per-row state, no parameter server), the driver holds only the
  * weight vector, and the scan count equals the iteration count.
  * Completes the trained-structure family (k-means quantizer, PQ/IVF
  * codebooks, power-iteration PCA) with a supervised member.
  *
  * Determinism discipline (the reason this is reproducible when MLlib's
  * float tree-aggregation is not): every per-row gradient/loss
  * contribution is computed in a FIXED double expression, rounded to
  * integer micro-units, and summed as BIGINTs — integer addition is
  * associative, so any partitioning, any cluster size, any retry
  * produces bit-identical weight trajectories. The quantization error
  * (≤ 5e-7 per row per term) is orders below the gradient signal and
  * identical everywhere.
  *
  * Model: P(lang = 'en' | n_chars) with x = n_chars/300 and an
  * intercept — a deliberately small, fully-observable fit whose OUTPUT
  * is the training trajectory itself (iter, w, loss), the thing a
  * training job logs. Rows-only driver check (seeded trained state, same
  * class as kmeans_clusters); LogRegSpec pins determinism, partitioning
  * invariance, and monotone loss descent.
  */
object LogReg {

  val Iters = 5
  val LearningRate = 0.5

  def mlLogreg(t: Tables): DataFrame = {
    val spark = t.spark
    val data = t.documents
      // rows with NULL x or y would contribute NULL terms that sum()
      // skips — drop them first so n matches the summed row set and the
      // step stays a true mean gradient
      .filter(col("n_chars").isNotNull && col("lang").isNotNull)
      .select(
        (col("n_chars").cast("double") / 300.0).as("x"),
        when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
    val n = data.count()
    var w0 = 0.0
    var w1 = 0.0
    val trajectory = Seq.newBuilder[(Int, Long, Long, Long)]
    for (iter <- 0 to Iters) {
      // one aggregate per iteration: micro-quantized gradient + NLL sums
      val p = lit(1.0) / (lit(1.0) + exp(-(lit(w0) + lit(w1) * col("x"))))
      val stats = data.select(
        sum(round((p - col("y")) * 1e6).cast("long")).as("g0"),
        sum(round((p - col("y")) * col("x") * 1e6).cast("long")).as("g1"),
        sum(round((-col("y") * log(p) -
          (lit(1.0) - col("y")) * log(lit(1.0) - p)) * 1e6).cast("long")).as("nll"))
        .collect()(0)
      val lossMicro = stats.getLong(2) / n // mean NLL in micro-nats
      trajectory += ((iter, math.round(w0 * 1e6), math.round(w1 * 1e6), lossMicro))
      if (iter < Iters) {
        w0 -= LearningRate * stats.getLong(0).toDouble / (n * 1e6)
        w1 -= LearningRate * stats.getLong(1).toDouble / (n * 1e6)
      }
    }
    import spark.implicits._
    trajectory.result()
      .toDF("iter", "w0_micro", "w1_micro", "loss_micro")
      .orderBy("iter")
  }
}
