package graft.ops

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path beside LSH ([[Ann]]). A coarse quantizer of K centroids partitions
  * the corpus into cells; each vector is assigned to its nearest centroid
  * once (an N×K broadcast dot-product pass — the "inverted file" is just
  * a cell_id column, i.e. a partition key); a query probes only its
  * `nprobe` nearest cells and exact-cosine re-ranks inside them.
  *
  * At cluster scale the corpus is hash-partitioned (or bucketed) by
  * cell_id, so probing nprobe cells touches nprobe/K of the data — the
  * candidate join is an equi-join on cell_id, never a cross join.
  *
  * Centroids here are picked deterministically (first K vec_ids — no
  * runtime RNG, no iterative k-means in v1; swap in trained centroids
  * without changing any plan shape). Recall degrades gracefully with
  * nprobe, and IvfSpec proves the limit case: nprobe = K reproduces the
  * brute-force top-k bit-for-bit.
  */
object Ivf {

  val NumCells = 16

  /** (cell_id, c_e, c_nrm) — the coarse quantizer, always broadcast. */
  def centroids(t: Tables): DataFrame =
    Ann.vectorsWithNorm(t)
      .filter(col("vec_id") < NumCells)
      .select(col("vec_id").as("cell_id"), col("e").as("c_e"), col("nrm").as("c_nrm"))

  /** Assign every vector to its nearest centroid by cosine (deterministic
    * argmax: ties break on lowest cell_id).
    */
  def assignments(t: Tables): DataFrame = {
    val v = Ann.vectorsWithNorm(t)
    val w = Window.partitionBy("vec_id").orderBy(desc("c_cos"), asc("cell_id"))
    v.crossJoin(broadcast(centroids(t)))
      .select(
        col("vec_id"), col("e"), col("nrm"), col("cell_id"),
        (Vector.dot(col("e"), col("c_e")) / (col("nrm") * col("c_nrm"))).as("c_cos"))
      .select(col("vec_id"), col("e"), col("nrm"), col("cell_id"),
        row_number().over(w).as("rn"))
      .filter(col("rn") === 1)
      .select("vec_id", "e", "nrm", "cell_id")
  }

  /** IVF top-k: probe the `nprobe` nearest cells per query, exact-cosine
    * re-rank the union of those cells.
    */
  def ivfCosineTopk(t: Tables, probeLimit: Int = 50, k: Int = 5, nprobe: Int = 4): DataFrame = {
    val assigned = assignments(t)
    val probes = assigned.filter(col("vec_id") < probeLimit)
      .select(col("vec_id").as("a_id"), col("e").as("a_e"), col("nrm").as("a_nrm"))
    val wCells = Window.partitionBy("a_id").orderBy(desc("p_cos"), asc("cell_id"))
    val probedCells = probes
      .crossJoin(broadcast(centroids(t)))
      .select(
        col("a_id"),
        col("cell_id"),
        (Vector.dot(col("a_e"), col("c_e")) / (col("a_nrm") * col("c_nrm"))).as("p_cos"))
      .select(col("a_id"), col("cell_id"), row_number().over(wCells).as("rn"))
      .filter(col("rn") <= nprobe)
      .select("a_id", "cell_id")
    val wTop = Window.partitionBy("a_id").orderBy(desc("cos"), asc("b_id"))
    probedCells
      .join(probes, "a_id")
      .join(
        assigned.select(col("vec_id").as("b_id"), col("e").as("b_e"),
          col("nrm").as("b_nrm"), col("cell_id")),
        Seq("cell_id"))
      .filter(col("a_id") =!= col("b_id"))
      .select(
        col("a_id"), col("b_id"),
        (Vector.dot(col("a_e"), col("b_e")) / (col("a_nrm") * col("b_nrm"))).as("cos"))
      .select(col("a_id"), col("b_id"), col("cos"), row_number().over(wTop).as("rn"))
      .filter(col("rn") <= k)
      .select(col("a_id"), col("b_id"), round(col("cos"), 6).as("cos"))
      .orderBy(asc("a_id"), desc("cos"), asc("b_id"))
  }
}
