package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector-similarity operators (SURVEY.md §2.2 north star): brute-force
  * cosine top-k and k-NN label voting over the 64-dim embedding vectors.
  *
  * Scale design: the probe side is bounded (vec_id < 50 / < 100) and
  * broadcast, so the pair generation is a broadcast nested-loop over the
  * full corpus — linear in corpus size, never corpus×corpus. Norms are
  * hoisted out of the pair expression (computed once per vector, not once
  * per pair — identical doubles, ~3× less work than the naive per-pair
  * form). The unbounded 100 TB path is LSH bucketing (graft.ops.Ann)
  * feeding candidates into this same exact cosine re-rank.
  */
object Vector {

  /** Fold-based dot product over two double arrays — the declared-contract
    * reference semantics. The hot path uses the bit-identical native
    * codegen expression [[graft.functions.DotProduct]] instead (one fused
    * loop vs per-element lambda dispatch).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)

  /** Native codegen'd dot product (requires
    * [[graft.functions.VectorExpressions.register]], done by [[vectors]]).
    */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** vec_id, e (double array), nrm. */
  private def vectors(t: Tables): DataFrame = {
    graft.functions.VectorExpressions.register(t.spark)
    t.embeddings.select(
      col("vec_id"),
      transform(col("embedding"), x => x.cast(DoubleType)).as("e"),
      l2norm(transform(col("embedding"), x => x.cast(DoubleType))).as("nrm"))
  }

  /** Cosine pairs (probe × corpus), probe broadcast. */
  private def cosinePairs(t: Tables, probeLimit: Int): DataFrame = {
    val v = vectors(t)
    val a = broadcast(v.filter(col("vec_id") < probeLimit))
      .select(col("vec_id").as("a_id"), col("e").as("a_e"), col("nrm").as("a_nrm"))
    val b = v.select(
      col("vec_id").as("b_id"), col("e").as("b_e"), col("nrm").as("b_nrm"))
    a.join(b, col("a_id") =!= col("b_id"))
      .select(
        col("a_id"), col("b_id"),
        (dot(col("a_e"), col("b_e")) / (col("a_nrm") * col("b_nrm"))).as("cos"))
  }

  def simCosineTopk(t: Tables): DataFrame = {
    val w = Window.partitionBy("a_id").orderBy(desc("cos"), asc("b_id"))
    cosinePairs(t, 50)
      .select(col("a_id"), col("b_id"), col("cos"), row_number().over(w).as("rn"))
      .filter(col("rn") <= 5)
      .select(col("a_id"), col("b_id"), round(col("cos"), 6).as("cos"))
      .orderBy(asc("a_id"), desc("cos"), asc("b_id"))
  }

  /** Embedding-cosine near-duplicate detection: all pairs with cosine ≥
    * 0.4 (full pair join at test scale; the 100 TB path prefilters with
    * LSH banding — [[Ann]] — and re-ranks candidates with this same
    * expression).
    */
  def simCosineThreshold(t: Tables): DataFrame = {
    val v = vectors(t)
    val a = v.select(col("vec_id").as("a_id"), col("e").as("a_e"), col("nrm").as("a_nrm"))
    val b = v.select(col("vec_id").as("b_id"), col("e").as("b_e"), col("nrm").as("b_nrm"))
    a.join(b, col("a_id") < col("b_id"))
      .select(
        col("a_id"), col("b_id"),
        (dot(col("a_e"), col("b_e")) / (col("a_nrm") * col("b_nrm"))).as("cos"))
      .filter(col("cos") >= 0.4)
      .select(col("a_id"), col("b_id"), round(col("cos"), 6).as("cos"))
      .orderBy("a_id", "b_id")
  }

  /** k-NN (k=5) majority vote: top-5 cosine neighbors per probe, then a
    * vote count per (probe, label).
    */
  def knnLabelVote(t: Tables): DataFrame = {
    val labels = broadcast(
      t.embeddings.select(col("vec_id").as("l_id"), col("label").as("b_label")))
    val w = Window.partitionBy("a_id").orderBy(desc("cos"), asc("b_id"))
    cosinePairs(t, 100)
      .select(col("a_id"), col("b_id"), row_number().over(w).as("rn"))
      .filter(col("rn") <= 5)
      .join(labels, col("b_id") === col("l_id"))
      .groupBy("a_id", "b_label")
      .agg(count(lit(1)).as("votes"))
      .select(col("a_id"), col("b_label").as("pred"), col("votes"))
      .orderBy(asc("a_id"), desc("votes"), asc("pred"))
  }
}
