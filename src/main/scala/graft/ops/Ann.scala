package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Approximate nearest neighbor over embeddings (north star): random-
  * hyperplane LSH bucketing with exact cosine re-rank. This is the scale
  * path for [[Vector.simCosineTopk]]: candidate generation is an equi-join
  * on bucket keys (linear in corpus size), and only candidates pay the
  * exact-cosine cost.
  *
  * Hyperplanes are generated driver-side from a fixed seed — deterministic
  * across runs, no runtime RNG. Multiple small tables (4 × 8 bits) trade
  * precision for recall: a pair is a candidate if it collides in ANY
  * table. Brute force remains the exactness baseline (AnnSpec measures
  * recall against it).
  */
object Ann {

  val NumTables = 4
  val BitsPerTable = 8
  val Dim = 64

  /** [table][bit][dim] — fixed-seed unit-free gaussian components. */
  private val planes: Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(NumTables, BitsPerTable, Dim)(rnd.nextGaussian())
  }

  /** Signature for one table: Σ_b (sign(e·p_b) << b), via the native dot
    * product against literal plane arrays.
    */
  private def tableSignature(e: Column, table: Int): Column =
    (0 until BitsPerTable).map { b =>
      when(Vector.dot(e, typedlit(planes(table)(b).toSeq)) >= 0, 1L << b).otherwise(0L)
    }.reduce(_ + _)

  /** (vec_id, e, nrm) — one row per vector. */
  def vectorsWithNorm(t: Tables): DataFrame = {
    graft.functions.VectorExpressions.register(t.spark)
    val e = transform(col("embedding"), x => x.cast(DoubleType))
    t.embeddings
      .select(col("vec_id"), e.as("e"))
      .withColumn("nrm", sqrt(Vector.dot(col("e"), col("e"))))
  }

  /** (vec_id, e, nrm, table_idx, bucket) — one row per (vector, table). */
  def bucketed(t: Tables): DataFrame = {
    val tables = (0 until NumTables).map { i =>
      struct(lit(i).as("table_idx"), tableSignature(col("e"), i).as("bucket"))
    }
    vectorsWithNorm(t)
      .select(col("vec_id"), col("e"), col("nrm"), explode(array(tables: _*)).as("tb"))
      .select(col("vec_id"), col("e"), col("nrm"),
        col("tb.table_idx").as("table_idx"), col("tb.bucket").as("bucket"))
  }

  /** ANN top-k per probe (vec_id < probeLimit): bucket-collision
    * candidates from any table, exact cosine re-rank, top-k.
    *
    * Plan-shape notes (both alternatives measured at sf0.1, round 4):
    * the probe side is bounded by contract, so `vec_id < probeLimit`
    * pushes into the probe branch's parquet scan and the tiny probe bucket
    * set broadcasts — the corpus side streams through one bucket
    * computation with no shuffle before the candidate distinct. The
    * repartition-shared self-join shape the unbounded dedup pipelines use
    * was 30% slower here (corpus-wide band shuffle + post-shuffle probe
    * filter), and an explode-barrier around the cast transform (the
    * Dedup fix) was ~25% slower still — CollapseProject does not in fact
    * re-inline the aliased transform in this plan, so the barrier is pure
    * Generate overhead. Measure before barriering.
    */
  def annCosineTopk(t: Tables, probeLimit: Int = 50, k: Int = 5): DataFrame = {
    val b = bucketed(t)
    val w = Window.partitionBy("a_id").orderBy(desc("cos"), asc("b_id"))
    // Dedup candidates on the id pair alone (cheap), then fetch vectors
    // once per surviving pair — never distinct over the 64-dim arrays.
    val v = vectorsWithNorm(t)
    b.filter(col("vec_id") < probeLimit)
      .select(col("vec_id").as("a_id"), col("table_idx"), col("bucket"))
      .join(
        b.select(col("vec_id").as("b_id"), col("table_idx"), col("bucket")),
        Seq("table_idx", "bucket"))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
      .join(v.select(col("vec_id").as("a_id"), col("e").as("a_e"), col("nrm").as("a_nrm")), "a_id")
      .join(v.select(col("vec_id").as("b_id"), col("e").as("b_e"), col("nrm").as("b_nrm")), "b_id")
      .select(
        col("a_id"), col("b_id"),
        (Vector.dot(col("a_e"), col("b_e")) / (col("a_nrm") * col("b_nrm"))).as("cos"))
      .select(col("a_id"), col("b_id"), col("cos"), row_number().over(w).as("rn"))
      .filter(col("rn") <= k)
      .select(col("a_id"), col("b_id"), round(col("cos"), 6).as("cos"))
      .orderBy(asc("a_id"), desc("cos"), asc("b_id"))
  }
}
