package graft.ops

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-ADC: the composition of the [[Ivf]] coarse quantizer with the
  * [[Pq]] codes/ADC stage — the standard two-level ANN index (Jégou et
  * al., "Product Quantization for Nearest Neighbor Search", TPAMI 2011,
  * §V "IVFADC"). [[Pq.pqCosineTopk]] is exhaustive ADC: every probe's
  * lookup table scores the WHOLE code table. Here the coarse quantizer
  * prunes first — each corpus vector carries its IVF cell beside its PQ
  * codes (the inverted file with PQ payloads), a probe ranks only the
  * `nprobe` nearest cells, and the ADC scan touches only code rows whose
  * cell is probed: ~nprobe/[[Ivf.NumCells]] of the corpus per probe
  * instead of all of it. At 100 TB that is the difference between
  * streaming every 4-byte code per probe and streaming 1/4 cell-pruned
  * shards of them; the cell column is the partition/bucketing key, so the
  * probed-cell restriction is partition pruning, not a filter scan.
  *
  * Spark shape: probed cells (probes·nprobe rows) pre-join the broadcast
  * ADC LUT, so the corpus-side scan is ONE broadcast hash join keyed
  * (cell, subspace, code) — the per-code-row fan-out is the number of
  * probes that probed its cell (exhaustive ADC fans out to ALL probes).
  * The only shuffle is the same partial+final SUM over (probe, vector)
  * as exhaustive PQ, now over ~nprobe/K as many rows, followed by the
  * shared [[Pq.adcRerank]] exact re-rank.
  *
  * This variant encodes RAW vectors (not residuals x − centroid): the
  * codebooks are shared with [[Pq]] — memoized once per dataset — and on
  * this corpus the recall cost vs residual encoding is within the spec's
  * measurement noise, while residual codebooks would force a second
  * training pass keyed by cell. Recall ≤ min(IVF recall, PQ recall) by
  * construction (candidates are the intersection of both prunings);
  * IvfPqSpec pins the floors and the scan-volume claim.
  *
  * Engine-specific seeded sketch (trained quantizer + codebooks) ⇒ no
  * cross-engine oracle; driver records rows-only, like its siblings
  * ann_ivf_topk / ann_pq_topk.
  */
object IvfPq {

  /** ADC-scored candidate pairs (a_id, b_id, adot), restricted to probed
    * cells. Exposed separately so the scale gate can assert the scan
    * volume (`count` of this frame's pre-aggregation input is
    * probes · NumSub · |probed cells' rows|) grows as n·nprobe/K, not n.
    */
  def adcScoredPairs(t: Tables, probeLimit: Int = 50, nprobe: Int = 4): DataFrame = {
    val quant = Ivf.centroids(t)
    val cb = Pq.codebook(t)
    val v = Ann.vectorsWithNorm(t)
    val probes = v.filter(col("vec_id") < probeLimit)
      .select(col("vec_id").as("a_id"), col("e").as("a_e"), col("nrm").as("a_nrm"))
    // nprobe nearest cells per probe — identical ranking to Ivf.ivfCosineTopk.
    val wCells = Window.partitionBy("a_id").orderBy(desc("p_cos"), asc("cell_id"))
    val probedCells = probes
      .crossJoin(broadcast(quant))
      .select(col("a_id"), col("cell_id"),
        (Vector.dot(col("a_e"), col("c_e")) / (col("a_nrm") * col("c_nrm"))).as("p_cos"))
      .select(col("a_id"), col("cell_id"), row_number().over(wCells).as("rn"))
      .filter(col("rn") <= nprobe)
      .select(col("a_id"), col("cell_id").as("p_cell"))
    // LUT × probed cells: probes·nprobe·NumSub·KSub rows — still tiny,
    // and folding the cell restriction into the broadcast side makes the
    // corpus scan a single (cell, subspace, code)-keyed hash join.
    val lutCells = Pq.lut(probes, cb).join(probedCells, Seq("a_id"))
    // The inverted file: PQ codes annotated with their coarse cell.
    val codesWithCell = Pq.codes(t, cb)
      .join(Ivf.assignments(t, quant).select(col("vec_id"), col("cell_id")), Seq("vec_id"))
      .select(col("vec_id").as("b_id"), col("sub_id"), col("code"), col("cell_id"))
    codesWithCell
      .join(broadcast(lutCells),
        col("cell_id") === col("p_cell") &&
          col("sub_id") === col("l_sub") && col("code") === col("l_cell"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(sum(col("pdot")).as("adot"))
  }

  /** IVF-ADC top-k: cell-pruned ADC candidates, exact re-rank of the top
    * [[Pq.RerankDepth]]. Same output shape/contract as
    * [[Ivf.ivfCosineTopk]] and [[Pq.pqCosineTopk]].
    */
  def ivfpqCosineTopk(
      t: Tables, probeLimit: Int = 50, k: Int = 5, nprobe: Int = 4): DataFrame = {
    val v = Ann.vectorsWithNorm(t)
    val probes = v.filter(col("vec_id") < probeLimit)
      .select(col("vec_id").as("a_id"), col("e").as("a_e"), col("nrm").as("a_nrm"))
    Pq.adcRerank(v, probes, adcScoredPairs(t, probeLimit, nprobe), k)
  }
}
