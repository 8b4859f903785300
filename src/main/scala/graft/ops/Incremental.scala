package graft.ops

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental dedup — the block discipline applied to MinHash/LSH.
  *
  * A corpus pipeline never re-deduplicates 100 TB because one new block
  * arrived: the accumulated corpus's band table (doc_id, band_idx,
  * band_hash — bytes per doc) is materialized once and kept (at scale:
  * written bucketed on the band key via [[graft.sources.Bucketing]], so
  * the per-block join below shuffles ONLY the new block's bands).
  * Each arriving block computes signatures for its own docs — a pure map
  * stage — and candidate-joins against the store. Cost per block is
  * O(|block|) compute + one equi-join probe, independent of corpus size;
  * candidates then feed the usual exact re-rank and (for cluster
  * maintenance) [[Graph.connectedComponents]] over stored + new edges.
  *
  * IncrementalSpec proves the invariant that makes this sound: block-vs-
  * store candidates are exactly the full-recompute candidates restricted
  * to cross-boundary pairs — signatures are per-document, so incremental
  * and batch computation cannot diverge.
  */
object IncrementalDedup {

  /** The band table to materialize for an accumulated corpus:
    * (doc_id, band_idx, band_hash).
    */
  def bandStore(docs: DataFrame): DataFrame =
    Dedup.lshBands(Dedup.minhashSignatures(docs))

  /** Candidate pairs of a new block against a stored band table —
    * (new_id, old_id), distinct. The two inputs are assumed disjoint
    * (blocks are immutable and appended once).
    */
  def newBlockCandidates(newDocs: DataFrame, store: DataFrame): DataFrame = {
    val nb = bandStore(newDocs)
      .select(col("doc_id").as("new_id"), col("band_idx"), col("band_hash"))
    val ob = store
      .select(col("doc_id").as("old_id"), col("band_idx"), col("band_hash"))
    nb.join(ob, Seq("band_idx", "band_hash"))
      .select("new_id", "old_id")
      .distinct()
  }

  /** The registered daily-arrival drive (`incremental_dedup`): the corpus
    * split two-phase — accumulated store = `doc_id % 3 != 0`, today's block
    * = `doc_id % 3 == 0` — then the full incremental pipeline: materialize
    * the store's band table, candidate-join ONLY the block's bands against
    * it, exact shingle-Jaccard re-rank, keep pairs ≥ minJaccard.
    *
    * Oracle-checkable (ExtraSql `incremental_dedup`): the DuckDB side is
    * the exact cross-boundary Jaccard join at the same threshold. Equality
    * holds when LSH recall on the corpus's true pairs is total — this
    * corpus's near-dup pairs sit at j ≥ 0.88 (P[band hit] ≈ 1−(1−j⁴)⁸ >
    * 0.998, and identical docs collide with certainty), and the seeded
    * hashes make the outcome deterministic, so the driver's hash compare is
    * stable run to run. IncrementalSpec separately proves the structural
    * invariant (block-vs-store candidates ≡ batch candidates restricted to
    * cross-boundary) that makes the incremental discipline sound at ANY
    * recall.
    *
    * At 100 TB: the store's band table is written once, bucketed on
    * (band_idx, band_hash); each day's block computes its own bands (pure
    * map over the block) and probes — per-block cost O(|block|), never
    * O(|corpus|).
    */
  def incrementalDedup(t: Tables, minJaccard: Double = 0.5): DataFrame = {
    graft.functions.VectorExpressions.register(t.spark)
    val docs = t.documents
    val store = docs.filter(col("doc_id") % 3 =!= 0)
    val block = docs.filter(col("doc_id") % 3 === 0)
    val cands = newBlockCandidates(block, bandStore(store))
    // Exact re-rank over distinct shingle sets, same evaluate-once explode
    // barrier as Dedup.dedupMinhashLsh (jac computed once per pair).
    val sets = Dedup.shingleArray(docs)
      .select(col("doc_id"), array_distinct(col("shingles")).as("s"))
      .repartition(col("doc_id"))
    cands
      .join(sets.select(col("doc_id").as("new_id"), col("s").as("n_s")), "new_id")
      .join(sets.select(col("doc_id").as("old_id"), col("s").as("o_s")), "old_id")
      .select(col("new_id"), col("old_id"),
        explode(array(round(call_function("graft_jaccard", col("n_s"), col("o_s")), 6))).as("jac"))
      .filter(col("jac") >= minJaccard)
      .orderBy("new_id", "old_id")
  }
}
