package graft.ops

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
}
