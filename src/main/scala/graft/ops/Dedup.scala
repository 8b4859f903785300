package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sketch-based near-duplicate detection at scale (north star): MinHash +
  * LSH banding and SimHash. These are the 100 TB paths for the exact
  * Jaccard/shingle measures in [[Text]]/[[TextAnalysis]] — candidate
  * generation is linear (explode signature bands, equi-join on band hash)
  * instead of quadratic, and the exact measure then re-ranks only the
  * candidates.
  *
  * Sketches are seeded-hash-dependent, so results are engine-specific by
  * construction (deterministic within this engine — fixed seeds, no RNG at
  * runtime): driver correctness is rows-only; the property tests in
  * DedupSpec assert the guarantees that matter (candidates ⊇ identical
  * docs, LSH-candidate Jaccard ≫ random-pair Jaccard, determinism).
  */
object Dedup {

  val NumPerms = 32
  val Bands = 8
  val RowsPerBand: Int = NumPerms / Bands

  /** Mersenne prime 2^31 − 1. Hash values and coefficients are kept below
    * 2^31 so a·h + b < 2^62 — no Long overflow under ANSI mode (Spark 4
    * default raises on wraparound).
    */
  private val Prime = 2147483647L

  /** Deterministic permutation coefficients (fixed seed — no runtime RNG). */
  private val coeffs: Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(NumPerms)(((math.abs(rnd.nextLong()) % (Prime - 1)) + 1, math.abs(rnd.nextLong()) % Prime))
  }

  /** (doc_id, shingle) — word n-grams, generated map-side from the split
    * array (no window/shuffle). Shingling (not unigram sets) is what makes
    * MinHash discriminative: over a small vocabulary, unigram SETS of any
    * two long documents are nearly identical (measured median Jaccard
    * ~0.65 on this corpus → LSH would emit ~all pairs), while shingle
    * space is vocab^n and random-pair similarity drops to ~0.
    */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame = {
    val parts = (0 until n).map(o => s"toks[i+$o]").mkString(", ' ', ")
    docs
      .withColumn("toks", expr("filter(split(text, ' '), x -> x <> '')"))
      .withColumn("token", explode(expr(
        s"CASE WHEN size(toks) >= $n THEN transform(sequence(0, size(toks) - $n), i -> concat($parts)) ELSE array() END")))
      .select("doc_id", "token")
  }

  /** One pass over (doc_id, shingle): 32 permuted-min aggregates computed
    * side-by-side — no row explosion beyond the shingles themselves,
    * partial+final aggregation on doc_id. Docs with fewer than n tokens
    * have no shingles and drop out (nothing to near-dup against).
    */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val mins: Seq[Column] = coeffs.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h") * lit(a) + lit(b), lit(Prime))).as(s"m$i")
    }
    shingles(docs)
      .withColumn("h", pmod(xxhash64(col("token")), lit(Prime))) // hash once, permute 32×
      .groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
  }

  /** LSH banding: hash each band of 4 signature slots, explode to
    * (band_idx, band_hash) keys. Two docs collide on a band iff all 4
    * slots match → P(collide) ≈ 1 − (1 − j⁴)⁸ for Jaccard j.
    */
  def lshBands(sig: DataFrame): DataFrame = {
    val bandCols = (0 until Bands).map { bIdx =>
      val slots = (0 until RowsPerBand).map(r => col(s"m${bIdx * RowsPerBand + r}"))
      struct(lit(bIdx).as("band_idx"), xxhash64(slots: _*).as("band_hash"))
    }
    sig
      .select(col("doc_id"), explode(array(bandCols: _*)).as("band"))
      .select(col("doc_id"), col("band.band_idx").as("band_idx"), col("band.band_hash").as("band_hash"))
  }

  /** Candidate pairs: equi-join on (band_idx, band_hash) — the only
    * shuffle key; document bodies never move. Distinct because a pair can
    * collide in several bands.
    */
  def minhashCandidates(docs: DataFrame): DataFrame = {
    val bands = lshBands(minhashSignatures(docs))
    val a = bands.select(col("doc_id").as("a_id"), col("band_idx"), col("band_hash"))
    val b = bands.select(col("doc_id").as("b_id"), col("band_idx"), col("band_hash"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: LSH candidates → exact
    * shingle-set Jaccard re-rank → keep pairs ≥ minJaccard. Candidate
    * generation and the exact measure use the same shingle features.
    */
  def dedupMinhashLsh(t: Tables, minJaccard: Double = 0.5): DataFrame = {
    graft.functions.VectorExpressions.register(t.spark)
    val sets = shingles(t.documents)
      .groupBy("doc_id")
      .agg(collect_set(col("token")).as("s"))
    val cands = minhashCandidates(t.documents)
    cands
      .join(sets.select(col("doc_id").as("a_id"), col("s").as("a_s")), "a_id")
      .join(sets.select(col("doc_id").as("b_id"), col("s").as("b_s")), "b_id")
      .select(
        col("a_id"), col("b_id"),
        round(call_function("graft_jaccard", col("a_s"), col("b_s")), 6).as("jac"))
      .filter(col("jac") >= minJaccard)
      .orderBy("a_id", "b_id")
  }

  def dedupMinhash(t: Tables): DataFrame = dedupMinhashLsh(t)

  /** 64-bit SimHash: per-token hash votes ±1 per bit position, majority
    * sign per bit. Computed as 64 side-by-side SUM aggregates over the
    * token stream (single pass, partial+final, no row explosion — the
    * exploded (doc, bit, vote) formulation shuffles 64× the rows for the
    * same result), then one projection packs the sign bits into a long.
    */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    val votes: Seq[Column] = (0 until 64).map { k =>
      sum(when(shiftright(col("h"), k).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"v$k")
    }
    val pack: Column = (0 until 64)
      .map(k => when(col(s"v$k") > 0, lit(1L << k)).otherwise(lit(0L)))
      .reduce(_ + _)
    Text.tokens(docs)
      .withColumn("h", xxhash64(col("token")))
      .groupBy("doc_id")
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), pack.as("simhash"))
  }

  /** The registered `dedup_simhash` surface — the banded (unbounded,
    * 100 TB) path at a looser operating point than [[dedupSimhashBanded]]:
    * 8×8-bit bands make d ≤ 7 pigeonhole-exact, casting a wider near-dup
    * net at the cost of more band collisions (smaller chunks ⇒ more random
    * matches for the exact re-rank to discard). The round-1 probe-bounded
    * form (cross-join from a fixed probe set) is retired: it capped work by
    * CONTRACT rather than by plan shape, so it could never be the operator
    * a pipeline runs corpus-wide. One SimHash code path remains —
    * [[simhashBandedPairs]] — with two registered operating points.
    */
  def dedupSimhash(t: Tables, maxHamming: Int = 7, bands: Int = 8): DataFrame = {
    require(maxHamming < bands, "pigeonhole completeness needs maxHamming < bands")
    simhashBandedPairs(simhashSignatures(t.documents), maxHamming, bands)
  }

  /** Signature bands for the unbounded SimHash path: the 64-bit signature
    * split into `bands` contiguous chunks, exploded to (band_idx,
    * band_bits) keys. Pigeonhole guarantee: two signatures within Hamming
    * distance d < bands differ in at most d chunks, so at least one chunk
    * is bit-identical → every true pair collides on ≥ 1 band key. Shuffle
    * moves (doc_id, band) pairs only.
    */
  def simhashBands(sig: DataFrame, bands: Int = 4): DataFrame = {
    require(64 % bands == 0, s"bands must divide 64, got $bands")
    val bits = 64 / bands
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    val bandCols = (0 until bands).map { i =>
      struct(
        lit(i).as("band_idx"),
        shiftrightunsigned(col("simhash"), i * bits).bitwiseAND(lit(mask)).as("band_bits"))
    }
    sig
      .select(col("doc_id"), col("simhash"), explode(array(bandCols: _*)).as("band"))
      .select(col("doc_id"), col("simhash"),
        col("band.band_idx").as("band_idx"), col("band.band_bits").as("band_bits"))
  }

  /** Unbounded SimHash near-dup detection — the 100 TB path: candidates
    * via equi-join on (band_idx, band_bits), exact Hamming re-rank ≤
    * maxHamming. EXACT for maxHamming < bands (candidates ⊇ all true
    * pairs by pigeonhole, re-rank filters to exactly the true pairs) —
    * DedupSpec asserts equality with the brute-force pair join. The
    * default d=3 / 4×16-bit bands is the standard web-dedup operating
    * point (Manku et al., WWW'07 describe the same chunk-collision
    * scheme).
    */
  def dedupSimhashBanded(t: Tables, maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    require(maxHamming < bands, "pigeonhole completeness needs maxHamming < bands")
    simhashBandedPairs(simhashSignatures(t.documents), maxHamming, bands)
  }

  /** Banded candidate generation + exact Hamming re-rank over an arbitrary
    * (doc_id, simhash) signature table (factored out so property tests can
    * feed synthetic corpora).
    */
  def simhashBandedPairs(sig: DataFrame, maxHamming: Int, bands: Int): DataFrame = {
    val bd = simhashBands(sig, bands)
    val a = bd.select(col("doc_id").as("a_id"), col("simhash").as("a_sig"),
      col("band_idx"), col("band_bits"))
    val b = bd.select(col("doc_id").as("b_id"), col("simhash").as("b_sig"),
      col("band_idx"), col("band_bits"))
    a.join(b, Seq("band_idx", "band_bits"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sig").bitwiseXOR(col("b_sig"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct() // a pair may collide on several bands
      .orderBy("a_id", "b_id")
  }
}
