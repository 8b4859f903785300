package graft.ops

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset-split operators.
  *
  * A training pipeline needs *reproducible* samples: re-running the job on
  * the same snapshot — or on a different cluster — must pick the same rows,
  * so every operator here orders/assigns by a content hash (md5 of the key,
  * computable identically in any engine) instead of an RNG. All are either
  * pure map stages or a single stratum-keyed shuffle, so they hold at
  * 100 TB unchanged.
  */
object Sampling {

  /** Exact-count stratified sample: `perStratum` rows per event_type,
    * chosen by md5(event_id) order (a uniform, reproducible "random" order;
    * event_id tiebreak is unreachable for distinct ids but pins totality).
    * One shuffle keyed on the stratum; at extreme per-stratum cardinality
    * the same hash-order semantics support a two-phase per-partition top-N
    * (take perStratum per partition, re-rank the ≤ partitions×perStratum
    * survivors) because hash-order top-N is associative.
    */
  def sampleStratified(t: Tables, perStratum: Int = 5): DataFrame = {
    val h = md5(col("event_id").cast("string"))
    val w = Window.partitionBy("event_type").orderBy(h.asc, col("event_id").asc)
    t.events
      .select(col("event_type"), col("event_id"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= perStratum)
      .orderBy("event_type", "rn")
      .select("event_type", "rn", "event_id")
  }

  /** Weight-proportional Bernoulli sample with NO floating point in the
    * inclusion decision: doc d is kept iff u(d)·cap < n_chars(d)·2^32,
    * where u(d) is the first 8 hex chars of md5(doc_id) folded into a
    * 32-bit integer — i.e. P(keep) = min(1, n_chars/cap), docs at or above
    * `cap` chars always kept. Both sides of the comparison are exact
    * BIGINTs (≤ ~2.4e12), so any engine computing the same md5 makes the
    * identical per-row decision — the deterministic-sampling discipline of
    * [[sampleHash]] extended to weighted rates. Pure map stage, no shuffle.
    */
  def sampleWeighted(t: Tables, cap: Int = 400): DataFrame = {
    val u32 = graft.util.HexFold.u32(
      md5(col("doc_id").cast("string").cast("binary")))
    t.documents
      .withColumn("u32", u32)
      .filter(col("u32") * cap < col("n_chars") * lit(4294967296L))
      .select(
        col("doc_id"), col("n_chars"),
        round(least(lit(1.0), col("n_chars") / lit(cap.toDouble)), 6).as("p"))
      .orderBy("doc_id")
  }

  /** Hash-bucketed train/val/test split — assignment is a pure map (no
    * shuffle, no RNG): the first hex nibble of md5(doc_id) buckets docs
    * 12/2/2 of 16 into train/val/test (75%/12.5%/12.5%). Emitted here as
    * the per-(split, lang) audit aggregate a pipeline logs; the assignment
    * column itself is the first `select`.
    */
  def splitTrainTest(t: Tables): DataFrame = {
    val nib = substring(md5(col("doc_id").cast("string")), 1, 1)
    val split = when(nib.isin("c", "d"), "val")
      .when(nib.isin("e", "f"), "test")
      .otherwise("train")
    t.documents
      .select(split.as("split"), col("lang"), col("n_chars"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("split", "lang")
  }

  /** Class-balanced downsampling: every language keeps exactly
    * min-class-count documents, chosen by md5(doc_id) order (the same
    * reproducible hash-order draw as [[sampleStratified]] — no RNG, any
    * engine picks identical rows). The floor is a broadcast scalar; the
    * per-class ranking is one lang-keyed window. At extreme per-class
    * cardinality the two-phase per-partition top-N applies unchanged
    * (hash-order top-N is associative); the output here is the kept
    * (doc_id, lang) assignment a training run feeds downstream.
    */
  def balanceClasses(t: Tables): DataFrame = {
    val floor = t.documents.groupBy("lang")
      .agg(count(lit(1)).as("c"))
      .agg(min("c").cast("long").as("m"))
    val h = md5(col("doc_id").cast("string"))
    val w = Window.partitionBy("lang").orderBy(h.asc, col("doc_id").asc)
    t.documents
      .select(col("doc_id"), col("lang"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .crossJoin(broadcast(floor))
      .filter(col("rn") <= col("m"))
      .select("lang", "rn", "doc_id")
      .orderBy("lang", "rn")
  }

  /** Deterministic contrastive negative sampling — for each probe
    * document, k "negatives" drawn from a hash-selected global candidate
    * pool, excluding candidates that share the probe's `source` (the
    * usual same-domain leakage guard for contrastive pairs).
    *
    * Scale shape: the pool is the FIXED-SIZE hash-order head of the
    * corpus — the `PoolSize` docs with the smallest pool hash (a global
    * top-K, which Spark runs as per-partition top-K + a driver merge of
    * K·partitions rows, never a full sort). A fixed RATE (keep 1/p of
    * the corpus) would make probes × pool grow quadratically with the
    * corpus; a fixed SIZE keeps the pool broadcast-small at any corpus
    * size and the probe cross-product linear — ScaleRehearsalSpec pins
    * exactly this. Probes then cross the broadcast pool (map-only, no
    * corpus shuffle) and keep the k smallest PAIR hashes. Every choice
    * is a pure function of (probe_id, cand_id), so re-runs, retries, and
    * the DuckDB oracle all pick identical negatives — the no-RNG
    * discipline of [[sampleHash]] applied to pair selection.
    */
  val NegativePoolSize = 64

  def sampleNegatives(t: Tables, k: Int = 3): DataFrame = {
    val poolGate = graft.util.HexFold.u32(
      md5(concat(lit("pool:"), col("doc_id").cast("string")).cast("binary")))
    val pool = t.documents
      .select(col("doc_id").as("neg_id"), col("source").as("neg_source"),
        poolGate.as("pg"))
      .orderBy(col("pg").asc, col("neg_id").asc)
      .limit(NegativePoolSize)
      .drop("pg")
    val pairHash = graft.util.HexFold.u32(
      md5(concat(lit("neg:"), col("doc_id").cast("string"), lit(":"),
        col("neg_id").cast("string")).cast("binary")))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("h").asc, col("neg_id").asc)
    t.documents
      .filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), col("source"))
      .crossJoin(broadcast(pool))
      .filter(col("neg_source") =!= col("source") &&
        col("neg_id") =!= col("doc_id"))
      .withColumn("h", pairHash)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("neg_id"), col("neg_source"))
      .orderBy("doc_id", "rank")
  }
}
