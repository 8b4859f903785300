package graft.ops

import graft.Tables
import graft.pipeline.Pipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Relational.{dbl, dec}

/** A declared query composed THROUGH the pipeline graph API
  * ([[graft.pipeline.Pipeline]]) — proves the basis-style node layer
  * yields oracle-exact relational results: the Pipeline only wires
  * DataFrame transformations, so Catalyst sees one fused plan.
  */
object Pipelines {

  def pipelineRevenueBySegment(t: Tables): DataFrame =
    new Pipeline()
      .source("orders")(s => Tables(s, t.sfDir).orders)
      .source("customer")(s => Tables(s, t.sfDir).customer)
      .node("big_orders", "orders")(in =>
        in("orders").filter(col("o_totalprice") > 150000.0))
      .node("enriched", "big_orders", "customer")(in =>
        in("big_orders").join(in("customer"),
          col("o_custkey") === col("c_custkey")))
      .node("by_segment", "enriched")(in =>
        in("enriched")
          .groupBy("c_mktsegment")
          .agg(
            count(lit(1)).as("n"),
            dbl(sum(dec(col("o_totalprice"))).cast(DecimalType(38, 2))).as("rev"))
          .orderBy("c_mktsegment"))
      .produce(t.spark, "by_segment")

  /** The training-data preparation tail a pretraining pipeline runs after
    * cleaning, composed through the node graph: exact dedup (md5(text),
    * keep min doc_id) → hash-stable train/val/test assignment → overlapping
    * token-window chunking → per-split audit (docs, chunks, token mass).
    * Every stage reuses an oracled standalone operator
    * ([[graft.ops.Packing.textChunk]] / [[graft.ops.Sampling.splitTrainTest]]
    * semantics), so the composition is checkable end to end; the chunk
    * fan-out is a pure map, leaving two shuffles total (dedup hash key,
    * split-audit key).
    */
  def pipelineTrainPrep(t: Tables): DataFrame =
    new Pipeline()
      .source("docs")(s => Tables(s, t.sfDir).documents)
      .node("uniq", "docs")(in => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(md5(col("text"))).orderBy(col("doc_id").asc)
        in("docs").withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
      })
      .node("splits", "uniq")(in => {
        val nib = substring(md5(col("doc_id").cast("string")), 1, 1)
        in("uniq").withColumn("split",
          when(nib.isin("c", "d"), "val")
            .when(nib.isin("e", "f"), "test")
            .otherwise("train"))
      })
      .node("chunks", "splits")(in =>
        in("splits")
          .select(col("doc_id"), col("split"),
            expr("filter(split(text, ' '), x -> x <> '')").as("toks"))
          .withColumn("n_tok", size(col("toks")).cast("long"))
          .filter(col("n_tok") > 0)
          .select(col("doc_id"), col("split"), col("n_tok"),
            explode(sequence(lit(0L), col("n_tok") - 1, lit(16L))).as("start"))
          .select(col("doc_id"), col("split"),
            (least(col("start") + 24, col("n_tok")) - col("start")).as("n_toks")))
      .node("audit", "chunks")(in =>
        in("chunks")
          .groupBy("split")
          .agg(
            countDistinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_chunks"),
            sum(col("n_toks")).as("sum_tokens"))
          .orderBy("split"))
      .produce(t.spark, "audit")

  /** The end-to-end corpus-cleaning job a pretraining pipeline runs,
    * composed through the node graph: quality-gate (score ≥ 4.5) → exact
    * dedup (md5(text), keep min doc_id) → near-dup dedup (sorted-token-set
    * fingerprint, keep best quality) → per-language audit summary. Three
    * shuffles total (hash, fp, lang keys), none on document bodies after
    * the first projection; every stage is the oracled standalone operator
    * re-used, so the composition is checkable end to end.
    *
    * avg_quality sums DECIMAL(18,6) — exact, addition-order-independent —
    * then divides as double, so the distributed sum can't drift from the
    * single-node oracle by float reassociation.
    */
  def pipelineCorpusClean(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    new Pipeline()
      .source("docs")(s => Tables(s, t.sfDir).documents)
      .source("quality")(s => TextAnalysis.textQuality(Tables(s, t.sfDir))
        .select(col("doc_id"), col("quality")))
      .node("gated", "docs", "quality")(in =>
        in("docs").join(in("quality"), "doc_id").filter(col("quality") >= 4.5))
      .node("exact", "gated")(in => {
        val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id").asc)
        in("gated")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
      })
      .node("near", "exact")(in => {
        val fp = md5(array_join(array_sort(array_distinct(split(col("text"), " "))), " "))
        val w = Window.partitionBy(fp).orderBy(desc("quality"), col("doc_id").asc)
        in("exact")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
      })
      .node("summary", "near")(in =>
        in("near")
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            round(dbl(sum(col("quality").cast(DecimalType(18, 6)))) / count(lit(1)), 6)
              .as("avg_quality"),
            sum(col("n_chars")).as("sum_chars"))
          .orderBy("lang"))
      .produce(t.spark, "summary")
  }

  /** Embedding-space curation capstone, composed through the node graph:
    * semantic near-dup clusters ([[Graph.dedupSemantic]], exact τ=0.4
    * cosine → connected components) → keep each cluster's min-id canonical
    * → quality gate ([[TextAnalysis.textQuality]] ≥ 4.0) → hash-stable
    * train/val/test assignment → per-split audit. Every stage reuses an
    * oracled standalone operator; the audit emits only order-independent
    * exact values (counts, BIGINT token mass, min/max of the 6dp-rounded
    * quality), so the composition is hash-checkable end to end.
    */
  def pipelineCurate(t: Tables): DataFrame =
    new Pipeline()
      .source("components")(s => Graph.dedupSemantic(Tables(s, t.sfDir)))
      .source("quality")(s => TextAnalysis.textQuality(Tables(s, t.sfDir))
        .select(col("doc_id"), col("n_tok"), col("quality")))
      .node("canonical", "components")(in =>
        in("components")
          .groupBy("component_id")
          .agg(min(col("vec_id")).as("doc_id")))
      .node("kept", "canonical", "quality")(in =>
        in("canonical").join(in("quality"), "doc_id")
          .filter(col("quality") >= 4.0))
      .node("splits", "kept")(in => {
        val nib = substring(md5(col("doc_id").cast("string")), 1, 1)
        in("kept").withColumn("split",
          when(nib.isin("c", "d"), "val")
            .when(nib.isin("e", "f"), "test")
            .otherwise("train"))
      })
      .node("audit", "splits")(in =>
        in("splits")
          .groupBy("split")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("sum_tokens"),
            min(col("quality")).as("min_q"),
            max(col("quality")).as("max_q"))
          .orderBy("split"))
      .produce(t.spark, "audit")

  /** The DAILY-INGEST capstone (`pipeline_daily_ingest`): the literal
    * ship/drop decision a training pipeline makes for each arriving block
    * document, composed from the round's incremental stages through the
    * node graph — LM quality features ([[TextAnalysis.textLmScore]]:
    * store-trained add-one model, micro-nat-exact avg NLL + OOV counts)
    * joined with near-dup detection against the accumulated corpus
    * ([[IncrementalDedup.incrementalDedup]]: band-store probe + exact
    * re-rank at τ=0.5). A block doc ships iff it duplicates nothing in
    * the store; the LM features ride along for downstream mixing/
    * curriculum decisions. Every stage reuses an independently-oracled
    * operator and every emitted value is order-independent-exact, so the
    * composition is hash-checkable end to end.
    *
    * At 100 TB the two sources are the same daily jobs the standalone
    * entries run (block-sized probe against the bucketed band store; one
    * token join against the persisted count model) — the decision join
    * itself is block-sized.
    */
  def pipelineDailyIngest(t: Tables): DataFrame =
    new Pipeline()
      .source("lm")(s => TextAnalysis.textLmScore(Tables(s, t.sfDir)))
      .source("dups")(s => IncrementalDedup.incrementalDedup(Tables(s, t.sfDir))
        .select(col("new_id").as("doc_id")).distinct())
      .node("decision", "lm", "dups")(in =>
        in("lm")
          .join(in("dups").withColumn("is_dup", lit(true)), Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tok"), col("n_oov"), col("avg_nll"),
            coalesce(col("is_dup"), lit(false)).as("is_dup"))
          .withColumn("keep", !col("is_dup"))
          .orderBy("doc_id"))
      .produce(t.spark, "decision")

  /** Observed-metrics instrumentation (`Dataset.observe` →
    * `CollectMetrics`): the mid-pipeline row count and exact-cents
    * volume are collected AS THE QUERY RUNS — accumulator-style, zero
    * extra passes, zero extra shuffles — which is how a production run
    * audits "how many rows survived the filter" without a second job.
    * The observation rides the plan invisibly (the oracle states the
    * plain aggregate); [[pipelineObserveWith]] hands the spec the
    * handle, and the spec pins the delivered metrics against a direct
    * recomputation. At 100 TB this is the difference between free
    * instrumentation and doubling the pipeline's cost for a dashboard.
    */
  def pipelineObserve(t: Tables): DataFrame = pipelineObserveWith(t)._1

  private val obsSeq = new java.util.concurrent.atomic.AtomicLong()

  def pipelineObserveWith(t: Tables): (DataFrame, org.apache.spark.sql.Observation) = {
    // fresh handle per invocation: an Observation attaches to exactly one
    // action, and Bench/Verify re-invoke the query function per pass
    val obs = org.apache.spark.sql.Observation(
      s"graft_obs_${obsSeq.incrementAndGet()}")
    val df = t.orders
      .filter(col("o_orderstatus") =!= "P")
      .select(col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(col("cents")).as("sum_cents"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
      .orderBy("o_orderstatus")
    (df, obs)
  }
}
