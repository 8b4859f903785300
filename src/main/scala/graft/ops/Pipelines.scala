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
}
