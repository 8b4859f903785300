package graft.ops

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Corpus mixing — the two decisions a pretraining data pipeline makes
  * after cleaning: WHICH documents fill each source's token budget, and
  * HOW HARD to up/down-sample each source to hit a target mixture.
  * Everything is integer/rank-exact, so both operators are fully
  * DuckDB-oracled.
  */
object Mixing {

  /** Greedy quality-first selection under a per-language token budget:
    * within each language, documents are taken in (quality desc, doc_id)
    * order — a deterministic total order — while the RUNNING token total
    * stays ≤ `budgetTokens`. One window over the language key (shuffle
    * volume = corpus rows, state = running sum — no collect, no loop);
    * the classic greedy knapsack heuristic every budgeted corpus cut uses.
    * Emits the kept docs with their cumulative position for auditability.
    */
  def budgetSelect(t: Tables, budgetTokens: Long = 2000L): DataFrame = {
    val q = TextAnalysis.textQuality(t)
      .select(col("doc_id"), col("n_tok"), col("quality"))
    val docs = t.documents.select(col("doc_id"), col("lang")).join(q, "doc_id")
    val w = Window.partitionBy("lang").orderBy(desc("quality"), asc("doc_id"))
    docs
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .filter(col("cum_tok") <= budgetTokens)
      .select(col("lang"), col("doc_id"), col("n_tok"), col("cum_tok"), col("quality"))
      .orderBy("lang", "cum_tok")
  }

  /** Per-source mixture weights: target share (uniform across sources
    * here) over actual token share — weight > 1 means the source must be
    * up-sampled to hit the target mix, < 1 down-sampled. Token masses are
    * exact BIGINTs; the only division happens in the final projection.
    * Two tiny aggregates (per-lang and global); the global total rides
    * along via a window over the single-row-per-lang frame.
    */
  def mixWeights(t: Tables): DataFrame = {
    val q = TextAnalysis.textQuality(t).select(col("doc_id"), col("n_tok"))
    val perLang = t.documents.select(col("doc_id"), col("lang"))
      .join(q, "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tok_mass"))
    val totals = perLang.agg(
      sum(col("tok_mass")).as("total_mass"), count(lit(1)).as("n_langs"))
    perLang
      .crossJoin(broadcast(totals)) // one global row against #langs rows
      .select(
        col("lang"), col("n_docs"), col("tok_mass"),
        round(col("tok_mass").cast(DoubleType) / col("total_mass"), 6).as("actual_share"),
        round((col("total_mass").cast(DoubleType) / col("n_langs")) / col("tok_mass"), 6)
          .as("weight"))
      .orderBy("lang")
  }
}
