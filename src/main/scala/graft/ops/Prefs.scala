package graft.ops

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Preference-pair construction — the DPO/RLHF data-prep step that turns
  * a scored corpus into (chosen, rejected) training pairs: within each
  * comparable group (here language × source, the proxy for "same
  * prompt"), the best- and worst-scoring documents are paired, and pairs
  * without a strict quality margin are dropped (a tie teaches the reward
  * model nothing).
  *
  * The quality score is the type-token ratio in exact milli-units
  * (`distinct_tokens * 1000 div tokens` — integer division, so both
  * engines compute the identical BIGINT; TTR is the repetition-penalty
  * core of the Gopher quality suite). Scale shape: one map stage scores
  * every doc (no shuffle), then ONE shuffle on the group key feeds two
  * frame-free extrema windows — the group cardinality is
  * vocabulary-sized (langs × sources), never corpus-sized, and per-group
  * data fits any executor because only (doc_id, score) rides the
  * shuffle, not the text.
  */
object Prefs {

  /** One (chosen, rejected) pair per (lang, source) group with ≥ 2 docs
    * and a strict score margin; extrema tie-break on doc_id.
    */
  def pairPreference(t: Tables): DataFrame = {
    val scored = t.documents
      .withColumn("toks", expr("filter(split(text, ' '), x -> x != '')"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("lang"), col("source"),
        expr("CAST(size(array_distinct(toks)) AS BIGINT) * 1000 div size(toks)")
          .as("ttr_milli"))
    val wBest = Window.partitionBy("lang", "source")
      .orderBy(col("ttr_milli").desc, col("doc_id").asc)
    val wWorst = Window.partitionBy("lang", "source")
      .orderBy(col("ttr_milli").asc, col("doc_id").asc)
    val wN = Window.partitionBy("lang", "source")
    scored
      .withColumn("rb", row_number().over(wBest))
      .withColumn("rw", row_number().over(wWorst))
      .withColumn("n_docs", count(lit(1)).over(wN).cast(LongType))
      .filter(col("rb") === 1 || col("rw") === 1)
      .groupBy("lang", "source", "n_docs")
      .agg(
        max(when(col("rb") === 1, col("doc_id"))).as("chosen_id"),
        max(when(col("rb") === 1, col("ttr_milli"))).as("chosen_ttr"),
        max(when(col("rw") === 1, col("doc_id"))).as("rejected_id"),
        max(when(col("rw") === 1, col("ttr_milli"))).as("rejected_ttr"))
      .filter(col("n_docs") >= 2 && col("chosen_ttr") > col("rejected_ttr"))
      .select(col("lang"), col("source"), col("n_docs"),
        col("chosen_id"), col("chosen_ttr"),
        col("rejected_id"), col("rejected_ttr"),
        (col("chosen_ttr") - col("rejected_ttr")).as("margin_milli"))
      .orderBy("lang", "source")
  }
}
