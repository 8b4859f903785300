package graft.ops

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus tokenizer: frequency-ranked vocabulary construction and
  * document → id-sequence encoding — the step between a cleaned corpus and
  * a training shard. Everything here is integer-exact (counts, ranks,
  * ids), so both operators are fully DuckDB-oracled.
  *
  * Scale shape: the vocabulary is built with one token-keyed
  * partial+final count (shuffle volume = #distinct tokens) followed by a
  * rank over the TOP `maxVocab` rows only — the limit runs BEFORE the
  * single-partition window, so the window's input is a bounded,
  * driver-chosen constant (the same boundedness class as a broadcast
  * build side), never the full vocabulary. Encoding is a broadcast hash
  * join of the ≤`maxVocab`-row vocab against the exploded tokens: bodies
  * shuffle once on doc_id for the per-document reassembly and nothing
  * else moves.
  */
object Tokenize {

  /** (id, token, cnt): top-`maxVocab` tokens by (count desc, token asc) —
    * a deterministic total order — with dense 1-based ids in rank order.
    */
  def vocabBuild(t: Tables, maxVocab: Int = 500): DataFrame = {
    val counts = Text.tokens(t.documents)
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("token"))
      .limit(maxVocab)
    // The windowed rank sees only the ≤ maxVocab limited rows (bounded by
    // construction); empty partitionBy is deliberate and safe here.
    counts
      .select(
        row_number().over(Window.orderBy(desc("cnt"), asc("token")))
          .cast("long").as("id"),
        col("token"), col("cnt"))
      .orderBy("id")
  }

  /** (doc_id, n_tok, ids): every document's token sequence encoded against
    * [[vocabBuild]]'s vocabulary, OOV → -1, ids emitted in token order as
    * a comma-joined string (driver compare rule: no raw array cells).
    * Docs with zero tokens drop out (no sequence to emit) — mirroring the
    * oracle's GROUP BY over exploded tokens.
    */
  def tokenizeIds(t: Tables, maxVocab: Int = 500): DataFrame = {
    val vocab = broadcast(
      vocabBuild(t, maxVocab).select(col("token").as("v_token"), col("id")))
    val tok = t.documents
      .select(col("doc_id"),
        posexplode(filter(split(col("text"), " "), x => x =!= ""))
          .as(Seq("pos", "token")))
    tok
      .join(vocab, col("token") === col("v_token"), "left")
      .select(col("doc_id"), col("pos"), coalesce(col("id"), lit(-1L)).as("id"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tok"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("id")))),
            s => s.getField("id").cast("string")),
          ",").as("ids"))
      .orderBy("doc_id")
  }
}
