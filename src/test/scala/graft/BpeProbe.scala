package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Throwaway A/B probe for the fused BPE encode (not part of the suite). */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExpressions.register(spark)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Tables.cacheAll(spark, dir)
    val t = Tables(spark, dir)
    val rs = ops.Bpe.rules(t)
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(label: String)(mk: => DataFrame): Unit = {
      noop(mk)
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); noop(mk); (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $label ${samples.min}%.3f  (all: ${samples.map(s => f"$s%.3f").mkString(", ")})")
    }
    val tok = t.documents
      .select(col("doc_id"),
        posexplode(filter(split(col("text"), " "), x => x =!= ""))
          .as(Seq("wpos", "word")))
    val dw = tok.select("word").distinct()
    val ruleArr = array(rs.flatMap(ru => Seq(lit(ru.l), lit(ru.r))): _*)
    println("distinct words: " + dw.count())
    time("seg_fold_distinct") { ops.Bpe.withSegFold(dw, rs, "word") }
    time("seg_fused_distinct") {
      dw.withColumn("seg", call_function("graft_bpe_seg", col("word"), ruleArr))
    }
    // full query, fold form (withSegFold in place of withSeg)
    def tokenizeBpeFold(): DataFrame = {
      val enc = ops.Bpe.withSegFold(tok.select("word").distinct(), rs, "word")
        .select(col("word").as("e_word"),
          posexplode(split(col("seg"), " ")).as(Seq("ppos", "sym")))
        .join(broadcast(ops.Bpe.vocabSymbols(t)), Seq("sym"), "left")
        .select(col("e_word"), col("ppos"),
          coalesce(col("sym_id"), lit(-1L)).as("id"))
        .groupBy("e_word")
        .agg(count(lit(1)).as("np"),
          transform(
            array_sort(collect_list(struct(col("ppos"), col("id")))),
            s => s.getField("id")).as("pids"))
      tok.join(enc, col("word") === col("e_word"))
        .groupBy("doc_id")
        .agg(sum(col("np")).cast("long").as("n_pieces"),
          array_join(
            flatten(transform(
              array_sort(collect_list(struct(col("wpos"), col("pids")))),
              s => transform(s.getField("pids"), p => p.cast("string")))),
            ",").as("ids"))
        .orderBy("doc_id")
    }
    time("tokenize_bpe_ids_fold") { tokenizeBpeFold() }
    time("tokenize_bpe_ids_mapside") { Registry.all("tokenize_bpe_ids")(spark, dir) }
    time("tokenize_bpe_ids_fold2") { tokenizeBpeFold() }
    time("tokenize_bpe_ids_mapside2") { Registry.all("tokenize_bpe_ids")(spark, dir) }
    // row-for-row equality of the map-side form vs the legacy join form
    val a = tokenizeBpeFold().collect().map(_.toString)
    val b = Registry.all("tokenize_bpe_ids")(spark, dir).collect().map(_.toString)
    println("EQUAL " + (a.length == b.length && a.sameElements(b)) +
      s" (rows ${a.length} vs ${b.length})")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("plans/r16/tokenize_bpe_ids_before.txt"),
      tokenizeBpeFold().queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get("plans/r16/tokenize_bpe_ids_after.txt"),
      Registry.all("tokenize_bpe_ids")(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))
    spark.stop()
  }
}
