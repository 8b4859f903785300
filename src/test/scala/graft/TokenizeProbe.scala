package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Throwaway A/B probe for the fused word-grain encode (not part of the suite). */
object TokenizeProbe {
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
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(label: String)(mk: => DataFrame): Unit = {
      noop(mk)
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); noop(mk); (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $label ${samples.min}%.3f  (all: ${samples.map(s => f"$s%.3f").mkString(", ")})")
    }
    // full query, legacy broadcast-join form (the r15 shape)
    def tokenizeIdsJoin(): DataFrame = {
      val vocab = broadcast(
        ops.Tokenize.vocabBuild(t).select(col("token").as("v_token"), col("id")))
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
    time("tokenize_ids_join") { tokenizeIdsJoin() }
    time("tokenize_ids_mapside") { Registry.all("tokenize_ids")(spark, dir) }
    time("tokenize_ids_join2") { tokenizeIdsJoin() }
    time("tokenize_ids_mapside2") { Registry.all("tokenize_ids")(spark, dir) }
    val a = tokenizeIdsJoin().collect().map(_.toString)
    val b = Registry.all("tokenize_ids")(spark, dir).collect().map(_.toString)
    println("EQUAL " + (a.length == b.length && a.sameElements(b)) +
      s" (rows ${a.length} vs ${b.length})")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("plans/r16/tokenize_ids_before.txt"),
      tokenizeIdsJoin().queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get("plans/r16/tokenize_ids_after.txt"),
      Registry.all("tokenize_ids")(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))
    spark.stop()
  }
}
