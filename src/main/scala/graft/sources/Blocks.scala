package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Block-lifecycle materializers beyond append: keyed upsert and
  * small-file compaction. Blocks stay immutable — both operators read
  * existing block generations and write a NEW generation directory, the
  * snapshot-isolation model of every table format; nothing is modified in
  * place, so readers of the old generation are never torn.
  */
object Blocks {

  /** Keyed upsert: latest-wins merge of `updates` into `existing` — the
    * basis `unique_on` + keep-latest accumulation pattern as a batch
    * materializer. One shuffle on the key; `ord` breaks versions
    * (updates win ties via the source rank, so replaying the same update
    * block is idempotent). Returns the merged frame; write it as the next
    * generation with [[Sources.writeBlock]].
    */
  def upsert(existing: DataFrame, updates: DataFrame,
      keys: Seq[String], ord: String): DataFrame = {
    // name+type set equality: unionByName is column-order-insensitive, so
    // order must not matter here either — but a type mismatch has to fail
    // at the guard, not as a widening surprise downstream
    def shape(df: DataFrame) = df.schema.fields.map(f => (f.name, f.dataType)).toSet
    require(shape(existing) == shape(updates),
      "upsert requires identical column names and types")
    Seq("__gen", "__rn").foreach(r =>
      require(!existing.columns.contains(r), s"column name $r is reserved by upsert"))
    val tagged = existing.withColumn("__gen", lit(0))
      .unionByName(updates.withColumn("__gen", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ord).desc, col("__gen").desc)
    tagged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__gen")
  }

  /** Compaction: rewrite a block directory of many small files into
    * `numFiles` files (sorted by `sortCol` so min/max stats stay tight).
    * The small-file problem is THE operational tax of incremental
    * pipelines at scale — micro-batch accumulators emit a file per
    * trigger, and scan throughput collapses under per-file overhead.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      numFiles: Int, sortCol: String): Unit =
    spark.read.parquet(inDir)
      .repartitionByRange(numFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("errorifexists").parquet(outDir)
}
