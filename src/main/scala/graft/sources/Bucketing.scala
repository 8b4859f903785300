package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table storage layout: pre-hash-partition fact tables on their
  * join key at write time so repeated joins/aggregations on that key run
  * with ZERO shuffle — the decisive layout decision at 100 TB, where a
  * fact-fact shuffle is the single most expensive operation a query can
  * trigger. Bucket counts should match (or divide) between co-joined
  * tables; bucket pruning also serves point lookups.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
