package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned directory layout — the at-rest organization for the
  * event/fact tables at 100 TB (SURVEY.md §7.4): one directory per day
  * means a time-bounded query plans `PartitionFilters` and never opens
  * irrelevant files, and ingestion appends whole immutable partitions
  * (the DataBlock granularity at cluster scale).
  */
object Partitioned {

  /** Write `df` partitioned by the date of `tsCol` (adds `p_date`). */
  def writeDatePartitioned(df: DataFrame, path: String, tsCol: String): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .write
      .partitionBy("p_date")
      .mode("overwrite")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
