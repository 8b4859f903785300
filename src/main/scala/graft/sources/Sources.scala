package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File sources/sinks beyond parquet (basis `import_local_csv` / Json
  * field lineage): explicit-schema CSV and JSON-lines readers — schema is
  * always declared, never inferred (inference is a full extra pass over
  * the data and nondeterministic under schema drift at 100 TB), and a
  * parquet block-writer that mirrors DataBlock materialization.
  */
object Sources {

  def csvSource(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "FAILFAST")
      .schema(schema)
      .csv(path)

  def jsonLinesSource(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("mode", "FAILFAST")
      .schema(schema)
      .json(path)

  /** Materialize a DataFrame as an immutable parquet block directory. */
  def writeBlock(df: DataFrame, path: String): Unit =
    df.write.mode("errorifexists").parquet(path)
}
