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

  /** ORC source with declared schema — same contract as the CSV/JSON
    * readers: no inference pass. ORC is the second columnar format a
    * warehouse-adjacent pipeline ingests; predicate pushdown and column
    * pruning work exactly as for parquet (OrcScan reports PushedFilters).
    */
  def orcSource(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Immutable ORC block writer (mirror of [[writeBlock]]). */
  def writeOrcBlock(df: DataFrame, path: String): Unit =
    df.write.mode("errorifexists").orc(path)
}
