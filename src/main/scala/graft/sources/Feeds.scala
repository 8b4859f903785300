package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-checkable NON-PARQUET source queries. The driver test data is
  * parquet-only, so the CSV/JSON-lines readers ([[Sources]]) stayed
  * unit-test-only for six rounds; these queries close that gap by
  * MATERIALIZING a small dimension table in the foreign format first
  * (single file, fixed per-SF path) and then running an aggregation
  * through the declared-schema reader — which lets the DuckDB oracle read
  * the very same file with `read_csv` / `read_json` and check the result
  * end-to-end (format writer + reader + query, not just the reader).
  *
  * The feed path is keyed by the SF directory name so a bench run at
  * another SF can never clobber the file between a Verify dump and the
  * driver's oracle pass. Tiny DIM tables only (nation: 25 rows, supplier:
  * hundreds) — the materialization is a single-partition format write
  * (coalesce(1) + move), not a driver-side row loop.
  */
object Feeds {

  private def feedDir(sfDir: String): Path = {
    val d = Paths.get("/tmp/graft_source_feed",
      Paths.get(sfDir).getFileName.toString)
    Files.createDirectories(d)
    d
  }

  /** Write `df` as exactly one `dest` file in `format` (csv with header /
    * json lines) via a staging single-partition write + move. The CSV
    * escape is pinned to the RFC-4180 doubled-quote convention so DuckDB's
    * default `read_csv` dialect parses it byte-identically.
    */
  private def writeOne(df: DataFrame, format: String, dest: Path): Unit = {
    val staging = Files.createTempDirectory("graft_feed_fmt")
    val w = df.coalesce(1).write.mode("overwrite")
    val configured = format match {
      case "csv" => w.option("header", "true").option("escape", "\"")
      case _ => w
    }
    configured.format(format).save(staging.toString)
    val part = staging.toFile.listFiles()
      .find(f => f.getName.startsWith("part-")).get
    Files.deleteIfExists(dest)
    Files.move(part.toPath, dest)
  }

  /** CSV round-trip query: nation → one headered CSV file → declared-
    * schema CSV read → nations per region. Oracle: DuckDB `read_csv` on
    * the same file.
    */
  def sourceCsv(spark: SparkSession, sfDir: String): DataFrame = {
    val nation = graft.Tables(spark, sfDir).nation
    val dest = feedDir(sfDir).resolve("nation.csv")
    writeOne(nation, "csv", dest)
    Sources.csvSource(spark, dest.toString, nation.schema)
      .groupBy("n_regionkey")
      .agg(
        count(lit(1)).as("n_nations"),
        min(col("n_name")).as("first_name"),
        sum(col("n_nationkey")).as("sum_key"))
      .orderBy("n_regionkey")
  }

  /** JSON-lines round-trip query: supplier (string/long columns — the
    * float s_acctbal stays out, JSON float round-tripping is not
    * byte-stable cross-engine) → one ndjson file → declared-schema JSON
    * read → suppliers per nation. Oracle: DuckDB `read_json` on the same
    * file.
    */
  def sourceJson(spark: SparkSession, sfDir: String): DataFrame = {
    val supplier = graft.Tables(spark, sfDir).supplier
      .select("s_suppkey", "s_name", "s_nationkey")
    val dest = feedDir(sfDir).resolve("supplier.json")
    writeOne(supplier, "json", dest)
    Sources.jsonLinesSource(spark, dest.toString, supplier.schema)
      .groupBy("s_nationkey")
      .agg(
        count(lit(1)).as("n_suppliers"),
        min(col("s_name")).as("first_name"),
        sum(col("s_suppkey")).as("sum_key"))
      .orderBy("s_nationkey")
  }
}
