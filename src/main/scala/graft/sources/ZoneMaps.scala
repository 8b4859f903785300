package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-file key zone maps read from parquet FOOTERS only — the manifest
  * statistic that lets maintenance jobs (erasure, compaction targeting,
  * clustering audits) decide which files a key set touches WITHOUT
  * scanning data and WITHOUT driver-side file lists.
  *
  * Scale shape: the file inventory is a DataFrame (a content-pruned
  * `binaryFile` listing — only the `path` column is projected, so file
  * bytes are never read), and the footer opens run inside executors via
  * `mapPartitions`; no path or statistic ever aggregates on the driver.
  * Cost is one footer read per file — exactly what a lakehouse manifest
  * write amortizes away; computing it on demand here is the no-catalog
  * fallback with the same downstream join shape.
  */
object ZoneMaps {

  /** One row per parquet file under `dir`: (path, zmin, zmax) of the
    * long-typed `column`, min/max over the file's row-group statistics.
    * Files with no non-null statistics surface as an empty zone
    * (zmin > zmax), which no key can match.
    */
  def keyZones(spark: SparkSession, dir: String, column: String): DataFrame = {
    import spark.implicits._
    val paths = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.parquet").load(dir)
      .select("path").as[String]
    paths.mapPartitions { it =>
      import scala.jdk.CollectionConverters._
      val conf = new org.apache.hadoop.conf.Configuration()
      it.map { p =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(p), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          var mn = Long.MaxValue
          var mx = Long.MinValue
          r.getFooter.getBlocks.asScala.foreach { b =>
            b.getColumns.asScala
              .find(_.getPath.toDotString == column)
              .foreach { c =>
                val st = c.getStatistics
                if (st != null && st.hasNonNullValue) {
                  mn = math.min(mn, st.genericGetMin.toString.toLong)
                  mx = math.max(mx, st.genericGetMax.toString.toLong)
                }
              }
          }
          (p, mn, mx)
        } finally r.close()
      }
    }.toDF("path", "zmin", "zmax")
  }
}
