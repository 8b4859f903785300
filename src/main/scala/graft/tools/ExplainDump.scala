package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.{Registry, Tables}

/** Writes `.explain("formatted")` for the named Registry queries to
  * `<outDir>/<query>_<suffix>.txt` — the round's plan-evidence files
  * (the before/after dumps under plans/r16).
  *
  * Usage: sbt "runMain graft.tools.ExplainDump <outDir> <suffix> q1 q2 ..."
  * Session settings mirror Bench's so the dumped plan is the one the
  * bench actually runs (AQE off, shuffle partitions = cpus).
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(outDir)
    try {
      Tables.cacheAll(spark, sfDir)
      names.foreach { name =>
        val df = Registry.all(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), txt)
        println(s"wrote ${outDir.resolve(s"${name}_$suffix.txt")}")
      }
    } finally spark.stop()
  }
}
