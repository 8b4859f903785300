package graft

/** Local-iteration helper: time named registry queries at sf0.1 with the
  * bench session settings (warm run measured, noop sink). Usage:
  * `sbt "Test/runMain graft.BenchOne <query> [query ...]"`. Test scope
  * only — the driver's numbers come from [[graft.Bench]].
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Tables.cacheAll(spark, dir)
    args.foreach { name =>
      Registry.all(name)(spark, dir).write.mode("overwrite").format("noop").save()
      val t0 = System.nanoTime()
      Registry.all(name)(spark, dir).write.mode("overwrite").format("noop").save()
      println(f"TIMING $name ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
