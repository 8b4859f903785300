package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{Registry, Tables}

/** Ad-hoc single-query timer: `runMain graft.tools.QTime q1 q2 ...` times
  * the named Registry queries on SPARK_GRAFT_SF_DIR with Bench's exact
  * session settings (cache + warmup + min-of-2), for iterating on one
  * operator without paying for the whole bench.
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.cacheAll(spark, sfDir)
    args.foreach { name =>
      val fn = Registry.all(name)
      val w0 = System.nanoTime()
      fn(spark, sfDir).count() // warmup
      println(f"QWARM $name%-24s ${(System.nanoTime() - w0) / 1e9}%.3f s")
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QTIME $name%-24s ${times.min}%.3f s")
    }
    spark.stop()
  }
}
