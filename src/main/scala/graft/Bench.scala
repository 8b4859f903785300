package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Methodology: tables are cached+materialized first (the single-node
  * analog of a warm buffer pool — the oracle engine gets the OS page cache
  * for free), then one untimed warmup pass amortizes JIT + whole-stage
  * codegen compilation, then the timed pass. Per-query time is the
  * dominant planning+execution cost, not JVM warmup noise.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // AQE's extra per-stage re-planning is pure overhead at micro-benchmark
    // scale (its wins — shuffle coalescing, skew splits — need real data
    // volumes); overridable so cluster-scale runs keep it on.
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "false")
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.cacheAll(spark, sfDir)
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // Two timed passes, min per query: single-shot timings at this scale
    // carry ±0.3 s GC/scheduler noise that would drown real regressions.
    def timedPass(): Map[String, Double] = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val p1 = timedPass()
    val p2 = timedPass()
    val results = p1.map { case (k, v1) =>
      val v2 = p2.getOrElse(k, v1)
      k -> (if (v1 < 0 || v2 < 0) -1.0 else math.min(v1, v2))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // A failed query keeps its -1 sentinel in the per-query map but must
    // not subtract from (or silently shrink) the totals — failures are
    // reported by name so a regression can never read as a speedup.
    val failed = results.collect { case (k, v) if v < 0 => k }.toSeq.sorted
    val total = results.values.filter(_ >= 0).sum
    // BASELINE.md's totals cover the 69 survey queries; the registry has
    // grown past that, so report the like-for-like subtotal alongside.
    val survey69 = results.view.filterKeys(SurveySql.spark.contains).values
      .filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","survey69_total":$survey69,"failed":$failedJson,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
