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
    // volumes). Re-measured round 5 with 4 A/B pairs at sf0.1: AQE-off
    // medians ~24.6 s all-query vs ~25.6 s on (run noise ±2 s); the
    // round-1 call stands. Overridable so cluster-scale runs keep it on.
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
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + r3(v) }
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
    val full =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","survey69_total":${r3(survey69)},"failed":$failedJson,"queries":$qs,"sf":"$sfDir"}"""
    // The driver keeps only the last ~2000 chars of stdout; the full
    // per-query map (~2.5 KB for 89 queries) overflows that window and the
    // driver then sees a mid-object fragment (BENCH_r01/r02: parsed=null).
    // So: full detail goes to a file, and stdout carries ONE compact line —
    // totals plus the headline subset — sized well under the tail window.
    // The default detail path is derived from the launch directory (sbt
    // forks the bench JVM with CWD = project root), absolutized so the
    // printed pointer can't dangle; SPARK_GRAFT_BENCH_OUT overrides for
    // any other layout. No machine-specific path is baked in.
    val detailPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json"))
      .toAbsolutePath.normalize()
    java.nio.file.Files.write(detailPath, (full + "\n").getBytes("UTF-8"))
    val headline = Seq(
      "agg_hash_q1", "join_multiway", "join_asof_native", "win_running_sum",
      "topk_per_group", "sort_multi", "subq_correlated", "text_tfidf",
      "text_langid", "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
      "ann_cosine_topk", "ann_ivf_topk", "sim_cosine_topk", "knn_label_vote",
      "stream_session", "fn_json")
    val hs = headline.flatMap(k => results.get(k).map(v => s"\"" + k + "\":" + r3(v)))
      .mkString("{", ",", "}")
    // Stop Spark BEFORE printing: the compact JSON must be the process's
    // LAST stdout line (shutdown logging after it would push it out of the
    // driver's tail window / leave it mid-stream).
    spark.stop()
    println(
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","survey69_total":${r3(survey69)},"n_queries":${results.size},"failed":$failedJson,"queries":$hs,"detail":"$detailPath","sf":"$sfDir"}""")
    System.out.flush()
  }
}
