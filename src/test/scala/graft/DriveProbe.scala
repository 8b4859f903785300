package graft

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Scratch probe: per-batch duration breakdown of a streaming drive.
  * Test scope only. Usage: Test/runMain graft.DriveProbe <query> ...
  */
object DriveProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Tables.cacheAll(spark, dir)
    val listener = new StreamingQueryListener {
      var startMs = 0L
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = {
        startMs = System.currentTimeMillis()
        println(s"  START ${e.name}")
      }
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"  BATCH ${p.batchId} rows=${p.numInputRows} " +
          s"t+${System.currentTimeMillis() - startMs}ms dur=${p.durationMs}")
        // state-store commit/JNI breakdown per operator: how much of
        // addBatch is RocksDB commit vs row work
        p.stateOperators.foreach { so =>
          val cm = so.customMetrics
          def m(k: String): Long =
            Option(cm.get(k)).map(_.longValue()).getOrElse(-1L)
          println(s"    STATE ${so.operatorName} rows=${so.numRowsTotal} " +
            s"updated=${so.numRowsUpdated} commitMs=${so.commitTimeMs} " +
            s"updatesMs=${so.allUpdatesTimeMs} removalsMs=${so.allRemovalsTimeMs} " +
            s"rocksdbCommit(flush=${m("rocksdbCommitFlushLatency")} " +
            s"compact=${m("rocksdbCommitCompactLatency")} " +
            s"fileSync=${m("rocksdbCommitFileSyncLatencyMs")} " +
            s"checkpoint=${m("rocksdbCommitCheckpointLatency")})")
        }
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"  END t+${System.currentTimeMillis() - startMs}ms")
    }
    // warm first so the drives create their sessions WITH their own
    // config; only then look the memoized clones up (no-op configure)
    // and attach the listener
    args.foreach(name => Registry.all(name)(spark, dir).count())
    for {
      parts <- Seq(1, 2)
      prov <- Seq(
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
      noData <- Seq(true, false)
    } {
      val ss = util.Sessions.forContext(spark, s"drive|$parts|$prov|$noData")(_ => ())
      ss.streams.addListener(listener)
    }
    args.foreach { name =>
      println(s"== $name")
      val t0 = System.nanoTime()
      Registry.all(name)(spark, dir).count()
      println(f"== $name total ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
