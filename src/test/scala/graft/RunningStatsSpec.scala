package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.RunningStats
import graft.streaming.RunningStats.UserEvent

/** transformWithState running aggregates: streamed state must converge to
  * the batch groupBy answer, and per-batch emissions must reflect only the
  * data seen so far. Requires the RocksDB state store provider (bundled
  * with Spark 4) — set per-query below and restored after.
  */
class RunningStatsSpec extends AnyFunSuite with SparkSessionFixture {

  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, RocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("streamed running stats == batch aggregate; mid-stream state is partial") {
    import spark.implicits._
    val t = Tables(spark, "/root/testdata/sf0.001")
    val evs = t.events.select(col("user_id"), col("value")).as[UserEvent].collect().toSeq
    val (first, second) = evs.splitAt(evs.size / 2)

    withRocksDb {
      val s = MemoryStream[UserEvent]
      val q = RunningStats.runningStats(s.toDS())
        .writeStream.format("memory").queryName("running_out")
        .outputMode("update").start()
      try {
        s.addData(first)
        q.processAllAvailable()
        val mid = spark.table("running_out")
          .groupBy("user_id").agg(max("n").as("n")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val wantMid = first.groupBy(_.user_id).view.mapValues(_.size.toLong).toMap
        assert(mid === wantMid, "after batch 1 the state covers exactly batch 1")

        s.addData(second)
        q.processAllAvailable()
        // latest emission per key = the one with the largest n (n strictly
        // grows per emission; struct max is lexicographic)
        val got = spark.table("running_out")
          .groupBy("user_id")
          .agg(max(struct(col("n"), col("sum_value"), col("max_value"))).as("s"))
          .select(col("user_id"), col("s.n").as("n"),
            round(col("s.sum_value"), 4).as("sv"), col("s.max_value").as("max_value"))
          .collect().map(_.toString).sorted.toSeq
        val want = t.events.groupBy("user_id")
          .agg(count(lit(1)).as("n"), sum("value").as("sum_value"), max("value").as("max_value"))
          .select(col("user_id"), col("n"), round(col("sum_value"), 4).as("sv"), col("max_value"))
          .collect().map(_.toString).sorted.toSeq
        assert(got === want)
      } finally q.stop()
    }
  }
}
