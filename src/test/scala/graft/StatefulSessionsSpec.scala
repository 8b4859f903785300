package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.SessionEvent

/** flatMapGroupsWithState sessionizer vs the built-in session_window
  * batch aggregation on the same events.
  */
class StatefulSessionsSpec extends AnyFunSuite with SparkSessionFixture {

  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("custom stateful sessionizer == batch session_window aggregate") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val evs = t.events
      .select(col("user_id"), col("ts"), col("value"))
      .orderBy("ts", "user_id")
      .as[SessionEvent]
      .collect()
      .toSeq

    val s = MemoryStream[SessionEvent]
    val q = StatefulSessions.sessionize(s.toDS())
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    val got = try {
      s.addData(evs)
      q.processAllAvailable()
      // Per-key far-future sentinel: closes (and emits) every open
      // session via the gap rule; the sentinel sessions themselves stay
      // open and are never emitted.
      val far = new Timestamp(evs.map(_.ts.getTime).max + 86400000L)
      s.addData(evs.map(_.user_id).distinct.map(u => SessionEvent(u, far, 0.0)))
      q.processAllAvailable()
      spark.table("sessions_out")
        .select(col("user_id"), col("start").cast("string").as("start"),
          col("cnt"), round(col("sum_value"), 4).as("sv"))
        .collect().map(_.toString).sorted.toSeq
    } finally q.stop()

    val want = StatefulSessions.batchReference(
        t.events.select(col("user_id"), col("ts"), col("value")))
      .select(col("user_id"), col("start").cast("string").as("start"),
        col("cnt"), round(col("sum_value"), 4).as("sv"))
      .collect().map(_.toString).sorted.toSeq

    assert(got.size == want.size, s"session count: got ${got.size} want ${want.size}")
    assert(got == want)
  }
}
