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

  test("late in-watermark event bridges two open sessions (out-of-order)") {
    def ts(s: String) = Timestamp.valueOf(s)
    val s = MemoryStream[SessionEvent]
    val q = StatefulSessions.sessionize(s.toDS(), watermark = "2 hours")
      .writeStream.format("memory").queryName("bridge_out")
      .outputMode("append").start()
    val got = try {
      // Two sessions 40 min apart → separate under a 30-min gap.
      s.addData(SessionEvent(1, ts("2024-06-01 12:00:00"), 1.0),
        SessionEvent(1, ts("2024-06-01 12:40:00"), 2.0))
      q.processAllAvailable()
      // A late (but in-watermark) event at 12:20 bridges them into ONE.
      s.addData(SessionEvent(1, ts("2024-06-01 12:20:00"), 4.0))
      q.processAllAvailable()
      // Far-future sentinel closes everything via the watermark.
      s.addData(SessionEvent(2, ts("2024-06-03 00:00:00"), 0.0))
      q.processAllAvailable()
      spark.table("bridge_out")
        .select(col("user_id"), col("start").cast("string"), col("cnt"), col("sum_value"))
        .collect().map(_.toString).sorted.toSeq
    } finally q.stop()
    assert(got == Seq("[1,2024-06-01 12:00:00,3,7.0]"),
      s"expected one bridged session, got $got")
  }
}
