package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SessionTimeout
import graft.streaming.SessionTimeout.UserEvent

/** Timer-driven session close: a session must emit exactly once, with every
  * event of the session aggregated — including one added mid-session, which
  * proves the earlier timer was superseded rather than fired.
  *
  * NOTE: in ProcessingTime mode the engine runs micro-batches continuously
  * to service timers, so `processAllAvailable` never quiesces — the test
  * polls the sink with a deadline instead.
  */
class SessionTimeoutSpec extends AnyFunSuite with SparkSessionFixture {

  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("session closes on silence via timer, exactly once, with the extension merged") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, RocksDb)
    val s = MemoryStream[UserEvent]
    val q = SessionTimeout.closedSessions(s.toDS(), gapMs = 3000L)
      .writeStream.format("memory").queryName("closed_out")
      .outputMode("append").start()
    try {
      s.addData(UserEvent(1L, 2.0), UserEvent(1L, 3.0), UserEvent(2L, 5.0))
      // extend user 1's session well inside the 3 s gap: its first timer
      // must be superseded (a premature close would split the session)
      Thread.sleep(1000)
      s.addData(UserEvent(1L, 7.0))

      def closed(): Seq[(Long, Long, Double)] = spark.table("closed_out")
        .selectExpr("user_id", "n_ev", "round(sum_value, 4) AS sv")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
      val deadline = System.currentTimeMillis() + 90000
      while (closed().size < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(250)

      val rows = closed()
      assert(rows.contains((1L, 3L, 12.0)), s"got $rows")
      assert(rows.contains((2L, 1L, 5.0)), s"got $rows")
      assert(rows.map(_._1).distinct.size === rows.size, s"duplicate close: $rows")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
