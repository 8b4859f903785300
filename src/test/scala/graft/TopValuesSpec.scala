package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.TopValues
import graft.streaming.TopValues.UserEvent

/** Bounded per-key top-K state: after any batch split, the final emission
  * per user must equal the batch top-5 (order-free semantics make the
  * stream deterministic regardless of how the input is chunked).
  */
class TopValuesSpec extends AnyFunSuite with SparkSessionFixture {

  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("streamed top-5 sum per user == batch window top-5, across batch splits") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val evs = t.events.select(col("user_id"), col("value")).as[UserEvent].collect().toSeq
    val (b1, rest) = evs.splitAt(evs.size / 3)
    val (b2, b3) = rest.splitAt(rest.size / 2)

    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val s = MemoryStream[UserEvent]
    val q = TopValues.topValues(s.toDS())
      .writeStream.format("memory").queryName("topk_out")
      .outputMode("update").start()
    try {
      Seq(b1, b2, b3).foreach { b => s.addData(b); q.processAllAvailable() }
      // latest emission per key = max n_top (n_top is non-decreasing) with
      // the final sum; round to kill double-format jitter in the compare
      val got = spark.table("topk_out")
        .groupBy("user_id")
        .agg(max(struct(col("n_top"), col("sum_top"))).as("s"))
        .select(col("user_id"), col("s.n_top").as("n"), col("s.sum_top").as("sv"))
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
      val w = Window.partitionBy("user_id").orderBy(desc("value"), asc("event_id"))
      val want = t.events
        .select(col("user_id"), col("event_id"), col("value"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 5)
        .groupBy("user_id")
        .agg(count(lit(1)).cast("int").as("n"), sum("value").as("sv"))
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
      // tolerance compare: the stream sums sorted-desc, the batch sums in
      // partition order — a boundary-straddling round() would flake
      assert(got.keySet === want.keySet)
      got.foreach { case (u, (n, sv)) =>
        val (wn, wsv) = want(u)
        assert(n === wn && math.abs(sv - wsv) < 1e-6, s"user $u: ($n,$sv) vs ($wn,$wsv)")
      }
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
