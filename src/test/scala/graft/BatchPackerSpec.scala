package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.BatchPacker
import graft.streaming.BatchPacker.UserEvent

/** ListState batch assembly: for an in-order source, the emitted groups
  * must equal batch packing by event_id — including groups straddling a
  * micro-batch boundary (the remainder lives in ListState between
  * batches) — and the pending tail must never reach the group size.
  */
class BatchPackerSpec extends AnyFunSuite with SparkSessionFixture {

  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("streamed fixed-size groups == batch packing, across batch splits") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val evs = t.events.select(col("user_id"), col("event_id"), col("value"))
      .as[UserEvent].collect().toSeq.sortBy(_.event_id)
    // uneven splits so many users' groups straddle batch boundaries
    val (b1, rest) = evs.splitAt(evs.size / 5)
    val (b2, b3) = rest.splitAt(rest.size / 3)

    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val s = MemoryStream[UserEvent]
    val q = BatchPacker.packStream(s.toDS(), b = 4)
      .writeStream.format("memory").queryName("packed_out")
      .outputMode("append").start()
    try {
      Seq(b1, b2, b3).foreach { b => s.addData(b); q.processAllAvailable() }
      val got = spark.table("packed_out")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getInt(2), r.getDouble(3), r.getLong(4), r.getLong(5)))
        .toMap
      val w = Window.partitionBy("user_id").orderBy("event_id")
      val want = t.events
        .select(col("user_id"), col("event_id"), col("value"),
          ((row_number().over(w) - 1).cast("long")).as("rn0"))
        .withColumn("group_id", expr("rn0 div 4"))
        .groupBy("user_id", "group_id")
        .agg(count(lit(1)).cast("int").as("n"), sum("value").as("sv"),
          min("event_id").as("fe"), max("event_id").as("le"))
        .filter(col("n") === 4)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getInt(2), r.getDouble(3), r.getLong(4), r.getLong(5)))
        .toMap
      assert(got.keySet === want.keySet)
      got.foreach { case (k, (n, sv, fe, le)) =>
        val (wn, wsv, wfe, wle) = want(k)
        assert(n === wn && fe === wfe && le === wle, s"$k: ($n,$fe,$le) vs ($wn,$wfe,$wle)")
        assert(math.abs(sv - wsv) < 1e-6, s"$k: $sv vs $wsv")
      }
      // every group is exactly full-size
      assert(spark.table("packed_out").filter(col("n") =!= 4).count() === 0)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
