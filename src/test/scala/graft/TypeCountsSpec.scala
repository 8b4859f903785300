package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.TypeCounts
import graft.streaming.TypeCounts.TypedEvent

/** MapState sub-keyed counters: the latest emission per (user, type) must
  * equal the batch groupBy count regardless of how the input is chunked
  * (count-merge is order-free).
  */
class TypeCountsSpec extends AnyFunSuite with SparkSessionFixture {

  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("streamed per-(user,type) counts == batch groupBy, across splits") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val evs = t.events.select(col("user_id"), col("event_type"))
      .as[TypedEvent].collect().toSeq
    val (b1, rest) = evs.splitAt(evs.size / 4)
    val (b2, b3) = rest.splitAt(rest.size / 2)

    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val s = MemoryStream[TypedEvent]
    val q = TypeCounts.typeCounts(s.toDS())
      .writeStream.format("memory").queryName("typecounts_out")
      .outputMode("update").start()
    try {
      Seq(b1, b2, b3).foreach { b => s.addData(b); q.processAllAvailable() }
      // counts are non-decreasing → latest emission = max(n)
      val got = spark.table("typecounts_out")
        .groupBy("user_id", "event_type").agg(max("n").as("n"))
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      val want = t.events.groupBy("user_id", "event_type").count()
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got === want)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
