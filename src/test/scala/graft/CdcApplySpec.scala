package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CdcApply
import graft.streaming.CdcApply.CdcOp

/** transformWithState CDC apply: the properties the DuckDB oracle can't
  * state — cross-batch tombstone/revival sequencing and at-least-once
  * replay idempotency (the LSN high-water mark).
  */
class CdcApplySpec extends AnyFunSuite with SparkSessionFixture {

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

  private def latestPerKey(table: String): Map[Long, (Long, Long, Boolean)] =
    spark.table(table)
      .groupBy("user_id")
      .agg(max(struct(col("seq"), col("n_ops"), col("vc"), col("deleted"))).as("s"))
      .select(col("user_id"), col("s.n_ops"), col("s.vc"), col("s.deleted"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap

  test("cross-batch upsert → delete → revival, with replays ignored") {
    withRocksDb {
      val s = MemoryStream[CdcOp]
      val q = CdcApply.applyCdc(s.toDS())
        .writeStream.format("memory").queryName("cdc_out")
        .outputMode("update").start()
      try {
        // batch 1: u1 gets two upserts (out of order in the batch), u2 one
        s.addData(Seq(
          CdcOp(1L, 2L, is_del = false, 20L),
          CdcOp(1L, 1L, is_del = false, 10L),
          CdcOp(2L, 1L, is_del = false, 99L)))
        q.processAllAvailable()
        assert(latestPerKey("cdc_out") ==
          Map(1L -> ((2L, 20L, false)), 2L -> ((1L, 99L, false))))

        // batch 2: REPLAY of u1's ops (must be no-ops), u2 deleted
        s.addData(Seq(
          CdcOp(1L, 2L, is_del = false, 20L),
          CdcOp(1L, 1L, is_del = false, 777L),
          CdcOp(2L, 2L, is_del = true, 0L)))
        q.processAllAvailable()
        assert(latestPerKey("cdc_out") ==
          Map(1L -> ((2L, 20L, false)), 2L -> ((2L, 0L, true))),
          "replayed LSNs must not change state or op counts")

        // batch 3: u2 revived by a later upsert
        s.addData(Seq(CdcOp(2L, 3L, is_del = false, 55L)))
        q.processAllAvailable()
        assert(latestPerKey("cdc_out") ==
          Map(1L -> ((2L, 20L, false)), 2L -> ((3L, 55L, false))))
      } finally q.stop()
    }
  }

  test("drive equals the batch twin on the sf0.001 feed") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val got = graft.streaming.StreamDrive
      .streamCdcApply(spark, "/root/testdata/sf0.001")
      .collect().map(_.toString).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    val want = t.events
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("value").isNotNull && col("event_type").isNotNull)
      .select(col("user_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("vc"),
        row_number().over(w).as("rn"),
        count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("user_id"))
          .as("n_ops"))
      .filter(col("rn") === 1 && col("event_type") =!= "signup")
      .select(col("user_id"), col("n_ops"), col("vc"))
      .orderBy("user_id")
      .collect().map(_.toString).toSeq
    assert(got == want)
  }
}
