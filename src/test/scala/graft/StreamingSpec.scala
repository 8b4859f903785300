package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

/** Streaming forms vs their batch twins on identical data, plus watermark
  * late-row behavior — MemoryStream-driven, no external source needed.
  */
class StreamingSpec extends AnyFunSuite with SparkSessionFixture {

  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  /** sf0.001 events as a deterministic in-memory dataset, event order. */
  private lazy val evRows: Seq[Ev] = {
    Tables(spark, "/root/testdata/sf0.001").events
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("event_id")
      .as[Ev]
      .collect()
      .toSeq
  }

  private def runComplete(stream: MemoryStream[Ev], df: org.apache.spark.sql.DataFrame,
      name: String): Seq[String] = {
    val q = df.writeStream.format("memory").queryName(name).outputMode("complete").start()
    try {
      q.processAllAvailable()
      spark.table(name).collect().map(_.toString).sorted.toSeq
    } finally q.stop()
  }

  test("streaming tumbling window == batch twin") {
    val s = MemoryStream[Ev]
    s.addData(evRows)
    val got = runComplete(s, Streams.tumblingCounts(s.toDF()), "tumbling_out")
    val want = graft.ops.Temporal.streamTumbling(Tables(spark, "/root/testdata/sf0.001"))
      .collect().map(_.toString).sorted.toSeq
    assert(got == want)
  }

  test("streaming session window == batch twin") {
    val s = MemoryStream[Ev]
    s.addData(evRows)
    val got = runComplete(s, Streams.sessionCounts(s.toDF()), "session_out")
    val want = graft.ops.Temporal.streamSession(Tables(spark, "/root/testdata/sf0.001"))
      .collect().map(_.toString).sorted.toSeq
    assert(got == want)
  }

  test("streaming dropDuplicates == batch first-event dedup") {
    val s = MemoryStream[Ev]
    s.addData(evRows) // event_id order == arrival order → first arrival = min id
    val df = Streams.dedupFirstEvent(s.toDF().repartition(1))
      .select("user_id", "event_type", "event_id")
    val q = df.writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    val got = try {
      q.processAllAvailable()
      spark.table("dedup_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    } finally q.stop()
    val want = graft.ops.Temporal.streamDedup(Tables(spark, "/root/testdata/sf0.001"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(got == want)
  }

  test("watermark drops late rows from stateful aggregation") {
    val s = MemoryStream[Ev]
    val base = Timestamp.valueOf("2024-06-01 12:00:00")
    val late = Timestamp.valueOf("2024-06-01 00:30:00")
    val df = Streams.tumblingCounts(s.toDF(), watermark = "10 minutes")
    val q = df.writeStream.format("memory").queryName("late_out").outputMode("append").start()
    try {
      // Batch 1 advances the watermark to 11:50; its own window [12:00,13:00)
      // stays open.
      s.addData(Ev(1, base, 1, "click", 1.0))
      q.processAllAvailable()
      // Batch 2: a row 11+ hours behind the watermark → dropped from state.
      s.addData(Ev(2, late, 1, "click", 1.0))
      q.processAllAvailable()
      // Batch 3: push event time far ahead so every open window closes and
      // append-mode emits finals.
      s.addData(Ev(3, Timestamp.valueOf("2024-06-02 12:00:00"), 2, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("late_out")
        .select(col("ws").cast("string"), col("event_type"), col("cnt"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(rows.contains(("2024-06-01 12:00:00", "click", 1L)),
        s"on-time window must emit; got $rows")
      assert(!rows.exists(_._1 == "2024-06-01 00:00:00"),
        s"late row must have been dropped; got $rows")
    } finally q.stop()
  }

  test("stream-stream interval join == batch twin") {
    // Two live streams joined on key + time range with dual watermarks —
    // the state-bounded append-mode shape. Inner matches emit as soon as
    // both sides arrive; row equality with the batch interval join proves
    // the streaming form computes the same relation.
    val t = Tables(spark, "/root/testdata/sf0.001")
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    clicks.addData(evRows.filter(_.event_type == "click"))
    purchases.addData(evRows.filter(_.event_type == "purchase"))
    val joined = Streams.clickPurchaseJoin(clicks.toDF(), purchases.toDF())
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    val got = try {
      q.processAllAvailable()
      spark.table("ssj_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    } finally q.stop()
    val want = graft.ops.Temporal.joinInterval(t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(want.nonEmpty && got == want)
  }

  test("stream-static reference join enriches each micro-batch") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    // Reference table: per-user event counts (the "latest state" a basis
    // reference port would see).
    val ref = t.events.groupBy("user_id").count().withColumnRenamed("count", "user_total")
    ref.createOrReplaceTempView("user_totals")
    val s = MemoryStream[Ev]
    val enriched = Streams.withReference(
      s.toDF(), spark.table("user_totals"), Seq("user_id"))
      .select("event_id", "user_id", "user_total")
    val q = enriched.writeStream.format("memory").queryName("ref_out")
      .outputMode("append").start()
    val got = try {
      s.addData(evRows.take(50))
      q.processAllAvailable()
      spark.table("ref_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    } finally q.stop()
    val want = t.events.orderBy("event_id").limit(50)
      .join(ref, Seq("user_id"))
      .select("event_id", "user_id", "user_total").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(got == want)
  }

  test("file stream source: parquet blocks drive a windowed aggregation") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-src").toString
    val batch = t.events.select("event_id", "ts", "user_id", "event_type", "value")
    // Two blocks arriving over time.
    batch.filter(col("event_id") < 500).write.parquet(s"$dir/in/b1")
    val stream = Streams.parquetStreamSource(
      spark, s"$dir/in/*", batch.schema)
    val q = Streams.tumblingCounts(stream)
      .writeStream.format("memory").queryName("filesrc_out")
      .outputMode("complete").start()
    val got = try {
      q.processAllAvailable()
      batch.filter(col("event_id") >= 500).write.parquet(s"$dir/in/b2")
      q.processAllAvailable()
      spark.table("filesrc_out").collect().map(_.toString).sorted.toSeq
    } finally q.stop()
    val want = graft.ops.Temporal.streamTumbling(t)
      .collect().map(_.toString).sorted.toSeq
    assert(got == want)
  }

  test("accumulator appends every micro-batch to the parquet block dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft-acc").toString
    val s = MemoryStream[Ev]
    val q = Streams.accumulator(s.toDF(), s"$dir/data", s"$dir/ckpt")
    try {
      s.addData(evRows.take(10))
      q.processAllAvailable()
      s.addData(evRows.slice(10, 25))
      q.processAllAvailable()
      val n = spark.read.parquet(s"$dir/data").count()
      assert(n == 25)
    } finally q.stop()
  }

  test("accumulator recovers from checkpoint: exactly-once across restart") {
    // Crash-recovery proof: stop the query between blocks, start a NEW
    // query from the same checkpoint. The source offset log must skip the
    // already-committed block and the file-sink log must keep each input
    // row exactly once — no loss, no reprocessing.
    val t = Tables(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val batch = t.events.select("event_id", "ts", "user_id", "event_type", "value")
    val total = batch.count()
    def start() = Streams.accumulator(
      Streams.parquetStreamSource(spark, s"$dir/in/*", batch.schema),
      s"$dir/data", s"$dir/ckpt")

    batch.filter(col("event_id") < 400).write.parquet(s"$dir/in/b1")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop() // "crash" after block 1

    batch.filter(col("event_id") >= 400).write.parquet(s"$dir/in/b2")
    val q2 = start() // restart from the same checkpoint
    try q2.processAllAvailable() finally q2.stop()

    val out = spark.read.parquet(s"$dir/data")
    assert(out.count() == total, "restart lost or duplicated rows")
    assert(out.select("event_id").distinct().count() == total,
      "a block was reprocessed after restart (duplicate event_ids)")
  }

  test("stream_watermark drive == batch-stated surviving set (oracle rule)") {
    // End-to-end: three ordered file micro-batches (recent / empty /
    // out-of-order), watermark 10 min, hour windows. The batch twin
    // states the rule the oracle SQL encodes: f1 rows all survive; f3
    // rows survive iff their window END is strictly above
    // max(ts of f1) − 10 min (the late-filter watermark of batch 3 under
    // Spark's stateful-chaining semantics).
    val t = Tables(spark, "/root/testdata/sf0.001")
    val feed = t.events
      .filter(col("user_id").isNotNull && col("value").isNotNull && col("ts").isNotNull)
      .select(col("event_id"), col("ts"),
        round(col("value") * 100).cast("long").as("vc"))
    val inF1 = col("event_id") % 3 =!= 0 &&
      col("ts") <= lit("2024-01-25 00:00:00").cast("timestamp")
    val wm = feed.filter(inF1)
      .agg((max(col("ts")).cast("long") - 600L).as("wm")).head().getLong(0)
    val surviving = feed.filter(
      inF1 || (window(col("ts"), "1 hour")("end").cast("long") > wm))
    val expected = surviving
      .groupBy(window(col("ts"), "1 hour")("start").as("win_start"))
      .agg(count(lit(1)).as("n_ev"), sum(col("vc")).as("sum_cents"))
      .orderBy("win_start")
      .collect().map(_.toString).toSeq
    val got = graft.streaming.StreamDrive.streamWatermark(spark, "/root/testdata/sf0.001")
      .collect().map(_.toString).toSeq
    assert(got == expected)
    // the scenario is discriminative: some late rows dropped, some kept
    val all = feed.count()
    val kept = surviving.count()
    val f3 = feed.filter(!inF1).count()
    info(s"feed rows: $all (f3 late-arrivals: $f3), surviving: $kept (dropped ${all - kept})")
    assert(kept < all, "no rows were late — watermark never exercised")
    assert(kept - (all - f3) > 0,
      "every f3 row was dropped — acceptance path never exercised")
  }

  test("stream-stream join drive == batch interval join over the feed rows") {
    // End-to-end twin of the MemoryStream spec above: two file streams
    // over the shared feed (clicks / purchases), dual watermarks, append
    // inner join. All feed files co-arrive in one micro-batch, so the
    // sink must equal the batch interval join restricted to the feed's
    // not-null rows (value NOT NULL matters: joinInterval over raw events
    // would include valued-null clicks the feed excludes).
    val t = Tables(spark, "/root/testdata/sf0.001")
    val fe = t.events.filter(
      col("user_id").isNotNull && col("value").isNotNull && col("ts").isNotNull)
    val a = fe.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("a_user"), col("ts").as("a_ts"))
    val b = fe.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("b_user"), col("ts").as("b_ts"))
    val want = a.join(b,
        col("a_user") === col("b_user") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL '30' MINUTE"))
      .select("click_id", "purchase_id").orderBy("click_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = graft.streaming.StreamDrive.streamStreamJoin(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(want.nonEmpty && got == want)
  }

  test("split-arrival join drive == batch interval join (state crosses batches)") {
    // The multi-batch proof the co-arrival drive can't give: clicks land
    // in micro-batch 1, purchases in micro-batch 2, so EVERY emitted pair
    // passed through the RocksDB join buffer across the batch boundary.
    // Result must still equal the batch interval join over the feed rows.
    val t = Tables(spark, "/root/testdata/sf0.001")
    val fe = t.events.filter(
      col("user_id").isNotNull && col("value").isNotNull && col("ts").isNotNull)
    val a = fe.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("a_user"), col("ts").as("a_ts"))
    val b = fe.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("b_user"), col("ts").as("b_ts"))
    val want = a.join(b,
        col("a_user") === col("b_user") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL '30' MINUTE"))
      .select("click_id", "purchase_id").orderBy("click_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = graft.streaming.StreamDrive.streamJoinMultibatch(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(want.nonEmpty && got == want)
  }

  test("checkpoint restart drive == both-phase totals for phase-2 keys only") {
    // Run 2's sink must hold exactly the keys with a phase-2 row, each
    // carrying totals over BOTH phases: restored state + skipped p1.
    // The cross-phase assertion below is the teeth — if the restart
    // re-read p1 (doubling) or lost state (phase-2-only totals), at
    // least one key's numbers would differ from the batch statement.
    import org.apache.spark.sql.functions._
    val t = Tables(spark, "/root/testdata/sf0.001")
    val fe = t.events
      .filter(col("user_id").isNotNull && col("value").isNotNull)
      .select(col("event_id"), col("user_id"),
        round(col("value") * 100).cast("long").as("vc"))
    val p2Keys = fe.filter(col("event_id") % 3 === 0)
      .select("user_id").distinct()
    val want = fe.join(p2Keys, "user_id")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_ev"), sum(col("vc")).as("sum_cents"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got = graft.streaming.StreamDrive.streamRestart(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    // State restore is non-vacuous: some key must have phase-1 rows too
    // (its total strictly exceeds its phase-2-only count).
    val p2Only = fe.filter(col("event_id") % 3 === 0)
      .groupBy("user_id").agg(count(lit(1)).as("n2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.exists { case (u, n, _) => n > p2Only.getOrElse(u, 0L) },
      "no key carried phase-1 state across the restart — restore path never exercised")
  }

  test("left-outer stream-stream join drive == batch left join, null side non-vacuous") {
    import org.apache.spark.sql.functions._
    val t = Tables(spark, "/root/testdata/sf0.001")
    val fe = t.events
      .filter(col("user_id").isNotNull && col("value").isNotNull && col("ts").isNotNull)
    val c = fe.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("a_ts"))
    val p = fe.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("b_ts"))
    // Batch twin stated as inner pairs ∪ anti-joined unmatched clicks —
    // equivalent to the interval LEFT JOIN with COALESCE(-1), and immune
    // to the filtered-left-join trap (a click whose user purchases, just
    // never in-window, must still emit its -1 row).
    val pairs = c.join(p, c("user_id") === p("user_id") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL '30' MINUTE"), "inner")
      .select(col("click_id"), col("purchase_id"))
    val unmatchedClicks = c.join(pairs.select("click_id").distinct(), Seq("click_id"), "left_anti")
      .select(col("click_id"), lit(-1L).as("purchase_id"))
    val wantRows = pairs.union(unmatchedClicks)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val got = graft.streaming.StreamDrive.streamOuterJoin(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == wantRows)
    // Both sides of the outer semantics must be exercised on this corpus:
    assert(got.exists(_._2 == -1L), "no unmatched click emitted a null row")
    assert(got.exists(_._2 != -1L), "no matched pair emitted")
  }

  test("event-time timer sessionization == batch recompute over the accepted multiset") {
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    val got = graft.streaming.StreamDrive.stateSessions(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // driver-side recompute of the oracle rule (see the state_sessions
    // ExtraSql entry): accepted multiset = ALL valid rows (the feed
    // co-arrives as one data batch, late filter at epoch) → 30-min gap
    // split → sessions closed by the final watermark
    val gap = 30 * 60 * 1000L
    val delay = 600000L
    val ev = Tables(spark, sfDir).events
      .filter(col("user_id").isNotNull && col("value").isNotNull && col("ts").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"),
        round(col("value") * 100).cast("long").as("vc"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime, r.getLong(3)))
    val accepted = ev
    val wf = accepted.map(_._3).max - delay
    val expected = accepted.groupBy(_._2).toSeq.flatMap { case (uid, evs) =>
      val sorted = evs.map(e => (e._3, e._4)).sortBy(identity)
      val splits = scala.collection.mutable.ArrayBuffer[Int](0)
      for (i <- 1 until sorted.length) if (sorted(i)._1 - sorted(i - 1)._1 >= gap) splits += i
      splits += sorted.length
      splits.toSeq.sliding(2).map(w => (w(0), w(1))).collect {
        case (s, e) if sorted(e - 1)._1 + gap <= wf =>
          (uid, sorted(s)._1, (e - s).toLong, sorted.slice(s, e).map(_._2).sum)
      }
    }.toSet
    assert(got.toSet == expected)
    assert(got.length == got.toSet.size, "append-mode sessions must be exactly-once")
    // the scenario exercises both closure paths: sessions closed AND a
    // still-open tail (at least the user owning the max-ts event)
    val openTails = accepted.groupBy(_._2).count { case (_, evs) => evs.map(_._3).max + gap > wf }
    info(s"sessions emitted: ${got.length}, users with open tails withheld: $openTails")
    assert(got.nonEmpty && openTails > 0)
  }

  test("dropDuplicatesWithinWatermark: in-window duplicate drops across batches, " +
    "evicted key re-emits — the path the drive can't exercise deterministically") {
    val s = MemoryStream[Ev]
    val df = s.toDF()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id")
      .select(col("user_id"), col("event_id"))
    val q = df.writeStream.format("memory").queryName("ddww_out")
      .outputMode("append").start()
    def batch(evs: Ev*): Unit = { s.addData(evs); q.processAllAvailable() }
    try {
      // b1: first sighting of u1 emits; state expiry = 12:00 + 10 min
      batch(Ev(1, Timestamp.valueOf("2024-06-01 12:00:00"), 1, "click", 1.0))
      // b2: duplicate of u1 INSIDE the window → dropped by cross-batch state
      batch(Ev(2, Timestamp.valueOf("2024-06-01 12:05:00"), 1, "click", 1.0))
      // b3: u2 at 13:00 — plans the NEXT batch's watermark at 12:50
      batch(Ev(3, Timestamp.valueOf("2024-06-01 13:00:00"), 2, "click", 1.0))
      // b4: u3 emits; this batch's eviction watermark (12:50) clears u1
      batch(Ev(4, Timestamp.valueOf("2024-06-01 13:02:00"), 3, "click", 1.0))
      // b5: u1 is GONE from state → the same key legitimately re-emits
      batch(Ev(5, Timestamp.valueOf("2024-06-01 13:05:00"), 1, "click", 1.0))
      val got = spark.table("ddww_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 1L), (2L, 3L), (3L, 4L), (1L, 5L)), s"got $got")
      assert(!got.contains((1L, 2L)), "in-window duplicate must never emit")
    } finally q.stop()
  }
}
