package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DSv2 connector's pushdown surfaces, asserted OBSERVABLY:
  * partition pruning via the planned-partition count, filter pushdown
  * via the executed plan's scan description, column pruning via the
  * scan's read schema — plus value-level checks of the generator
  * formula and the clamp edges (the oracle re-checks values at sf0.01;
  * this spec pins the plan shapes the oracle can't see).
  */
class RangeGenSpec extends AnyFunSuite with SparkSessionFixture {

  private def rangegen(start: Long, end: Long, slices: Int = 16) =
    spark.read.format("graft.sources.RangeGen")
      .option("start", start).option("end", end).option("slices", slices)
      .load()

  private def scanDescription(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")

  test("full scan produces the declared range with the exact formula") {
    val rows = rangegen(0, 1000).collect()
    assert(rows.length == 1000)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == (id * 2654435761L) % 1000003L)
      assert(r.getString(2) == "t" + (id % 7))
    }
  }

  test("id predicates clamp the planned partitions (pushdown prunes work)") {
    val full = rangegen(0, 200000)
    val narrowed = full.filter(col("id") >= 190000L)
    // 16 slices over 200k rows = 12500/slice; [190000, 200000) spans 1.
    assert(full.rdd.getNumPartitions == 16)
    assert(narrowed.rdd.getNumPartitions == 1)
    assert(narrowed.count() == 10000)
    // unsatisfiable clamp plans zero partitions and zero rows
    assert(rangegen(0, 1000).filter(col("id") === 5000L).count() == 0)
    // clamp edges are exact on every operator
    assert(rangegen(0, 1000).filter(col("id") > 997L)
      .select(collect_list("id")).head().getSeq[Long](0).sorted == Seq(998L, 999L))
    assert(rangegen(0, 1000).filter(col("id") <= 1L).count() == 2)
    assert(rangegen(0, 1000).filter(col("id") === 7L)
      .head().getLong(0) == 7L)
  }

  test("LIMIT clamps generation: only min(n, range) ids are ever produced") {
    val full = rangegen(0, 200000)
    // 12500 ids/slice: LIMIT 100 clamps [0, 100) -> 1 planned partition
    val limited = full.limit(100)
    assert(limited.rdd.getNumPartitions == 1,
      "a pushed limit should clamp generation to one slice")
    assert(limited.count() == 100)
    // composes with a pushed filter: [150000, ...) LIMIT 50 -> [150000, 150050)
    val both = full.filter(col("id") >= 150000L).limit(50)
    assert(both.count() == 50)
    assert(both.agg(min("id")).head().getLong(0) == 150000L)
    // limit past the range over-asks harmlessly
    assert(rangegen(0, 10).limit(1000).count() == 10)
  }

  test("pushed range and pruned columns appear in the scan; tag filter stays residual") {
    val df = rangegen(0, 200000)
      .filter(col("id") >= 150000L && col("id") < 180000L && col("tag") =!= "t3")
      .select("id")
    val scan = scanDescription(df)
    assert(scan.contains("range=[150000,180000)"))
    // tag was needed by the residual filter, id by the projection;
    // val_cents is referenced nowhere and must be pruned from the scan
    assert(scan.contains("cols=id,tag") || scan.contains("cols=tag,id"))
    assert(!scan.contains("val_cents"))
    // the residual tag predicate executes post-scan and is respected
    assert(df.count() == 30000 - rangegen(150000, 180000)
      .filter(col("tag") === "t3").count())
  }

  test("micro-batch stream: admission-controlled batches drain the range exactly once") {
    val ck = java.nio.file.Files.createTempDirectory("graft_rgstream_ck").toString
    val q = spark.readStream.format("graft.sources.RangeGen")
      .option("start", 0).option("end", 10000)
      .option("slices", 4).option("batchRows", 3000)
      .load()
      .groupBy("tag").agg(count(lit(1)).as("n"), sum("val_cents").as("sc"))
      .writeStream.format("memory").queryName("rg_stream")
      .outputMode("update")
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // 10000 rows at 3000/batch → 4 data micro-batches, not one catch-up
    assert(q.recentProgress.count(_.numInputRows > 0) == 4)
    assert(q.recentProgress.filter(_.numInputRows > 0)
      .map(_.numInputRows).sum == 10000)
    val got = spark.table("rg_stream")
      .groupBy("tag").agg(max(struct(col("n"), col("sc"))).as("s"))
      .select(col("tag"), col("s.n"), col("s.sc"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val want = (0L until 10000L).groupBy(id => "t" + (id % 7)).map {
      case (tag, ids) =>
        tag -> ((ids.size.toLong, ids.map(id => (id * 2654435761L) % 1000003L).sum))
    }
    assert(got == want)
  }

  test("count-only query prunes every column from the scan") {
    val df = rangegen(0, 10000).groupBy().count()
    assert(scanDescription(df).contains("cols="))
    assert(df.head().getLong(0) == 10000)
  }
}
