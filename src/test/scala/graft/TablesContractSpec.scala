package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Data-contract pin for the events loader (round-8 postmortem).
  *
  * The driver's data generator has shipped `events.ts` in two encodings:
  * parquet TIMESTAMP(NANOS) — which Spark 4.x surfaces as ns-since-epoch
  * LongType under `nanosAsLong` — and TIMESTAMP(MICROS), a native
  * TimestampType. Round 8 lost 44 queries + the whole bench because the
  * loader assumed one encoding. This spec writes BOTH shapes and asserts
  * `Tables.events` yields identical TimestampType values for each, so any
  * future data-contract drift fails here first, not in the driver's gate.
  */
class TablesContractSpec extends AnyFunSuite with SparkSessionFixture {

  /** encoding: "ns_long" (legacy nanos-as-long), "us_tz" (TimestampType),
    * "us_ntz" (naive µs — what pandas/pyarrow driver data actually is). */
  private def writeEvents(dir: String, encoding: String): Unit = {
    import spark.implicits._
    val base = Seq(
      (1L, 1700000000000000L, 10L, "click", 1.5, """{"k":1}"""),
      (2L, 1700000001500000L, 11L, "view", 2.5, """{"k":2}""")
    ).toDF("event_id", "us", "user_id", "event_type", "value", "props")
    val withTs = encoding match {
      case "ns_long" => base.withColumn("ts", (col("us") * 1000L).cast(LongType))
      case "us_tz"   => base.withColumn("ts", timestamp_micros(col("us")))
      case "us_ntz"  =>
        base.withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
    }
    withTs.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def loadMap(dir: String): Map[Long, Long] = {
    val ev = Tables(spark, dir).events
    assert(ev.schema("ts").dataType == TimestampType, s"ts type for $dir")
    ev.select(col("event_id"), unix_micros(col("ts")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("events loader handles ns-long, µs-tz, and µs-ntz encodings") {
    val expected = Map(1L -> 1700000000000000L, 2L -> 1700000001500000L)
    Seq("ns_long", "us_tz", "us_ntz").foreach { enc =>
      val dir = Files.createTempDirectory(s"graft-events-$enc").toString
      writeEvents(dir, enc)
      assert(loadMap(dir) == expected, s"encoding $enc")
    }
  }

  test("driver testdata events loads with TimestampType ts") {
    val sfDir = "/root/testdata/sf0.001"
    if (new java.io.File(s"$sfDir/events.parquet").exists()) {
      val ev = Tables(spark, sfDir).events
      assert(ev.schema("ts").dataType == TimestampType)
      assert(ev.limit(1).count() == 1)
    }
  }
}
