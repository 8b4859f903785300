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

  /** The full LOADED data contract, every table: if a driver data
    * regeneration changes any column's name or Spark-side type, this
    * single test names the drifted table and column instead of scattering
    * dozens of cryptic per-query analysis failures across the suite (the
    * round-8 failure mode). Timestamp columns are asserted as TimestampType
    * regardless of the on-disk encoding — that is the loaders' published
    * contract, not the file's.
    */
  test("driver testdata: loaded schema contract for every table") {
    val expected: Map[String, Seq[(String, DataType)]] = Map(
      "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
      "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
        "n_regionkey" -> IntegerType),
      "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
        "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
        "c_mktsegment" -> StringType),
      "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
        "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
      "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
        "p_brand" -> StringType, "p_type" -> StringType,
        "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
      "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
        "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
        "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
      "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
        "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
        "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
        "l_discount" -> DoubleType, "l_tax" -> DoubleType,
        "l_returnflag" -> StringType, "l_linestatus" -> StringType,
        "l_shipdate" -> TimestampNTZType),
      "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
        "user_id" -> LongType, "event_type" -> StringType,
        "value" -> DoubleType, "props" -> StringType),
      "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
        "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
      "embeddings" -> Seq("vec_id" -> LongType,
        "embedding" -> ArrayType(FloatType, containsNull = true),
        "label" -> IntegerType))
    val sfDir = "/root/testdata/sf0.001"
    if (new java.io.File(s"$sfDir/events.parquet").exists()) {
      val t = Tables(spark, sfDir)
      expected.foreach { case (name, cols) =>
        val got = t.table(name).schema.fields.toSeq.map(f => f.name -> f.dataType)
        assert(got == cols,
          s"data-contract drift in table '$name': loaded=$got expected=$cols")
      }
    }
  }
}
