package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two survey ops deliberately excluded from the oracle contract:
  * approx_count_distinct (HLL sketches are engine-specific → ε-bound vs
  * exact) and map-typed columns (no map column in testdata; DuckDB↔Spark
  * map parquet round-trips are fragile → unit-test only).
  */
class ApproxMapSpec extends AnyFunSuite with SparkSessionFixture {

  private lazy val t = Tables(spark, "/root/testdata/sf0.01")

  test("approx_count_distinct within HLL++ error bound of exact") {
    val df = t.lineitem.agg(
      countDistinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey")).as("approx"), // default rsd 5%
      approx_count_distinct(col("l_orderkey"), 0.01).as("approx1"))
    val r = df.head
    val (exact, approx, approx1) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(math.abs(approx - exact).toDouble / exact < 0.15, s"rsd5%%: $approx vs $exact")
    assert(math.abs(approx1 - exact).toDouble / exact < 0.03, s"rsd1%%: $approx1 vs $exact")
  }

  test("map column construction, access, and aggregation") {
    val m = t.events
      .select(
        col("event_id"),
        map(lit("type"), col("event_type"), lit("user"), col("user_id").cast("string"))
          .as("props_map"))
    assert(m.schema("props_map").dataType.typeName == "map")
    val back = m.select(
      col("event_id"),
      element_at(col("props_map"), "type").as("ty"),
      map_keys(col("props_map")).as("ks"),
      map_values(col("props_map")).as("vs"))
    val row = back.orderBy("event_id").head
    assert(row.getSeq[String](2) == Seq("type", "user"))
    val counts = m.select(explode(col("props_map")))
      .groupBy("key").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("type" -> t.events.count(), "user" -> t.events.count()))
  }

  test("map survives a parquet round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-map").toString
    val m = t.events.limit(100).select(
      col("event_id"),
      map(lit("t"), col("event_type")).as("pm"))
    m.write.parquet(s"$dir/m")
    val back = spark.read.parquet(s"$dir/m")
    assert(back.count() == 100)
    assert(back.select(element_at(col("pm"), "t")).filter(col("element_at(pm, t)").isNull).count() == 0)
  }
}
