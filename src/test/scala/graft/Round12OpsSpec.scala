package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 surface additions: recursive CTE through the parser, the
  * VariantType extraction path, the XML source round trip, and the
  * foreachBatch upsert sink. Each already carries a DuckDB oracle; the
  * pins here are the properties the oracle can't see — plan shape
  * (the engine, not a driver loop, owns the recursion), store layout
  * and idempotence (the upsert versions on disk), and cross-surface
  * equalities.
  */
class Round12OpsSpec extends AnyFunSuite with SparkSessionFixture {

  private val sfDir = "/root/testdata/sf0.001"

  test("sql_recursive_cte: UnionLoop executes the recursion (engine-owned loop)") {
    val df = Registry.all("sql_recursive_cte")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("UnionLoop"), p)
  }

  test("sql_recursive_cte: root subtree covers every customer at full depth") {
    val df = Registry.all("sql_recursive_cte")(spark, sfDir).cache()
    try {
      // 16-ary heap rooted at key 0: EVERY walk terminates at anc = 0
      // (k DIV 16 reaches 0, then the anc > 0 guard stops), so the root
      // subtree is the whole table
      val nCust = Tables(spark, sfDir).customer.count()
      val maxKey = Tables(spark, sfDir).customer
        .agg(max("c_custkey")).head().getLong(0)
      val root = df.filter(col("anc") === 0).head()
      // every node's walk passes the root exactly once
      assert(root.getAs[Long]("n_desc") == nCust)
      // deepest walk: floor(log16(maxKey)) + 1 DIV-16 steps to reach 0
      val expectDepth = (63 - java.lang.Long.numberOfLeadingZeros(maxKey)) / 4 + 1
      assert(root.getAs[Long]("max_depth") == expectDepth,
        s"max_depth=${root.getAs[Long]("max_depth")} expected=$expectDepth")
      // each node contributes its key to every ancestor's sum, itself incl.
      val self = df.filter(col("anc") === maxKey).head()
      assert(self.getAs[Long]("n_desc") >= 1)
    } finally df.unpersist()
  }

  test("fn_variant: typed paths round-trip, missing path is NULL") {
    val df = Registry.all("fn_variant")(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("vmiss"))))
    // vtag was built as event_id % 11 — the array index really extracted
    assert(rows.forall { r =>
      r.getAs[Long]("vtag") == r.getAs[Long]("event_id") % 11
    })
    // vk must agree with the source-of-truth JSON extraction
    val direct = Tables(spark, sfDir).events
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("k").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.forall { r =>
      direct(r.getAs[Long]("event_id")) == r.getAs[Long]("vk")
    })
  }

  test("source_xml: round trip equals the original-table aggregate") {
    val viaXml = Registry.all("source_xml")(spark, sfDir).collect()
    val direct = Tables(spark, sfDir).part
      .groupBy("p_brand")
      .agg(
        count(lit(1)).as("n_parts"),
        min(col("p_name")).as("first_name"),
        countDistinct(col("p_type")).as("n_types"),
        sum(col("p_partkey")).as("sum_key"),
        sum(col("p_size")).as("sum_size"))
      .orderBy("p_brand")
      .collect()
    assert(viaXml.toSeq == direct.toSeq)
  }

  test("agg_listagg: the native WITHIN GROUP aggregate equals the composition twin") {
    val native = Registry.all("agg_listagg")(spark, sfDir)
      .select("s_nationkey", "n", "names").collect()
    val composed = Registry.all("agg_string")(spark, sfDir).collect()
    assert(native.toSeq == composed.toSeq)
  }

  test("stream_foreach_upsert: fold equals batch aggregate; replay is a no-op") {
    val first = Registry.all("stream_foreach_upsert")(spark, sfDir).collect()
    val expect = Tables(spark, sfDir).events
      .filter(col("user_id").isNotNull && col("value").isNotNull && col("ts").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))
      .orderBy("user_id")
      .collect()
    assert(first.toSeq == expect.toSeq)
    // Warm store + fresh checkpoint: the whole stream REPLAYS and every
    // version commit must lose to the existing dir — same result, still
    // exactly the three feed batches' versions.
    val second = Registry.all("stream_foreach_upsert")(spark, sfDir).collect()
    assert(second.toSeq == first.toSeq)
  }
}
