package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Relational.{dbl, dec}

/** Bloom-filter-pruned semi join — the runtime-filter pattern made
  * explicit: build a compact bloom filter over the (filtered) build-side
  * keys, and prune the probe side BEFORE its shuffle; an exact semi join
  * then removes the false positives, so the result is independent of the
  * bloom parameters. At 100 TB the probe-side exchange is the dominant
  * cost of a selective semi join, and the bloom pass cuts it by ≈ the key
  * selectivity.
  *
  * The filter uses Spark's OWN runtime-filter machinery —
  * `BloomFilterAggregate` builds the sketch distributed (partial+final
  * merge of bitmap buffers), and `BloomFilterMightContain` probes it with
  * the filter arriving as a SCALAR SUBQUERY result, exactly the plan shape
  * `InjectRuntimeFilter` produces. The subquery result is runtime data,
  * not a plan literal: at production sizes (m ≥ 2²⁷ bits for ~10⁸ keys)
  * a literal bitmap array would poison codegen and plan serialization,
  * while the subquery form ships the same bytes through the existing
  * broadcast path. (The round-1..6 version assembled the bitmap by hand —
  * explode bit positions → bit_or → collect → typedlit literal — which
  * was bounded at test scale but exactly that literal trap at scale.)
  *
  * Both expressions are Catalyst-internal (used by the adaptive runtime
  * filter), not in the builtin function registry — registered here under
  * graft names with the same runtime-registration pattern as the other
  * native graft expressions.
  */
object Bloom {

  private def registerBloomFns(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val fns: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
      (FunctionIdentifier("graft_bloom_agg"),
        new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
        (c: Seq[Expression]) => new BloomFilterAggregate(c(0), c(1), c(2))),
      (FunctionIdentifier("graft_might_contain"),
        new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
        (c: Seq[Expression]) => BloomFilterMightContain(c(0), c(1))))
    val registry = spark.sessionState.functionRegistry
    fns.foreach { case (id, info, b) =>
      if (!registry.functionExists(id)) registry.registerFunction(id, info, b)
    }
  }

  def bloomSemiJoin(t: Tables, priceMin: Double = 450000.0, bitsLog2: Int = 20): DataFrame = {
    val (pruned, keys) = prunedProbe(t, priceMin, bitsLog2)
    pruned
      .join(keys, pruned("l_orderkey") === keys("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        dbl(sum(dec(col("l_quantity"))).cast(DecimalType(38, 2))).as("sum_qty"))
      .orderBy("l_returnflag")
  }

  /** Bloom build + probe prune, returning (pruned lineitem, key set) —
    * the stage before the exact semi join. Also exposed for the
    * pruning-effect spec (the registered query's result can't show the
    * prune by construction — the semi join erases false positives).
    *
    * The estimated-items hint (2¹² ≈ 3× the filtered key count at sf0.1)
    * only sizes the number of hash functions k = max(1, ⌈m/n·ln2⌉·…) —
    * the bit budget itself is pinned at m = 2^bitsLog2, matching the
    * previous hand-rolled filter's footprint.
    */
  /** Per-call view-name counter: the SQL text needs named relations, but
    * fixed names would clobber a user view of the same name and race under
    * concurrent calls (view A's analysis reading view B's build side turns
    * bloom false POSITIVES into false NEGATIVES — silently dropped rows).
    * Unique names + drop-after-analysis: `spark.sql` resolves the relations
    * eagerly, so the returned (lazy) frame no longer needs the views.
    */
  private val viewSeq = new java.util.concurrent.atomic.AtomicLong()

  private[graft] def prunedProbe(t: Tables, priceMin: Double, bitsLog2: Int): (DataFrame, DataFrame) = {
    val m = 1L << bitsLog2
    registerBloomFns(t.spark)
    val keys = t.orders.filter(col("o_totalprice") > priceMin).select("o_orderkey")
    val n = viewSeq.incrementAndGet()
    val buildView = s"graft_bloom_build_$n"
    val probeView = s"graft_bloom_probe_$n"
    t.orders.createOrReplaceTempView(buildView)
    t.lineitem.createOrReplaceTempView(probeView)
    val pruned =
      try t.spark.sql(
        s"""SELECT * FROM $probeView
           |WHERE graft_might_contain(
           |  (SELECT graft_bloom_agg(xxhash64(o_orderkey), CAST(4096 AS BIGINT), CAST($m AS BIGINT))
           |   FROM $buildView WHERE o_totalprice > $priceMin),
           |  xxhash64(l_orderkey))""".stripMargin)
      finally {
        t.spark.catalog.dropTempView(buildView)
        t.spark.catalog.dropTempView(probeView)
      }
    (pruned, keys)
  }
}
