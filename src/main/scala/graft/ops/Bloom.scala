package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Relational.{dbl, dec}

/** Bloom-filter-pruned semi join — the runtime-filter pattern made
  * explicit: build a compact bit set over the (filtered) build-side keys,
  * broadcast it as a literal, and prune the probe side BEFORE its shuffle;
  * an exact semi join then removes the false positives, so the result is
  * independent of the bloom parameters. At 100 TB the probe-side exchange
  * is the dominant cost of a selective semi join, and the bloom pass cuts
  * it by ≈ the key selectivity (false-positive rate (1−e^(−kn/m))^k ≈ 1e-5
  * at k=2, m=2^20, n≈1.5k) — the same machinery Spark's adaptive runtime
  * bloom filter injects, but deterministic and visible in the plan.
  *
  * The bitmap is assembled distributed (explode bit positions → groupBy
  * word → bit_or) and only the non-zero words of the m/64 = 16 Ki-long
  * array are collected — bounded driver state of the broadcast-dim class,
  * NOT a hot-path collect (the key set itself never becomes driver-
  * resident, and the probe pass is a pure map of codegen expressions).
  */
object Bloom {

  private val Seed2 = 0x9e3779b97f4a7c15L // golden ratio → independent 2nd hash

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

  /** Two-hash membership test against the literal word array (element_at
    * is 1-based). Plain codegen expressions — no UDF anywhere.
    */
  private[graft] def mightContain(lut: Column, k: Column, m: Long): Column = {
    def bitSet(p: Column): Column =
      call_function("bit_get",
        element_at(lut, shiftright(p, 6).cast(IntegerType) + 1),
        pmod(p, lit(64L)).cast(IntegerType)) === 1
    bitSet(pmod(xxhash64(k), lit(m))) && bitSet(pmod(xxhash64(k, lit(Seed2)), lit(m)))
  }

  /** Bloom build + probe prune, returning (pruned lineitem, key set) —
    * the stage before the exact semi join. Also exposed for the
    * pruning-effect spec (the registered query's result can't show the
    * prune by construction — the semi join erases false positives).
    */
  private[graft] def prunedProbe(t: Tables, priceMin: Double, bitsLog2: Int): (DataFrame, DataFrame) = {
    val m = 1L << bitsLog2
    val keys = t.orders.filter(col("o_totalprice") > priceMin).select("o_orderkey")
    val posCol = explode(array(
      pmod(xxhash64(col("o_orderkey")), lit(m)),
      pmod(xxhash64(col("o_orderkey"), lit(Seed2)), lit(m))))
    val words = keys
      .select(posCol.as("pos"))
      .select(
        shiftright(col("pos"), 6).cast(IntegerType).as("w"),
        call_function("shiftleft", lit(1L), pmod(col("pos"), lit(64L)).cast(IntegerType)).as("bit"))
      .groupBy("w").agg(bit_or(col("bit")).as("bits"))
      .collect()
    val dense = new Array[Long]((m / 64).toInt)
    words.foreach(r => dense(r.getInt(0)) = r.getLong(1))
    (t.lineitem.filter(mightContain(typedlit(dense.toSeq), col("l_orderkey"), m)), keys)
  }
}
