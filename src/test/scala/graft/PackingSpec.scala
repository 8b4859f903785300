package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Packing

/** Sequence sharding: two-pass rank correctness (vs the single-partition
  * global window) and the balance guarantee of longest-first striping.
  */
class PackingSpec extends AnyFunSuite with SparkSessionFixture {

  private lazy val t = Tables(spark, "/root/testdata/sf0.001")

  test("bin audit equals the global-window reference") {
    val toks = t.documents.select(
      col("doc_id"),
      size(expr("filter(split(text, ' '), x -> x <> '')")).cast("long").as("n_tok"))
    val ref = toks
      .withColumn("rk", row_number().over(Window.orderBy(desc("n_tok"), asc("doc_id"))))
      .select(col("doc_id"), col("n_tok"), ((col("rk") - 1) % 8).as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("tok_mass"))
      .orderBy("bin").collect().map(_.toString).toSeq
    val got = Packing.packSequences(t).collect().map(_.toString).toSeq
    assert(got === ref)
  }

  test("no single-partition window in the registered plan") {
    val plan = Packing.packSequences(t).queryExecution.executedPlan.toString()
    // the only Window in the plan must be partitioned (by pid), never a
    // global Window.orderBy
    assert(!plan.contains("windowspecdefinition(") ||
      !plan.matches("(?s).*Window \\[[^\\]]*\\], \\[\\].*"),
      s"global (unpartitioned) WindowExec found:\n$plan")
    assert(plan.contains("Window"), "two-pass rank still uses per-pid windows")
  }

  test("striping balances doc counts within 1 and token mass within a stripe spread") {
    val rows = Packing.packSequences(t).collect()
    val docs = rows.map(_.getLong(1))
    assert(docs.max - docs.min <= 1, "doc counts differ by at most 1")
    val mass = rows.map(_.getLong(2))
    val maxTok = t.documents
      .select(max(size(expr("filter(split(text, ' '), x -> x <> '')")))).head().getInt(0).toLong
    // LPT striping: per-stripe contribution differs by at most the spread
    // of that stripe; across all stripes the bound telescopes to max n_tok
    assert(mass.max - mass.min <= maxTok,
      s"token-mass imbalance ${mass.max - mass.min} exceeds max doc ${maxTok}")
  }
}
