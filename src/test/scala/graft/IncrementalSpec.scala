package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, IncrementalDedup, Text}

/** Incremental dedup invariant and PII scrubbing behavior. */
class IncrementalSpec extends AnyFunSuite with SparkSessionFixture {

  test("block-vs-store candidates == full-recompute cross-boundary pairs") {
    val t = Tables(spark, "/root/testdata/sf0.1") // sf0.1: has exact dups
    val block = t.documents.filter(col("doc_id") < 500)
    val corpus = t.documents.filter(col("doc_id") >= 500)

    val store = IncrementalDedup.bandStore(corpus)
    val inc = IncrementalDedup.newBlockCandidates(block, store)
      .collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)), math.max(r.getLong(0), r.getLong(1))))
      .toSet

    val full = Dedup.minhashCandidates(t.documents)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val crossBoundary = full.filter { case (a, b) => (a < 500) != (b < 500) }

    assert(inc === crossBoundary)
    assert(inc.nonEmpty, "boundary-spanning candidates should exist at sf0.1")
  }

  test("PII scrub redacts emails and phones, counts hits, leaves clean text alone") {
    import spark.implicits._
    val df = Seq(
      (1L, "contact me at jo.doe+x@example.org or (555) 867-5309 today"),
      (2L, "two mails a@b.io and c.d@e.co.uk, phone +44 20 7946 0958"),
      (3L, "a clean document with no contact details at all"))
      .toDF("doc_id", "text")
    val out = Text.scrubPii(df, "text").orderBy("doc_id").collect()

    assert(out(0).getAs[String]("text") === "contact me at <EMAIL> or <PHONE> today")
    assert(out(0).getAs[Int]("n_email") === 1 && out(0).getAs[Int]("n_phone") === 1)
    assert(out(1).getAs[Int]("n_email") === 2 && out(1).getAs[Int]("n_phone") === 1)
    assert(!out(1).getAs[String]("text").contains("@"))
    assert(out(2).getAs[String]("text") === "a clean document with no contact details at all")
    assert(out(2).getAs[Int]("n_email") === 0 && out(2).getAs[Int]("n_phone") === 0)
  }
}
