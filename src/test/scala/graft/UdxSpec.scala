package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Text, Udx}

/** The typed flatMap generator (UDTF v2) must agree row-for-row with the
  * declared posexplode+lead plan; the UDAF/UDF extension points are
  * covered by the contract suite (their declared queries hash-match the
  * builtin-only oracle).
  */
class UdxSpec extends AnyFunSuite with SparkSessionFixture {

  import spark.implicits._

  test("typed flatMap bigram generator == declared posexplode+lead plan") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val docs = t.documents.filter(col("doc_id") < 10)
      .select(col("doc_id"), col("text")).as[(Long, String)]
    val typed = Udx.bigramsTyped(docs)
      .groupBy(col("_1").as("doc_id"), col("_2").as("bigram"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(asc("doc_id"), desc("cnt"), asc("bigram"))
    val declared = Text.udtfBigrams(t)
    assert(typed.collect().map(_.toString).toSeq ==
      declared.collect().map(_.toString).toSeq)
  }
}
