package graft.ops

import graft.Tables
import java.math.{BigDecimal => JBigDecimal}
import java.util.Locale

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import Relational.dec

/** User-defined-extension surface (SURVEY.md §2.2): basis's whole premise
  * is user code as pipeline nodes, so the engine exercises all three Spark
  * extension points — scalar UDF, typed Aggregator UDAF, and a generator
  * (flatMap UDTF, v1 expressed as posexplode+lead in [[Text.udtfBigrams]]).
  *
  * Every declared query's oracle uses only builtins, so DuckDB checks the
  * custom implementations for semantic equality.
  */
object Udx {

  /** Scalar UDF: slugify. Spec: LOWER(REGEXP_REPLACE(name,'[^a-zA-Z0-9]+','-')).
    * JVM regex is the same engine Spark's builtin regexp_replace uses, so
    * the UDF and the builtin agree byte-for-byte.
    */
  val slugify = udf { s: String =>
    if (s == null) null
    else s.replaceAll("[^a-zA-Z0-9]+", "-").toLowerCase(Locale.ROOT)
  }

  def udfSlugify(t: Tables): DataFrame =
    t.part
      .select(col("p_partkey"), slugify(col("p_name")).as("slug"))
      .orderBy("p_partkey")
      .limit(500)

  /** Typed Aggregator UDAF: weighted average sum(p*q)/sum(q) with exact
    * decimal accumulation (inputs arrive pre-cast to DECIMAL(18,2); the
    * buffer is exact java BigDecimal arithmetic, so partial+final merge
    * order can't perturb the result). Returns the unrounded double ratio —
    * final rounding stays in the builtin `round` so the rounding rule is
    * identical to the oracle's.
    */
  object WeightedAvg
      extends Aggregator[(JBigDecimal, JBigDecimal), (JBigDecimal, JBigDecimal), Double] {
    override def zero: (JBigDecimal, JBigDecimal) =
      (JBigDecimal.ZERO, JBigDecimal.ZERO)
    override def reduce(
        b: (JBigDecimal, JBigDecimal),
        a: (JBigDecimal, JBigDecimal)): (JBigDecimal, JBigDecimal) =
      if (a._1 == null || a._2 == null) b
      else (b._1.add(a._1.multiply(a._2)), b._2.add(a._2))
    override def merge(
        x: (JBigDecimal, JBigDecimal),
        y: (JBigDecimal, JBigDecimal)): (JBigDecimal, JBigDecimal) =
      (x._1.add(y._1), x._2.add(y._2))
    override def finish(r: (JBigDecimal, JBigDecimal)): Double =
      r._1.doubleValue() / r._2.doubleValue()
    override def bufferEncoder: Encoder[(JBigDecimal, JBigDecimal)] =
      Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val weightedAvg = udaf(WeightedAvg)

  def udafWeightedAvg(t: Tables): DataFrame =
    t.lineitem
      .groupBy("l_returnflag")
      .agg(
        round(weightedAvg(dec(col("l_extendedprice")), dec(col("l_quantity"))), 4)
          .as("wavg_price"))
      .orderBy("l_returnflag")

  /** Generator/UDTF v2: one doc row → N bigram rows as a typed flatMap —
    * the imperative twin of the declared posexplode+lead plan
    * ([[Text.udtfBigrams]]); UdxSpec proves they agree row-for-row.
    */
  def bigramsTyped(docs: org.apache.spark.sql.Dataset[(Long, String)])
      : org.apache.spark.sql.Dataset[(Long, String)] = {
    import docs.sparkSession.implicits._
    docs.flatMap { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      toks.iterator.zip(toks.iterator.drop(1)).map { case (a, b) => (id, s"$a $b") }
    }
  }
}
