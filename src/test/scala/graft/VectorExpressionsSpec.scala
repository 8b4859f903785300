package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Vector

/** The native codegen'd graft_dot must be bit-identical to the declared
  * HOF fold semantics (same left-to-right double accumulation), including
  * null propagation.
  */
class VectorExpressionsSpec extends AnyFunSuite with SparkSessionFixture {

  test("graft_dot matches HOF fold bit-exactly on real embeddings") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    graft.functions.VectorExpressions.register(spark)
    val e = transform(col("embedding"), x => x.cast(DoubleType))
    val diff = t.embeddings
      .select(Vector.dot(e, e).as("native"), Vector.dotHof(e, e).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diff == 0)
  }

  test("graft_dot null propagation and cross-vector values") {
    graft.functions.VectorExpressions.register(spark)
    val df = spark.sql(
      """SELECT graft_dot(CAST(a AS ARRAY<DOUBLE>), CAST(b AS ARRAY<DOUBLE>)) AS d,
        |       aggregate(zip_with(CAST(a AS ARRAY<DOUBLE>), CAST(b AS ARRAY<DOUBLE>),
        |                          (x, y) -> x * y), CAST(0.0 AS DOUBLE), (s, x) -> s + x) AS hof
        |FROM VALUES
        |  (array(1.0, 2.0, 3.0), array(4.0, 5.0, 6.0)),
        |  (CAST(NULL AS ARRAY<DOUBLE>), array(1.0)),
        |  (array(), array()),
        |  (array(1.0, 2.0), array(1.0)),
        |  (array(1.0, CAST(NULL AS DOUBLE)), array(1.0, 2.0))
        |AS t(a, b)""".stripMargin)
    val rows = df.collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    val hof = df.collect().map(r => if (r.isNullAt(1)) null else r.getDouble(1))
    assert(rows.toSeq == Seq(32.0, null, 0.0, null, null))
    assert(rows.toSeq == hof.toSeq, "graft_dot must equal the HOF fold on every edge case")
  }
}
