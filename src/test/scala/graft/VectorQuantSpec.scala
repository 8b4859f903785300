package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Vector

/** int8 quantization guarantees: code range, per-element reconstruction
  * error bound (0.5·scale by rounding), and small corpus RMS error.
  */
class VectorQuantSpec extends AnyFunSuite with SparkSessionFixture {

  test("codes bounded, reconstruction within half a step, RMS error small") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val q = Vector.vecQuantize(t)
      .select(col("vec_id"), col("scale"),
        expr("transform(split(codes, ','), c -> CAST(c AS INT))").as("q"))
    val orig = t.embeddings.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
    val joined = q.join(orig, "vec_id")
      .select(col("vec_id"), col("scale"),
        expr("aggregate(zip_with(e, q, (a, b) -> abs(a - b * scale)), CAST(0.0 AS DOUBLE), (s, x) -> greatest(s, x))").as("max_err"),
        expr("sqrt(aggregate(zip_with(e, q, (a, b) -> pow(a - b * scale, 2)), CAST(0.0 AS DOUBLE), (s, x) -> s + x) / size(e))").as("rms"),
        expr("aggregate(q, 0, (s, c) -> greatest(s, abs(c)))").as("max_code"))
    val rows = joined.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getDouble(1)
      assert(r.getInt(4) <= 127, s"code out of int8 range for vec ${r.getLong(0)}")
      assert(r.getDouble(2) <= 0.5 * scale + 1e-12,
        s"reconstruction error ${r.getDouble(2)} exceeds half-step ${0.5 * scale}")
    }
    val meanRms = rows.map(_.getDouble(3)).sum / rows.length
    val meanScale = rows.map(_.getDouble(1)).sum / rows.length
    assert(meanRms <= 0.3 * meanScale, s"RMS $meanRms vs scale $meanScale")
  }
}
