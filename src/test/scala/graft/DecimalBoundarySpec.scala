package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the decimal→double output rule's 2^53 boundary (Relational.dbl's
  * scaladoc, ADVICE r3 medium risk): the driver's hash compare renders both
  * engines' decimals as float64, which is exact-stable only while the
  * SCALED decimal magnitude stays below 2^53.
  *
  * DuckDB is driver-side Python and not callable from ScalaTest, so the
  * spec simulates its documented conversion path exactly in the JVM:
  * hugeint unscaled value → nearest double → divide by 10^scale (two
  * roundings). Spark's path (Decimal.toDouble = BigDecimal.doubleValue) is
  * a single correct rounding of the true rational value.
  *
  *  - BELOW 2^53: the unscaled long is float64-exact, so DuckDB's division
  *    is a single correct rounding of the same rational — the paths agree
  *    for EVERY value (IEEE-754 argument, asserted over a dense sample
  *    ending at 2^53 - 1).
  *  - ABOVE 2^53: the first conversion already rounds, so the divide
  *    double-rounds; the spec exhibits a concrete divergence, proving the
  *    documented bound is tight, and shows the fixed-scale-string fallback
  *    (CAST AS STRING) stays digit-exact there.
  */
class DecimalBoundarySpec extends AnyFunSuite with SparkSessionFixture {

  private val scale = 4
  private val pow10 = math.pow(10, scale) // 1e4 is float64-exact

  /** DuckDB DECIMAL→DOUBLE: unscaled → nearest double, then divide. */
  private def duckPath(unscaled: BigInt): Double =
    unscaled.toDouble / pow10

  /** Spark DECIMAL→DOUBLE through the real engine: one correct rounding. */
  private def sparkPath(unscaled: Seq[BigInt]): Seq[Double] = {
    import spark.implicits._
    val rows = unscaled.map(u => BigDecimal(u, scale).toString)
    rows.toDF("s")
      .select(col("s").cast(DecimalType(38, scale)).cast(DoubleType).as("d"))
      .as[Double].collect().toSeq
  }

  test("below 2^53 scaled magnitude: Spark and the DuckDB path agree exactly") {
    val top = BigInt(1) << 53
    // Dense at the boundary (the hardest mantissa region) plus spread-out
    // magnitudes below it.
    val sample = (1 to 2000).map(i => top - i) ++
      (1 to 50).map(i => top / (i * 7 + 1) + i)
    val spark64 = sparkPath(sample)
    sample.zip(spark64).foreach { case (u, s) =>
      assert(s == duckPath(u) && !s.isInfinite,
        s"paths diverged below 2^53 at unscaled=$u")
    }
  }

  test("above 2^53: double rounding diverges, so the documented bound is tight") {
    val top = BigInt(1) << 53
    // Odd unscaled values just above 2^53 are not float64-exact — the
    // DuckDB path's first rounding moves them to an even neighbor before
    // the divide. Some survive to the same final double; the spec only
    // needs ONE divergence to prove hash-stability genuinely ends here.
    val sample = (1 to 4000).map(i => top + 2 * i - 1)
    val spark64 = sparkPath(sample)
    val diverged = sample.zip(spark64).filter { case (u, s) => s != duckPath(u) }
    assert(diverged.nonEmpty,
      "expected at least one double-rounding divergence above 2^53")
    info(s"${diverged.size}/${sample.size} odd values in (2^53, 2^53+8000] " +
      s"diverge; first at unscaled=${diverged.head._1}")
  }

  test("fixed-scale string fallback is digit-exact above 2^53") {
    import spark.implicits._
    val top = BigInt(1) << 53
    val sample = (1 to 100).map(i => top + 2 * i - 1)
    val rendered = sample.map(u => BigDecimal(u, scale).toString)
      .toDF("s")
      .select(col("s").cast(DecimalType(38, scale)).cast(StringType).as("out"))
      .as[String].collect().toSeq
    // CAST(decimal AS STRING) carries every digit — both engines print the
    // exact decimal, so a string-typed output column is hash-stable at any
    // magnitude. This is the documented fallback for >2^53 deployments.
    assert(rendered == sample.map(u => BigDecimal(u, scale).toString))
  }
}
