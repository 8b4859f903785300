package graft.ops

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mergeable QUANTILE pre-aggregation via the moments sketch (Gan et
  * al., VLDB'18 shape, first-order Cornish–Fisher estimator) — the
  * third member of the sketch-persistence family beside the HLL
  * distinct rollup (`agg_hll_mergeable`) and the exact bitmap rollup
  * (`agg_bitmap_rollup`): per-day partials are anchored power sums
  * (n, Σx', Σx'², Σx'³ with x' = cents − [[Anchor]]), which merge
  * across calendar grains BY ADDITION — re-aggregating a quantile over
  * a year never rescans events, it adds 365 rows of four numbers.
  *
  * Unlike `agg_approx_quantile` (Spark's randomized KLL — rows-only by
  * necessity), EVERYTHING here is deterministic and cross-engine
  * exact: the power sums are exact integers (DECIMAL(38,0) / HUGEINT —
  * |x'| ≤ ~3·10⁴ so Σ|x'|³ stays ≤ ~10²³ at any realistic row count,
  * far inside 38 digits), and the estimator is one closed-form IEEE
  * expression over them, written as the IDENTICAL tree the DuckDB
  * oracle states:
  *
  *   μ' = S₁/n,  m₂ = S₂/n − μ'²,  m₃ = S₃/n − 3μ'S₂/n + 2μ'³
  *   q_p ≈ (Anchor + μ') + √m₂ · (z_p + (z_p² − 1)/6 · m₃/m₂^{3/2})
  *
  * Estimator error is the sketch's documented trade (MomentsSketchSpec
  * pins it against exact percentiles: within 0.5σ on the driver
  * corpus); the MERGE is exact, which is the property that matters at
  * 100 TB — the per-grain rollup is a four-column sum over partials at
  * DAY grain, never a rescan, and the partial store is bytes per day.
  */
object MomentsSketch {

  /** Fixed, data-independent anchor (cents) keeping |x'| small so the
    * cubed sums stay well inside exact decimal range. Any constant
    * works; mid-range of the fixture's value domain keeps the powers
    * tightest.
    */
  val Anchor = 25000L

  private[graft] val Z90 = 1.2815515655446004 // Φ⁻¹(0.9)

  /** Cornish–Fisher coefficients PRECOMPUTED in Scala and interpolated
    * as explicit DOUBLE casts: written inline as `(z*z-1.0)/6.0` the
    * literals parse as DECIMAL in both engines and the two decimal
    * division rules round differently (caught by the oracle gate as a
    * 3rd-decimal q50 divergence).
    */
  private[graft] val C50 = (0.0 * 0.0 - 1.0) / 6.0
  private[graft] val C90 = (Z90 * Z90 - 1.0) / 6.0

  def aggQuantileMoments(t: Tables): DataFrame = {
    val dec38 = DecimalType(38, 0)
    val dec12 = DecimalType(12, 0)
    val daily = t.events
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("ts").cast(DateType).as("day"),
        // widen BEFORE cubing: an anchored value ≥ 2^21 cents would wrap
        // a 64-bit x³ silently (while the oracle's BIGINT multiply
        // throws) — the decimal cube is exact for any |x'| < 10¹²
        (round(col("value") * 100).cast(LongType) - Anchor)
          .cast(dec12).as("x"))
      .groupBy("day")
      .agg(
        count(lit(1)).cast(LongType).as("n"),
        sum(col("x")).cast(dec38).as("s1"),
        sum(col("x") * col("x")).cast(dec38).as("s2"),
        sum(col("x") * col("x") * col("x")).cast(dec38).as("s3"))
    val weekly = daily
      .groupBy(date_trunc("week", col("day")).cast(DateType).as("period_date"))
      .agg(sum(col("n")).cast(LongType).as("n"),
        sum(col("s1")).cast(dec38).as("s1"),
        sum(col("s2")).cast(dec38).as("s2"),
        sum(col("s3")).cast(dec38).as("s3"))
      .select(lit("week").as("grain"),
        col("period_date").cast(StringType).as("period"),
        col("n"), col("s1"), col("s2"), col("s3"))
    val allTime = daily
      .agg(sum(col("n")).cast(LongType).as("n"),
        sum(col("s1")).cast(dec38).as("s1"),
        sum(col("s2")).cast(dec38).as("s2"),
        sum(col("s3")).cast(dec38).as("s3"))
      .select(lit("all").as("grain"), lit("all").as("period"),
        col("n"), col("s1"), col("s2"), col("s3"))
    val dayRows = daily.select(lit("day").as("grain"),
      col("day").cast(StringType).as("period"),
      col("n"), col("s1"), col("s2"), col("s3"))
    dayRows.unionByName(weekly).unionByName(allTime)
      .selectExpr("grain", "period", "n",
        "CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu",
        "CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2",
        "CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3")
      .selectExpr("grain", "period", "n", "mu", "r3",
        // m2 clamped at 0: a constant-valued grain makes r2 − mu² a tiny
        // negative under rounding, where Spark's SQRT yields NaN but
        // DuckDB's THROWS — the clamp (and the zero-variance skew guard
        // below) keeps both trees total and identical
        "GREATEST(r2 - mu * mu, 0.0) AS m2",
        "r3 - 3 * mu * r2 + 2 * mu * mu * mu AS m3")
      .selectExpr("grain", "period", "n", "mu", "m2",
        "CASE WHEN m2 <= 0.0 THEN 0.0 ELSE m3 / (SQRT(m2) * SQRT(m2) * SQRT(m2)) END AS sk")
      .selectExpr("grain", "period", "n",
        s"ROUND($Anchor + mu, 6) AS mean_cents",
        "ROUND(SQRT(m2), 6) AS std_cents",
        "ROUND(sk, 6) AS skew",
        s"ROUND($Anchor + mu + SQRT(m2) * (CAST($C50 AS DOUBLE) * sk), 6) AS q50_est",
        s"ROUND($Anchor + mu + SQRT(m2) * (CAST($Z90 AS DOUBLE) + CAST($C90 AS DOUBLE) * sk), 6) AS q90_est")
      .orderBy("grain", "period")
  }
}
