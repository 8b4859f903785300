package graft.ops

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-group linear trend fitting + forecasting — the capacity-planning
  * primitive ("events grow 3%/day; where are we next week?"): ordinary
  * least squares over each event type's daily counts, then a 7-day
  * extrapolation.
  *
  * OLS here is a textbook case of aggregate-then-solve at scale: the
  * fit needs only the five sufficient statistics (n, Σx, Σy, Σxy, Σx²),
  * so the 100 TB history collapses through ONE partial+final aggregate
  * per group and the solve is a per-group projection — no iteration, no
  * driver round-trips, no matrix library. Every sufficient statistic is
  * an exact BIGINT (x = day index ≤ 29, y = daily count), so the slope
  * is one IEEE division of exact integers and the intercept/forecast
  * reuse it in a FIXED expression-tree order — the DuckDB oracle states
  * the identical tree, making the doubles bit-equal across engines.
  *
  * Days with zero observed events contribute no (x, y) point (observed
  * days only — the convention both the plan and the oracle state).
  */
object Forecast {

  private val Horizon = 7 // forecast days beyond the observed window

  /** Per event type: OLS daily-count trend over days-since-2024-01-01,
    * forecasts for the 7 days after the last observed day.
    */
  def tsForecastLinear(t: Tables): DataFrame = {
    val daily = t.events
      .filter(col("event_type").isNotNull)
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast(DateType)).as("x"))
      .agg(count(lit(1)).cast(LongType).as("y"))
    val stats = daily.groupBy("event_type").agg(
      count(lit(1)).cast(LongType).as("n"),
      sum(col("x").cast(LongType)).as("sx"),
      sum(col("y")).as("sy"),
      sum(col("x").cast(LongType) * col("y")).as("sxy"),
      sum(col("x").cast(LongType) * col("x").cast(LongType)).as("sxx"),
      max(col("x")).as("last_x"))
    // fixed expression-tree order, mirrored verbatim in the oracle SQL
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")).cast(DoubleType) /
      (col("n") * col("sxx") - col("sx") * col("sx")).cast(DoubleType)
    val withFit = stats
      .withColumn("slope", slope)
      .withColumn("intercept",
        (col("sy").cast(DoubleType) - col("slope") * col("sx").cast(DoubleType)) /
          col("n").cast(DoubleType))
    withFit
      .select(col("event_type"), col("n"), col("slope"), col("intercept"),
        explode(expr(s"sequence(last_x + 1, last_x + $Horizon)")).as("x"))
      .select(
        col("event_type"), col("x").cast(LongType).as("x"),
        round(col("slope"), 6).as("slope"),
        round(col("intercept"), 6).as("intercept"),
        round(col("intercept") + col("slope") * col("x").cast(DoubleType), 6)
          .as("yhat"))
      .orderBy("event_type", "x")
  }
}
