package graft.ops

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Relational.{dbl, dec}

/** Reshaping and statistical operators (round-4 registry additions):
  * pivot/unpivot, deterministic hash sampling, ordered string aggregation,
  * bivariate statistics. All DuckDB-oracled.
  */
object Reshape {

  /** Wide pivot: per return flag, total quantity split by line status —
    * `pivot` with EXPLICIT values, which keeps the plan a single
    * partial+final aggregate (value discovery would add a distinct scan
    * first, and unknown pivot columns couldn't be pruned). Decimal sums,
    * DOUBLE in the final projection (§2.4 money rule).
    */
  def pivotWide(t: Tables): DataFrame =
    t.lineitem
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(dbl(sum(dec(col("l_quantity"))).cast(DecimalType(38, 2))))
      .orderBy("l_returnflag")

  /** Long unpivot (melt): one (metric, val) row per measure column — the
    * inverse reshape, map-side only (no shuffle: unpivot is a local
    * row-expansion, Spark plans it as Expand).
    */
  def unpivotLong(t: Tables): DataFrame =
    t.part
      .select(col("p_partkey"),
        dbl(col("p_size")).as("size"),
        dbl(col("p_retailprice")).as("retail"))
      .unpivot(Array(col("p_partkey")), Array(col("size"), col("retail")), "metric", "val")
      .orderBy("p_partkey", "metric")

  /** Deterministic 1/16 sample: keep rows whose md5(key) starts with '0'.
    * Unlike TABLESAMPLE (seeded RNG, partition-dependent), a content-hash
    * predicate is reproducible across engines, runs, and partitionings —
    * the property a training-data pipeline needs for holdout splits that
    * stay stable as the corpus is re-sharded. Map-side filter; at scale
    * this composes with partition pruning (the filter itself cannot push
    * into parquet, but needs no shuffle either).
    */
  def sampleHash(t: Tables): DataFrame =
    t.documents
      .filter(substring(md5(col("doc_id").cast(StringType).cast(BinaryType)), 1, 1) === "0")
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")

  /** Ordered string aggregation (LISTAGG/STRING_AGG): supplier roster per
    * nation, as the composition collect_list → array_sort → array_join —
    * order-canonicalized because collect_list order is
    * partition-dependent (§2.4 determinism rule for collected lists).
    * Spark 4.0 gained a NATIVE ordered `listagg … WITHIN GROUP`;
    * [[aggListagg]] drives that surface through the parser — this
    * composition stays as the version-portable twin (and the two share
    * result semantics, pinned by their oracles).
    */
  def aggString(t: Tables): DataFrame =
    t.supplier
      .groupBy("s_nationkey")
      .agg(
        count(lit(1)).as("n"),
        array_join(array_sort(collect_list(col("s_name"))), ",").as("names"))
      .orderBy("s_nationkey")

  /** The SQL-standard ordered LISTAGG through the PARSER (Spark 4.0+
    * `listagg … WITHIN GROUP (ORDER BY …)`; DuckDB `string_agg … ORDER
    * BY`): the same supplier roster as [[aggString]] plus a
    * separator-variant column, so the native aggregate and the
    * composition are both pinned against the same oracle family. The
    * WITHIN GROUP order makes the result rowwise-deterministic without
    * a canonicalizing sort. Per-group output is group-bounded (the
    * roster string), same memory caveat as any collected aggregate —
    * fine for dimension-grain groups, not for fact-grain ones.
    */
  def aggListagg(t: Tables): DataFrame = {
    t.registerViews()
    t.spark.sql(
      """SELECT s_nationkey, count(*) AS n,
        |       listagg(s_name, ',') WITHIN GROUP (ORDER BY s_name) AS names,
        |       listagg(DISTINCT CAST(s_suppkey % 3 AS STRING), '|')
        |         WITHIN GROUP (ORDER BY CAST(s_suppkey % 3 AS STRING)) AS key_mods
        |FROM supplier
        |GROUP BY s_nationkey
        |ORDER BY s_nationkey""".stripMargin)
  }

  /** Bivariate statistics per group: Pearson correlation, sample/population
    * covariance, least-squares slope+intercept of price on quantity. All
    * six are one-pass co-moment aggregates (partial+final, shuffle volume
    * = #groups); roundings are sized to each statistic's magnitude so the
    * ~1e-12 relative float-summation slack between engines stays far from
    * the rounding boundary.
    */
  def aggStats2(t: Tables): DataFrame =
    t.lineitem
      .groupBy("l_returnflag")
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cov_s"),
        round(covar_pop(col("l_quantity"), col("l_extendedprice")), 2).as("cov_p"),
        round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
        round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 2).as("icept"))
      .orderBy("l_returnflag")

  /** Value histogram by fixed-width arithmetic binning (floor division —
    * engine-portable, no width_bucket dependency). Partial+final count
    * agg; shuffle volume = #bins.
    */
  def aggHistogram(t: Tables): DataFrame =
    t.lineitem
      .select(floor(col("l_quantity") / 5.0).cast(LongType).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")

  /** Time-series resample with gap fill: per-user hourly grid from first
    * to last event (sequence + explode — the grid is generated, never
    * shuffled), left-joined against hourly counts, missing hours as 0.
    * Probe-bounded (user_id < 20) for output size; the unbounded form is
    * identical per user and shards on user_id.
    */
  def tsResample(t: Tables): DataFrame = {
    val ev = t.events
      .filter(col("user_id") < 20)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("h"))
    val grid = ev.groupBy("user_id").agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("user_id"), explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    val counts = ev.groupBy("user_id", "h").agg(count(lit(1)).as("cnt"))
    grid.join(counts, Seq("user_id", "h"), "left")
      .select(col("user_id"), col("h"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      .orderBy("user_id", "h")
  }

  /** Hourly resample with LINEAR interpolation of missing buckets — the
    * time-series gap-repair twin of [[tsResample]] (which only gap-fills
    * counts with zero): per-user hourly cent sums, and an hour with no
    * events takes the line between its nearest observed neighbors;
    * leading/trailing gaps carry the nearest observation (the pandas
    * `interpolate(limit_direction='both')` convention).
    *
    * Scale shape: one (user, hour) aggregate, a per-user hour grid
    * (sequence explode, map-side), and two window passes over the grid —
    * all partitioned by user_id, never a global window. Determinism: the
    * hour grid is unique per user (total window order), neighbor values
    * are exact integer cents, and the interpolation ratio is one fixed
    * IEEE expression mirrored by the oracle; round(…, 6) renders it.
    */
  def tsInterpolate(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = t.events
      .filter(col("user_id") < 20 && col("value").isNotNull)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("h"),
        round(col("value") * 100).cast("long").as("vc"))
    val hourly = ev.groupBy("user_id", "h").agg(sum(col("vc")).as("sc"))
    val grid = hourly.groupBy("user_id").agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("user_id"), explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    val joined = grid.join(hourly, Seq("user_id", "h"), "left")
      .select(col("user_id"), col("h"), col("h").cast("long").as("hs"), col("sc"))
    val wPrev = Window.partitionBy("user_id").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy("user_id").orderBy("h")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val markers = joined
      .withColumn("pv", last(col("sc"), ignoreNulls = true).over(wPrev))
      .withColumn("ph", last(when(col("sc").isNotNull, col("hs")), ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("sc"), ignoreNulls = true).over(wNext))
      .withColumn("nh", first(when(col("sc").isNotNull, col("hs")), ignoreNulls = true).over(wNext))
    markers.select(
      col("user_id"), col("h"),
      round(
        when(col("sc").isNotNull, col("sc").cast(DoubleType))
          .when(col("pv").isNull, col("nv").cast(DoubleType))
          .when(col("nv").isNull, col("pv").cast(DoubleType))
          .otherwise(col("pv").cast(DoubleType) +
            (col("nv") - col("pv")).cast(DoubleType) *
              ((col("hs") - col("ph")).cast(DoubleType) /
                (col("nh") - col("ph")).cast(DoubleType))) / 100.0,
        6).as("v_interp"),
      col("sc").isNotNull.as("observed"))
      .orderBy("user_id", "h")
  }
}
