package graft.ops

import graft.Tables
import graft.util.HexFold
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spatial radius self-join via grid blocking — the distributed spatial
  * primitive (geofence matching, store-catchment assignment, point
  * clustering) restated as a cell-keyed equi-join.
  *
  * The customer table carries no coordinates, so each customer gets a
  * DETERMINISTIC synthetic position: two independent md5 folds
  * ([[graft.util.HexFold]]) mapped into a planar micro-degree frame
  * (lat ∈ [−90°, 90°), lon ∈ [−180°, 180°), 1 µdeg = 1e−6 °). The frame
  * is treated as a plane — no meridian wrap, no great-circle metric —
  * because the POINT of the operator is the join geometry, and a planar
  * integer metric makes every comparison exact: dist² and the radius
  * bound are BIGINT arithmetic, so the engine and the DuckDB oracle make
  * bit-identical keep/drop decisions with zero trigonometry drift.
  *
  * Scale shape: each point lands in one ⌊coord / cell⌋ grid cell; the
  * probe side replicates into its 3×3 cell stencil (constant fan-out),
  * and the join is a plain equi-join on the cell key — candidate-complete
  * because the cell edge ≥ the radius in both axes, so any pair within R
  * is in adjacent cells. Cost is Σ_cell |probe∩stencil|·|cell|, never
  * points²; the shuffle is keyed by cell, which is exactly how a cluster
  * partitions a planet-scale point set (a growing point set covers more
  * AREA at roughly constant density, so per-cell occupancy — and with it
  * per-point cost — stays flat; ScaleRehearsalSpec pins that growth
  * curve on a density-constant synthetic plane). Skewed megacity cells
  * would take the [[Skew]] salting treatment — same key, same recipe.
  */
object Geo {

  private val CellMicro = 5000000L // 5° cells = the radius ⇒ 3×3 complete
  private val RadiusMicro = 5000000L // pair-keep radius, micro-degrees

  /** All customer pairs (a < b) within 5 planar degrees of each other,
    * with the exact squared distance and its degree rendering.
    */
  def geoGridJoin(t: Tables): DataFrame = {
    def fold(tag: String): org.apache.spark.sql.Column =
      HexFold.u32(md5(concat(lit(tag), col("c_custkey").cast("string"))
        .cast("binary")))
    val pts = t.customer.select(
      col("c_custkey").as("id"),
      (fold("lat:") % 180000000L - 90000000L).as("lat"),
      (fold("lon:") % 360000000L - 180000000L).as("lon"))
    pairsWithin(pts, CellMicro, RadiusMicro)
      .select(col("id_a").as("cust_a"), col("id_b").as("cust_b"),
        col("d2"), col("dist_deg"))
      .orderBy("cust_a", "cust_b")
  }

  /** Grid-blocked radius self-join over any (id, lat, lon) micro-degree
    * point table: all pairs (id_a < id_b) with planar dist² ≤ radius².
    * Candidate-complete for any `cellMicro >= radiusMicro` (3×3 stencil);
    * every comparison is exact BIGINT arithmetic. Test seam for
    * ScaleRehearsalSpec's density-constant growth rehearsal.
    */
  private[graft] def pairsWithin(
      points: DataFrame, cellMicro: Long, radiusMicro: Long,
      broadcastCandidates: Boolean = true): DataFrame = {
    require(cellMicro >= radiusMicro, "stencil completeness needs cell ≥ radius")
    val pts = points
      // shifted to non-negative before the integer divide: truncating and
      // flooring division agree there, so Spark and DuckDB bucket alike
      .withColumn("clat", expr(s"(lat + 90000000) div $cellMicro"))
      .withColumn("clon", expr(s"(lon + 180000000) div $cellMicro"))
    val cands = pts.select(
      col("id").as("id_b"), col("lat").as("lat_b"),
      col("lon").as("lon_b"), col("clat"), col("clon"))
    val probes = pts
      // the point table arrives as ONE file/partition at bench scale, and
      // everything downstream of the stencil explode is the hot path —
      // spread points across workers first (at planet scale this shuffle
      // IS the cell-keyed distribution the join wants anyway)
      .repartition(col("clat"), col("clon"))
      .select(col("id").as("id_a"), col("lat").as("lat_a"),
        col("lon").as("lon_a"), col("clat"), col("clon"))
      .withColumn("dlat", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dlon", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("id_a"), col("lat_a"), col("lon_a"),
        (col("clat") + col("dlat")).as("clat"),
        (col("clon") + col("dlon")).as("clon"))
    // Build side pinned to the UN-replicated candidate table: left to its
    // own size guesses Catalyst broadcast the 9×-exploded probe side
    // (post-Generate row estimates are poor), and the candidate broadcast
    // is ~30× smaller. broadcast() overrides the size threshold, so the
    // hint is only safe while the point table fits an executor — a
    // planet-scale caller passes broadcastCandidates=false and gets a
    // shuffle-hash join on the same cell key instead (the join geometry —
    // cell-keyed equi-join — is unchanged either way).
    val build =
      if (broadcastCandidates) broadcast(cands)
      else cands.hint("shuffle_hash")
    probes.join(build, Seq("clat", "clon"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("d2",
        (col("lat_a") - col("lat_b")) * (col("lat_a") - col("lat_b")) +
          (col("lon_a") - col("lon_b")) * (col("lon_a") - col("lon_b")))
      .filter(col("d2") <= radiusMicro * radiusMicro)
      .select(col("id_a"), col("id_b"), col("d2"),
        round(sqrt(col("d2").cast(DoubleType)) / 1e6, 6).as("dist_deg"))
  }
}
