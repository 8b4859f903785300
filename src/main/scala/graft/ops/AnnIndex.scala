package graft.ops

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted, versioned ANN index artifacts — the trained IVF coarse
  * quantizer, PQ codebooks, and the encoded inverted file materialized
  * ON DISK under the dataset stamp, so a FRESH process (the routine
  * cluster restart at 100 TB) serves top-k queries without a single
  * Lloyd iteration. In-JVM memoization ([[Ivf.trainedCells]],
  * [[Pq.trainedEntries]]) remains the hot path inside one process; this
  * is the restart path, the same promotion the bucketed band store got
  * in [[Incremental.incrementalDedupBucketed]].
  *
  * Commit discipline (the [[graft.sources.ManifestTable]] /
  * [[graft.pipeline.BlockRuntime]] pattern): all three tables are
  * written into ONE staging directory, ATOMIC_MOVEd to `snap/`, and only
  * then does a one-line `meta.log` commit (temp file + ATOMIC_MOVE) make
  * the index visible — readers key on `meta.log` existence, so a crash
  * at any point leaves either no index (orphan swept on next build) or a
  * complete one, never a torn artifact. The index root embeds a digest
  * of (sfDir, dataset stamp): a regenerated dataset gets a DIFFERENT
  * root and fails safe to a rebuild instead of serving stale codebooks.
  *
  * Artifact layout and the 100 TB read shape:
  *   - `centroids/`  (cell_id, c_e)         — K rows, broadcast on read
  *   - `codebook/`   (sub_id, cell, c_se)   — NumSub·KSub rows, broadcast
  *   - `codes/`      (vec_id, sub_id, code) PARTITIONED BY cell_id — the
  *     inverted file with PQ payloads; a probe's nprobe-cell restriction
  *     is directory partition PRUNING on this table, so the serve scan
  *     reads ~nprobe/K of the code files, never a filter over all of
  *     them.
  * Derived columns (c_nrm, c_cc) are recomputed in-plan from the
  * persisted doubles — parquet round-trips IEEE doubles exactly, so the
  * served plan is value-identical to the in-memory one (AnnIndexSpec
  * pins bit-identical top-k).
  */
object AnnIndex {

  /** Index root for a dataset: /tmp/graft_layout/<tag>/annindex, tag =
    * sf basename + md5(sfDir#stamp) — same keying as the bucketed band
    * store, for the same reason (a path collision or in-place rewrite
    * must never serve another dataset's trained state).
    */
  private[graft] def indexRoot(sfDir: String): Path = {
    val stamp = graft.util.DatasetStamp.stamp(sfDir, "embeddings")
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$sfDir#$stamp".getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
    val tag = Paths.get(sfDir).getFileName.toString
      .replaceAll("[^a-zA-Z0-9]", "_") + "_" + digest
    Paths.get("/tmp/graft_layout", tag, "annindex")
  }

  private def metaPath(root: Path): Path = root.resolve("meta.log")

  /** True iff a complete committed index exists for this dataset. */
  def committed(sfDir: String): Boolean = Files.exists(metaPath(indexRoot(sfDir)))

  private val buildLock = new Object

  /** Train-if-absent: returns immediately when the committed artifact
    * exists (the restart path pays zero training); otherwise trains via
    * the memoized [[Ivf]]/[[Pq]] state and commits the artifact. Safe
    * against concurrent builders in one JVM (lock) and against crashed
    * prior attempts (an orphan `snap/` without `meta.log` is swept).
    */
  def build(t: Tables): Path = {
    val root = indexRoot(t.sfDir)
    if (Files.exists(metaPath(root))) return root
    buildLock.synchronized {
      if (Files.exists(metaPath(root))) return root
      Files.createDirectories(root)
      val snap = root.resolve("snap")
      // no meta.log ⇒ any existing snap is an uncommitted crash orphan
      if (Files.exists(snap)) graft.util.Fs.deleteRecursively(snap)
      val staging = Files.createTempDirectory(root, "stage_")
      try {
        import t.spark.implicits._
        Ivf.trainedCells(t).toSeq.toDF("cell_id", "c_e")
          .coalesce(1).write.parquet(staging.resolve("centroids").toString)
        Pq.trainedEntries(t).toSeq.toDF("sub_id", "cell", "c_se")
          .coalesce(1).write.parquet(staging.resolve("codebook").toString)
        // the inverted file: PQ codes annotated with the coarse cell,
        // laid out so cell restriction = partition pruning
        Pq.codes(t, Pq.codebook(t))
          .join(Ivf.assignments(t).select(col("vec_id"), col("cell_id")), Seq("vec_id"))
          .repartition(col("cell_id"))
          .write.partitionBy("cell_id")
          .parquet(staging.resolve("codes").toString)
        Files.move(staging, snap, StandardCopyOption.ATOMIC_MOVE)
      } catch {
        case e: Throwable => graft.util.Fs.deleteRecursively(staging); throw e
      }
      val tmp = Files.createTempFile(root, "meta", ".tmp")
      Files.write(tmp, "snap".getBytes("UTF-8"))
      Files.move(tmp, metaPath(root),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      root
    }
  }

  final case class IndexFrames(
      centroids: DataFrame, codebook: DataFrame, codes: DataFrame)

  /** Pure READ of a committed index — throws when absent. This method
    * (and [[serve]], which consumes only its frames) contains no
    * training path at all, which is the spec's proof that a fresh
    * session serving from disk cannot have run Lloyd.
    */
  def loadOnly(spark: SparkSession, sfDir: String): IndexFrames = {
    val root = indexRoot(sfDir)
    require(Files.exists(metaPath(root)),
      s"no committed ANN index at $root — run AnnIndex.build first")
    val snap = root.resolve("snap")
    IndexFrames(
      spark.read.parquet(snap.resolve("centroids").toString),
      spark.read.parquet(snap.resolve("codebook").toString),
      spark.read.parquet(snap.resolve("codes").toString))
  }

  /** IVF-ADC top-k served entirely from the persisted index — the same
    * plan as [[IvfPq.ivfpqCosineTopk]] with every piece of trained state
    * read from parquet: probes rank the broadcast persisted centroids,
    * the LUT builds against the broadcast persisted codebook, the ADC
    * scan hash-joins the cell-partitioned persisted codes (probed-cell
    * restriction prunes code partitions), and the exact re-rank touches
    * true vectors by id exactly as before.
    */
  def serve(
      t: Tables, idx: IndexFrames,
      probeLimit: Int = 50, k: Int = 5, nprobe: Int = 4): DataFrame = {
    graft.functions.VectorExpressions.register(t.spark)
    val quant = broadcast(idx.centroids.select(col("cell_id"), col("c_e"),
      sqrt(Vector.dot(col("c_e"), col("c_e"))).as("c_nrm")))
    val v = Ann.vectorsWithNorm(t)
    val probes = v.filter(col("vec_id") < probeLimit)
      .select(col("vec_id").as("a_id"), col("e").as("a_e"), col("nrm").as("a_nrm"))
    val wCells = Window.partitionBy("a_id").orderBy(desc("p_cos"), asc("cell_id"))
    val probedCells = probes
      .crossJoin(quant)
      .select(col("a_id"), col("cell_id"),
        (Vector.dot(col("a_e"), col("c_e")) / (col("a_nrm") * col("c_nrm"))).as("p_cos"))
      .select(col("a_id"), col("cell_id"), row_number().over(wCells).as("rn"))
      .filter(col("rn") <= nprobe)
      .select(col("a_id"), col("cell_id").as("p_cell"))
    val lutCells = Pq.lut(probes, idx.codebook).join(probedCells, Seq("a_id"))
    val scored = idx.codes
      .select(col("vec_id").as("b_id"), col("sub_id"), col("code"), col("cell_id"))
      .join(broadcast(lutCells),
        col("cell_id") === col("p_cell") &&
          col("sub_id") === col("l_sub") && col("code") === col("l_cell"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(sum(col("pdot")).as("adot"))
    Pq.adcRerank(v, probes, scored, k)
  }

  /** The registered query: build-if-absent, then serve from disk. After
    * the first process has committed the artifact, every later process
    * (and every later call) is the pure read path.
    */
  def ivfpqPersistedTopk(
      t: Tables, probeLimit: Int = 50, k: Int = 5, nprobe: Int = 4): DataFrame = {
    build(t)
    serve(t, loadOnly(t.spark, t.sfDir), probeLimit, k, nprobe)
  }
}
