package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CHANGE DATA FEED over the manifest store — "what changed between
  * version a and version b", as rows: the table's columns plus
  * `_change_type` ('insert' | 'delete') and `_commit_version`. The
  * Delta-CDF shape, derived entirely from the immutable manifests (no
  * change files are ever written — the commit log IS the change log):
  *
  *   - data files ADDED in version v → their rows, read raw through the
  *     file-restricted scan, as 'insert' @ v. Cost: O(changed files),
  *     never O(table) — the property that makes CDF usable at 100 TB.
  *   - equality-delete entries ADDED in v (key set K on column c) → the
  *     rows K actually erased = snapshot(v−1) filtered to K, as
  *     'delete' @ v. K is request-sized (the delete contract), the
  *     filter is key-equality, so zone maps / partition fields prune the
  *     snapshot scan to the files that can hold K. Re-deleting an
  *     already-dead key erases nothing and correctly emits nothing
  *     (snapshot(v−1) no longer holds it).
  *   - a [[ManifestTable.mergeKeys]] upsert therefore reads as
  *     delete@v + insert@v per updated key — the merge-on-read CDC pair
  *     (downstreams that want update-images join the two on the key).
  *
  * Versions that REMOVE data files (truncating overwrite,
  * [[ManifestTable.compactDeletes]]) are not expressible as a change
  * stream and FAIL loudly — same contract as the streaming source:
  * run maintenance on a quiesced table and restart feeds from the
  * compacted state. Changes remain readable as long as the version
  * range's manifests survive [[ManifestTable.vacuum]] retention.
  */
object ManifestCdf {

  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"

  private val Fmt = "graft.sources.ManifestTable"

  def changes(
      spark: SparkSession, path: String, fromVersion: Int, toVersion: Int): DataFrame = {
    require(fromVersion >= 0 && toVersion > fromVersion,
      s"changes: need 0 <= from < to, got ($fromVersion, $toVersion]")

    def linesAt(v: Int): Seq[String] =
      if (v == 0) Seq.empty
      else ManifestTable.manifestAt(path, Some(v)).map(_._2).getOrElse(Seq.empty)

    def dataNames(ls: Seq[String]): Set[String] =
      ManifestTable.dataEntries(ls).iterator.map { l =>
        val (name, stats) = ManifestTable.parseEntry(l)
        (name, stats)
      }.collect {
        // 0-row markers carry no change
        case (name, stats)
            if !stats.get(ManifestTable.RowStatKey).exists(_._1 == 0L) => name
      }.toSet

    val perVersion: Seq[DataFrame] = (fromVersion + 1 to toVersion).flatMap { v =>
      val prevLines = linesAt(v - 1)
      val curLines = linesAt(v)
      val prevData = dataNames(prevLines)
      val curData = dataNames(curLines)
      val removed = prevData -- curData
      if (removed.nonEmpty) throw new IllegalStateException(
        s"graft manifest CDF at $path: version $v removed data files " +
          s"(${removed.toSeq.sorted.take(5).mkString(", ")}) — truncating " +
          "rewrites/compaction are not expressible as a change feed; " +
          "restart feeds from the compacted state")

      val inserted = curData -- prevData
      val inserts: Option[DataFrame] =
        if (inserted.isEmpty) None
        else Some(spark.read.format(Fmt)
          .option("path", path).option("version", v)
          .option("files", inserted.toSeq.sorted.mkString(","))
          .load()
          .withColumn(ChangeTypeCol, lit("insert"))
          .withColumn(CommitVersionCol, lit(v)))

      // delete entries added in v, keyed (column → union of new keys);
      // note a version's OWN inserts are never subject to its own new
      // deletes (deleteKeys adds no files; mergeKeys scopes prior-only)
      import scala.jdk.CollectionConverters._
      val prevDel = prevLines.filter(ManifestTable.isDeleteEntry).toSet
      val newDelCols: Map[String, Set[Long]] = curLines
        .filter(l => ManifestTable.isDeleteEntry(l) && !prevDel.contains(l))
        .map(ManifestTable.parseDeleteEntry)
        .groupBy(_._2)
        .map { case (colName, entries) =>
          colName -> entries.iterator.flatMap { case (f, _) =>
            java.nio.file.Files.readAllLines(
              ManifestTable.dir(path).resolve(f)).asScala
              .iterator.filter(_.nonEmpty).map(_.toLong)
          }.toSet
        }
      val deletes: Seq[DataFrame] = newDelCols.toSeq.sortBy(_._1).map {
        case (colName, keys) =>
          spark.read.format(Fmt)
            .option("path", path).option("version", v - 1).load()
            .filter(col(colName).isin(keys.toSeq.sorted: _*))
            .withColumn(ChangeTypeCol, lit("delete"))
            .withColumn(CommitVersionCol, lit(v))
      }
      inserts.toSeq ++ deletes
    }

    perVersion.reduceOption(_ unionByName _).getOrElse {
      // no changes in range: an empty frame in the CDF schema
      val cur = spark.read.format(Fmt).option("path", path).load()
      cur.withColumn(ChangeTypeCol, lit("insert"))
        .withColumn(CommitVersionCol, lit(0))
        .limit(0)
    }
  }
}
