package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A complete DataSource V2 connector: a deterministic generated table
  * (`id`, `val_cents`, `tag` over a half-open id range) that implements
  * the three pushdown surfaces a real remote-storage connector needs —
  *
  *   - `SupportsPushDownFilters`: range predicates on `id` (=, <, <=, >,
  *     >=, and the analyzer's IsNotNull residue) CLAMP the generated
  *     range before planning. Pushed filters disappear from the
  *     post-scan Filter; everything else (e.g. predicates on `tag`)
  *     is returned as residual and stays in the query plan.
  *   - partition planning derived from the PUSHED range: the clamped
  *     range is split into `slices` contiguous chunks and empty chunks
  *     are never planned — so predicate pushdown provably prunes work
  *     (observable as `df.rdd.getNumPartitions` shrinking, the same way
  *     a parquet reader drops row groups).
  *   - `SupportsPushDownRequiredColumns`: the reader materializes ONLY
  *     the pruned schema — a `select(count)` never computes `tag`
  *     strings at all.
  *
  * The row formula is pure 64-bit integer arithmetic (`val_cents =
  * (id·2654435761) mod 1000003`, `tag = 't' ++ id mod 7`), so a DuckDB
  * `range()` oracle reproduces every cell bit-for-bit — the connector's
  * pushdown paths are value-checked end to end, not just plan-shaped.
  *
  * Usage: `spark.read.format("graft.sources.RangeGen")
  *   .option("start", 0).option("end", 200000).option("slices", 16).load()`
  *
  * At 100 TB the analogous connector fronts a sharded store; everything
  * here maps one-to-one (clamp → shard pruning, slices → splits,
  * residual filters → post-scan predicates).
  */
class RangeGen extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RangeGen.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RangeGenTable(
      properties.getOrDefault("start", "0").toLong,
      properties.getOrDefault("end", "1000").toLong,
      properties.getOrDefault("slices", "8").toInt,
      properties.getOrDefault("batchRows", "10000").toLong)
  override def supportsExternalMetadata(): Boolean = false
}

object RangeGen {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val_cents", LongType, nullable = false),
    StructField("tag", StringType, nullable = false)))

  def valCents(id: Long): Long = (id * 2654435761L) % 1000003L
  def tag(id: Long): String = "t" + (id % 7L)
}

private[sources] class RangeGenTable(
    start: Long, end: Long, slices: Int, batchRows: Long)
    extends Table with SupportsRead {
  override def name(): String = s"rangegen[$start,$end)"
  override def schema(): StructType = RangeGen.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeGenScanBuilder(start, end, slices, batchRows)
}

private[sources] class RangeGenScanBuilder(
    start: Long, end: Long, slices: Int, batchRows: Long)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit {

  /** LIMIT pushdown: `LIMIT n` clamps GENERATION to the first n ids of
    * the (post-filter) range — a generator never has to produce rows a
    * limit will drop. PARTIAL pushdown (Spark keeps the Limit and
    * re-truncates), so the clamp can only over-produce by nothing and
    * under-produce never: exactly min(n, range) ids exist and all
    * qualify (the pushed id-filters already tightened [lo, hi); residual
    * non-id filters keep Spark from offering the limit at all).
    */
  override def pushLimit(limit: Int): Boolean = {
    if (hi - lo > limit.toLong) hi = lo + limit.toLong
    true
  }
  override def isPartiallyPushed: Boolean = true

  private var lo = start
  private var hi = end // half-open
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = RangeGen.schema

  // saturating bounds tightening; an unsatisfiable clamp (lo >= hi)
  // simply plans zero partitions
  private def clamp(f: Filter): Boolean = f match {
    case EqualTo("id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v + 1); true
    case GreaterThan("id", v: Long) => lo = math.max(lo, v + 1); true
    case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); true
    case LessThan("id", v: Long) => hi = math.min(hi, v); true
    case LessThanOrEqual("id", v: Long) => hi = math.min(hi, v + 1); true
    case IsNotNull("id") => true // generated ids are never null
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition(clamp)
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new RangeGenScan(start, end, lo, math.max(lo, hi), slices, batchRows, required)
}

private[sources] class RangeGenScan(
    declStart: Long, declEnd: Long,
    lo: Long, hi: Long, slices: Int, batchRows: Long, required: StructType)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required

  /** EXACT statistics from the pushed range: the generator produces one
    * row per id in [lo, hi), so the row count is arithmetic and the byte
    * size is rows × the pruned schema's per-row footprint (8 B per long,
    * ~10 B per tag string). Reported POST-pushdown — a clamped scan
    * reports the clamped size, so a `WHERE id BETWEEN …` dim side
    * becomes broadcast-eligible exactly when the surviving range is
    * small, with no hint.
    */
  override def estimateStatistics(): Statistics = {
    val rows = math.max(0L, hi - lo)
    val perRow = required.fields.map(_.dataType match {
      case LongType => 8L
      case _ => 10L // tag: "t" + digit, UTF8String overhead
    }).sum
    new Statistics {
      override def sizeInBytes(): util.OptionalLong =
        util.OptionalLong.of(rows * math.max(1L, perRow))
      override def numRows(): util.OptionalLong = util.OptionalLong.of(rows)
    }
  }
  override def description(): String =
    s"graft-rangegen range=[$lo,$hi) cols=${required.fieldNames.mkString(",")}"
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new RangeGenMicroBatchStream(lo, hi, slices, batchRows, required)

  /** Slice boundaries are fixed by the DECLARED range (the moral
    * equivalent of parquet row-group edges); the pushed range then
    * INTERSECTS each slice and empty intersections are never planned.
    * Predicate pushdown therefore prunes whole partitions — observable
    * as `df.rdd.getNumPartitions` shrinking — exactly like row-group
    * pruning, rather than re-splitting the surviving rows.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val n = declEnd - declStart
    if (n <= 0 || hi <= lo) return Array.empty
    val step = math.max(1L, (n + slices - 1) / slices)
    (declStart until declEnd by step)
      .map(s => (math.max(s, lo), math.min(math.min(s + step, declEnd), hi)))
      .collect { case (a, b) if a < b => RangeGenPartition(a, b): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RangeGenReaderFactory(required.fieldNames)
}

private[sources] case class RangeGenPartition(lo: Long, hi: Long)
    extends InputPartition

private[sources] class RangeGenReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[RangeGenPartition]
    new PartitionReader[InternalRow] {
      private var id = part.lo - 1
      override def next(): Boolean = { id += 1; id < part.hi }
      override def get(): InternalRow =
        // only the pruned columns are ever computed
        InternalRow.fromSeq(cols.toSeq.map {
          case "id" => id
          case "val_cents" => RangeGen.valCents(id)
          case "tag" => UTF8String.fromString(RangeGen.tag(id))
        })
      override def close(): Unit = ()
    }
  }
}

/** The same generated range as a MICRO-BATCH STREAM — the connector's
  * streaming surface, with the three production behaviors a real source
  * needs stated explicitly:
  *
  *   - OFFSETS are positions in the id range (`RangeGenOffset`): the
  *     engine persists them in the checkpoint's offset log, and
  *     `planInputPartitions(start, end)` regenerates exactly [start,
  *     end) — replays after a restart produce the identical batch, the
  *     exactly-once contract.
  *   - ADMISSION CONTROL (`SupportsAdmissionControl`): the default read
  *     limit is `batchRows`, so history drains as bounded micro-batches
  *     instead of one giant catch-up batch.
  *   - `SupportsTriggerAvailableNow`: Trigger.AvailableNow processes
  *     everything up to the range end in rate-limited batches and then
  *     TERMINATES — the bounded-drive contract StreamDrive relies on.
  *
  * Filter pushdown composes: the stream is built from the pushed
  * ScanBuilder state, so an id-range predicate clamps what the stream
  * ever generates, batch boundaries included.
  */
private[sources] case class RangeGenOffset(pos: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = pos.toString
}

private[sources] class RangeGenMicroBatchStream(
    lo: Long, hi: Long, slices: Int, batchRows: Long, required: StructType)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset => SOffset, ReadLimit, ReadMaxRows}

  override def initialOffset(): SOffset = RangeGenOffset(lo)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(batchRows)

  override def prepareForTriggerAvailableNow(): Unit = () // hi is static

  override def latestOffset(): SOffset =
    throw new UnsupportedOperationException(
      "admission-controlled source: latestOffset(start, limit) is the entry point")

  override def latestOffset(start: SOffset, limit: ReadLimit): SOffset = {
    val from = start.asInstanceOf[RangeGenOffset].pos
    limit match {
      case r: ReadMaxRows => RangeGenOffset(math.min(hi, from + r.maxRows()))
      case _ => RangeGenOffset(hi)
    }
  }

  override def reportLatestOffset(): SOffset = RangeGenOffset(hi)

  override def planInputPartitions(start: SOffset, end: SOffset): Array[InputPartition] = {
    val a = start.asInstanceOf[RangeGenOffset].pos
    val b = end.asInstanceOf[RangeGenOffset].pos
    if (b <= a) return Array.empty
    val step = math.max(1L, (b - a + slices - 1) / slices)
    (a until b by step)
      .map(s => RangeGenPartition(s, math.min(s + step, b)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RangeGenReaderFactory(required.fieldNames)

  override def deserializeOffset(json: String): SOffset =
    RangeGenOffset(json.toLong)

  override def commit(end: SOffset): Unit = ()
  override def stop(): Unit = ()
}
