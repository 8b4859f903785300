package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing (north star): media is
  * carried as an opaque `binary` column plus typed metadata, and per-item
  * compute (decode, feature extraction, frame sampling) runs as typed
  * `mapPartitions` over the Dataset — the Scala analog of `mapInPandas`
  * batch UDFs: one JVM-side iterator per partition, no per-row driver
  * involvement, scales with partition count.
  *
  * STUB NOTICE: real codec work (JPEG/PNG/audio decode) needs native
  * libraries that are not in this environment. [[Multimodal.decodeStub]]
  * is a clearly-marked deterministic fake standing in for the decoder;
  * everything around it — schema, batching, partition parallelism,
  * metadata handling — is real and tested (MultimodalSpec).
  */
object Multimodal {

  case class MediaMeta(mime: String, width: Int, height: Int, duration_ms: Long)
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      byte_entropy: Double,
      lead_histogram: Array[Long],
      fingerprint: String)
  case class Frame(media_id: Long, frame_idx: Int, offset: Long, frame_bytes: Array[Byte])

  /** STUB decoder: stands in for "decode image / resample audio". Real
    * implementation would dispatch on meta.mime to a codec; this
    * deterministic fake returns the raw bytes so the pipeline around it is
    * fully exercisable.
    */
  def decodeStub(bytes: Array[Byte], meta: MediaMeta): Array[Byte] = bytes

  /** Deterministic synthetic media corpus derived from the documents table
    * (text bytes as payload) — gives the plumbing a real distributed input
    * without binary fixtures.
    */
  def syntheticCorpus(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)]
      .map { case (id, text, lang) =>
        val bytes = text.getBytes("UTF-8")
        val kind = id % 3 match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaRow(id, kind,
          bytes,
          MediaMeta(s"x-graft/$kind-$lang", bytes.length min 1024, 256, bytes.length * 7L))
      }
  }

  /** Batched feature extraction: byte count, empirical byte entropy, a
    * 16-bin histogram of the first 256 bytes, and a content fingerprint.
    * Runs once per partition; per-item state (digest) is reused.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.map { m =>
        val decoded = decodeStub(m.bytes, m.meta)
        val counts = new Array[Long](256)
        decoded.foreach(b => counts(b & 0xff) += 1)
        val n = decoded.length.toDouble
        val entropy =
          if (decoded.isEmpty) 0.0
          else -counts.filter(_ > 0)
            .map { c => val p = c / n; p * math.log(p) / math.log(2) }.sum
        val hist = new Array[Long](16)
        decoded.take(256).foreach(b => hist((b & 0xff) / 16) += 1)
        md.reset()
        val fp = md.digest(decoded).map("%02x".format(_)).mkString
        MediaFeatures(m.media_id, m.kind, decoded.length.toLong, entropy, hist, fp)
      }
    }
  }

  /** Frame sampling: every `stride` bytes emit a fixed-size slice — the
    * shape of video frame-sampling (1 input row → N frame rows) as a typed
    * flatMap generator.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 64, frameLen: Int = 16): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val decoded = decodeStub(m.bytes, m.meta)
      Iterator.range(0, decoded.length, stride).zipWithIndex.map { case (off, idx) =>
        Frame(m.media_id, idx, off.toLong, decoded.slice(off, math.min(off + frameLen, decoded.length)))
      }
    }
  }

  /** Per-item oracle-checkable slice of the feature extraction: kind,
    * byte count and the md5 content fingerprint are all derivable from the
    * source text in plain SQL, so this query gives the mapPartitions
    * plumbing a full value-level driver check (byte_entropy, which SQL
    * can't express, stays in the rows-only [[featureStats]]).
    */
  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(syntheticCorpus(spark, sfDir))
      .select(col("media_id"), col("kind"), col("n_bytes"), col("fingerprint"))
      .orderBy("media_id")

  /** Oracle-checkable frame index: every sampled frame's position, size
    * and content fingerprint. The synthetic corpus is ASCII text bytes, so
    * a byte slice is a SQL substring and the md5 matches across engines —
    * the same trick that oracles [[mediaMeta]] — giving the 1-row→N-frames
    * flatMap generator a full value-level driver check.
    */
  def frameIndex(spark: SparkSession, sfDir: String): DataFrame =
    sampleFrames(syntheticCorpus(spark, sfDir)).toDF()
      .select(
        col("media_id"), col("frame_idx"), col("offset"),
        length(col("frame_bytes")).cast("long").as("n_bytes"),
        md5(col("frame_bytes")).as("frame_md5"))
      .orderBy("media_id", "frame_idx")

  case class ResizedMedia(
      media_id: Long, kind: String, out_w: Int, out_h: Int,
      n_bytes: Long, fingerprint: String)

  /** Resize / transcode stage: aspect-preserving fit of the metadata
    * dims into a `box`×`box` target (pure integer math) plus a payload
    * downsample to ~`targetBytes` via stride-k byte selection — the
    * deterministic stand-in for "decode → scale → re-encode" (see the
    * STUB NOTICE above: a real deployment swaps the byte stride for a
    * codec call; dims math, typed mapPartitions shape, and the 1-in
    * 1-out batch contract are the real plumbing under test). Every
    * output is a pure integer/substring function of the input, which is
    * what lets the driver oracle check this END-TO-END in SQL.
    */
  def resize(media: Dataset[MediaRow], box: Int = 128, targetBytes: Int = 192): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.map { m =>
        val decoded = decodeStub(m.bytes, m.meta)
        val (w, h) = (m.meta.width, m.meta.height)
        val (ow, oh) =
          if (w >= h) { val s = math.min(w, box); (s, math.max(1, h * s / w)) }
          else { val s = math.min(h, box); (math.max(1, w * s / h), s) }
        val k = math.max(1, (decoded.length + targetBytes - 1) / targetBytes)
        val out = Array.range(0, decoded.length, k).map(decoded(_))
        md.reset()
        ResizedMedia(m.media_id, m.kind, ow, oh, out.length.toLong,
          md.digest(out).map("%02x".format(_)).mkString)
      }
    }
  }

  /** Driver-checkable resize projection: dims, downsampled byte count
    * and content fingerprint (ASCII payload ⇒ the stride-k selection is
    * a SQL character walk, same trick as [[frameIndex]]).
    */
  def mediaResize(spark: SparkSession, sfDir: String): DataFrame =
    resize(syntheticCorpus(spark, sfDir)).toDF()
      .orderBy("media_id")

  /** EXACT dedup at the MEDIA grain: group by sha2-256 of the opaque
    * binary payload (never the decoded content — byte identity is the
    * contract for stored media; the `bytes` column), keep the smallest id per digest, and
    * report the duplicate-cardinality histogram with a survivor
    * checksum. The hash-keyed shuffle is the same scale shape as text
    * dedup_exact; the input is the BINARY column, so the whole pipeline
    * (payload → codegen sha2 → groupBy) exercises media bytes end to
    * end. The oracle recomputes sha256 over the same UTF-8 bytes in
    * DuckDB — a payload that tears anywhere changes a digest and shifts
    * the histogram.
    */
  def mediaDedup(spark: SparkSession, sfDir: String): DataFrame =
    syntheticCorpus(spark, sfDir).toDF()
      .select(col("media_id"), sha2(col("bytes"), 256).as("digest"))
      .groupBy("digest")
      .agg(min(col("media_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .groupBy("n_copies")
      .agg(count(lit(1)).as("n_groups"), sum(col("keeper")).as("sum_keeper"))
      .orderBy("n_copies")

  /** Relational view over the typed features — joins back to document
    * metadata, demonstrating binary-derived columns flowing into ordinary
    * DataFrame analytics.
    */
  def featureStats(spark: SparkSession, sfDir: String): DataFrame = {
    val feats = extractFeatures(syntheticCorpus(spark, sfDir))
    feats.groupBy("kind")
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("byte_entropy")), 4).as("avg_entropy"),
        sum(col("n_bytes")).as("total_bytes"))
      .orderBy("kind")
  }
}
