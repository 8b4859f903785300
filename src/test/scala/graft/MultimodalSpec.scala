package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkSessionFixture {

  private val sfDir = "/root/testdata/sf0.001"

  test("binary corpus schema: opaque bytes + typed metadata") {
    val ds = Multimodal.syntheticCorpus(spark, sfDir)
    val f = ds.schema("bytes")
    assert(f.dataType.typeName == "binary")
    assert(ds.schema("meta").dataType.typeName == "struct")
    assert(ds.count() == 500)
  }

  test("feature extraction is deterministic and partition-parallel") {
    val ds = Multimodal.syntheticCorpus(spark, sfDir)
    val f1 = Multimodal.extractFeatures(ds.repartition(8)).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(ds.repartition(2)).collect().sortBy(_.media_id)
    assert(f1.length == 500)
    assert(f1.map(_.fingerprint).toSeq == f2.map(_.fingerprint).toSeq)
    assert(f1.forall(f => f.byte_entropy >= 0 && f.byte_entropy <= 8))
    assert(f1.forall(f => f.lead_histogram.sum == math.min(f.n_bytes, 256)))
  }

  test("identical payloads get identical fingerprints") {
    val t = Tables(spark, sfDir)
    val feats = Multimodal.extractFeatures(Multimodal.syntheticCorpus(spark, sfDir))
      .toDF().select(col("media_id").as("doc_id"), col("fingerprint"))
    val conflicts = t.documents.select(col("doc_id"), md5(col("text")).as("h"))
      .join(feats, "doc_id")
      .groupBy("h").agg(countDistinct(col("fingerprint")).as("nfp"))
      .filter(col("nfp") > 1).count()
    assert(conflicts == 0)
  }

  test("frame sampling emits ceil(len/stride) frames per item") {
    val ds = Multimodal.syntheticCorpus(spark, sfDir)
    val frames = Multimodal.sampleFrames(ds, stride = 64, frameLen = 16)
    val perDoc = frames.groupBy("media_id").count()
      .withColumnRenamed("count", "n_frames")
    val expected = ds.toDF()
      .select(col("media_id"), ceil(length(col("bytes")) / 64.0).as("want"))
    val bad = perDoc.join(expected, "media_id")
      .filter(col("n_frames") =!= col("want")).count()
    assert(bad == 0)
  }

  test("features flow into relational analytics") {
    val stats = Multimodal.featureStats(spark, sfDir).collect()
    assert(stats.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    assert(stats.map(_.getLong(1)).sum == 500)
  }
}
