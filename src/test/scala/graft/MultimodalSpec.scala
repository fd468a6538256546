package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal._

class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.asMedia(
    spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("bytes")),
    "doc_id", "bytes", mime = "text/plain")

  test("media wrapping preserves payload bytes and ids") {
    val r = media.filter(_.media_id == 0L).collect()(0)
    assert(r.mime == "text/plain" && r.payload.nonEmpty)
  }

  test("feature extraction is deterministic, partition-count independent") {
    val f1 = extractFeatures(media.repartition(1)).collect()
      .map(f => (f.media_id, f.width, f.height, f.embedding.toSeq)).sortBy(_._1)
    val f8 = extractFeatures(media.repartition(8)).collect()
      .map(f => (f.media_id, f.width, f.height, f.embedding.toSeq)).sortBy(_._1)
    assert(f1.length == 500 && f1.toSeq == f8.toSeq)
    assert(f1.forall { case (_, w, h, e) =>
      w >= 64 && w < 128 && h >= 64 && h < 128 && e.length == 16 })
  }

  test("extracted embeddings feed the similarity machinery") {
    val feats = extractFeatures(media).toDF()
    // quantized-cosine self-similarity of identical payloads is 1
    val self = feats.select(col("media_id"), col("embedding"))
    import TestSpark.spark.implicits._
    val e = self.filter(col("media_id") === 0L).as[(Long, Array[Float])].collect()(0)._2
    val dot = e.map(x => x.toDouble * x.toDouble).sum
    assert(dot > 0.0)
  }

  test("nearDupMedia finds byte-identical payloads via the LSH bucket join") {
    val ss = spark
    import ss.implicits._
    val payloads = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
      (3L, "completely different content about spark engines"),
      (4L, "completely different content about spark engines"), // exact dup of 3
      (5L, "a singleton payload with no duplicate anywhere"))
    val m = Multimodal.asMedia(
      payloads.toDF("id", "txt").select(col("id"), col("txt").cast("binary").as("b")),
      "id", "b")
    val pairs = Multimodal.nearDupMedia(m, minCosine = 0.99)
      .select("v1", "v2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (3L, 4L)), s"got $pairs")
  }

  test("window sampling emits n frames with deterministic offsets") {
    val frames = sampleWindows(media, n = 4, window = 16)
    assert(frames.groupBy("media_id").count().filter(col("count") =!= 4).count() == 0)
    val f0 = frames.filter(col("media_id") === 0L).orderBy("frame_idx").collect()
    assert(f0.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))
    assert(f0.forall(_.getAs[Array[Byte]]("frame_bytes").length <= 16))
  }

  test("resize rewrites dimensions deterministically, partition-independent") {
    val feats = extractFeatures(media)
    val r1 = Multimodal.resize(feats.repartition(1), 32, 32).collect()
      .map(f => (f.media_id, f.width, f.height, f.embedding.toSeq)).sortBy(_._1)
    val r4 = Multimodal.resize(feats.repartition(4), 32, 32).collect()
      .map(f => (f.media_id, f.width, f.height, f.embedding.toSeq)).sortBy(_._1)
    assert(r1.toSeq == r4.toSeq)
    assert(r1.forall { case (_, w, h, _) => w == 32 && h == 32 })
  }
}

