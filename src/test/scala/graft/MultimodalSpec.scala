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

  /** Deterministic synthetic PNG: a w×h two-tone gradient keyed by `seed`.
    * Encoded with the same javax.imageio the decoder reads with — real
    * bytes through a real codec, no fixtures needed. */
  private def pngBytes(seed: Int, w: Int = 32, h: Int = 24,
                       flipPixel: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 255 / (w - 1) + seed * 37) % 256
      img.setRGB(x, y, (v << 16) | (((y * 255 / (h - 1)) ^ seed) % 256 << 8) | v)
    }
    if (flipPixel) img.setRGB(0, 0, img.getRGB(0, 0) ^ 0x000008)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("ImageIoDecoder decodes real PNGs: exact dims, deterministic embedding") {
    val ss = spark
    import ss.implicits._
    val rows = Seq(
      (1L, pngBytes(seed = 1)),
      (2L, pngBytes(seed = 1)),                    // byte-identical to 1
      (3L, pngBytes(seed = 1, flipPixel = true)),  // 1 LSB of 1 pixel differs
      (4L, pngBytes(seed = 9)),                    // different image
      (5L, "not an image at all".getBytes("UTF-8"))) // poison row
    val m = Multimodal.asMedia(
      rows.toDF("id", "b"), "id", "b", mime = "image/png")
    val f = extractFeatures(m, ImageIoDecoder).collect()
      .map(x => x.media_id -> x).toMap
    // real dims off the raster
    assert(f(1L).width == 32 && f(1L).height == 24)
    // identical bytes → identical embedding
    assert(f(1L).embedding.toSeq == f(2L).embedding.toSeq)
    // poison payload quarantined, not thrown
    assert(f(5L).width == -1 && f(5L).embedding.isEmpty)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    // near-identical image is near under cosine; different image is not as near
    val near = cos(f(1L).embedding, f(3L).embedding)
    val far = cos(f(1L).embedding, f(4L).embedding)
    assert(near > 0.999, s"near-dup cosine $near")
    assert(far < near, s"far=$far near=$near")
  }

  test("resizeMedia really resamples: decoded dims change, poison passes through") {
    val ss = spark
    import ss.implicits._
    val m = Multimodal.asMedia(
      Seq((1L, pngBytes(seed = 3, w = 40, h = 30)),
          (2L, "junk".getBytes("UTF-8"))).toDF("id", "b"),
      "id", "b", mime = "image/png")
    val resized = Multimodal.resizeMedia(m, 16, 12)
    val f = extractFeatures(resized, ImageIoDecoder).collect()
      .map(x => x.media_id -> x).toMap
    assert(f(1L).width == 16 && f(1L).height == 12)
    assert(f(2L).width == -1) // junk unchanged, still undecodable
    val orig = resized.filter(_.media_id == 2L).collect()(0)
    assert(new String(orig.payload, "UTF-8") == "junk")
  }

  test("WavDecoder decodes real PCM16 WAV: rate/count off the container, exact envelope") {
    val ss = spark
    import ss.implicits._
    // constant half-amplitude clip → every segment mean is exactly 0.5
    val flat = Array.fill[Short](1600)(16384)
    // alternating full-scale square wave → mean |s| = (32767+32768)/2/32768
    val square = Array.tabulate[Short](1600)(i => if (i % 2 == 0) 32767 else -32768)
    val rows = Seq(
      (1L, Multimodal.pcm16Wav(flat)),
      (2L, Multimodal.pcm16Wav(square)),
      (3L, "definitely not audio".getBytes("UTF-8")))
    val m = Multimodal.asMedia(rows.toDF("id", "b"), "id", "b", mime = "audio/wav")
    val f = extractFeatures(m, WavDecoder).collect().map(x => x.media_id -> x).toMap
    assert(f(1L).width == 8000 && f(1L).height == 1600)
    assert(f(1L).embedding.forall(_ == 0.5f))
    val expSquare = ((32767.0 / 32768.0 + 1.0) * 50 / 100).toFloat
    assert(f(2L).embedding.forall(_ == expSquare))
    assert(f(3L).width == -1 && f(3L).embedding.isEmpty)
  }

  test("dhash56: codec round-trip equals raster kernel; near-dup close, distinct far; poison null") {
    val ss = spark
    import ss.implicits._
    // PNG is lossless: dhash off the ENCODED payload must equal dhash off
    // the raw raster the encoder was fed
    val w = 32; val h = 24
    val raster = Array.tabulate(w * h) { i =>
      val v = (i * 7 + (i * i) % 251) % 256; (v << 16) | (v << 8) | v
    }
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, raster, 0, w)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val viaCodec = Multimodal.dhash56(bos.toByteArray)
    assert(viaCodec != null &&
      viaCodec.longValue == Multimodal.dhash56Raster(raster, w, h))
    // 56-bit contract: always non-negative, top 8 bits clear
    assert(viaCodec.longValue >= 0 && (viaCodec.longValue >>> 56) == 0)
    // a 1-LSB pixel flip moves Hamming by at most a couple of bits; a
    // structurally different image is far
    def hm(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val near = Multimodal.dhash56(pngBytes(seed = 1, flipPixel = true)).longValue
    val base = Multimodal.dhash56(pngBytes(seed = 1)).longValue
    val far = Multimodal.dhash56(pngBytes(seed = 9)).longValue
    assert(hm(base, near) <= 2, s"near hamming ${hm(base, near)}")
    assert(hm(base, far) > hm(base, near), s"far=${hm(base, far)}")
    assert(Multimodal.dhash56("not an image".getBytes("UTF-8")) == null)
  }

  test("perceptualHashes + hammingPairsFromHashes: planted near-dups pair, poison quarantines") {
    val ss = spark
    import ss.implicits._
    val rows = Seq(
      (1L, pngBytes(seed = 1)),
      (2L, pngBytes(seed = 1)),                    // exact dup of 1 → hamming 0
      (3L, pngBytes(seed = 1, flipPixel = true)),  // near dup of 1
      (4L, pngBytes(seed = 9)),                    // distinct image
      (5L, "poison".getBytes("UTF-8")))
    val m = Multimodal.asMedia(rows.toDF("id", "b"), "id", "b", mime = "image/png")
    val hashed = Multimodal.perceptualHashes(m).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(hashed(5L).isEmpty && hashed(1L).isDefined)
    assert(hashed(1L) == hashed(2L))
    val pairs = graft.operators.Dedup.hammingPairsFromHashes(
      Multimodal.perceptualHashes(m)
        .filter(col("dhash").isNotNull)
        .select(col("media_id").as("id"), col("dhash").as("sh")),
      blockBits = 14, maxHamming = 4)
      .select("d1", "d2", "hamming").as[(Long, Long, Long)]
      .collect().toSet
    assert(pairs.contains((1L, 2L, 0L)), s"exact pair missing: $pairs")
    assert(pairs.exists(p => p._1 == 1L && p._2 == 3L), s"near pair missing: $pairs")
    assert(!pairs.exists(p => p._2 == 4L || p._1 == 4L), s"distinct image paired: $pairs")
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

  test("qAudioVad islands equal a brute per-clip recomputation off the generator") {
    val out = SparkEntry.queries("q_audio_vad")(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ids = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val brute = ids.flatMap { id =>
      // identical arithmetic to the query's generator + WavDecoder fold:
      // double accumulation per 100-sample segment, float narrowing, 2^20
      val q = (0 until 16).map { seg =>
        var s = 0.0
        (0 until 100).foreach { k =>
          val i = seg * 100 + k
          val v = (((id + 3) * (i + 11L)) % 65536) * 31153 % 65536 - 32768
          s += math.abs(v) / 32768.0
        }
        math.floor((s / 100).toFloat.toDouble * 1048576).toLong
      }
      val tot = q.sum
      val act = q.map(_ * 16 > tot)
      (0 until 16).filter(i => act(i) && (i == 0 || !act(i - 1))).map { st =>
        val en = (st until 16).takeWhile(act).last
        (id, st.toLong, en.toLong, (en - st + 1).toLong)
      }
    }.sortBy(t => (t._1, t._2))
    assert(out.toSeq == brute.toSeq,
      s"first diff: ${out.toSeq.zip(brute.toSeq).find(p => p._1 != p._2)}")
    // the fixture must exercise variety: multi-island clips and gaps
    assert(brute.map(_._1).distinct.length < ids.length ||
      brute.groupBy(_._1).values.exists(_.length > 1))
  }
}

