package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media payloads
  * travel as opaque BINARY columns beside typed metadata, and decode /
  * feature-extraction runs partition-parallel with per-partition decoder
  * initialization (the Spark-side shape that matters at 100 TB — payloads
  * never pass through the driver, decoders initialize once per task, and
  * the output is a flat columnar schema ready for the similarity/dedup
  * operators).
  *
  * Two decoders ship behind the same [[MediaDecoder]] contract:
  * [[ImageIoDecoder]] is a REAL codec for the formats the JVM decodes
  * natively (PNG/BMP/GIF/JPEG via `javax.imageio`) with a perceptual
  * block-luminance embedding; [[DeterministicFakeDecoder]] derives stable
  * pseudo-features from raw payload bytes for formats with no in-sandbox
  * codec (video/audio), keeping every downstream contract (schema,
  * batching, partitioning, determinism) real and tested — swap in a
  * JNI/codec implementation per modality in production.
  */
object Multimodal {

  /** A media row: id + opaque payload + typed metadata. */
  case class MediaRecord(media_id: Long, mime: String, payload: Array[Byte])

  /** Extracted features: decoded dimensions + a unit-scale embedding. */
  case class MediaFeatures(media_id: Long, mime: String, n_bytes: Long,
                           width: Int, height: Int, embedding: Array[Float])

  /** Deterministic grayscale PNG for the codec fixtures: pixel
    * v = (id·31 + i·7) mod 256 — pure integer arithmetic, so a DuckDB
    * oracle can rebuild the exact pixel grid without a codec (PNG
    * truecolor is lossless). Shared by q_image_embed, q_image_neardup and
    * the round-14 q_crossmodal_knn probes. Caller should have disabled
    * ImageIO's on-disk cache once per partition. */
  def synthPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](w * h)
    var i = 0
    while (i < w * h) {
      val v = ((id * 31 + i.toLong * 7) % 256).toInt
      px(i) = (v << 16) | (v << 8) | v
      i += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w) // bulk write, same packed ints
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Per-partition decoder contract. Implementations may hold heavyweight
    * native state — `open()` runs once per partition, not per row. */
  trait MediaDecoder extends Serializable {
    def open(): Unit = ()
    def decode(mime: String, payload: Array[Byte]): (Int, Int, Array[Float])
    def close(): Unit = ()
  }

  /** Deterministic stand-in for a real codec: dimensions and embedding are
    * pure functions of the payload bytes (FNV-1a over byte windows). */
  object DeterministicFakeDecoder extends MediaDecoder {
    private def fnv(bytes: Array[Byte], from: Int, until: Int): Long = {
      var h = 0xcbf29ce484222325L
      var i = from
      while (i < until && i < bytes.length) {
        h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1
      }
      h
    }
    override def decode(mime: String, payload: Array[Byte]): (Int, Int, Array[Float]) = {
      val h = fnv(payload, 0, payload.length)
      val w = 64 + (h & 0x3f).toInt
      val ht = 64 + ((h >>> 6) & 0x3f).toInt
      val emb = Array.tabulate(16) { k =>
        val hk = fnv(payload, k * 7, k * 7 + 64)
        ((hk >>> 11).toDouble / (1L << 53).toDouble - 0.5).toFloat
      }
      (w, ht, emb)
    }
  }

  /** REAL image decoder backed by `javax.imageio` (PNG/BMP/GIF/JPEG —
    * ships with every JVM, no native libs): dimensions come from the
    * decoded raster, and the embedding is a 16-dim perceptual signature —
    * mean luminance of a 4×4 block grid, zero-centered — so
    * near-identical images land near each other under cosine and
    * [[nearDupMedia]] becomes a real perceptual near-dup pass for these
    * formats. `open()` disables ImageIO's on-disk decode cache once per
    * partition (per-row temp-file churn would dominate at scale).
    *
    * Decode failures (truncated/foreign payloads — inevitable in a
    * crawled corpus) surface as (-1, -1, empty) rather than killing the
    * task: at 100 TB a poison payload must quarantine a ROW, not a job. */
  object ImageIoDecoder extends MediaDecoder {
    override def open(): Unit = javax.imageio.ImageIO.setUseCache(false)
    override def decode(mime: String, payload: Array[Byte]): (Int, Int, Array[Float]) = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: java.io.IOException => null }
      if (img == null) (-1, -1, Array.empty[Float])
      else {
        val w = img.getWidth; val h = img.getHeight
        // ONE bulk getRGB: the per-pixel call runs a colorspace conversion
        // per invocation and dominated decode at 50k images (~9× the
        // embedding arithmetic); the bulk form converts the raster in one
        // pass and returns identical packed sRGB ints, so the embedding
        // is bit-unchanged
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        val sums = new Array[Double](16); val counts = new Array[Long](16)
        var y = 0
        while (y < h) {
          val by = math.min(3, y * 4 / h)
          val row = y * w
          var x = 0
          while (x < w) {
            val bx = math.min(3, x * 4 / w)
            val rgb = px(row + x)
            val lum = 0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            val b = by * 4 + bx
            sums(b) += lum / 255.0; counts(b) += 1
            x += 1
          }
          y += 1
        }
        val means = Array.tabulate(16)(b =>
          if (counts(b) == 0) 0.0 else sums(b) / counts(b))
        val overall = means.sum / 16.0
        (w, h, means.map(m => (m - overall).toFloat))
      }
    }
  }

  /** REAL audio decoder backed by `javax.sound.sampled` (WAV/PCM — ships
    * with every JVM): the payload is parsed as a WAV container, PCM16
    * samples are read off the real `AudioInputStream`, and the embedding
    * is a 16-dim envelope signature — mean absolute amplitude (|s|/32768)
    * per 1/16th segment. (width, height) carry (sample rate, n samples) —
    * the audio analog of raster dims. PCM is lossless, so the decoded
    * samples are bit-identical to what the encoder wrote, which is what
    * lets [[graft.queries.TextQueries.qAudioEmbed]] put this decoder
    * under the DuckDB oracle. Undecodable payloads quarantine per row
    * like [[ImageIoDecoder]]. */
  /** The platform's audio codecs, resolved ONCE through the public SPI.
    * `AudioSystem.getAudioInputStream`/`write` route every call through
    * `JDK13Services.getProviders`, a synchronized JVM-global method — at
    * 32 decode threads the lock serializes the whole stage (measured:
    * MORE threads made 50 k WAV round-trips SLOWER). Loading the same
    * provider instances (the JDK's WaveFileReader/Writer) via
    * `ServiceLoader` once and dispatching directly removes the lock while
    * keeping the identical real codec. Provider instances are stateless;
    * the lists are immutable after lazy init. On a cluster the lock is
    * per-executor-JVM anyway — this matters most in fat local JVMs. */
  private lazy val audioReaders: List[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val b = List.newBuilder[javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) b += it.next()
    b.result()
  }
  private lazy val audioWriters: List[javax.sound.sampled.spi.AudioFileWriter] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
    val b = List.newBuilder[javax.sound.sampled.spi.AudioFileWriter]
    while (it.hasNext) b += it.next()
    b.result()
  }

  object WavDecoder extends MediaDecoder {
    /** The provider that last accepted a payload, tried first on the next
      * call: the SPI contract makes every NON-matching provider reject by
      * THROWING (UnsupportedAudioFileException), and constructed stack
      * traces across the 5+ platform providers dominated decode time on a
      * homogeneous WAV corpus. Benign race — worst case two threads both
      * store the same winner. */
    @volatile private var preferred: javax.sound.sampled.spi.AudioFileReader = null
    private def tryRead(r: javax.sound.sampled.spi.AudioFileReader,
                        payload: Array[Byte]): javax.sound.sampled.AudioInputStream =
      try r.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => null
        case _: java.io.IOException => null
      }
    override def decode(mime: String, payload: Array[Byte]): (Int, Int, Array[Float]) = {
      // AudioSystem's own dispatch algorithm, minus its global lock:
      // first provider that accepts the container wins
      var in: javax.sound.sampled.AudioInputStream = null
      val pref = preferred
      if (pref != null) in = tryRead(pref, payload)
      if (in == null) {
        val it = audioReaders.iterator
        while (in == null && it.hasNext) {
          val r = it.next()
          if (r ne pref) {
            in = tryRead(r, payload)
            if (in != null) preferred = r
          }
        }
      }
      if (in == null) (-1, -1, Array.empty[Float])
      else {
        val fmt = in.getFormat
        val bytes = in.readAllBytes()
        in.close()
        val n = bytes.length / 2
        if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian || n == 0)
          (-1, -1, Array.empty[Float])
        else {
          val sums = new Array[Double](16); val counts = new Array[Long](16)
          var i = 0
          while (i < n) {
            val s = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
            val seg = math.min(15, i * 16 / n)
            sums(seg) += math.abs(s) / 32768.0; counts(seg) += 1
            i += 1
          }
          val emb = Array.tabulate(16)(seg =>
            if (counts(seg) == 0) 0f else (sums(seg) / counts(seg)).toFloat)
          (fmt.getSampleRate.toInt, n, emb)
        }
      }
    }
  }

  /** Encode raw PCM16 samples as a WAV payload via the same
    * `javax.sound.sampled` the decoder reads with (fixture builder for
    * the audio path — in production payloads come off the media scan). */
  def pcm16Wav(samples: Array[Short], sampleRate: Float = 8000f): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val raw = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      raw(2 * i) = (samples(i) & 0xff).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    val wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
    // direct provider dispatch — see audioWriters scaladoc
    audioWriters.find(_.isFileTypeSupported(wave, ais)) match {
      case Some(w) => w.write(ais, wave, bos)
      case None    => javax.sound.sampled.AudioSystem.write(ais, wave, bos)
    }
    bos.toByteArray
  }

  /** Real image resize for ImageIO-decodable payloads: decode → bilinear
    * `Graphics2D` resample → re-encode PNG. A narrow partition-parallel
    * map over payloads (never through the driver); undecodable payloads
    * pass through unchanged (same poison-row policy as the decoder). */
  def resizeMedia(media: Dataset[MediaRecord], targetW: Int, targetH: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          catch { case _: java.io.IOException => null }
        if (img == null) r
        else {
          val out = new java.awt.image.BufferedImage(
            targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, targetW, targetH, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          r.copy(mime = "image/png", payload = bos.toByteArray)
        }
      }
    }
  }

  /** Wrap a text/binary DataFrame as media records (fixture builder: any
    * bytes column works — in production this is the raw image/audio scan). */
  def asMedia(df: DataFrame, idCol: String, bytesCol: String,
              mime: String = "application/octet-stream"): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        lit(mime).as("mime"),
        col(bytesCol).cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** Partition-parallel decode + feature extraction. `mapPartitions` (not a
    * per-row UDF) so the decoder amortizes `open()` across the partition —
    * the standard pattern for native codecs. */
  def extractFeatures(media: Dataset[MediaRecord],
                      decoder: MediaDecoder = DeterministicFakeDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      decoder.open()
      val out = it.map { r =>
        val (w, h, emb) = decoder.decode(r.mime, r.payload)
        MediaFeatures(r.media_id, r.mime, r.payload.length.toLong, w, h, emb)
      }
      new Iterator[MediaFeatures] {
        override def hasNext: Boolean = {
          val more = out.hasNext
          if (!more) decoder.close()
          more
        }
        override def next(): MediaFeatures = out.next()
      }
    }
  }

  /** Resize-style transform: deterministic re-dimension of decoded media.
    * The pixel resample itself is part of the stubbed codec (`???`-class
    * work in this environment); the Spark-side contract — a narrow
    * partition-parallel map that rewrites (width, height) and re-derives
    * the embedding at the new scale — is real and tested. */
  def resize(features: Dataset[MediaFeatures], targetW: Int, targetH: Int): Dataset[MediaFeatures] = {
    import features.sparkSession.implicits._
    features.map { f =>
      val sx = targetW.toDouble / math.max(1, f.width)
      val sy = targetH.toDouble / math.max(1, f.height)
      // deterministic "resample": scale the embedding energy by the area
      // ratio stand-in — a real codec plugs in here
      val scale = math.sqrt(sx * sy).toFloat
      f.copy(width = targetW, height = targetH,
        embedding = f.embedding.map(_ * scale))
    }
  }

  /** Media near-duplicate pairs: decode → embed → sign-LSH bucket join →
    * exact cosine — the full multimodal dedup composition (decode feeds
    * [[graft.operators.Similarity.lshNearDupPairs]] directly). With a real
    * codec the embedding is perceptual and near-identical media cluster;
    * with the deterministic fake only byte-identical payloads coincide
    * (FNV avalanche), which is exactly what the plumbing test pins. */
  def nearDupMedia(media: Dataset[MediaRecord],
                   decoder: MediaDecoder = DeterministicFakeDecoder,
                   bits: Int = 8, minCosine: Double = 0.9): DataFrame =
    graft.operators.Similarity.lshNearDupPairs(
      extractFeatures(media, decoder).toDF(), "media_id", "embedding",
      bits = bits, minCosine = minCosine)

  /** 56-bit perceptual difference-hash (dHash — Krawetz's classic, public
    * knowledge) off an already-decoded raster: the image reduces to an
    * 8×8 grid of INTEGER intensity block sums (intensity = 299·R + 587·G
    * + 114·B, the parts-per-thousand form of the same Rec.601 luma the
    * embedding uses — integer-exact, so a lossless codec round-trip is
    * oracle-replayable from the generator arithmetic), and bit r·7+c is
    * set iff block (r,c)'s MEAN intensity exceeds block (r,c+1)'s —
    * compared cross-multiplied (`sumA·cntB > sumB·cntA`) so uneven block
    * pixel counts (dims not divisible by 8) never need division. 8 rows ×
    * 7 adjacent comparisons = 56 bits, always non-negative, which keeps
    * every band-extraction shift and the DuckDB `bit_or` pack sign-free.
    * Near-identical images (crops aside) agree on almost every
    * neighbour-brightness comparison, so Hamming distance on this hash is
    * the standard cheap perceptual near-dup signal. */
  def dhash56Raster(px: Array[Int], w: Int, h: Int): Long = {
    val sums = new Array[Long](64); val cnts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val by = math.min(7, y * 8 / h)
      val row = y * w
      var x = 0
      while (x < w) {
        val bx = math.min(7, x * 8 / w)
        val rgb = px(row + x)
        val b = by * 8 + bx
        sums(b) += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
          114L * (rgb & 0xff)
        cnts(b) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 7) {
        val a = r * 8 + c
        if (sums(a) * cnts(a + 1) > sums(a + 1) * cnts(a)) hash |= 1L << (r * 7 + c)
        c += 1
      }
      r += 1
    }
    hash
  }

  /** [[dhash56Raster]] over an encoded payload through the REAL
    * `javax.imageio` codec (one bulk `getRGB`, the [[ImageIoDecoder]]
    * discipline). Undecodable payloads return null (per-row quarantine). */
  def dhash56(payload: Array[Byte]): java.lang.Long = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException => null }
    if (img == null) null
    else {
      val w = img.getWidth; val h = img.getHeight
      dhash56Raster(img.getRGB(0, 0, w, h, null, 0, w), w, h)
    }
  }

  /** Partition-parallel perceptual hashing: (media_id, width, height,
    * dhash), dims/dhash null on undecodable payloads. One decode per row,
    * decoder configured once per partition, payloads never reach the
    * driver — feeds [[graft.operators.Dedup.hammingPairsFromHashes]] for
    * the image near-dup join. */
  def perceptualHashes(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          catch { case _: java.io.IOException => null }
        if (img == null) (r.media_id, None: Option[Int], None: Option[Int], None: Option[Long])
        else {
          val w = img.getWidth; val h = img.getHeight
          (r.media_id, Some(w), Some(h),
            Some(dhash56Raster(img.getRGB(0, 0, w, h, null, 0, w), w, h)))
        }
      }
    }.toDF("media_id", "width", "height", "dhash")
  }

  /** Frame/sample-style batching: deterministic byte-window sampling of a
    * payload (the video-frame-sampling shape: n evenly spaced windows). */
  def sampleWindows(media: Dataset[MediaRecord], n: Int, window: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val len = r.payload.length
      if (len == 0) Seq.empty
      else (0 until n).map { i =>
        val off = (len.toLong * i / n).toInt
        val until = math.min(off + window, len)
        (r.media_id, i, java.util.Arrays.copyOfRange(r.payload, off, until))
      }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }
}
