package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-record gzip member writer with ONE reused Deflater for the whole
  * partition. Two lessons are baked in:
  *  - `GZIPOutputStream.finish()` ends the member but NOT the native
  *    Deflater — at one member per record, relying on GC to run
  *    `Deflater.end()` leaks ~hundreds of KB of NATIVE memory per record
  *    (measured: the first 100× wet-export run was OOM-killed at 129 GB
  *    rss with a 20 GB heap — invisible to heap monitoring);
  *  - allocating a fresh Deflater + buffers per member (10 M members at
  *    the 1000× fixture) pays native init/teardown per record; a single
  *    `reset()` Deflater writes byte-compatible members (the RFC 1952
  *    framing is written explicitly: fixed header, raw deflate stream,
  *    CRC32 + ISIZE trailer — exactly what GZIPOutputStream emits with
  *    FLG=0).
  * Call [[member]] once per record, [[close]] once per partition. */
private final class MemberGzipWriter(out: java.io.OutputStream) {
  private val deflater =
    new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
  private val crc = new java.util.zip.CRC32()
  private val buf = new Array[Byte](64 * 1024)
  private val header = Array[Byte](0x1f.toByte, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0)
  private val trailer = new Array[Byte](8)

  def member(parts: Array[Byte]*): Unit = {
    out.write(header)
    deflater.reset(); crc.reset()
    var total = 0L
    parts.foreach { p => deflater.setInput(p); crc.update(p); total += p.length
      while (!deflater.needsInput()) {
        val n = deflater.deflate(buf)
        if (n > 0) out.write(buf, 0, n)
      }
    }
    deflater.finish()
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      if (n > 0) out.write(buf, 0, n)
    }
    val c = crc.getValue; val isize = total & 0xffffffffL
    trailer(0) = c.toByte; trailer(1) = (c >> 8).toByte
    trailer(2) = (c >> 16).toByte; trailer(3) = (c >> 24).toByte
    trailer(4) = isize.toByte; trailer(5) = (isize >> 8).toByte
    trailer(6) = (isize >> 16).toByte; trailer(7) = (isize >> 24).toByte
    out.write(trailer)
  }

  def close(): Unit = deflater.end()
}

/** User-facing WARC entry points — the crawl-container twin of
  * [[FastxIO]]. The reference engine has no web-container surface at all
  * (`fastx_parsers.py` is FASTX records + expressions); this is the
  * round-13-verdict extension that completes crawl→text→curation
  * end-to-end in-engine.
  */
object WarcIO {

  /** Sanitize a WARC header value for CRLF-framed US-ASCII emission.
    * Crawl data is attacker-influenced: a raw CR/LF inside `target_uri`
    * would inject forged header lines and break the container framing
    * downstream readers rely on, and a bare `getBytes(US-ASCII)` silently
    * mangles every non-ASCII codepoint to '?'. Control bytes (< 0x20,
    * 0x7f) and non-ASCII codepoints are percent-encoded as UTF-8 byte
    * escapes (RFC 3986 style — loss-free, and what real crawl writers do
    * to non-ASCII IRIs); printable ASCII, including '%', passes through
    * untouched so already-percent-encoded URIs round-trip byte-exactly. */
  private[graft] def headerValue(s: String): String = {
    var i = 0
    var clean = true
    while (clean && i < s.length) {
      val c = s.charAt(i)
      if (c < 0x20 || c >= 0x7f) clean = false
      i += 1
    }
    if (clean) return s
    val sb = new java.lang.StringBuilder(s.length + 8)
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
      val u = b & 0xff
      if (u >= 0x20 && u < 0x7f) sb.append(u.toChar)
      else sb.append('%').append(f"$u%02X")
    }
    sb.toString
  }

  /** Lazy WARC scan: `spark.read.format("warc")` —
    * (record_type, record_id, target_uri, warc_date, content_type,
    * content_length, payload). Splittable on plain files; compressed
    * files read whole-file. */
  def scanWarc(spark: SparkSession, path: String): DataFrame =
    spark.read.format("warc").load(path)

  /** HTTP message body of a `response` payload (decoded as a string):
    * everything after the first blank line (`\r\n\r\n`), or the whole
    * string when no HTTP header block is present (resource records).
    * Pure string ops — codegen'd and engine-portable (the oracle replays
    * the same split). */
  def httpBody(payload: Column): Column = {
    val s = payload.cast("string")
    when(instr(s, "\r\n\r\n") > 0,
      s.substr(instr(s, "\r\n\r\n") + 4, length(s)))
      .otherwise(s)
  }

  /** Container-level dedup via WARC `revisit` records (round-15 item 8 —
    * the convention real crawls ship: a page whose payload is byte-
    * identical to an earlier capture is stored as a tiny `revisit` record
    * pointing at that capture instead of repeating the bytes). Per
    * payload digest the record with the SMALLEST record_id is the
    * canonical capture; every other member becomes record_type `revisit`
    * with an EMPTY payload and `refers_to` = the canonical record_id
    * (the writer adds the identical-payload-digest WARC-Profile header).
    * One digest-keyed shuffle — the exact-dedup shape; winner selection
    * is a map-side-combinable min, never a window over payload bytes. */
  def revisitize(df: DataFrame): DataFrame = {
    val withD = df.withColumn("__digest", md5(col("payload")))
    val winners = withD.groupBy("__digest")
      .agg(min(col("record_id")).as("__winner"))
    withD.join(winners, Seq("__digest"))
      .withColumn("refers_to",
        when(col("record_id") === col("__winner"), lit(null).cast("string"))
          .otherwise(col("__winner")))
      .withColumn("record_type",
        when(col("refers_to").isNull, col("record_type")).otherwise(lit("revisit")))
      .withColumn("payload",
        when(col("refers_to").isNull, col("payload"))
          .otherwise(lit(Array.empty[Byte])))
      .drop("__digest", "__winner")
  }

  /** Resolve `revisit` records back to full captures: each revisit joins
    * its `refers_to` target and takes that record's type and payload,
    * keeping its own identity (record_id, target_uri, warc_date). Returns
    * the resolved frame plus a `was_revisit` flag. Scale shape: one
    * equi-join of the (small) revisit side onto originals keyed by
    * record_id. */
  def resolveRevisits(warc: DataFrame): DataFrame = {
    val cols = Seq("record_type", "record_id", "target_uri", "warc_date",
      "content_type", "payload")
    val originals = warc.filter(col("record_type") =!= "revisit")
      .select(cols.map(col): _*)
    val body = originals.select(col("record_id").as("__ref"),
      col("record_type").as("__otype"), col("payload").as("__opayload"))
    val resolved = warc.filter(col("record_type") === "revisit")
      .join(body, col("refers_to") === col("__ref"))
      .select(col("__otype").as("record_type"), col("record_id"),
        col("target_uri"), col("warc_date"), col("content_type"),
        col("__opayload").as("payload"))
    originals.withColumn("was_revisit", lit(false))
      .unionByName(resolved.withColumn("was_revisit", lit(true)))
  }

  /** WARC sink — fully distributed (one file per partition, nothing on
    * the driver): each row becomes one ISO 28500 record with CRLF framing
    * and an exact Content-Length walk; the output directory scans back
    * via [[scanWarc]], including through forced small splits. Expects
    * columns (record_type, record_id, warc_date, target_uri, payload);
    * `target_uri` may be null (warcinfo records carry none). Unlike the
    * FASTA/FASTQ sinks this cannot ride `df.write.text` — the text sink
    * appends LF after every row, corrupting binary CRLF framing — so rows
    * stream through per-partition Hadoop file writes instead. Commit
    * protocol: each task attempt writes a hidden per-attempt temp file
    * (`.part-…-attempt-N` — dot-prefixed, so readers' hidden-file filter
    * never sees it) and atomically renames onto the final part name on
    * success; a speculative or retried attempt can therefore never
    * interleave bytes into a half-written visible file — last completed
    * rename wins, and every rename installs a COMPLETE file. Header
    * values pass through [[headerValue]] (CR/LF injection and non-ASCII
    * mangling are framing hazards, not data). */
  def writeWarc(df: DataFrame, path: String, recordGzip: Boolean = false,
                recordZstd: Boolean = false): Unit = {
    require(!(recordGzip && recordZstd), "pick one container codec")
    val spark = df.sparkSession
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val outDir = new org.apache.hadoop.fs.Path(path)
    val fs = outDir.getFileSystem(serConf.value)
    fs.delete(outDir, true)
    fs.mkdirs(outDir)
    val withCt =
      if (df.columns.contains("content_type")) df
      else df.withColumn("content_type",
        lit("application/http; msgtype=response"))
    val withRef =
      if (withCt.columns.contains("refers_to")) withCt
      else withCt.withColumn("refers_to", lit(null).cast("string"))
    val cols = Seq("record_type", "record_id", "warc_date", "target_uri",
      "content_type", "refers_to", "payload")
    withRef.select(cols.head, cols.tail: _*).rdd.foreachPartition { rows =>
      val tc = org.apache.spark.TaskContext.get()
      val pid = tc.partitionId()
      val ext = if (recordGzip) ".warc.gz"
        else if (recordZstd) ".warc.zst" else ".warc"
      val file = new org.apache.hadoop.fs.Path(path, f"part-$pid%05d$ext")
      val tmp = new org.apache.hadoop.fs.Path(path,
        f".part-$pid%05d$ext.attempt-${tc.taskAttemptId()}")
      val fsw = file.getFileSystem(serConf.value)
      val out = new java.io.BufferedOutputStream(fsw.create(tmp, true), 1 << 16)
      val gz = if (recordGzip) new MemberGzipWriter(out) else null
      // one reused native compression context per partition (the Deflater
      // lesson: deterministic native release, no per-record init); content
      // size lands in each frame header (single-shot compress of a known
      // buffer) and setChecksum appends the frame checksum the reader's
      // decompress verifies
      val zctx = if (recordZstd)
        new com.github.luben.zstd.ZstdCompressCtx().setLevel(3).setChecksum(true)
      else null
      var committed = false
      try {
        val crlfCrlf = "\r\n\r\n".getBytes("US-ASCII")
        rows.foreach { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val sb = new java.lang.StringBuilder(256)
          sb.append("WARC/1.0\r\n")
          sb.append("WARC-Type: ").append(headerValue(r.getAs[String]("record_type"))).append("\r\n")
          sb.append("WARC-Record-ID: ").append(headerValue(r.getAs[String]("record_id"))).append("\r\n")
          sb.append("WARC-Date: ").append(headerValue(r.getAs[String]("warc_date"))).append("\r\n")
          val uri = r.getAs[String]("target_uri")
          if (uri != null) sb.append("WARC-Target-URI: ").append(headerValue(uri)).append("\r\n")
          val refersTo = r.getAs[String]("refers_to")
          if (refersTo != null) {
            sb.append("WARC-Refers-To: ").append(headerValue(refersTo)).append("\r\n")
            // revisit records carry the identical-payload-digest profile
            // (ISO 28500 §6.7.2 convention; the public netpreserve URI)
            if (r.getAs[String]("record_type") == "revisit")
              sb.append("WARC-Profile: http://netpreserve.org/warc/1.0/revisit/identical-payload-digest\r\n")
          }
          sb.append("Content-Type: ").append(headerValue(r.getAs[String]("content_type"))).append("\r\n")
          sb.append("Content-Length: ").append(payload.length).append("\r\n\r\n")
          val head = sb.toString.getBytes("US-ASCII")
          if (gz != null) gz.member(head, payload, crlfCrlf)
          else if (zctx != null) {
            // one frame per record: head + payload + terminator
            val rec = new Array[Byte](head.length + payload.length + 4)
            System.arraycopy(head, 0, rec, 0, head.length)
            System.arraycopy(payload, 0, rec, head.length, payload.length)
            System.arraycopy(crlfCrlf, 0, rec, head.length + payload.length, 4)
            out.write(zctx.compress(rec))
          }
          else { out.write(head); out.write(payload); out.write(crlfCrlf) }
        }
        if (gz != null) gz.close()
        if (zctx != null) zctx.close()
        out.close()
        // commit: install the complete temp file under the final name.
        // A concurrently-committed speculative twin wrote the same bytes;
        // delete-then-rename makes the last completed commit win whole.
        fsw.delete(file, false)
        if (!fsw.rename(tmp, file))
          throw new java.io.IOException(s"writeWarc: commit rename $tmp -> $file failed")
        committed = true
      } finally {
        if (!committed) {
          try { if (gz != null) gz.close() } catch { case _: Throwable => }
          try { if (zctx != null) zctx.close() } catch { case _: Throwable => }
          try out.close() catch { case _: Throwable => }
          try fsw.delete(tmp, false) catch { case _: Throwable => }
        }
      }
    }
  }
}
