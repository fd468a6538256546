package graft

import java.io.File

import org.apache.spark.sql.functions._

/** The WARC connector under forced-split pressure: byte-exact roundtrip
  * through [[WarcIO.writeWarc]] → `format("warc")`, record-marker resync
  * with planted false `WARC/1.0` lines inside payloads, compressed
  * whole-file reads, and the pushdown surface (columns, record_type
  * filter, partial limit). */
class WarcSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private def fixtureDf = {
    // payloads deliberately hostile to naive resync: embedded version
    // lines, header-looking lines, blank lines, CRLFs, high bytes
    val rows = (0L until 40L).map { i =>
      val body =
        if (i % 7 == 3)
          s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>doc $i\r\n" +
            "WARC/1.0\r\nnot: a real record start\r\n\r\nmore</html>"
        else if (i % 5 == 1)
          s"HTTP/1.1 200 OK\r\n\r\nbinary-ish ÿ payload $i with trailing newline\n"
        else
          s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>plain doc $i body text long enough</html>"
      val t = if (i % 3 == 0) "request" else "response"
      (t, s"<urn:uuid:rec-$i>", "2024-01-01T00:00:00Z",
        s"https://fixture.test/p/$i", body.getBytes("ISO-8859-1"))
    }
    rows.toDF("record_type", "record_id", "warc_date", "target_uri", "payload")
  }

  private def writeFixture(name: String): String = {
    val dir = new File(s"/root/repo/target/warc_spec/$name")
    WarcIO.writeWarc(fixtureDf.repartition(3), dir.getAbsolutePath)
    dir.getAbsolutePath
  }

  private def collectAll(path: String, maxSplit: Option[Long]) = {
    val r = maxSplit.foldLeft(spark.read.format("warc"))((b, m) =>
      b.option("maxSplitBytes", m.toString))
    r.load(path)
      .select(col("record_type"), col("record_id"), col("target_uri"),
        col("content_length"), md5(col("payload")).as("pmd5"))
      .collect()
      .map(x => (x.getString(0), x.getString(1), x.getString(2), x.getLong(3), x.getString(4)))
      .toSet
  }

  test("roundtrip: whole-file read returns every record byte-exactly") {
    val path = writeFixture("whole")
    val got = collectAll(path, None)
    val want = fixtureDf.collect().map { r =>
      val p = r.getAs[Array[Byte]]("payload")
      val d = java.security.MessageDigest.getInstance("MD5").digest(p)
      (r.getString(0), r.getString(1), r.getString(3), p.length.toLong,
        d.map("%02x".format(_)).mkString)
    }.toSet
    assert(got == want)
    assert(got.size == 40)
  }

  test("forced 256-byte splits: resync yields the same set, no dups or misses") {
    val path = writeFixture("split")
    val whole = collectAll(path, None)
    val split = collectAll(path, Some(256L))
    assert(split == whole)
    // and genuinely multi-split: more partitions than files
    val parts = spark.read.format("warc").option("maxSplitBytes", "256")
      .load(path).rdd.getNumPartitions
    assert(parts > 3, s"expected many splits, got $parts")
  }

  test("every split offset is consistent: sweep split sizes") {
    val path = writeFixture("sweep")
    val whole = collectAll(path, None)
    Seq(64L, 200L, 333L, 1024L, 4096L).foreach { m =>
      assert(collectAll(path, Some(m)) == whole, s"maxSplitBytes=$m diverged")
    }
  }

  test("gzip member read: whole-file parse of a compressed warc") {
    val src = writeFixture("gz")
    val gzDir = new File("/root/repo/target/warc_spec/gz_out")
    gzDir.mkdirs()
    gzDir.listFiles().foreach(_.delete())
    new File(src).listFiles().filter(_.getName.endsWith(".warc")).foreach { f =>
      val out = new java.util.zip.GZIPOutputStream(
        new java.io.FileOutputStream(new File(gzDir, f.getName + ".gz")))
      out.write(java.nio.file.Files.readAllBytes(f.toPath)); out.close()
    }
    assert(collectAll(gzDir.getAbsolutePath, None) == collectAll(src, None))
  }

  test("column pruning and record_type filter reach the scan; partial limit") {
    val path = writeFixture("push")
    val df = spark.read.format("warc").load(path)
      .filter(col("record_type") === "response")
      .select(col("target_uri"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("record_type"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("cols=record_type,target_uri"), // pruned read schema
      s"columns not pruned:\n$plan")
    assert(df.count() == fixtureDf.filter(col("record_type") === "response").count())
    // pushed partial limit still yields exactly n rows globally
    assert(spark.read.format("warc").load(path).limit(5).collect().length == 5)
  }

  test("record-gzip: member-split reads equal the plain-file truth") {
    val plain = writeFixture("rg_plain")
    val dir = new File("/root/repo/target/warc_spec/rg")
    WarcIO.writeWarc(fixtureDf.repartition(2), dir.getAbsolutePath,
      recordGzip = true)
    val names = new File(dir.getAbsolutePath).listFiles().map(_.getName)
    assert(names.forall(n => n.startsWith("_") || n.startsWith(".") ||
      n.endsWith(".warc.gz")))
    val whole = collectAll(plain, None)
    // whole-file codec path (no option): concatenated members stream as one
    assert(collectAll(dir.getAbsolutePath, None) == whole)
    // member-split path: sweep split sizes — boundaries land mid-member,
    // between members, and exactly ON member starts somewhere in the sweep
    (64L to 600L by 39L).foreach { m =>
      val got = spark.read.format("warc")
        .option("recordGzipSplit", "true").option("maxSplitBytes", m.toString)
        .load(dir.getAbsolutePath)
        .select(col("record_type"), col("record_id"), col("target_uri"),
          col("content_length"), md5(col("payload")).as("pmd5"))
        .collect()
        .map(x => (x.getString(0), x.getString(1), x.getString(2), x.getLong(3), x.getString(4)))
        .toSet
      assert(got == whole, s"recordGzipSplit maxSplitBytes=$m diverged")
    }
    // genuinely multi-split
    val parts = spark.read.format("warc").option("recordGzipSplit", "true")
      .option("maxSplitBytes", "200").load(dir.getAbsolutePath)
      .rdd.getNumPartitions
    assert(parts > 2, s"expected member splits, got $parts")
  }

  test("record-gzip: FNAME/FEXTRA headers and false magic inside payloads survive") {
    // hand-write members with optional header fields (real crawl writers
    // set FNAME) and payloads containing the gzip magic bytes
    val dir = new File("/root/repo/target/warc_spec/rg_hdr")
    dir.mkdirs(); dir.listFiles().foreach(_.delete())
    def record(i: Int, body: Array[Byte]): Array[Byte] = {
      val h = s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:uuid:h-$i>\r\n" +
        s"WARC-Date: 2024-01-01T00:00:00Z\r\nWARC-Target-URI: https://x.test/$i\r\n" +
        s"Content-Type: application/http\r\nContent-Length: ${body.length}\r\n\r\n"
      h.getBytes("ISO-8859-1") ++ body ++ "\r\n\r\n".getBytes("ISO-8859-1")
    }
    val out = new java.io.FileOutputStream(new File(dir, "h.warc.gz"))
    (0 until 10).foreach { i =>
      val body =
        if (i % 3 == 0) Array[Byte](0x1f.toByte, 0x8b.toByte, 0x08, 0x00) ++
          s"fake gzip magic inside payload $i".getBytes("ISO-8859-1")
        else s"plain body $i".getBytes("ISO-8859-1")
      // raw deflate via GZIPOutputStream per member, with a filename field
      // simulated by wrapping: java's GZIPOutputStream sets FLG=0, so for
      // FNAME coverage build the header by hand around a raw deflater
      if (i % 2 == 0) {
        val bos = new java.io.ByteArrayOutputStream()
        val gz = new java.util.zip.GZIPOutputStream(bos)
        gz.write(record(i, body)); gz.finish()
        out.write(bos.toByteArray)
      } else {
        val payload = record(i, body)
        val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
        d.setInput(payload); d.finish()
        val comp = new Array[Byte](payload.length * 2 + 64)
        val n = d.deflate(comp); d.end()
        val crc = new java.util.zip.CRC32(); crc.update(payload)
        val name = s"rec$i.warc".getBytes("ISO-8859-1")
        val hdr = Array[Byte](0x1f.toByte, 0x8b.toByte, 8, 0x08, 0, 0, 0, 0, 0, 0) ++
          name ++ Array[Byte](0)
        val trailer = java.nio.ByteBuffer.allocate(8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          .putInt(crc.getValue.toInt).putInt(payload.length).array()
        out.write(hdr); out.write(comp, 0, n); out.write(trailer)
      }
    }
    out.close()
    val whole = spark.read.format("warc").load(dir.getAbsolutePath)
      .select(col("record_id"), col("content_length")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(whole.size == 10)
    (32L to 300L by 23L).foreach { m =>
      val got = spark.read.format("warc")
        .option("recordGzipSplit", "true").option("maxSplitBytes", m.toString)
        .load(dir.getAbsolutePath)
        .select(col("record_id"), col("content_length")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == whole, s"FNAME sweep maxSplitBytes=$m diverged")
    }
  }

  test("record-gzip: files larger than the reader's buffer window walk cleanly") {
    // regression: the trailer read returned SHORT when the 8 bytes
    // straddled the 256 KB RawReader window — needs a multi-window file
    val dir = new File("/root/repo/target/warc_spec/rg_big")
    val rows = (0L until 1500L).map { i =>
      ("response", s"<urn:uuid:big-$i>", "2024-01-01T00:00:00Z",
        s"https://fixture.test/big/$i",
        (s"HTTP/1.1 200 OK\r\n\r\nbig payload $i " + ("x" * 900)).getBytes("ISO-8859-1"))
    }
    WarcIO.writeWarc(
      rows.toDF("record_type", "record_id", "warc_date", "target_uri", "payload")
        .repartition(1),
      dir.getAbsolutePath, recordGzip = true)
    val f = new File(dir.getAbsolutePath).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).head
    assert(f.length > 300 * 1024, s"fixture must span windows, got ${f.length}")
    def ids(split: Option[Long]) = {
      val r = split.foldLeft(spark.read.format("warc")
        .option("recordGzipSplit", "true"))((b, m) =>
        b.option("maxSplitBytes", m.toString))
      r.load(dir.getAbsolutePath).select("record_id").collect()
        .map(_.getString(0)).toSet
    }
    val whole = ids(None)
    assert(whole.size == 1500)
    assert(ids(Some(100000L)) == whole)
  }

  test("record-gzip: a bit-flipped member fails loudly (CRC trailer verified)") {
    val dir = new File("/root/repo/target/warc_spec/rg_crc")
    WarcIO.writeWarc(fixtureDf.repartition(1), dir.getAbsolutePath,
      recordGzip = true)
    val f = new File(dir.getAbsolutePath).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    // flip one byte deep inside the first member's deflate stream; drop
    // Hadoop's local-FS checksum sidecar so OUR trailer verification is
    // the layer under test (on HDFS-without-checksums it's the only one)
    bytes(40) = (bytes(40) ^ 0x01).toByte
    java.nio.file.Files.write(f.toPath, bytes)
    new File(f.getParentFile, "." + f.getName + ".crc").delete()
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("warc").option("recordGzipSplit", "true")
        .load(dir.getAbsolutePath).count()
    }
    assert(e.getMessage.contains("Malformed record-gzipped WARC") ||
      Option(e.getCause).exists(_.getMessage.contains("Malformed record-gzipped WARC")),
      s"corruption must fail loudly, got: ${e.getMessage}")
  }

  test("record_offset is the exact container address (plain and gz-member)") {
    // plain: seeking to record_offset must read THAT record's version line
    val plain = writeFixture("offsets")
    val rows = spark.read.format("warc").load(plain)
      .select(col("record_file"), col("record_offset"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // (file, offset) is unique — the CDX address
    assert(rows.distinct.length == rows.length)
    rows.foreach { case (file, off) =>
      val bytes = java.nio.file.Files.readAllBytes(
        new File(plain, file).toPath)
      assert(new String(bytes, off.toInt, 8, "ISO-8859-1") == "WARC/1.0",
        s"($file, $off) does not address a version line")
    }
    // gz: the offset addresses a gzip member start (magic bytes)
    val gzDir = new File("/root/repo/target/warc_spec/offsets_gz")
    WarcIO.writeWarc(fixtureDf.repartition(1), gzDir.getAbsolutePath,
      recordGzip = true)
    val gf = gzDir.listFiles().filter(_.getName.endsWith(".warc.gz")).head
    val gb = java.nio.file.Files.readAllBytes(gf.toPath)
    spark.read.format("warc").option("recordGzipSplit", "true")
      .load(gzDir.getAbsolutePath)
      .select(col("record_offset")).collect().map(_.getLong(0)).foreach { off =>
        assert((gb(off.toInt) & 0xff) == 0x1f && (gb(off.toInt + 1) & 0xff) == 0x8b,
          s"offset $off does not address a member start")
      }
  }

  test("split seek landing exactly on a record boundary neither dups nor drops") {
    // single-partition file, then force splits at every offset granularity
    val dir = new File("/root/repo/target/warc_spec/boundary")
    WarcIO.writeWarc(fixtureDf.repartition(1), dir.getAbsolutePath)
    val whole = collectAll(dir.getAbsolutePath, None)
    // record sizes vary; sweeping many split sizes guarantees some split
    // boundary lands exactly on a version line
    (50L to 400L by 7L).foreach { m =>
      assert(collectAll(dir.getAbsolutePath, Some(m)) == whole,
        s"maxSplitBytes=$m diverged")
    }
  }

  test("frame-zstd: frame-split reads equal the plain-file truth; split sweep") {
    val plain = writeFixture("zst_truth")
    val dir = new File("/root/repo/target/warc_spec/zst")
    WarcIO.writeWarc(fixtureDf.repartition(3), dir.getAbsolutePath,
      recordZstd = true)
    assert(dir.listFiles().exists(_.getName.endsWith(".warc.zst")))
    val whole = collectAll(plain, None)
    def zst(split: Option[Long]) = {
      val r = split.foldLeft(spark.read.format("warc")
        .option("recordZstdSplit", "true"))((b, m) =>
        b.option("maxSplitBytes", m.toString))
      r.load(dir.getAbsolutePath)
        .select(col("record_type"), col("record_id"), col("target_uri"),
          col("content_length"), md5(col("payload")).as("pmd5"))
        .collect()
        .map(x => (x.getString(0), x.getString(1), x.getString(2), x.getLong(3), x.getString(4)))
        .toSet
    }
    assert(zst(None) == whole)
    Seq(64L, 200L, 333L, 1024L).foreach { m =>
      assert(zst(Some(m)) == whole, s"zst maxSplitBytes=$m diverged")
    }
  }

  test("frame-zstd: planted magic inside payloads survives resync; bit-flip fails loudly") {
    import TestSpark.spark.implicits._
    val magic = Array(0x28.toByte, 0xb5.toByte, 0x2f.toByte, 0xfd.toByte)
    val rows = (0L until 12L).map { i =>
      val pre = s"HTTP/1.1 200 OK\r\n\r\nbody $i ".getBytes("US-ASCII")
      val post = s" tail $i".getBytes("US-ASCII")
      // every third payload embeds the raw zstd magic bytes
      val body = if (i % 3 == 0) pre ++ magic ++ post else pre ++ post
      ("response", s"<urn:uuid:z-$i>", "2024-01-01T00:00:00Z",
        s"https://fixture.test/z/$i", body)
    }.toDF("record_type", "record_id", "warc_date", "target_uri", "payload")
    val dir = new File("/root/repo/target/warc_spec/zst_magic")
    WarcIO.writeWarc(rows.repartition(1), dir.getAbsolutePath, recordZstd = true)
    def ids(split: Option[Long]) = {
      val r = split.foldLeft(spark.read.format("warc")
        .option("recordZstdSplit", "true"))((b, m) =>
        b.option("maxSplitBytes", m.toString))
      r.load(dir.getAbsolutePath).select("record_id").as[String].collect().toSet
    }
    val want = (0L until 12L).map(i => s"<urn:uuid:z-$i>").toSet
    assert(ids(None) == want)
    (40L to 200L by 13L).foreach { m =>
      assert(ids(Some(m)) == want, s"split=$m diverged under planted magic")
    }
    // flip one byte mid-file: the frame checksum must reject the frame
    // loudly (strict walk from a true frame start), never ship bad bytes
    val f = dir.listFiles().filter(_.getName.endsWith(".warc.zst")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0x40).toByte
    java.nio.file.Files.write(f.toPath, bytes)
    // drop Hadoop's local-FS checksum sidecar so the ZSTD frame checksum
    // is the layer under test (the gzip twin's discipline)
    new File(f.getParentFile, "." + f.getName + ".crc").delete()
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("warc").option("recordZstdSplit", "true")
        .load(dir.getAbsolutePath).count()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.getMessage != null &&
      c.getMessage.contains("Malformed frame-zstd")), s"got: $e")
  }

  test("cdx: every record fetched THROUGH the index, both container layouts") {
    import graft.sources.warc.CdxIndex
    for (gz <- Seq(false, true)) {
      val tag = if (gz) "gz" else "plain"
      val dir = new File(s"/root/repo/target/warc_spec/cdx_$tag")
      WarcIO.writeWarc(fixtureDf.repartition(3), dir.getAbsolutePath, recordGzip = gz)
      val warc = spark.read.format("warc")
        .option("recordGzipSplit", gz.toString).load(dir.getAbsolutePath)
      val cdx = CdxIndex.cdxRecords(warc)
      val idxDir = new File(s"/root/repo/target/warc_spec/cdx_${tag}_idx").getAbsolutePath
      CdxIndex.writeCdxj(cdx, idxDir, numShards = 3)
      val back = CdxIndex.readCdxj(spark, idxDir)
      // responses only — the index is the response address book
      val nResp = fixtureDf.filter(col("record_type") === "response").count()
      assert(back.count() == nResp)
      // fetch EVERY indexed record through its (file, offset) address and
      // prove the served payload digest equals the indexed digest AND the
      // digest of the original dataframe row
      val addrs = back.select(
        regexp_extract(col("target_uri"), "/p/(\\d+)$", 1).cast("long").as("probe_id"),
        col("record_file"), col("record_offset"))
      val served = CdxIndex.fetchRecords(addrs, dir.getAbsolutePath, gzMembers = gz)
        .select(col("probe_id"), col("record_id"),
          md5(col("payload")).as("served_md5"))
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
      val want = fixtureDf.filter(col("record_type") === "response")
        .select(regexp_extract(col("target_uri"), "/p/(\\d+)$", 1).cast("long"),
          col("record_id"), md5(col("payload")))
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
      assert(served == want, s"layout=$tag served records diverged")
    }
  }

  test("cdx: CDXJ shards are globally sorted; a bad address fails loudly") {
    import graft.sources.warc.CdxIndex
    val dir = new File("/root/repo/target/warc_spec/cdx_sort")
    WarcIO.writeWarc(fixtureDf.repartition(3), dir.getAbsolutePath, recordGzip = true)
    val warc = spark.read.format("warc")
      .option("recordGzipSplit", "true").load(dir.getAbsolutePath)
    val idxDir = new File("/root/repo/target/warc_spec/cdx_sort_idx")
    CdxIndex.writeCdxj(CdxIndex.cdxRecords(warc), idxDir.getAbsolutePath,
      numShards = 3)
    // concatenating part files in NAME order must yield one sorted key
    // stream (range partitioning gives shards disjoint ascending ranges)
    val keys = idxDir.listFiles().filter(_.getName.startsWith("part-"))
      .sortBy(_.getName)
      .flatMap(f => scala.io.Source.fromFile(f, "UTF-8").getLines()
        .map(_.split(" ", 3).take(2).mkString(" ")).toArray)
    assert(keys.nonEmpty && keys.sameElements(keys.sorted),
      "CDXJ shard concatenation is not globally sorted")
    // an offset pointing mid-member is index/container drift → loud
    import TestSpark.spark.implicits._
    val bogus = Seq((0L, "part-00000.warc.gz", 7L))
      .toDF("probe_id", "record_file", "record_offset")
    val e = intercept[org.apache.spark.SparkException] {
      CdxIndex.fetchRecords(bogus, dir.getAbsolutePath, gzMembers = true).collect()
    }
    assert(e.getMessage.contains("drift") ||
      Option(e.getCause).exists(_.getMessage.contains("drift")))
  }

  test("revisit records: dedup round-trip is byte-lossless, profile header present") {
    import TestSpark.spark.implicits._
    // 12 captures of 4 distinct payloads (3 captures each)
    val rows = (0L until 12L).map { i =>
      // payloads must dwarf the ~200-byte revisit header for the
      // shrinkage assertion to be meaningful (real pages are KB+)
      val body = (s"HTTP/1.1 200 OK\r\n\r\n" +
        s"shared body ${i / 3} content " * 100).getBytes("US-ASCII")
      ("response", f"<urn:uuid:r-$i%02d>", "2024-01-01T00:00:00Z",
        s"https://fixture.test/p/$i", body)
    }.toDF("record_type", "record_id", "warc_date", "target_uri", "payload")
    val dir = new File("/root/repo/target/warc_spec/revisit")
    val deduped = WarcIO.revisitize(rows)
    WarcIO.writeWarc(deduped.repartition(1), dir.getAbsolutePath)
    val back = spark.read.format("warc").load(dir.getAbsolutePath)
    // container stores each payload once: 8 revisits with EMPTY payloads,
    // refers_to = the min-record_id capture of the group
    val revs = back.filter(col("record_type") === "revisit")
      .select("record_id", "refers_to", "content_length").collect()
    assert(revs.length == 8)
    assert(revs.forall(_.getLong(2) == 0L))
    revs.foreach { r =>
      val i = r.getString(0).stripPrefix("<urn:uuid:r-").stripSuffix(">").toInt
      assert(r.getString(1) == f"<urn:uuid:r-${(i / 3) * 3}%02d>",
        s"wrong canonical pointer for $i: ${r.getString(1)}")
    }
    // the profile header is real container bytes, not just schema
    val f = dir.listFiles().filter(_.getName.endsWith(".warc")).head
    val raw = new String(java.nio.file.Files.readAllBytes(f.toPath), "ISO-8859-1")
    assert(raw.contains(
      "WARC-Profile: http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"))
    // resolution reproduces every original payload byte-exactly
    val resolved = WarcIO.resolveRevisits(back)
      .select(col("record_id"), md5(col("payload")).as("m"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val want = rows.select(col("record_id"), md5(col("payload")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(resolved == want)
    // and the dedup genuinely shrank the container vs writing raw
    val rawDir = new File("/root/repo/target/warc_spec/revisit_raw")
    WarcIO.writeWarc(rows.repartition(1), rawDir.getAbsolutePath)
    def sz(d: File) = d.listFiles().filter(_.getName.endsWith(".warc")).map(_.length).sum
    assert(sz(dir) < sz(rawDir), s"${sz(dir)} !< ${sz(rawDir)}")
  }

  test("header injection: CR/LF and non-ASCII in values are percent-encoded") {
    // crawl data is attacker-influenced — a raw CRLF in target_uri would
    // inject a forged header line and break the container framing
    val dir = new File("/root/repo/target/warc_spec/inject")
    val hostile = Seq(
      ("response", "<urn:uuid:evil-0>", "2024-01-01T00:00:00Z",
        "https://evil.test/a\r\nWARC-Type: warcinfo\r\nX-Forged: 1",
        "payload zero".getBytes("US-ASCII")),
      ("response", "<urn:uuid:evil-1>", "2024-01-01T00:00:00Z",
        "https://évïl.test/ü", // non-ASCII IRI: must not mangle to '?'
        "payload one".getBytes("US-ASCII")),
      ("response", "<urn:uuid:ok-2>", "2024-01-01T00:00:00Z",
        "https://ok.test/p%20q", // pre-encoded '%' passes through untouched
        "payload two".getBytes("US-ASCII")))
      .toDF("record_type", "record_id", "warc_date", "target_uri", "payload")
    WarcIO.writeWarc(hostile.repartition(1), dir.getAbsolutePath)
    val got = spark.read.format("warc").load(dir.getAbsolutePath)
      .select("record_id", "record_type", "target_uri", "payload")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getString(2), new String(r.getAs[Array[Byte]](3), "US-ASCII")))
      .toMap
    assert(got.size == 3) // framing intact: exactly 3 records, none forged
    val (t0, u0, p0) = got("<urn:uuid:evil-0>")
    assert(t0 == "response" && p0 == "payload zero")
    assert(!u0.contains("\r") && !u0.contains("\n"))
    assert(u0 == "https://evil.test/a%0D%0AWARC-Type: warcinfo%0D%0AX-Forged: 1")
    val (_, u1, _) = got("<urn:uuid:evil-1>")
    assert(u1 == "https://%C3%A9v%C3%AFl.test/%C3%BC") // UTF-8 byte escapes
    val (_, u2, _) = got("<urn:uuid:ok-2>")
    assert(u2 == "https://ok.test/p%20q") // clean ASCII: byte-exact
  }

  test("streaming: a file landing out of order fails loudly, not silently") {
    import org.apache.spark.sql.streaming.Trigger
    val base = new File("/root/repo/target/warc_spec/ooo")
    org.apache.commons.io.FileUtils.deleteQuietly(base)
    val inDir = new File(base, "in"); inDir.mkdirs()
    val outDir = new File(base, "out").getAbsolutePath
    val ckpt = new File(base, "ckpt").getAbsolutePath
    def land(prefix: String): Unit = {
      val stage = new File(base, s"stage-$prefix")
      WarcIO.writeWarc(fixtureDf.repartition(1), stage.getAbsolutePath)
      stage.listFiles().filter(_.getName.endsWith(".warc")).foreach { f =>
        java.nio.file.Files.move(f.toPath,
          new File(inDir, s"$prefix-${f.getName}").toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    def drain(): Unit = {
      val q = spark.readStream.format("warc").load(inDir.getAbsolutePath)
        .select("record_id")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    land("b"); drain() // offset advances to the 'b' file
    land("a")          // lexicographically BEFORE the checkpointed offset
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c => c.isInstanceOf[IllegalStateException] &&
      c.getMessage.contains("OUT OF ORDER")),
      s"expected the loud out-of-order failure, got: $ex")
  }

  test("takedown purge: listed URIs gone, tombstones complete, survivors byte-lossless (r15)") {
    // run the query once; then audit the artifacts it left behind
    SparkEntry.queries("q_takedown_purge")(spark, TestSpark.Sf0001).collect()
    val base = "/root/repo/target/takedown/sf0.001"
    def read(dir: String) = spark.read.format("warc")
      .option("recordGzipSplit", "true").load(dir)
      .select(col("target_uri"), col("record_id"), md5(col("payload")).as("d"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val orig = read(base + "/orig")
    val purged = read(base + "/purged")
    val tomb = spark.read.parquet(base + "/tombstones")
      .select(col("target_uri"), col("record_id"), col("reason"), col("digest"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))

    val listed = orig.map(_._1).distinct
      .filter(_.matches(".*/(\\d+)$"))
      .filter(u => u.substring(u.lastIndexOf('/') + 1).toLong % 17 == 5)
      .toSet
    assert(listed.nonEmpty, "fixture must contain takedown URIs")
    // 1) the purged container is LITERALLY free of listed URIs
    assert(!purged.exists(r => listed.contains(r._1)))
    // 2) mass conservation: every original record is either kept or tombstoned
    assert(orig.length == purged.length + tomb.length)
    // 3) tombstone completeness: each listed URI exactly twice (resp + req),
    //    with the original payload digests
    val tombByUri = tomb.groupBy(_._1)
    assert(tombByUri.keySet == listed)
    tombByUri.foreach { case (uri, rows) =>
      assert(rows.length == 2, s"$uri must tombstone both records")
      val origD = orig.filter(_._1 == uri).map(r => (r._2, r._3)).sorted.toSeq
      assert(rows.map(r => (r._2, r._4)).sorted.toSeq == origD,
        s"$uri tombstone digests must match the original payloads")
      val wantReason =
        if (uri.substring(uri.lastIndexOf('/') + 1).toLong % 2 == 0) "copyright"
        else "privacy"
      assert(rows.forall(_._3 == wantReason))
    }
    // 4) survivors are byte-identical (same record ids, same digests)
    assert(purged.map(r => (r._2, r._3)).sorted.toSeq ==
      orig.filter(r => !listed.contains(r._1)).map(r => (r._2, r._3)).sorted.toSeq)
    CacheScope.release()
  }
}
