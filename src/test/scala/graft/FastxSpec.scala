package graft

import java.io.{File, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import graft.sources.fastx.{FastxParser, PosLineReader}

/** FASTX fixtures from FIXTURES.md §A: multi-line FASTA, FASTQ with
  * `@`-leading quality, gzip, CRLF, no trailing newline. Parser semantics
  * pinned against needletail behavior (SURVEY §1.1): header keeps the
  * description; multi-line sequences concatenate; FASTQ parsed positionally.
  */
object FastxFixtures {
  lazy val dir: File = {
    val d = Files.createTempDirectory("fastx_fixtures").toFile
    d.deleteOnExit()
    write(d, "tiny.fasta",
      ">id1 first record\nACGT\n>id2\nacg\ntNNa\nCC\n>id3 desc with  spaces\nGGGG\n")
    write(d, "tiny.fastq",
      "@r1 desc\nACGT\n+\n!!!!\n@r2\nNNNN\n+r2\n@@@@\n@r3\nAC\n+\n#!\n")
    write(d, "edge.fasta",
      ">empty\n>allN\nNNNN\n>len5\nACGTA\n>lower\nacgt\n")
    write(d, "crlf.fasta", ">a one\r\nACGT\r\nTT\r\n>b\r\nGG") // no trailing newline
    gzip(d, "tiny.fasta.gz",
      ">id1 first record\nACGT\n>id2\nacg\ntNNa\nCC\n>id3 desc with  spaces\nGGGG\n")
    d
  }

  private def write(d: File, name: String, content: String): Unit =
    Files.write(new File(d, name).toPath, content.getBytes(StandardCharsets.UTF_8))

  private def gzip(d: File, name: String, content: String): Unit = {
    val out = new GZIPOutputStream(new FileOutputStream(new File(d, name)))
    out.write(content.getBytes(StandardCharsets.UTF_8)); out.close()
  }

  def path(name: String): String = new File(dir, name).getAbsolutePath
}

class FastxParserSpec extends SparkSpec {

  private def parseFasta(content: String): Seq[(String, String)] = {
    val in = new java.io.ByteArrayInputStream(content.getBytes(StandardCharsets.UTF_8))
    FastxParser.fastaRecords(new PosLineReader(in)).map(r => (r.header, r.sequence)).toSeq
  }

  test("multi-line FASTA concatenates; header keeps description") {
    val rs = parseFasta(">id1 first record\nACGT\n>id2\nacg\ntNNa\nCC\n")
    assert(rs == Seq(("id1 first record", "ACGT"), ("id2", "acgtNNaCC")))
  }

  test("CRLF and missing trailing newline") {
    val rs = parseFasta(">a one\r\nACGT\r\nTT\r\n>b\r\nGG")
    assert(rs == Seq(("a one", "ACGTTT"), ("b", "GG")))
  }

  test("empty sequence record") {
    val rs = parseFasta(">empty\n>next\nAC\n")
    assert(rs == Seq(("empty", ""), ("next", "AC")))
  }

  test("FASTQ positional parse tolerates @-leading quality lines") {
    val content = "@r1 desc\nACGT\n+\n!!!!\n@r2\nNNNN\n+r2\n@@@@\n@r3\nAC\n+\n#!\n"
    val in = new java.io.ByteArrayInputStream(content.getBytes(StandardCharsets.UTF_8))
    val rs = FastxParser.fastqRecords(new PosLineReader(in))
      .map(r => (r.header, r.sequence, r.quality)).toSeq
    assert(rs == Seq(("r1 desc", "ACGT", "!!!!"), ("r2", "NNNN", "@@@@"), ("r3", "AC", "#!")))
  }

  test("format sniff: > fasta, @ fastq, other rejected") {
    assert(FastxParser.sniffFormat('>') == "fasta")
    assert(FastxParser.sniffFormat('@') == "fastq")
    intercept[IllegalArgumentException](FastxParser.sniffFormat('A'))
  }

  test("split ownership: each record parsed exactly once across any split point") {
    val content = ">r0 x\nAAAA\nCC\n>r1\nGGGG\n>r2 yy\nTT\nTT\n>r3\nACGT\n"
    val bytes = content.getBytes(StandardCharsets.UTF_8)
    val whole = parseFasta(content)
    // every possible 2-way split boundary must preserve the record set
    for (cut <- 1 until bytes.length) {
      def reader(start: Int): PosLineReader = {
        val in = new java.io.ByteArrayInputStream(bytes, start, bytes.length - start)
        new PosLineReader(in, start)
      }
      // split 1: [0, cut) — owns records whose '>' starts at offset <= cut
      val r1 = FastxParser.fastaRecords(reader(0), cut).map(r => (r.header, r.sequence)).toSeq
      // split 2: [cut, len) — discard partial first line, own the rest
      val rd2 = reader(cut)
      rd2.readLine()
      val r2 = FastxParser.fastaRecords(rd2, bytes.length.toLong).map(r => (r.header, r.sequence)).toSeq
      assert(r1 ++ r2 == whole, s"cut=$cut r1=$r1 r2=$r2")
    }
  }

  test("FASTQ split ownership: exactly-once across any split point, @/+ quality") {
    // strict 4-line records with adversarial quality lines: '@'-leading
    // (fake header), '+'-leading (fake separator), and a quality line that
    // IS a plausible '@name' string — the resync must reject all of them
    val content =
      "@r0 x\nACGT\n+\n@@+!\n" +
      "@r1\nGGTTA\n+r1\n+@!!!\n" +
      "@r2\nAC\n+\n@x\n" +
      "@r3\nACGTN\n+\n@!+~I\n" +
      "@r4\nT\n+\n~\n"
    val bytes = content.getBytes(StandardCharsets.UTF_8)
    val wholeIn = new java.io.ByteArrayInputStream(bytes)
    val whole = FastxParser.fastqRecords(new PosLineReader(wholeIn))
      .map(r => (r.header, r.sequence, r.quality)).toSeq
    assert(whole.length == 5)
    for (cut <- 1 until bytes.length) {
      def reader(start: Int): PosLineReader = {
        val in = new java.io.ByteArrayInputStream(bytes, start, bytes.length - start)
        new PosLineReader(in, start)
      }
      // split 1: [0, cut) — record start at offset 0, owns headers <= cut
      val r1 = FastxParser.fastqRecordsSplit(reader(0), cut, resync = false)
        .map(r => (r.header, r.sequence, r.quality)).toSeq
      // split 2: [cut, len) — discard partial first line, resync, own rest
      val rd2 = reader(cut)
      rd2.readLine()
      val r2 = FastxParser.fastqRecordsSplit(rd2, bytes.length.toLong, resync = true)
        .map(r => (r.header, r.sequence, r.quality)).toSeq
      assert(r1 ++ r2 == whole, s"cut=$cut r1=$r1 r2=$r2")
    }
  }
}

class FastxConnectorSpec extends SparkSpec {

  test("schema sniff: FASTA 2 columns, FASTQ 3 columns") {
    val fa = spark.read.format("fastx").load(FastxFixtures.path("tiny.fasta"))
    assert(fa.columns.toSeq == Seq("header", "sequence"))
    val fq = spark.read.format("fastx").load(FastxFixtures.path("tiny.fastq"))
    assert(fq.columns.toSeq == Seq("header", "sequence", "quality"))
  }

  test("FASTA rows: multi-line concat, case preserved, descriptions kept") {
    val rows = spark.read.format("fastx").load(FastxFixtures.path("tiny.fasta"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(
      ("id1 first record", "ACGT"),
      ("id2", "acgtNNaCC"),
      ("id3 desc with  spaces", "GGGG")))
  }

  test("FASTQ rows incl. @-leading quality") {
    val rows = spark.read.format("fastx").load(FastxFixtures.path("tiny.fastq"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(rows == Seq(
      ("r1 desc", "ACGT", "!!!!"), ("r2", "NNNN", "@@@@"), ("r3", "AC", "#!")))
  }

  test("gzip transparent decompression parity") {
    val plain = spark.read.format("fastx").load(FastxFixtures.path("tiny.fasta")).collect()
    val gz = spark.read.format("fastx").load(FastxFixtures.path("tiny.fasta.gz")).collect()
    assert(plain.toSeq == gz.toSeq)
  }

  test("CRLF + no trailing newline") {
    val rows = spark.read.format("fastx").load(FastxFixtures.path("crlf.fasta"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(("a one", "ACGTTT"), ("b", "GG")))
  }

  test("column pruning pushes into the scan") {
    val df = spark.read.format("fastx").load(FastxFixtures.path("tiny.fasta"))
      .select("header")
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("id1 first record", "id2", "id3 desc with  spaces"))
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("cols=header"), s"pruning not visible in plan:\n$physical")
  }

  test("splittable FASTA: many tiny splits return the same rows as one") {
    // 500 records, some multi-line, ~30 bytes each
    val sb = new StringBuilder
    for (i <- 0 until 500) {
      sb.append(s">rec$i desc$i\n")
      sb.append("ACGTN" * (1 + i % 3)).append("\n")
      if (i % 4 == 0) sb.append("ggcc\n")
    }
    val f = new File(FastxFixtures.dir, "big.fasta")
    Files.write(f.toPath, sb.toString.getBytes(StandardCharsets.UTF_8))
    val whole = spark.read.format("fastx").load(f.getAbsolutePath)
      .collect().map(_.toSeq).toSet
    for (split <- Seq(64, 257, 1000, 4096)) {
      val parts = spark.read.format("fastx").option("maxSplitBytes", split.toString)
        .load(f.getAbsolutePath)
      val rows = parts.collect().map(_.toSeq)
      assert(rows.length == 500, s"split=$split returned ${rows.length} rows")
      assert(rows.toSet == whole, s"split=$split row mismatch")
      assert(parts.rdd.getNumPartitions > 1, s"split=$split did not split")
    }
  }

  test("splittable FASTQ: many tiny splits return the same rows as one") {
    // 500 strict-4-line records with '@'/'+'-leading quality lines — every
    // split boundary class (mid-header, mid-sequence, on the separator,
    // mid-quality, between records) occurs across these split sizes
    val rnd = new scala.util.Random(23)
    val sb = new StringBuilder
    for (i <- 0 until 500) {
      val len = 1 + rnd.nextInt(40)
      val seq = (0 until len).map(_ => "ACGTN".charAt(rnd.nextInt(5))).mkString
      val qual = (0 until len).map(_ => ('!' + rnd.nextInt(94)).toChar).mkString
      sb.append(s"@sq$i d$i\n$seq\n${if (i % 3 == 0) "+" else s"+sq$i"}\n$qual\n")
    }
    val f = new File(FastxFixtures.dir, "big.fastq")
    Files.write(f.toPath, sb.toString.getBytes(StandardCharsets.UTF_8))
    val whole = spark.read.format("fastx").load(f.getAbsolutePath)
      .collect().map(_.toSeq).toSet
    assert(whole.size == 500)
    for (split <- Seq(64, 257, 1000, 4096)) {
      val parts = spark.read.format("fastx").option("maxSplitBytes", split.toString)
        .load(f.getAbsolutePath)
      val rows = parts.collect().map(_.toSeq)
      assert(rows.length == 500, s"split=$split returned ${rows.length} rows")
      assert(rows.toSet == whole, s"split=$split row mismatch")
      assert(parts.rdd.getNumPartitions > 1, s"split=$split did not split")
    }
  }

  test("fastqSplit=false forces one partition per FASTQ file") {
    val f = new File(FastxFixtures.dir, "nosplit.fastq")
    val sb = new StringBuilder
    for (i <- 0 until 200) sb.append(s"@n$i\nACGT\n+\n!@+~\n")
    Files.write(f.toPath, sb.toString.getBytes(StandardCharsets.UTF_8))
    val df = spark.read.format("fastx")
      .option("maxSplitBytes", "500").option("fastqSplit", "false")
      .load(f.getAbsolutePath)
    assert(df.rdd.getNumPartitions == 1)
    assert(df.count() == 200)
  }

  test("empty FASTA file yields zero rows") {
    val f = new File(FastxFixtures.dir, "empty.fasta")
    Files.write(f.toPath, Array.emptyByteArray)
    assert(spark.read.format("fastx").load(f.getAbsolutePath).count() == 0)
  }

  test("filter pushdown: evaluated in the reader across splits, same rows") {
    val sb = new StringBuilder
    for (i <- 0 until 400) {
      sb.append(s">${if (i % 7 == 0) "keep" else "drop"}$i\n")
      sb.append("ACGT" * (1 + i % 5)).append("\n")
    }
    val f = new File(FastxFixtures.dir, "filterpush.fasta")
    Files.write(f.toPath, sb.toString.getBytes(StandardCharsets.UTF_8))
    val expected = (0 until 400 by 7).map(i => s"keep$i").toSet
    for (split <- Seq(128, 1 << 20)) {
      val df = spark.read.format("fastx").option("maxSplitBytes", split.toString)
        .load(f.getAbsolutePath)
        .filter(org.apache.spark.sql.functions.col("header").startsWith("keep"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") && plan.contains("StringStartsWith"),
        s"filter not pushed into fastx scan:\n$plan")
      assert(df.collect().map(_.getString(0)).toSet == expected, s"split=$split rows wrong")
    }
  }

  test("filter + limit pushdown: limit counts post-predicate rows") {
    // 100 records, every other header matches; limit 10 after filter must
    // return 10 matching rows (the reference under-delivers here, §0.1.5)
    val sb = new StringBuilder
    for (i <- 0 until 100)
      sb.append(s">${if (i % 2 == 0) "m" else "x"}$i\nAC\n")
    val f = new File(FastxFixtures.dir, "limitpush.fasta")
    Files.write(f.toPath, sb.toString.getBytes(StandardCharsets.UTF_8))
    val rows = spark.read.format("fastx").load(f.getAbsolutePath)
      .filter(org.apache.spark.sql.functions.col("header").startsWith("m"))
      .limit(10).collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getString(0).startsWith("m")))
  }
}

class FastaStatsSpec extends SparkSpec {

  test("fasta_stats pipeline: fields, filters, nested-to-json, TSV golden") {
    val out = Files.createTempDirectory("fasta_stats_out").toFile
    FastaStats.run(spark, FastxFixtures.path("tiny.fasta"), out.getAbsolutePath,
      fields = Seq("header", "length", "gc_content", "n_count", "hash", "codon_usage", "bogus"),
      minLen = 4, maxLen = 0, k = 3, hashLen = 8)
    val lines = new File(out, ".").listFiles().filter(_.getName.endsWith(".csv"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines().toSeq).toSeq
    val header = lines.head
    assert(header == "header\tlength\tgc_content\tn_count\thash\tcodon_usage")
    val data = lines.tail.sorted
    // id2 len 9 (acgtNNaCC), id1/id3 len 4; minLen=4 keeps all 3
    assert(data.length == 3)
    val id1 = data.find(_.startsWith("id1")).get.split("\t")
    assert(id1(1) == "4")
    assert(id1(2) == "0.5") // G,C of "ACGT" -> 2/4
    // codon_usage of ACGT -> {"ACG":1.0}; Spark CSV escapes inner quotes
    // with backslashes: "{\"ACG\":1.0}"
    assert(id1(5) == "\"{\\\"ACG\\\":1.0}\"", s"got: ${id1(5)}")
  }

  test("stats honors truthiness: minLen=0 disables the bound") {
    val df = FastaStats.stats(spark, FastxFixtures.path("edge.fasta"),
      fields = Seq("header", "length"), minLen = 0)
    assert(df.count() == 4) // includes the empty-sequence record
  }
}

class FastxIOSpec extends SparkSpec {
  test("typed records veneer: FASTA yields null quality, FASTQ keeps it") {
    val fa = FastxIO.records(spark, FastxFixtures.path("tiny.fasta")).collect()
    assert(fa.length == 3 && fa.forall(_.quality == null))
    assert(fa.head == graft.sources.fastx.FastxRecord("id1 first record", "ACGT", null))
    val fq = FastxIO.records(spark, FastxFixtures.path("tiny.fastq")).collect()
    assert(fq.length == 3 && fq.forall(_.quality != null))
  }

  test("scanFastx/readFastx are the same lazy scan") {
    val a = FastxIO.scanFastx(spark, FastxFixtures.path("tiny.fasta")).collect()
    val b = FastxIO.readFastx(spark, FastxFixtures.path("tiny.fasta")).collect()
    assert(a.toSeq == b.toSeq)
  }

  test("writeFasta roundtrip: wrap edges, descriptions, multi-partition") {
    val ss = spark
    import ss.implicits._
    // lengths straddle the wrap boundary: 0 < w-1 < w < w+1 < 2w multiples
    val rows = Seq(
      ("a desc kept", "ACGT" * 3),         // 12 = 2×wrap(6)
      ("b", "ACGTA"),                      // wrap-1
      ("c", "ACGTAC"),                     // exactly wrap
      ("d", "ACGTACG"),                    // wrap+1
      ("e", "A" * 20))                     // several lines
    val df = rows.toDF("header", "sequence").repartition(3)
    val dir = Files.createTempDirectory("fasta_sink").toFile.getAbsolutePath
    FastxIO.writeFasta(df, dir, wrap = 6)
    val back = FastxIO.scanFastx(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(back == rows.toSet)
    // no blank lines (exact-multiple wrap must not emit a trailing break)
    val lines = new File(dir).listFiles.filter(_.getName.startsWith("part-"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines().toSeq)
    assert(lines.forall(_.nonEmpty), s"blank line in output: ${lines.toSeq}")
  }

  test("writeFastq roundtrip: @/+ leading quality lines, multi-partition") {
    val ss = spark
    import ss.implicits._
    // qualities deliberately start with '@' and '+' — the framing ambiguity
    // the 4-line reader must disambiguate
    val rows = Seq(
      ("q1 desc", "ACGTACGT", "@IIIIIII"),
      ("q2", "ACGT", "+@II"),
      ("q3", "A", "@"),
      ("q4", "ACGTN", "IIIII"))
    val df = rows.toDF("header", "sequence", "quality").repartition(3)
    val dir = Files.createTempDirectory("fastq_sink").toFile.getAbsolutePath
    FastxIO.writeFastq(df, dir)
    val back = FastxIO.scanFastx(spark, dir)
      .select("header", "sequence", "quality")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(back == rows.toSet)
  }

  test("writeFastq rejects quality/sequence length mismatch") {
    val ss = spark
    import ss.implicits._
    val df = Seq(("bad", "ACGT", "III")).toDF("header", "sequence", "quality")
    val dir = Files.createTempDirectory("fastq_sink_bad").toFile.getAbsolutePath
    val e = intercept[Exception] { FastxIO.writeFastq(df, dir) }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("writeFastq")), s"got: ${messages(e)}")
  }
}

class FastxFuzzSpec extends SparkSpec {

  test("CRLF straddling the 64KB reader buffer boundary") {
    // place the \r at exactly byte 65535 so \n lands in the next buffer fill
    val pad = 65535 - ">x\r\n>".length - 2
    val content = ">x\r\n>" + ("A" * 0) + "h" + ("e" * pad) + "\r\nACGT\r\n>tail\r\nGG\r\n"
    val in = new java.io.ByteArrayInputStream(content.getBytes(StandardCharsets.UTF_8))
    val rs = FastxParser.fastaRecords(new PosLineReader(in))
      .map(r => (r.header, r.sequence)).toSeq
    assert(rs.length == 3)
    assert(rs(1)._2 == "ACGT" && rs(2) == (("tail", "GG")))
    assert(!rs.exists { case (h, s) => h.contains("\r") || s.contains("\r") })
  }

  test("random FASTA roundtrip: generated records -> file -> connector -> identical") {
    val rnd = new scala.util.Random(7)
    val records = (0 until 300).map { i =>
      val header = s"r$i " + rnd.alphanumeric.take(rnd.nextInt(20)).mkString
      val seq = (0 until (1 + rnd.nextInt(5))).map { _ =>
        val len = rnd.nextInt(80)
        (0 until len).map(_ => "ACGTNacgtn".charAt(rnd.nextInt(10))).mkString
      }
      (header.trim, seq)
    }
    val content = records.map { case (h, lines) =>
      s">$h\n" + lines.map(_ + "\n").mkString
    }.mkString
    val f = new File(FastxFixtures.dir, "fuzz.fasta")
    Files.write(f.toPath, content.getBytes(StandardCharsets.UTF_8))
    val expected = records.map { case (h, lines) => (h, lines.mkString) }
    for (split <- Seq(Int.MaxValue, 997)) {
      val got = spark.read.format("fastx").option("maxSplitBytes", split.toString)
        .load(f.getAbsolutePath)
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      assert(got.toSet == expected.toSet, s"split=$split")
      assert(got.length == expected.length, s"split=$split")
    }
  }

  test("random writeFasta roundtrip: generated rows -> sink -> scan -> identical") {
    val ss = spark
    import ss.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (0 until 250).map { i =>
      val header = s"w$i " + rnd.alphanumeric.take(rnd.nextInt(15)).mkString
      val len = rnd.nextInt(200) // includes 0 and wrap multiples
      val seq = (0 until len).map(_ => "ACGTNacgtn".charAt(rnd.nextInt(10))).mkString
      (header.trim, seq)
    }
    val dir = Files.createTempDirectory("fasta_sink_fuzz").toFile.getAbsolutePath
    FastxIO.writeFasta(rows.toDF("header", "sequence").repartition(5), dir, wrap = 60)
    for (split <- Seq(Int.MaxValue, 997)) {
      val got = spark.read.format("fastx").option("maxSplitBytes", split.toString)
        .load(dir)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(got == rows.toSet, s"split=$split")
    }
  }

  test("random writeFastq roundtrip: generated rows -> sink -> scan -> identical") {
    val ss = spark
    import ss.implicits._
    val rnd = new scala.util.Random(17)
    val rows = (0 until 200).map { i =>
      val len = 1 + rnd.nextInt(80)
      val seq = (0 until len).map(_ => "ACGTNacgtn".charAt(rnd.nextInt(10))).mkString
      // full printable Phred range — '@' and '+' leading chars included
      val qual = (0 until len).map(_ => ('!' + rnd.nextInt(94)).toChar).mkString
      val header = s"f$i " + rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      (header.trim, seq, qual)
    }
    val dir = Files.createTempDirectory("fastq_sink_fuzz").toFile.getAbsolutePath
    FastxIO.writeFastq(rows.toDF("header", "sequence", "quality").repartition(5), dir)
    val got = spark.read.format("fastx").load(dir)
      .select("header", "sequence", "quality")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == rows.toSet)
  }

  test("random FASTQ roundtrip incl. @ and + in quality strings") {
    val rnd = new scala.util.Random(11)
    val records = (0 until 200).map { i =>
      val len = 1 + rnd.nextInt(60)
      val seq = (0 until len).map(_ => "ACGTN".charAt(rnd.nextInt(5))).mkString
      // quality over the printable Phred range '!'..'~' — includes '@' and '+'
      val qual = (0 until len).map(_ => ('!' + rnd.nextInt(94)).toChar).mkString
      (s"q$i", seq, qual)
    }
    val content = records.map { case (h, s, q) => s"@$h\n$s\n+\n$q\n" }.mkString
    val f = new File(FastxFixtures.dir, "fuzz.fastq")
    Files.write(f.toPath, content.getBytes(StandardCharsets.UTF_8))
    for (split <- Seq(Int.MaxValue, 997, 64)) {
      val got = spark.read.format("fastx").option("maxSplitBytes", split.toString)
        .load(f.getAbsolutePath)
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
      assert(got == records, s"split=$split")
    }
  }
}

class FastxMultiFileSpec extends SparkSpec {
  test("directory and glob loads read all files, sorted by path") {
    val d = Files.createTempDirectory("fastx_multi").toFile
    Files.write(new File(d, "a.fasta").toPath, ">a1\nAC\n>a2\nGT\n".getBytes(StandardCharsets.UTF_8))
    Files.write(new File(d, "b.fasta").toPath, ">b1\nTT\n".getBytes(StandardCharsets.UTF_8))
    val fromDir = spark.read.format("fastx").load(d.getAbsolutePath)
      .collect().map(_.getString(0)).toSeq
    assert(fromDir == Seq("a1", "a2", "b1"))
    val fromGlob = spark.read.format("fastx").load(d.getAbsolutePath + "/*.fasta")
      .collect().map(_.getString(0)).toSeq
    assert(fromGlob == Seq("a1", "a2", "b1"))
  }

  test("mixed FASTA/FASTQ directory fails fast with a clear error") {
    val d = Files.createTempDirectory("fastx_mixed").toFile
    Files.write(new File(d, "a.fasta").toPath, ">a1\nAC\n".getBytes(StandardCharsets.UTF_8))
    Files.write(new File(d, "b.fastq").toPath, "@r1\nAC\n+\n!!\n".getBytes(StandardCharsets.UTF_8))
    val e = intercept[Exception] {
      spark.read.format("fastx").load(d.getAbsolutePath).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("mixed FASTA/FASTQ")), s"got: ${msgs(e)}")
  }

  test("Spark-written text directory scans cleanly (_SUCCESS/.crc skipped)") {
    val d = Files.createTempDirectory("fastx_sparkdir").toFile.getAbsolutePath
    val ss = spark
    import ss.implicits._
    Seq(">w1 a\nACGT", ">w2 b\nGG\nTT").toDF("value")
      .repartition(2).write.mode("overwrite").text(d)
    val rows = spark.read.format("fastx").load(d)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(("w1 a", "ACGT"), ("w2 b", "GGTT")))
  }

  test("malformed FASTQ surfaces a clear error") {
    val d = Files.createTempDirectory("fastx_bad").toFile
    Files.write(new File(d, "bad.fastq").toPath,
      "@r1\nACGT\nNOPLUS\n!!!!\n".getBytes(StandardCharsets.UTF_8))
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("fastx").load(new File(d, "bad.fastq").getAbsolutePath).collect()
    }
    assert(e.getMessage.contains("Malformed FASTQ") ||
      Option(e.getCause).exists(_.getMessage.contains("Malformed FASTQ")))
  }
}

class FastxBzip2Spec extends SparkSpec {
  test("bzip2 transparent decompression parity") {
    val content = ">id1 first record\nACGT\n>id2\nacg\ntNNa\nCC\n"
    val f = new File(FastxFixtures.dir, "tiny.fasta.bz2")
    val out = new org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream(
      new FileOutputStream(f))
    out.write(content.getBytes(StandardCharsets.UTF_8)); out.close()
    val rows = spark.read.format("fastx").load(f.getAbsolutePath)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(("id1 first record", "ACGT"), ("id2", "acgtNNaCC")))
  }
}

class FastxCodecAndMultilineSpec extends SparkSpec {
  private val tinyFasta = ">id1 first record\nACGT\n>id2\nacg\ntNNa\nCC\n"
  private val expected = Seq(("id1 first record", "ACGT"), ("id2", "acgtNNaCC"))

  test("zstd transparent decompression parity") {
    val f = new File(FastxFixtures.dir, "tiny.fasta.zst")
    val out = new org.apache.commons.compress.compressors.zstandard.ZstdCompressorOutputStream(
      new FileOutputStream(f))
    out.write(tinyFasta.getBytes(StandardCharsets.UTF_8)); out.close()
    val rows = spark.read.format("fastx").load(f.getAbsolutePath)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == expected)
  }

  test("xz transparent decompression parity") {
    val f = new File(FastxFixtures.dir, "tiny.fasta.xz")
    val out = new org.apache.commons.compress.compressors.xz.XZCompressorOutputStream(
      new FileOutputStream(f))
    out.write(tinyFasta.getBytes(StandardCharsets.UTF_8)); out.close()
    val rows = spark.read.format("fastx").load(f.getAbsolutePath)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == expected)
  }

  test("multi-line FASTQ: sequence until '+', quality by length (needletail parity)") {
    val content = "@r1 multi\nACGT\nACGT\n+\n!!!!\n@@@@\n@r2\nGG\n+r2\n!!\n"
    val f = new File(FastxFixtures.dir, "multiline.fastq")
    Files.write(f.toPath, content.getBytes(StandardCharsets.UTF_8))
    val rows = spark.read.format("fastx").load(f.getAbsolutePath)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(rows == Seq(("r1 multi", "ACGTACGT", "!!!!@@@@"), ("r2", "GG", "!!")))
  }

  test("FASTQ quality overrun is rejected") {
    val content = "@r1\nACGT\n+\n!!!!!!\n"
    val f = new File(FastxFixtures.dir, "overrun.fastq")
    Files.write(f.toPath, content.getBytes(StandardCharsets.UTF_8))
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("fastx").load(f.getAbsolutePath).collect()
    }
    assert(e.getMessage.contains("quality longer") ||
      Option(e.getCause).exists(_.getMessage.contains("quality longer")))
  }
}

