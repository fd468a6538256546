package graft.tools

import java.io.{BufferedOutputStream, FileOutputStream}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput check for the splittable FASTX reader: generates a synthetic
  * multi-line FASTA and a strict-4-line FASTQ (~hundreds of MB each), then
  * scans+aggregates each with one split vs many splits. The ratio is the
  * point: the same file saturates N cores when split, which is what a 1 TB
  * file needs on a cluster. FASTQ qualities start with '@' on every third
  * record so the resync disambiguation cost is part of the measurement.
  * Usage: runMain graft.tools.FastxBench [sizeMB] [cpus]
  */
object FastxBench {
  def main(args: Array[String]): Unit = {
    val sizeMB = args.headOption.map(_.toInt).getOrElse(512)
    val cpus = args.lift(1).map(_.toInt).getOrElse(8)
    val fastaPath = new java.io.File("/root/repo/target/fastx_bench.fasta")
    val fastqPath = new java.io.File("/root/repo/target/fastx_bench.fastq")
    val target = sizeMB.toLong << 20
    val alphabet = "ACGTN".getBytes

    // deterministic generator, ~100-byte records with multi-line bodies
    def writeFasta(): Long = {
      val rnd = new scala.util.Random(42)
      val out = new BufferedOutputStream(new FileOutputStream(fastaPath), 1 << 20)
      val lineBuf = new Array[Byte](60)
      var written = 0L
      var i = 0L
      while (written < target) {
        val header = s">rec$i len${60 + (i % 3) * 60}\n".getBytes
        out.write(header); written += header.length
        var lines = 1 + (i % 3).toInt
        while (lines > 0) {
          var j = 0
          while (j < 60) { lineBuf(j) = alphabet(rnd.nextInt(5)); j += 1 }
          out.write(lineBuf); out.write('\n'); written += 61
          lines -= 1
        }
        i += 1
      }
      out.close()
      println(s"[fastxbench] fasta: wrote ${written >> 20} MB, $i records")
      written
    }

    // strict 4-line FASTQ; every 3rd record's quality starts with '@'
    def writeFastq(): Long = {
      val rnd = new scala.util.Random(43)
      val out = new BufferedOutputStream(new FileOutputStream(fastqPath), 1 << 20)
      val seqBuf = new Array[Byte](100)
      val qualBuf = new Array[Byte](100)
      var written = 0L
      var i = 0L
      while (written < target) {
        val header = s"@rec$i d$i\n".getBytes
        out.write(header); written += header.length
        var j = 0
        while (j < 100) {
          seqBuf(j) = alphabet(rnd.nextInt(5))
          qualBuf(j) = ('!' + rnd.nextInt(94)).toByte
          j += 1
        }
        if (i % 3 == 0) qualBuf(0) = '@'
        out.write(seqBuf); out.write('\n')
        out.write('+'); out.write('\n')
        out.write(qualBuf); out.write('\n')
        written += 204
        i += 1
      }
      out.close()
      println(s"[fastxbench] fastq: wrote ${written >> 20} MB, $i records")
      written
    }

    val fastaBytes = writeFasta()
    val fastqBytes = writeFastq()

    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(path: java.io.File, bytes: Long, splitMB: Long, label: String): Unit = {
      val t0 = System.nanoTime()
      val df = spark.read.format("fastx")
        .option("maxSplitBytes", (splitMB << 20).toString)
        .load(path.getAbsolutePath)
      val agg = df.select(
        count(lit(1)).as("n"),
        sum(length(col("sequence"))).as("bases"),
        sum(graft.functions.SeqFunctions.nCount(col("sequence"))).as("ns"))
        .collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      val mbps = (bytes >> 20) / sec
      println(f"[fastxbench] $label%-28s ${sec}%6.2f s  ${mbps}%7.1f MB/s  rows=${agg.getLong(0)} bases=${agg.getLong(1)} ns=${agg.getLong(2)}")
    }
    run(fastaPath, fastaBytes, 1L << 20, "fasta single split")
    run(fastaPath, fastaBytes, 32L, "fasta 32MB splits")
    run(fastaPath, fastaBytes, 32L, "fasta 32MB splits (warm)")
    run(fastaPath, fastaBytes, 1L << 20, "fasta single split (warm)")
    run(fastqPath, fastqBytes, 1L << 20, "fastq single split")
    run(fastqPath, fastqBytes, 32L, "fastq 32MB splits")
    run(fastqPath, fastqBytes, 32L, "fastq 32MB splits (warm)")
    run(fastqPath, fastqBytes, 1L << 20, "fastq single split (warm)")
    fastaPath.delete()
    fastqPath.delete()
    spark.stop()
  }
}
