package graft.tools

import java.io.{BufferedOutputStream, FileOutputStream}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput check for the splittable FASTX reader: generates a synthetic
  * multi-line FASTA (~hundreds of MB), then scans+aggregates it with one
  * split vs many splits. The ratio is the point: the same file saturates N
  * cores when split, which is what a 1 TB FASTA needs on a cluster.
  * Usage: runMain graft.tools.FastxBench [sizeMB] [cpus]
  */
object FastxBench {
  def main(args: Array[String]): Unit = {
    val sizeMB = args.headOption.map(_.toInt).getOrElse(512)
    val cpus = args.lift(1).map(_.toInt).getOrElse(8)
    val path = new java.io.File("/root/repo/target/fastx_bench.fasta")

    // deterministic generator, ~100-byte records with multi-line bodies
    val rnd = new scala.util.Random(42)
    val out = new BufferedOutputStream(new FileOutputStream(path), 1 << 20)
    val alphabet = "ACGTN".getBytes
    var written = 0L
    var i = 0L
    val target = sizeMB.toLong << 20
    val lineBuf = new Array[Byte](60)
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
    println(s"[fastxbench] wrote ${written >> 20} MB, $i records")

    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(splitMB: Long, label: String): Unit = {
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
      val mbps = (written >> 20) / sec
      println(f"[fastxbench] $label%-28s ${sec}%6.2f s  ${mbps}%7.1f MB/s  rows=${agg.getLong(0)} bases=${agg.getLong(1)} ns=${agg.getLong(2)}")
    }
    run(1L << 20, "single split")   // split larger than file
    run(32L, "32MB splits")
    run(32L, "32MB splits (warm)")
    run(1L << 20, "single split (warm)")
    path.delete()
    spark.stop()
  }
}
