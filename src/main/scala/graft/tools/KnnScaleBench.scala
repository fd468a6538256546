package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-datapoint harness for [[graft.operators.Similarity.knnGraphQ]]:
  * the DECLARED q_knn_graph keeps nCells=32 (the oracle-replayable
  * contract), but candidate volume is n·nProbe·(n/nCells) — quadratic in
  * n at FIXED nCells. Production scales nCells with the corpus exactly
  * like semanticDedup's adaptive k; this main measures that regime at the
  * big fixtures, where the DuckDB oracle can't follow (a 2 M-row dots CTE
  * join is fine; a 250 B-row one is not).
  *
  * Usage: runMain graft.tools.KnnScaleBench <sfDir> <k> <nCells> <iters> <nProbe>
  * Prints one JSON line with the wall seconds of a full graph build+write.
  */
object KnnScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val k = args(1).toInt
    val nCells = args(2).toInt
    val iters = args(3).toInt
    val nProbe = args(4).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.t(spark, sfDir, "embeddings")
    def once(): (Double, Long, Opt15.StageMeter) = {
      // stage meter (r16): shuffle + spill totals per rep, so scale
      // datapoints carry the §5 spill evidence, not just wall seconds
      val meter = new Opt15.StageMeter
      spark.sparkContext.addSparkListener(meter)
      val t0 = System.nanoTime()
      val g = graft.operators.Similarity.knnGraphQ(
        emb, "vec_id", "embedding", k, nCells, iters, nProbe)
      val rows = g.count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(meter)
      graft.CacheScope.release()
      (sec, rows, meter)
    }
    val (s1, rows, m1) = once()
    val (s2, _, m2) = once()
    val m = if (s1 <= s2) m1 else m2
    println(s"""{"metric":"knn_graph","sec":${math.min(s1, s2)},"rows":$rows,""" +
      s""""k":$k,"nCells":$nCells,"iters":$iters,"nProbe":$nProbe,""" +
      s""""shuffle_mb":${(m.shuffleWrite / 1e6).round},""" +
      s""""spill_mem_mb":${(m.memSpill / 1e6).round},""" +
      s""""spill_disk_mb":${(m.diskSpill / 1e6).round},"sf":"$sfDir"}""")
    spark.stop()
  }
}
