package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Scratch profiling main — rewritten per investigation; current target:
  * VERDICT r11 item 6, the q_jaccard_pairs 1000× "last look". The open
  * question: the pair-stream groupBy(d1,d2) shuffles Ω(Σf²) candidate
  * rows with ~28 GB transient spill — does an explicit per-partition
  * pre-aggregation (or equivalently, shrinking each task's partial-agg
  * hash map by raising the pair-stage partition count) move the 1000×
  * wall time, or is the cost volume-inherent?
  *
  * Two facts this main makes measurable:
  *  1. The physical plan ALREADY runs partial_count before the exchange
  *     (printed and grepped) — "per-partition pair pre-aggregation" is
  *     not a missing feature but Spark's stock two-phase aggregate; what
  *     varies is only the partial map's working-set size per task.
  *  2. Per-variant wall time + total shuffle write + memory/disk spill
  *     from a stage-completion listener, for pairPartitions ∈ args.
  *
  * Args: sfDir then pairPartitions values (0 = operator default 2×scan).
  */
object Profile {
  def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }
  def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

  /** Accumulates shuffle/spill totals across all stages of one run. */
  final class StageMeter extends SparkListener {
    @volatile var shuffleWrite = 0L
    @volatile var shuffleRead = 0L
    @volatile var memSpill = 0L
    @volatile var diskSpill = 0L
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        shuffleWrite += m.shuffleWriteMetrics.bytesWritten
        shuffleRead += m.shuffleReadMetrics.totalBytesRead
        memSpill += m.memoryBytesSpilled
        diskSpill += m.diskBytesSpilled
      }
    }
    def report(tag: String): Unit =
      println(f"[profile] $tag metrics: shuffleWrite=${shuffleWrite / 1e9}%.2f GB " +
        f"shuffleRead=${shuffleRead / 1e9}%.2f GB memSpill=${memSpill / 1e9}%.2f GB " +
        f"diskSpill=${diskSpill / 1e9}%.2f GB")
  }

  /** Secondary mode (`pq` as the 2nd arg): sample-trained vs full-corpus
    * PQ codebook training at scale — the r11a sample-trained-Lloyd story
    * applied to the round-12 PQ build. trainSample values follow. */
  def pqMode(spark: SparkSession, sfDir: String, samples: Seq[Int]): Unit = {
    val emb = graft.Tables.t(spark, sfDir, "embeddings")
    println(s"[profile] embeddings rows: ${emb.count()}")
    for (ts <- samples) {
      time(s"pqIndexQ m=8 ksub=16 trainSample=$ts") {
        val (_, codes) = graft.operators.Similarity
          .pqIndexQ(emb, "vec_id", "embedding", m = 8, ksub = 16,
            iters = 2, trainSample = ts)
        noop(codes)
      }
      graft.CacheScope.release()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/sf100")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.lift(1).contains("pq")) {
      pqMode(spark, sfDir, args.drop(2).map(_.toInt).toSeq match {
        case Seq() => Seq(0, 131072)
        case s => s
      })
      spark.stop(); return
    }
    val docs = graft.Tables.t(spark, sfDir, "documents")
    println(s"[profile] documents rows: ${docs.count()}")
    val variants = args.drop(1) match {
      case Array() => Seq(0, 128, 256)
      case a => a.toSeq.map(_.toInt)
    }
    // fact 1: partial aggregation is already in the plan, pre-exchange
    val plan = graft.operators.Dedup
      .jaccardPairs(docs, "doc_id", "text").queryExecution.executedPlan.toString
    val partial = plan.contains("partial_count")
    println(s"[profile] pair groupBy has map-side partial aggregation: $partial")
    graft.CacheScope.release()
    for (p <- variants) {
      val meter = new StageMeter
      spark.sparkContext.addSparkListener(meter)
      time(s"jaccardPairs pairPartitions=$p") {
        noop(graft.operators.Dedup.jaccardPairs(
          docs, "doc_id", "text", pairPartitions = p))
      }
      spark.sparkContext.removeSparkListener(meter)
      meter.report(s"pairPartitions=$p")
      graft.CacheScope.release()
    }
    spark.stop()
  }
}
