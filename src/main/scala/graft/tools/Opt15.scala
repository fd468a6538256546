package graft.tools

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Round-15 optimization harness: per-query wall time (warmup at sf0.001,
  * then min-of-N noop-sink runs, the Bench methodology) plus stage-level
  * shuffle/spill totals, and the `.explain("formatted")` dump the round's
  * deliverable requires (plans/r15/<query>_<suffix>.txt).
  *
  * Usage: runMain graft.tools.Opt15 <sfDir> <suffix|-> <q1,q2,...> [reps]
  *   suffix "-"  → don't write plan files, just time
  *   reps        → timed repetitions per query (default 2, min kept)
  */
object Opt15 {

  final class StageMeter extends SparkListener {
    @volatile var shuffleWrite = 0L
    @volatile var shuffleRead = 0L
    @volatile var memSpill = 0L
    @volatile var diskSpill = 0L
    @volatile var stages = 0
    val stageRows = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double, Int)]()
    // per-stage task durations (ms) for the §2.5 skew audit: compare
    // max vs median task time per stage (OPT15_SKEW=1 prints them)
    val taskDurations = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.ConcurrentLinkedQueue[Long]]()
    override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      if (te.taskInfo != null) {
        taskDurations
          .computeIfAbsent(te.stageId, _ => new java.util.concurrent.ConcurrentLinkedQueue[Long]())
          .add(te.taskInfo.duration)
      }
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        shuffleWrite += m.shuffleWriteMetrics.bytesWritten
        shuffleRead += m.shuffleReadMetrics.totalBytesRead
        memSpill += m.memoryBytesSpilled
        diskSpill += m.diskBytesSpilled
        stages += 1
        val wall = (for {
          c <- sc.stageInfo.completionTime; s <- sc.stageInfo.submissionTime
        } yield (c - s) / 1e3).getOrElse(0.0)
        stageRows.add((sc.stageInfo.name.takeWhile(_ != '\n').take(70),
          wall, sc.stageInfo.numTasks))
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val reps = args.lift(3).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("OPT15_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // plan dumps land in the CURRENT optimization round's directory
    // (override with OPT15_PLAN_DIR); r15 dumps stay untouched history
    val planDir = new File(sys.props("user.dir"),
      sys.env.getOrElse("OPT15_PLAN_DIR", "plans/r16"))
    if (suffix != "-") planDir.mkdirs()

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warmup at the smallest SF: JIT + codegen compile out of the timings
      try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[opt15] warmup $name: ${e.getMessage}") }
      finally graft.CacheScope.release()

      if (suffix != "-") {
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.write(Paths.get(planDir.getPath, s"${name}_$suffix.txt"),
            txt.getBytes(StandardCharsets.UTF_8))
        } catch { case e: Throwable =>
          System.err.println(s"[opt15] explain $name failed: ${e.getMessage}")
        } finally graft.CacheScope.release()
      }

      var best = Double.MaxValue
      var bestMeter: StageMeter = null
      var failures = 0
      (1 to reps).foreach { _ =>
        val meter = new StageMeter
        spark.sparkContext.addSparkListener(meter)
        spark.sparkContext.setJobDescription(s"opt15: $name")
        val t0 = System.nanoTime()
        var ok = true
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          ok = false; failures += 1
          System.err.println(s"[opt15] $name FAILED: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.removeSparkListener(meter)
        graft.CacheScope.release()
        // a crashed rep must not report a plausible-looking min time
        // (r15 ADVICE): only successful reps compete for `best`
        if (ok && dt < best) { best = dt; bestMeter = meter }
      }
      if (bestMeter == null) {
        println(f"[opt15] $name%-28s  FAILED (all $failures%d reps threw)")
      } else
      println(f"[opt15] $name%-28s $best%7.2f s  stages=${bestMeter.stages}%3d " +
        f"shufW=${bestMeter.shuffleWrite / 1e6}%8.1f MB shufR=${bestMeter.shuffleRead / 1e6}%8.1f MB " +
        f"spillMem=${bestMeter.memSpill / 1e6}%8.1f MB spillDisk=${bestMeter.diskSpill / 1e6}%8.1f MB")
      if (sys.env.contains("OPT15_STAGES") && bestMeter != null) {
        import scala.jdk.CollectionConverters._
        bestMeter.stageRows.asScala.toSeq.sortBy(-_._2).take(15).foreach {
          case (n, w, t) => println(f"[opt15]    $w%6.2f s  tasks=$t%3d  $n")
        }
      }
      // skew audit (guide §2.5): per-stage max/median task duration for
      // every stage with ≥ 8 tasks, worst ratios first
      if (sys.env.contains("OPT15_SKEW") && bestMeter != null) {
        import scala.jdk.CollectionConverters._
        val rows = bestMeter.taskDurations.asScala.toSeq.flatMap { case (sid, q) =>
          val ds = q.asScala.toArray.sorted
          if (ds.length < 8) None
          else {
            val med = math.max(1L, ds(ds.length / 2))
            Some((sid, ds.length, ds.last, med, ds.last.toDouble / med))
          }
        }
        rows.sortBy(-_._5).take(10).foreach { case (sid, n, mx, med, r) =>
          println(f"[opt15]    skew stage=$sid%4d tasks=$n%4d max=${mx}%6d ms median=${med}%6d ms ratio=$r%5.1f")
        }
      }
    }
    spark.stop()
  }
}
