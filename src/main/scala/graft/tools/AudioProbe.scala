package graft.tools

import java.util.concurrent.Executors

import graft.multimodal.Multimodal

/** Microbench isolating the WAV encode/decode stages outside Spark:
  * N clips × T threads, per-stage wall time. Exists because the audio
  * codec stage showed thread-scaling anomalies (JVM-global provider
  * locks) that Spark-level timing can't attribute. */
object AudioProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val threads = args.lift(1).map(_.toInt).getOrElse(32)
    val pool = Executors.newFixedThreadPool(threads)

    def stage(name: String)(work: Int => Unit): Unit = {
      val t0 = System.nanoTime()
      val futs = (0 until n).map(i => pool.submit(new Runnable {
        def run(): Unit = work(i)
      }))
      futs.foreach(_.get())
      println(f"[probe] $name%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($n clips, $threads threads)")
    }

    def samples(id: Long): Array[Short] =
      Array.tabulate(1600)(i => (((id * 7 + i.toLong * 13) % 65536) - 32768).toShort)

    // warm provider init
    Multimodal.WavDecoder.decode("audio/wav", Multimodal.pcm16Wav(samples(0)))

    stage("encode only")(i => Multimodal.pcm16Wav(samples(i.toLong)))
    val wavs = (0 until 1024).map(i => Multimodal.pcm16Wav(samples(i.toLong))).toArray
    stage("decode only")(i => Multimodal.WavDecoder.decode("audio/wav", wavs(i % 1024)))
    stage("encode+decode") { i =>
      Multimodal.WavDecoder.decode("audio/wav", Multimodal.pcm16Wav(samples(i.toLong)))
    }
    pool.shutdown()
  }
}
