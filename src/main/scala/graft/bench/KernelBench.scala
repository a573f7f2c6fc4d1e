package graft.bench

import java.util.concurrent.atomic.AtomicLong
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import graft.core.extract.Extractor
import graft.gen.SyntheticTranscripts

/** No-Spark microbenchmark of the extraction kernels: same payload corpus,
  * N threads hammering [[Extractor.safeExtract]] — isolates kernel thread
  * scaling from Spark scheduling/shuffle/GC effects.
  * Usage: runMain graft.bench.KernelBench [nConvs] [threadList]
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val nConvs = if (args.length > 0) args(0).toInt else 8000
    val threadLevels = if (args.length > 1) args(1).split(",").toSeq.map(_.toInt) else Seq(1, 8, 32)

    val turns = (0 until nConvs).flatMap(i => SyntheticTranscripts.turnsFor(42L, i.toLong)).toArray
    println(s"corpus: ${turns.length} turns")

    def run(threads: Int): Double = {
      val pool = Executors.newFixedThreadPool(threads)
      val done = new CountDownLatch(threads)
      val sink = new AtomicLong()
      val chunks = turns.grouped(math.max(1, turns.length / threads + 1)).toArray
      val t0 = System.nanoTime()
      chunks.foreach { chunk =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var acc = 0L
            chunk.foreach { t =>
              val (ex, _) = Extractor.safeExtract(t.tool, t.text)
              acc += ex.text.length
            }
            sink.addAndGet(acc)
            done.countDown()
          }
        })
      }
      // any chunking mismatch: count down remaining
      (chunks.length until threads).foreach(_ => done.countDown())
      val completed = done.await(600, TimeUnit.SECONDS)
      val sec = (System.nanoTime() - t0) / 1e9
      // shutdownNow interrupts stragglers so a timed-out level cannot keep
      // hammering cores while the NEXT level is being measured; and an
      // incomplete level must fail loudly, not report garbage throughput
      pool.shutdownNow()
      require(completed, s"kernel bench: level $threads timed out after 600s")
      turns.length / sec
    }

    run(threadLevels.max) // warmup
    threadLevels.foreach { t =>
      val tps = run(t)
      println(f"threads=$t%2d turns/sec=$tps%.0f")
    }
  }
}
