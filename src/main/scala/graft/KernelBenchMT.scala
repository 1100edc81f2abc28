package graft

import java.util.concurrent.{Callable, Executors, TimeUnit}

import graft.extract.{ExtractorConfig, GoldenExtractor, PageLite}
import graft.sources.PageSource

/** Multi-threaded RAW-kernel scaling probe (no Spark at all): runs the
  * pure extraction kernel on T threads over pre-materialized pages.
  * This measures the HOST's parallel-scaling ceiling for this
  * memory-bandwidth-bound workload — the upper bound any Spark pipeline
  * on this box can reach. Dev tool for BASELINE.md evidence.
  */
object KernelBenchMT {
  def main(args: Array[String]): Unit = {
    val perThread = sys.env.getOrElse("SPARK_GRAFT_KERNEL_PAGES", "20000").toInt
    val levels = sys.env.getOrElse("SPARK_GRAFT_LEVELS", "1,8,32").split(",").map(_.trim.toInt)
    val wordScale = sys.env.getOrElse("SPARK_GRAFT_WORD_SCALE", "1").toInt
    val cfg = ExtractorConfig.default
    val maxT = levels.max
    // one shared corpus slice per thread, same pages at every level
    val corpus: Array[Array[PageLite]] = Array.tabulate(maxT) { t =>
      Array.tabulate(perThread) { i =>
        val p = PageSource.genPageScaled((t * perThread + i).toLong, wordScale)
        PageLite(p.url, p.warc_ts, p.html)
      }
    }

    def pass(threads: Int): Double = {
      val pool = Executors.newFixedThreadPool(threads)
      val t0 = System.nanoTime()
      val futs = (0 until threads).map { t =>
        pool.submit(new Callable[Long] {
          def call(): Long = {
            var acc = 0L
            val slice = corpus(t)
            var i = 0
            while (i < slice.length) {
              acc += GoldenExtractor.extractPage(slice(i), cfg).bytes_out
              i += 1
            }
            acc
          }
        })
      }
      futs.foreach(_.get())
      pool.shutdown(); pool.awaitTermination(1, TimeUnit.MINUTES)
      val sec = (System.nanoTime() - t0) / 1e9
      threads.toLong * perThread / sec
    }

    levels.foreach(pass) // warm-up sweep
    val out = levels.map { t =>
      val rates = (1 to 3).map(_ => pass(t)).sorted
      t -> rates(1)
    }
    val json = out.map { case (t, r) => s""""$t":$r""" }.mkString("{", ",", "}")
    val base = out.head
    val rel = out.map { case (t, r) =>
      s""""$t":${r / base._2 / (t.toDouble / base._1)}""" }.mkString("{", ",", "}")
    println(s"""{"metric":"kernel_docs_per_sec_by_threads","levels":$json,"efficiency_vs_t${base._1}":$rel}""")
  }
}
