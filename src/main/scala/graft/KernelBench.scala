package graft

import java.nio.charset.StandardCharsets

import graft.extract.{ExtractorConfig, GoldenExtractor}
import graft.sources.PageSource

/** Single-thread extraction-kernel micro-benchmark (no Spark): the
  * per-core ceiling of tokenize→score→assemble, for BASELINE.md's
  * single-node throughput comparison. Reference context: the reference
  * engine is a single-node OCR pipeline at ~8.6 FPS (images/sec) on a
  * GPU (Baek et al., CVPR 2019) — our per-core docs/sec on text pages
  * is the comparable "one machine, one stream" number.
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_KERNEL_PAGES", "20000").toInt
    val cfg = ExtractorConfig.default
    // Materialize pages first (generation excluded from timing).
    val pages = (0 until n).map(i => PageSource.genPage(i.toLong)).toArray
    val bytesIn = pages.map(_.html.length.toLong).sum

    def pass(): Long = {
      var acc = 0L
      var i = 0
      while (i < pages.length) {
        val p = pages(i)
        val ep = GoldenExtractor.extractPage(
          graft.extract.PageLite(p.url, p.warc_ts, p.html), cfg)
        acc += ep.bytes_out
        i += 1
      }
      acc
    }

    pass(); pass() // JIT warm-up
    val times = (1 to 5).map { _ =>
      val t0 = System.nanoTime(); pass(); (System.nanoTime() - t0) / 1e9
    }
    val med = times.sorted.apply(2)
    val docsPerSec = n / med
    val mbPerSec = bytesIn / med / 1e6
    println(
      s"""{"metric":"kernel_docs_per_sec_single_thread","value":$docsPerSec,""" +
      s""""unit":"docs/sec","mb_per_sec":$mbPerSec,"pages":$n,""" +
      s""""median_sec":$med,"runs_sec":[${times.mkString(",")}]}""")
  }
}
