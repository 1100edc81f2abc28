package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.extract.ExtractorConfig
import graft.pipeline.ExtractPipeline

/** Input-codec probe — the scan-side counterpart of [[CodecProbe]]
  * (perf frontier: scan + shuffle bytes). The bench corpus is
  * re-written once under each candidate codec (untimed), then the
  * SCAN+EXTRACT leg is timed per codec: read → gate → extract_page →
  * global digest (the digest forces full extraction; no write, no
  * wide shuffle). Decision data for how the crawl INPUT should be
  * stored at 100 TB (it is written once, scanned by every job).
  */
object ScanCodecProbe {

  def main(args: Array[String]): Unit = {
    val benchDir = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", "/root/repo/data/bench_pages")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val src = graft.pipeline.ParquetTableIO.readPages(spark, benchDir)

    def scanDigest(dir: String): Long = {
      val extracted = ExtractPipeline.extractExpr(
        ExtractPipeline.inputGate(
          graft.pipeline.ParquetTableIO.readPages(spark, dir))
          .select(col("url"), col("warc_ts"), col("html")),
        ExtractorConfig.default)
      ExtractPipeline.globalDigest(extracted).collect()(0).getLong(0)
    }

    // global burn-in: JIT the whole scan+extract codegen path BEFORE
    // the codec loop — measured (order-flip A/B): without it the
    // first codec slot reads 3-4x slow regardless of which codec
    // occupies it
    scanDigest(benchDir)

    // order is configurable to rule out residual run-order bias
    // (re-run reversed; medians must agree)
    val codecs = sys.env.getOrElse("SPARK_GRAFT_CODECS",
      "snappy,zstd,lz4,uncompressed").split(',').toSeq
    val results = codecs.map { codec =>
      val dir = java.nio.file.Files.createTempDirectory(s"scan_$codec").toString
      src.write.mode(SaveMode.Overwrite)
        .option("compression", codec)
        .parquet(dir) // corpus rewrite: NOT timed
      val bytes = new java.io.File(dir).listFiles().map(_.length).sum
      var digest = 0L
      val walls = (0 until runs + 1).map { _ =>
        val t0 = System.nanoTime()
        digest = scanDigest(dir)
        (System.nanoTime() - t0) / 1e9
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      val timed = walls.drop(1).sorted // first pass is warm-up
      (codec, timed(timed.length / 2), bytes, digest)
    }
    require(results.map(_._4).distinct.size == 1, "digest differs across codecs")
    val json = results.map { case (c, sec, bytes, _) =>
      s""""$c":{"median_scan_extract_sec":$sec,"input_bytes":$bytes}"""
    }.mkString("{", ",", s""","digest":${results.head._4},"runs":$runs}""")
    println(json)
    spark.stop()
  }
}
