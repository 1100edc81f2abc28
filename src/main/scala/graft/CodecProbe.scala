package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.extract.ExtractorConfig
import graft.pipeline.ExtractPipeline

/** Output-codec probe (perf frontier per BENCH.md: scan/write + shuffle
  * bytes). Isolates the WRITE stage: extracted output is materialized
  * in memory once, then written repeatedly under each candidate codec;
  * reports wall medians and on-disk bytes. Decision data for the
  * production write codec at 100 TB (storage + write + downstream-scan
  * tradeoff).
  */
object CodecProbe {

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

    val extracted = ExtractPipeline.dedupAndCluster(
        ExtractPipeline.withPartId(
          ExtractPipeline.extractExpr(
            ExtractPipeline.inputGate(
              graft.pipeline.ParquetTableIO.readPages(spark, benchDir))
              .select(col("url"), col("warc_ts"), col("html")),
            ExtractorConfig.default), 1024), cpus.toInt * 2)
      .drop("url_hash")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val rows = extracted.count() // materialize once; writes measure WRITE only

    val codecs = Seq("snappy", "zstd", "lz4", "uncompressed")
    val results = codecs.map { codec =>
      val walls = (0 until runs + 1).map { _ =>
        val out = java.nio.file.Files.createTempDirectory(s"codec_$codec").toString
        val t0 = System.nanoTime()
        extracted.write.mode(SaveMode.Overwrite)
          .option("compression", codec)
          .option("parquet.enable.dictionary", "false")
          .parquet(out)
        val sec = (System.nanoTime() - t0) / 1e9
        val bytes = new java.io.File(out).listFiles().map(_.length).sum
        (sec, bytes, out)
      }
      walls.map(_._3).foreach(p => org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
      val timed = walls.drop(1).map(_._1).sorted // first write is warm-up
      (codec, timed(timed.length / 2), walls.head._2)
    }
    val json = results.map { case (c, sec, bytes) =>
      s""""$c":{"median_write_sec":$sec,"bytes":$bytes}"""
    }.mkString("{", ",", s""","rows":$rows,"runs":$runs}""")
    println(json)
    spark.stop()
  }
}
