package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.WarcSource

/** Crawl-dump ingestion: a directory of WARC files (plain or
  * per-record-gzipped, the Common-Crawl layout) → the engine's pages
  * table (url, warc_ts, html) — the step in front of ExtractJob that
  * turns what a crawler actually ships into what the pipeline scans.
  *
  * Scale shape: `binaryFile` source (one task per WARC file — CC files
  * are ~1 GB, the standard Spark-on-WARC unit), record split / gzip /
  * HTTP unwrap inside a flatMap over a LAZY record iterator
  * (damage-tolerant, never throws; per-task heap holds the raw file
  * bytes plus O(one decompressed record) of bodies — the iterator
  * yields records as the flatMap drains them, it never materializes
  * the multi-GB decompressed body list), then
  * a parquet write repartitioned on url hash so downstream scans see
  * balanced files regardless of per-WARC skew. Ingestion is
  * deterministic per input file set, so a rerun after a crash is
  * idempotent at the overwrite level; incremental drains can point
  * ExtractJob's resume at the same pages table.
  *
  * CLI: spark-submit --class graft.IngestJob app.jar <warcDir> <pagesDir>
  */
object IngestJob {

  def run(spark: SparkSession, warcDir: String, pagesDir: String,
          numParts: Int = 32): (Long, Long) = {
    import spark.implicits._
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*")
      .load(warcDir)
      .select(col("path"), col("content"))
    val nFiles = files.count()
    val pages = files
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap(bytes => WarcSource.responsesIterator(bytes))
      .map { case (url, epoch, body) =>
        (url, new java.sql.Timestamp(epoch * 1000L), body)
      }
      .toDF("url", "warc_ts", "html")
    pages
      .repartition(numParts, xxhash64(col("url")))
      .write.mode(SaveMode.Overwrite)
      .option("compression", "zstd")
      .option("parquet.enable.dictionary", "false")
      .parquet(pagesDir)
    val nPages = spark.read.parquet(pagesDir).count()
    (nFiles, nPages)
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: graft.IngestJob <warcDir> <pagesDir>")
      sys.exit(2)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .appName("graft-ingest")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (nFiles, nPages) = run(spark, args(0), args(1))
    println(s"""{"warc_files":$nFiles,"pages":$nPages}""")
    spark.stop()
  }
}
