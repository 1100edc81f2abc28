package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.extract.{ExtractorConfig, PageLite}
import graft.pipeline.{ExtractPipeline, ParquetTableIO}

/** Structured Streaming formulation of the pipeline (SURVEY.md §2.10):
  * the extraction stages are stateless per-row transforms, so the batch
  * plan lifts directly onto `readStream` → `writeStream`. The streaming
  * checkpoint directory replaces the batch job's checkpoint table as
  * the resume mechanism (exactly-once file-sink semantics).
  *
  * `Trigger.AvailableNow` drains everything currently in the source and
  * stops — the incremental-backfill pattern for a crawl landing zone: a
  * scheduled run picks up exactly the new files since the last
  * checkpoint, extracts, appends.
  *
  * Latest-snapshot dedup is NOT part of the streaming path (it is a
  * global-window batch concern, SURVEY.md §2.5 A2); compaction runs as
  * the batch ExtractJob over the streamed output when needed.
  */
object StreamingExtract {

  def start(
      spark: SparkSession,
      pagesDir: String,
      outDir: String,
      checkpointDir: String,
      cfg: ExtractorConfig = ExtractorConfig.default
  ): StreamingQuery = {
    import spark.implicits._
    val pages = spark.readStream
      .schema(ParquetTableIO.pageSchema)
      .option("maxFilesPerTrigger", "64")
      .parquet(pagesDir)
    val extracted = ExtractPipeline.extract(
      ExtractPipeline.inputGate(pages)
        .select(col("url"), col("warc_ts"), col("html")).as[PageLite],
      cfg)
    // SAME part count as the batch job (the resume-unit contract is
    // shared — a divergent P here would corrupt batch resumes against
    // this table) and SAME output codec decisions (zstd, dictionary
    // off — see ParquetTableIO.append)
    ExtractPipeline.withPartId(extracted.toDF(), graft.ExtractJob.DefaultLogicalParts)
      .drop("url_hash")
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("compression", "zstd")
      .option("parquet.enable.dictionary", "false")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** CLI: drain the pages dir once and exit (incremental backfill). */
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: graft.streaming.StreamingExtract <pagesDir> <outDir> <checkpointDir>")
      sys.exit(2)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .appName("graft-streaming-extract")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = start(spark, args(0), args(1), args(2))
    q.awaitTermination()
    spark.stop()
  }
}
