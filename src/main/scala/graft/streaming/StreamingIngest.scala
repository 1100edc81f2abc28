package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.WarcSource

/** Streaming WARC landing-zone drain (SURVEY.md §2.10): crawlers drop
  * `.warc/.warc.gz` files into a directory continuously; each
  * scheduled `AvailableNow` drain picks up EXACTLY the files that
  * arrived since the last checkpoint (file-source exactly-once), record
  * splits them and appends pages — the streaming complement of the
  * batch [[graft.IngestJob]] backfill.
  *
  * Memory shape: the streaming binaryFile source ships file CONTENT
  * rows (unlike the batch job's path-listing + per-task FS streams),
  * so per-batch memory is bounded by `maxFilesPerTrigger` file bodies;
  * the record explode itself stays lazy (WarcSource.responsesIterator
  * — O(one decompressed record) beyond the raw file bytes). For
  * CC-sized 1 GB members, size maxFilesPerTrigger to the executor
  * count; the batch IngestJob remains the bulk-backfill tool.
  */
object StreamingIngest {

  def start(
      spark: SparkSession,
      warcDir: String,
      pagesDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 8
  ): StreamingQuery = {
    import spark.implicits._
    // the binaryFile source's FIXED schema — streaming file sources
    // require it explicitly (no inference pass over the landing dir)
    val binaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType)))
    val files = spark.readStream
      .format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "*.warc*")
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .load(warcDir)
    files.select(col("content")).as[Array[Byte]]
      .flatMap(bytes => WarcSource.responsesIterator(bytes))
      .map { case (url, epoch, body) =>
        (url, new java.sql.Timestamp(epoch * 1000L), body)
      }
      .toDF("url", "warc_ts", "html")
      .writeStream
      .format("parquet")
      .option("path", pagesDir)
      .option("compression", "zstd")
      .option("parquet.enable.dictionary", "false")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** CLI: drain the landing dir once and exit (run from a scheduler). */
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        "usage: graft.streaming.StreamingIngest <warcDir> <pagesDir> <checkpointDir>")
      sys.exit(2)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .appName("graft-streaming-ingest")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    start(spark, args(0), args(1), args(2)).awaitTermination()
    val n = spark.read.parquet(args(1)).count()
    println(s"""{"pages_total":$n}""")
    spark.stop()
  }
}
