package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.extract.{ExtractorConfig, PageLite}
import graft.pipeline.{ExtractPipeline, ParquetTableIO}

/** Stage-by-stage profiling of the pipeline (dev tool, not part of the
  * driver contract): isolates scan, extract, dedup, range shuffle and
  * write costs so optimization is measurement-driven (SURVEY.md: a
  * correct-but-slow operator is not done).
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val benchDir = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", "/root/repo/data/bench_pages")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    def timed(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   ($r)")
    }

    val pages = ParquetTableIO.readPages(spark, benchDir)

    timed("scan_count")(pages.count())
    timed("scan_html_bytes")(pages.agg(sum(length(col("html")))).collect()(0).getLong(0))
    def lite = ExtractPipeline.inputGate(pages).select(col("url"), col("warc_ts"), col("html")).as[PageLite]
    timed("extract_only_count")(
      ExtractPipeline.extract(lite, ExtractorConfig.default).count())
    timed("extract_sum_bytes_out")(
      ExtractPipeline.extract(lite, ExtractorConfig.default)
        .toDF().agg(sum("bytes_out")).collect()(0).getLong(0))
    timed("dedup_then_extract_count") {
      val d = ExtractPipeline.dedupLatest(ExtractPipeline.inputGate(pages))
        .select(col("url"), col("warc_ts"), col("html")).as[PageLite]
      ExtractPipeline.extract(d, ExtractorConfig.default).count()
    }
    timed("extract_write_nocluster") {
      ExtractPipeline.extract(lite, ExtractorConfig.default).toDF()
        .write.mode(SaveMode.Overwrite).parquet("/tmp/probe_out1")
    }
    timed("extract_cluster_write") {
      val keyed = ExtractPipeline.withPartId(
        ExtractPipeline.extract(lite, ExtractorConfig.default).toDF(), 1024)
      ExtractPipeline.clusterForWrite(keyed, spark.sparkContext.defaultParallelism * 4)
        .drop("url_hash")
        .write.mode(SaveMode.Overwrite).parquet("/tmp/probe_out2")
    }
    spark.stop()
  }
}
