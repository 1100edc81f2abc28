package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.extract.{ExtractorConfig, PageLite}
import graft.pipeline.{ExtractPipeline, ParquetTableIO}

/** Dev tool: isolates which pipeline stage limits 8→32-core scaling.
  * Times (a) parquet scan only, (b) extract-only (pure map, no shuffle,
  * no write), (c) full pipeline, at each level in one JVM.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val benchDir = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", "/root/repo/data/bench_pages")
    val levels = sys.env.getOrElse("SPARK_GRAFT_LEVELS", "8,32").split(",").map(_.trim.toInt)

    def session(cpus: Int): SparkSession = {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus * 4)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    }

    def timeIt(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    levels.foreach { cpus =>
      val spark = session(cpus)
      import spark.implicits._
      def pages = ParquetTableIO.readPages(spark, benchDir)
      def lite = ExtractPipeline.inputGate(pages)
        .select(col("url"), col("warc_ts"), col("html")).as[PageLite]
      def scanOnly = timeIt(pages.agg(sum(length(col("html")))).collect())
      def extractOnly = timeIt(
        ExtractPipeline.extract(lite, ExtractorConfig.default)
          .toDF().agg(sum("bytes_out")).collect())
      def full = timeIt {
        val keyed = ExtractPipeline.withPartId(
          ExtractPipeline.extract(lite, ExtractorConfig.default).toDF(), 1024)
        ExtractPipeline.dedupAndCluster(keyed, 128).drop("url_hash")
          .write.mode("overwrite").parquet(s"/dev/shm/scaleprobe_out_$cpus")
      }
      def noSpans = timeIt {
        val keyed = ExtractPipeline.withPartId(
          ExtractPipeline.extract(lite, ExtractorConfig.default).toDF()
            .drop("span_starts", "span_ends", "span_block_ids", "span_scores"), 1024)
        ExtractPipeline.dedupAndCluster(keyed, 128).drop("url_hash")
          .write.mode("overwrite").parquet(s"/dev/shm/scaleprobe_ns_$cpus")
      }
      scanOnly; extractOnly; full; noSpans // warm-up
      val s1 = Seq(scanOnly, scanOnly, scanOnly).sorted.apply(1)
      val e1 = Seq(extractOnly, extractOnly, extractOnly).sorted.apply(1)
      val f1 = Seq(full, full, full).sorted.apply(1)
      val n1 = Seq(noSpans, noSpans, noSpans).sorted.apply(1)
      println(f"PROBE cpus=$cpus scan=$s1%.2f extract=$e1%.2f full=$f1%.2f nospans=$n1%.2f")
      spark.stop()
    }
  }
}
