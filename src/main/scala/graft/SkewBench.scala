package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew evidence at bench scale (dev tool, not part of the driver
  * contract): the bench corpus is 50%-one-host by construction
  * (PageSource.hostId sends every even doc_id to host0 — the
  * one-mega-host crawl shape that kills host-keyed partitioning), and
  * the production pipeline clusters output on url_hash precisely so
  * that host skew cannot concentrate work. This probe RUNS the full
  * extract job over the bench corpus with a task-time listener and
  * reports, per stage, the task-duration spread (min/p50/max), plus
  * the output-file row balance — the numbers that show the single
  * exchange stays balanced under 50% single-host input.
  *
  * One JSON line to stdout:
  *   {"top_host_share_permille":…, "stages":[{"stage":…,"n_tasks":…,
  *    "min_ms":…,"p50_ms":…,"max_ms":…,"sum_ms":…}…],
  *    "out_files":…, "out_rows_min":…, "out_rows_p50":…, "out_rows_max":…}
  */
object SkewBench {

  def main(args: Array[String]): Unit = {
    val benchDir = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", "/root/repo/data/bench_pages")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_OUT_BASE", "/dev/shm") + "/graft_skew_bench"
    val spark = SparkSession.builder()
      .appName("graft-skew-bench")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // task-duration census, keyed by stage — populated by the scheduler
    // bus, so it sees every task of every job the run triggers
    val stageTasks = new mutable.HashMap[Int, mutable.ArrayBuffer[Long]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
        stageTasks.getOrElseUpdate(t.stageId, mutable.ArrayBuffer.empty) +=
          t.taskInfo.duration
      }
    })

    // input skew fact: share of the biggest host (expected ~500‰)
    val pages = spark.read.parquet(benchDir)
    val nPages = pages.count()
    val topHost = pages
      .select(regexp_extract(col("url"), "https://([^/]+)/", 1).as("host"))
      .groupBy(col("host")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(1).collect()(0)
    val topShare = topHost.getLong(1) * 1000L / math.max(1L, nPages)

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
    val t0 = System.nanoTime()
    ExtractJob.run(spark, benchDir, outDir, cpus.toInt, "skew1")
    val wallSec = (System.nanoTime() - t0) / 1e9

    // output balance: rows per written file (the post-exchange unit)
    val outRows = spark.read.parquet(s"$outDir/pages_extracted")
      .groupBy(input_file_name()).agg(count(lit(1)).as("n"))
      .select(col("n")).collect().map(_.getLong(0)).sorted
    def p50(xs: Seq[Long]): Long = if (xs.isEmpty) 0L else xs(xs.length / 2)

    val stages = stageTasks.toSeq.sortBy(_._1).map { case (sid, ds) =>
      val s = ds.sorted
      s"""{"stage":$sid,"n_tasks":${s.length},"min_ms":${s.head},""" +
        s""""p50_ms":${p50(s.toSeq)},"max_ms":${s.last},"sum_ms":${s.sum}}"""
    }.mkString("[", ",", "]")
    println(
      s"""{"pages":$nPages,"top_host_share_permille":$topShare,""" +
      s""""wall_sec":$wallSec,"stages":$stages,""" +
      s""""out_files":${outRows.length},"out_rows_min":${if (outRows.isEmpty) 0 else outRows.head},""" +
      s""""out_rows_p50":${p50(outRows.toSeq)},"out_rows_max":${if (outRows.isEmpty) 0 else outRows.last}}""")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
    spark.stop()
  }
}
