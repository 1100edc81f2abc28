package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.extract.{ExtractorConfig, PageLite}
import graft.pipeline.ExtractPipeline

/** Scaling-efficiency evidence (BASELINE.json north_rule): run the SAME
  * full read→extract→dedup→cluster→write pipeline over the SAME on-disk
  * corpus at two parallelism levels (local[8] ≙ N executors, local[32]
  * ≙ 4N, per driver instruction — no real cluster in this sandbox) and
  * report throughput at both plus efficiency = (t8/t32)/4.
  *
  * Protocol (BASELINE.md): ONE JVM for all runs so whole-stage-codegen
  * JIT is equally warm at both levels (a fresh JVM per run would charge
  * ~40 s of JIT to every measurement and distort the ratio); per level:
  * fresh SparkContext, 1 discarded warm-up, 3 timed runs, median
  * reported. Output digest asserted equal across ALL runs — the
  * byte-identity gate of BASELINE.md holds during the bench.
  */
object BenchScaling {

  def main(args: Array[String]): Unit = {
    val benchDir = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", "/root/repo/data/bench_pages")
    val levels = sys.env.getOrElse("SPARK_GRAFT_LEVELS", "8,32").split(",").map(_.trim.toInt)

    def session(cpus: Int): SparkSession = {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.builder()
        .master(s"local[$cpus]")
        .appName(s"graft-scaling-$cpus")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    }

    def onePass(spark: SparkSession, outDir: String): (Double, Long, Long) = {
      import spark.implicits._
      val t0 = System.nanoTime()
      val pages = graft.pipeline.ParquetTableIO.readPages(spark, benchDir)
      val extracted = ExtractPipeline.extract(
        ExtractPipeline.inputGate(pages)
          .select(col("url"), col("warc_ts"), col("html")).as[PageLite],
        ExtractorConfig.default)
      val deduped = ExtractPipeline.dedupLatest(extracted.toDF())
      val keyed = ExtractPipeline.withPartId(deduped, 1024)
      ExtractPipeline.clusterForWrite(keyed, spark.sparkContext.defaultParallelism * 4)
        .drop("url_hash")
        .write.mode(SaveMode.Overwrite).parquet(outDir)
      val sec = (System.nanoTime() - t0) / 1e9
      val out = spark.read.parquet(outDir)
      val d = ExtractPipeline.globalDigest(out).collect()(0)
      (sec, d.getLong(1), d.getLong(0)) // (sec, rows, digest)
    }

    case class Level(cpus: Int, runsSec: Seq[Double], rows: Long, digest: Long) {
      def medianSec: Double = runsSec.sorted.apply(runsSec.size / 2)
      def docsPerSec: Double = rows / medianSec
    }

    val results = levels.map { cpus =>
      val spark = session(cpus)
      val outDir = s"/tmp/graft_scaling_out_$cpus"
      onePass(spark, outDir) // warm-up, discarded
      val runs = (1 to 3).map(_ => onePass(spark, outDir))
      spark.stop()
      val digests = runs.map(_._3).distinct
      require(digests.size == 1, s"digest drift across runs: $digests")
      Level(cpus, runs.map(_._1), runs.head._2, digests.head)
    }

    require(results.map(_.digest).distinct.size == 1,
      "byte-identity violated across parallelism levels")

    val lo = results.minBy(_.cpus)
    val hi = results.maxBy(_.cpus)
    val coreRatio = hi.cpus.toDouble / lo.cpus
    val eff = (hi.docsPerSec / lo.docsPerSec) / coreRatio
    val levelsJson = results.map { l =>
      s"""{"cpus":${l.cpus},"runs_sec":[${l.runsSec.mkString(",")}],""" +
      s""""median_sec":${l.medianSec},"docs_per_sec":${l.docsPerSec},"rows":${l.rows}}"""
    }.mkString("[", ",", "]")
    println(
      s"""{"metric":"scaling_efficiency","value":$eff,"unit":"ratio",""" +
      s""""levels":$levelsJson,"digest":${lo.digest},""" +
      s""""core_ratio":$coreRatio,"bench_dir":"$benchDir"}""")
  }
}
