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
  * fresh SparkContext, 2 discarded warm-ups and 5 timed runs by default
  * (SPARK_GRAFT_WARMUPS / SPARK_GRAFT_RUNS), median reported. Output
  * digest asserted equal across ALL runs — the byte-identity gate of
  * BASELINE.md holds during the bench.
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
        // 4x cores: straggler insurance; AQE coalesces the excess
        .config("spark.sql.shuffle.partitions", cpus * 4)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        // v2 commit: task files moved at task commit, no serial
        // driver-side rename of every file at job end
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        // shuffle files in tmpfs too — same single-disk-artifact
        // argument as the output dir
        .config("spark.local.dir",
          sys.env.getOrElse("SPARK_GRAFT_OUT_BASE", "/dev/shm") + "/spark-local")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    }

    def onePass(spark: SparkSession, outDir: String): (Double, Long, Long) = {
      import spark.implicits._
      val t0 = System.nanoTime()
      val pages = graft.pipeline.ParquetTableIO.readPages(spark, benchDir)
      val extracted = ExtractPipeline.extractExpr(
        ExtractPipeline.inputGate(pages)
          .select(col("url"), col("warc_ts"), col("html")),
        ExtractorConfig.default)
      val keyed = ExtractPipeline.withPartId(extracted, 1024)
      ExtractPipeline.dedupAndCluster(keyed, 128)
        .drop("url_hash")
        .write.mode(SaveMode.Overwrite)
        // dictionary encoding is pure overhead on unique urls/text;
        // zstd = production codec (CodecProbe: 1.7x smaller output)
        .option("compression", "zstd")
        .option("parquet.enable.dictionary", "false")
        .parquet(outDir)
      val sec = (System.nanoTime() - t0) / 1e9
      val out = spark.read.parquet(outDir)
      val d = ExtractPipeline.globalDigest(out).collect()(0)
      (sec, d.getLong(1), d.getLong(0)) // (sec, rows, digest)
    }

    case class Level(cpus: Int, runsSec: Seq[Double], rows: Long, digest: Long) {
      def medianSec: Double = runsSec.sorted.apply(runsSec.size / 2)
      def docsPerSec: Double = rows / medianSec
    }

    // tmpfs output: removes single-local-disk writeback contention (a
    // sandbox artifact — real clusters write to distributed storage);
    // both levels use it, so the comparison stays symmetric.
    val outBase = sys.env.getOrElse("SPARK_GRAFT_OUT_BASE", "/dev/shm")
    val nWarm = sys.env.getOrElse("SPARK_GRAFT_WARMUPS", "2").toInt
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_RUNS", "5").toInt

    def passAt(cpus: Int): (Double, Long, Long) = {
      val spark = session(cpus) // context setup excluded from timing
      val r = onePass(spark, s"$outBase/graft_scaling_out_$cpus")
      spark.stop()
      r
    }

    // INTERLEAVED rounds (8,32,8,32,…): this host is a shared VM with
    // visible run-to-run noise; interleaving makes any noisy window hit
    // both levels equally instead of poisoning one level's median.
    (1 to nWarm).foreach(_ => levels.foreach(passAt)) // warm-ups, discarded
    val runsByLevel: Map[Int, Seq[(Double, Long, Long)]] =
      (1 to nRuns).flatMap(_ => levels.map(c => c -> passAt(c)))
        .groupBy(_._1).map { case (c, rs) => c -> rs.map(_._2).toSeq }

    val results = levels.toSeq.map { cpus =>
      val runs = runsByLevel(cpus)
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
