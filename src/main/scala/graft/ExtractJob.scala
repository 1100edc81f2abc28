package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.extract.{ExtractorConfig, Page}
import graft.pipeline.{ExtractPipeline, ParquetTableIO}

/** Production entry point (SURVEY.md §3.2): the spark-submit job
  *
  *   spark-submit --class graft.ExtractJob app.jar <pagesPath> <outDir> [P] [jobId]
  *
  * read pages → input gate → stable part_id → RESUME anti-join against
  * the checkpoint table → expression-mode extract (no object boundary)
  * → ONE exchange for latest-snapshot dedup + url_hash clustering →
  * append output + per-partition checkpoint/lineage metrics
  * (SURVEY.md §2.9; clustering rationale in BENCH.md).
  *
  * Idempotence: extraction is pure/deterministic, part_id is a pure
  * function of url — re-running after a partial failure appends ONLY
  * the part_ids missing from the checkpoint table, and re-executed
  * partitions would be byte-identical anyway.
  *
  * On a real cluster the two `ParquetTableIO` appends become Iceberg
  * `writeTo(...).append()` atomic snapshots (SURVEY.md §7.2).
  */
object ExtractJob {

  /** Number of stable logical resume units. Cluster-size independent;
    * at 10^12 rows this would be O(100k); tests use small values.
    */
  val DefaultLogicalParts = 256

  def run(
      spark: SparkSession,
      pagesPath: String,
      outDir: String,
      numLogicalParts: Int = DefaultLogicalParts,
      jobId: String = "job",
      attempt: Int = 0,
      cfg: ExtractorConfig = ExtractorConfig.default
  ): (Long, Long) = {
    import spark.implicits._
    val io = ParquetTableIO
    val outPath = s"$outDir/pages_extracted"
    val ckptPath = s"$outDir/checkpoint_metrics"

    val t0 = System.currentTimeMillis()
    val pages = io.readPages(spark, pagesPath)
    val gated = ExtractPipeline.inputGate(pages)

    // Resume: committed part_ids from previous attempts (J1: broadcast
    // left_anti — the checkpoint table is tiny relative to pages).
    // Runs BEFORE extraction so committed partitions pay no CPU.
    val done = io.readOrEmpty(spark, ckptPath, io.checkpointSchema)
      .select("part_id").distinct()
    val todo = ExtractPipeline
      .withPartId(gated, numLogicalParts)
      .join(broadcast(done), Seq("part_id"), "left_anti")

    // Extract FIRST (pure map, no shuffle), then ONE exchange does both
    // latest-snapshot dedup and url_hash output clustering — the shuffle
    // carries extracted text (~25% of raw html bytes), never the html,
    // and there is no range-sampling recompute (see dedupAndCluster).
    val extracted = ExtractPipeline
      .extractExpr(todo.select("url", "warc_ts", "html"), cfg)
    val keyed = ExtractPipeline.withPartId(extracted, numLogicalParts)
    val clustered = ExtractPipeline.dedupAndCluster(
      keyed, spark.sparkContext.defaultParallelism * 2)
    io.append(clustered.drop("url_hash"), outPath)

    val m = ExtractPipeline.metrics(clustered, jobId, attempt,
        wallMs = System.currentTimeMillis() - t0, inputSnapshot = pagesPath)
      .select("part_id", "n_docs", "n_blocks", "n_kept", "bytes_in",
        "bytes_out", "url_hash_lo", "url_hash_hi", "attempt", "job_id",
        "wall_ms", "committed_ts", "input_snapshot")
    io.append(m, ckptPath)

    val out = spark.read.parquet(outPath)
    (out.count(), done.count())
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: graft.ExtractJob <pagesPath> <outDir> [numLogicalParts] [jobId]")
      sys.exit(2)
    }
    val pagesPath = args(0)
    val outDir = args(1)
    val parts = if (args.length > 2) args(2).toInt else DefaultLogicalParts
    val jobId = if (args.length > 3) args(3) else "job-" + System.currentTimeMillis()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .appName("graft-extract")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (rows, resumedFrom) = run(spark, pagesPath, outDir, parts, jobId)
    println(s"""{"job":"$jobId","output_rows":$rows,"resumed_part_ids":$resumedFrom}""")
    spark.stop()
  }
}
