package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.extract.{ExtractorConfig, PageLite}
import graft.pipeline.ExtractPipeline
import graft.sources.PageSource

/** Benchmark main (driver contract + BASELINE.md protocol).
  *
  * Two parts:
  *  1. per-query timings of every SparkEntry query at $SPARK_GRAFT_SF_DIR;
  *  2. the HEADLINE pipeline bench: full read→extract→write over a
  *     seed-fixed synthetic pages corpus (FIXTURES.md §1, generated once
  *     and reused so N-core and 4N-core runs read the SAME input files),
  *     reported as documents/sec.
  *
  * Scaling evidence (BASELINE.json north_rule; no real cluster in this
  * sandbox): run this main twice on the same corpus with
  * SPARK_GRAFT_CPUS=8 and =32; efficiency = (docs/sec@32 / docs/sec@8) / 4.
  *
  * Output: ONE JSON line {"metric","value","unit","queries",...,"sf"}.
  */
object Bench {

  /** 1/5/15-min load averages as a JSON array — the host is a shared
    * VM and run-to-run noise is real (BENCH.md: the same jar measured
    * 8.2k-95k docs/sec depending on neighbor load), so the artifact
    * carries its own load evidence and a noisy reading is attributable
    * without a separate uptime capture.
    */
  private def loadAvgJson(): String =
    try {
      val parts = scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split(" ").take(3)
      parts.mkString("[", ",", "]")
    } catch { case _: Throwable => "null" }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val loadBefore = loadAvgJson()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val benchPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "500000").toLong
    val benchDir = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", "/root/repo/data/bench_pages")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    // ---- 1. per-query timings (skippable for pure scaling runs) -----
    // A failing query must NOT bench as a fast success: it is recorded
    // with value -1 and listed in "errors" in the output JSON.
    val pipelineOnly = sys.env.get("SPARK_GRAFT_PIPELINE_ONLY").contains("1")
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    val results =
      if (pipelineOnly) Seq.empty[(String, Double)]
      else SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          name -> (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
            errors += name
            name -> -1.0
        }
      }

    // ---- 1b. ANN index build/serve split ----------------------------
    // The serve queries in `queries` time build+serve together (they
    // are self-contained); this block separates the offline index
    // build from the serve-only cost — the number a serving deployment
    // actually budgets (VERDICT r3 item 2).
    val annIndexJson =
      if (pipelineOnly) "null"
      else try {
        val emb = graft.ops.VectorOps.readEmbeddings(spark, sfDir)
        val dir = java.nio.file.Files.createTempDirectory("bench-ann-index").toString
        def time(f: => Unit): Double = {
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        val lshBuild = time(graft.ops.AnnIndex.buildLsh(spark, emb, dir))
        val lshServe = time(graft.ops.AnnIndex.serveLsh(spark, emb, dir).count())
        val pqBuild = time(graft.ops.AnnIndex.buildPq(spark, emb, dir))
        val pqServe = time(graft.ops.AnnIndex.servePq(spark, emb, dir).count())
        val sqBuild = time(graft.ops.AnnIndex.buildSq(spark, emb, dir))
        val sqServe = time(graft.ops.AnnIndex.serveSq(spark, emb, dir).count())
        val ivfBuild = time(graft.ops.AnnIndex.buildIvf(spark, emb, dir))
        val ivfServe = time(graft.ops.AnnIndex.serveIvf(spark, emb, dir).count())
        // composed serving (no extra build: reuses the ivf + pq legs)
        val ivfPqServe = time(graft.ops.AnnIndex.serveIvfPq(spark, emb, dir).count())
        // maintenance leg: an append drop, then the compaction sweep,
        // then serve-from-compacted — the steady-state serving cost
        // after the daily-drop lifecycle (VERDICT r4 item 4)
        // disjoint-ids contract: shift the drop's ids out of the base
        val drop = emb.limit(50).withColumn("vec_id",
          org.apache.spark.sql.functions.col("vec_id") + 10000000L)
        graft.ops.AnnIndex.appendLsh(spark, drop, dir)
        graft.ops.AnnIndex.appendPq(spark, drop, dir)
        graft.ops.AnnIndex.appendSq(spark, drop, dir)
        graft.ops.AnnIndex.appendIvf(spark, drop, dir)
        val compactSec = time(graft.ops.AnnIndex.compact(spark, dir))
        val lshServeC = time(graft.ops.AnnIndex.serveLsh(spark, emb, dir).count())
        val pqServeC = time(graft.ops.AnnIndex.servePq(spark, emb, dir).count())
        val sqServeC = time(graft.ops.AnnIndex.serveSq(spark, emb, dir).count())
        val ivfServeC = time(graft.ops.AnnIndex.serveIvf(spark, emb, dir).count())
        val ivfPqServeC = time(graft.ops.AnnIndex.serveIvfPq(spark, emb, dir).count())
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
        s"""{"lsh_build_sec":$lshBuild,"lsh_serve_sec":$lshServe,""" +
          s""""pq_build_sec":$pqBuild,"pq_serve_sec":$pqServe,""" +
          s""""sq_build_sec":$sqBuild,"sq_serve_sec":$sqServe,""" +
          s""""ivf_build_sec":$ivfBuild,"ivf_serve_sec":$ivfServe,""" +
          s""""ivfpq_serve_sec":$ivfPqServe,""" +
          s""""compact_sec":$compactSec,"lsh_serve_compacted_sec":$lshServeC,""" +
          s""""pq_serve_compacted_sec":$pqServeC,"sq_serve_compacted_sec":$sqServeC,""" +
          s""""ivf_serve_compacted_sec":$ivfServeC,""" +
          s""""ivfpq_serve_compacted_sec":$ivfPqServeC}"""
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] ann_index_split FAILED: ${e.getMessage}")
          errors += "ann_index_split"
          "null"
      }

    // ---- 1b2. lexical index build/serve split ------------------------
    // Same separation for the BM25 leg: offline postings build vs
    // serve-only cost from the stored index, plus the append+compact
    // maintenance sweep (ops/SearchIndex mirrors the AnnIndex
    // lifecycle; serve results are oracle-checked via bm25_serve).
    val lexIndexJson =
      if (pipelineOnly) "null"
      else try {
        val docs = graft.ops.TextOps.readDocs(spark, sfDir)
        val qterms = Queries.bm25QueryTerms(docs)
        val dir = java.nio.file.Files.createTempDirectory("bench-lex-index").toString
        def time(f: => Unit): Double = {
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        val build = time(graft.ops.SearchIndex.build(spark, docs, dir))
        val serve = time(graft.ops.SearchIndex.serve(spark, dir, qterms).count())
        // disjoint-ids contract: shift the drop's ids out of the base
        val drop = docs.limit(50)
          .withColumn("doc_id", col("doc_id") + 10000000L)
        val appendSec = time(graft.ops.SearchIndex.append(spark, drop, dir))
        val compactSec = time(graft.ops.SearchIndex.compact(spark, dir))
        val serveC = time(graft.ops.SearchIndex.serve(spark, dir, qterms).count())
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
        // positional variant: the O(tokens)-row artifact exact-phrase
        // serving reads — build premium vs postings-only is the number
        // the index-time positions trade is made on
        val posDir = java.nio.file.Files.createTempDirectory("bench-lex-pos").toString
        val posBuild = time(graft.ops.SearchIndex.build(spark, docs, posDir,
          withPositions = true))
        val phraseServe = time(graft.ops.SearchIndex.servePhrase(spark, posDir,
          Queries.phraseQueriesOf(docs)).count())
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(posDir))
        s"""{"build_sec":$build,"serve_sec":$serve,""" +
          s""""append_sec":$appendSec,"compact_sec":$compactSec,""" +
          s""""serve_compacted_sec":$serveC,""" +
          s""""pos_build_sec":$posBuild,"phrase_serve_sec":$phraseServe}"""
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] lex_index_split FAILED: ${e.getMessage}")
          errors += "lex_index_split"
          "null"
      }

    // ---- 1c. incremental curation drop cost -------------------------
    // Three sequential drops of the documents table against a fresh
    // state: the steady-state daily-drop cost a curation deployment
    // budgets (atomic-manifest ingest included). Cross-drop duplicate
    // classes come from the table's own planted DupMod copies. Larger
    // constant-drop/growing-state evidence: graft.IncrementalBench.
    val incJson =
      if (pipelineOnly) "null"
      else try {
        val stateDir = java.nio.file.Files.createTempDirectory("bench-inc-state").toString
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(format_string("https://bench.example/d/%d", col("doc_id")).as("url"),
            col("text"))
        val walls = (0 until 3).map { k =>
          val dropDir = java.nio.file.Files.createTempDirectory(s"bench-inc-d$k").toString
          docs.filter(pmod(xxhash64(col("url")), lit(3)) === k)
            .write.mode(SaveMode.Overwrite).parquet(dropDir)
          val t0 = System.nanoTime()
          val r = IncrementalCurate.ingestDrop(spark, dropDir, stateDir)
          val sec = (System.nanoTime() - t0) / 1e9
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dropDir))
          (sec, r)
        }
        val total = spark.read.parquet(s"$stateDir/canonical").count()
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stateDir))
        s"""{"drop_sec":[${walls.map(_._1).mkString(",")}],""" +
          s""""admitted":[${walls.map(_._2.nAdmitted).mkString(",")}],""" +
          s""""state_linked":[${walls.map(_._2.nStateLinked).mkString(",")}],""" +
          s""""canonical_total":$total}"""
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] incremental_curate FAILED: ${e.getMessage}")
          errors += "incremental_curate"
          "null"
      }

    // ---- 2. headline pipeline bench ---------------------------------
    // One-time corpus generation (NOT timed); both parallelism levels
    // read these same files. Partition count >> 32 per BASELINE.md.
    val fs = new org.apache.hadoop.fs.Path(benchDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$benchDir/_SUCCESS"))) {
      PageSource.genPages(spark, benchPages, 128).toDF()
        .write.mode(SaveMode.Overwrite).parquet(benchDir)
    }

    // Cold run first (JIT compiles the kernel + codegen), then the
    // TIMED warm run — the headline docs/sec is reproducible as-invoked
    // instead of 10x below the tuned-protocol number (BENCH.md). Both
    // numbers are reported.
    def runPipeline(): (Double, Long, Long) = {
      val outDir = java.nio.file.Files.createTempDirectory("graft-bench").toString
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
        // zstd = production codec (CodecProbe: 1.7x smaller output);
        // env knob for codec A/B runs
        .option("compression", sys.env.getOrElse("SPARK_GRAFT_OUTPUT_CODEC", "zstd"))
        .option("parquet.enable.dictionary", "false")
        .parquet(s"$outDir/pages_extracted")
      val sec = (System.nanoTime() - t0) / 1e9
      // ONE verification pass: globalDigest already carries n_rows
      val r = ExtractPipeline.globalDigest(
        spark.read.parquet(s"$outDir/pages_extracted")).collect()(0)
      val (digest, rowsOut) = (r.getLong(0), r.getLong(1))
      // the full extracted copy (hundreds of MB) must not leak per run —
      // the interleaved protocol invokes Bench many times per session
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
      (sec, rowsOut, digest)
    }
    val (coldSec, rowsCold, digestCold) = runPipeline()
    val (pipelineSec, rowsOut, digest) = runPipeline()
    require(rowsOut == rowsCold && digest == digestCold, "non-deterministic pipeline output")
    val docsPerSec = rowsOut / pipelineSec
    // the recorded bench_pages must be what was MEASURED, not what was
    // requested: a pre-existing corpus (reused via _SUCCESS) wins over
    // a divergent SPARK_GRAFT_BENCH_PAGES value
    val corpusRows = spark.read.parquet(benchDir).count()
    if (corpusRows != benchPages)
      System.err.println(s"[bench] corpus at $benchDir has $corpusRows pages " +
        s"(requested $benchPages) — recording the measured count")

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ > 0).sum + pipelineSec
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""errors":$errJson,""" +
      s""""pipeline_docs_per_sec":$docsPerSec,"pipeline_rows":$rowsOut,""" +
      s""""pipeline_sec":$pipelineSec,"pipeline_cold_sec":$coldSec,""" +
      s""""pipeline_digest":$digest,"ann_index_split":$annIndexJson,""" +
      s""""lex_index_split":$lexIndexJson,""" +
      s""""incremental_curate":$incJson,""" +
      s""""load_before":$loadBefore,"load_after":${loadAvgJson()},""" +
      s""""host_cpus":${Runtime.getRuntime.availableProcessors()},""" +
      s""""cpus":$cpus,"bench_pages":$corpusRows,"sf":"$sfDir"}""")
    if (errors.nonEmpty)
      System.err.println(s"[bench] ${errors.size} queries failed: ${errors.mkString(",")}")
    spark.stop()
  }
}
