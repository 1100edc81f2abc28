package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** ANN index materialization — the build/serve split a 10^10-vector
  * corpus actually needs. The in-memory operators (VectorOps.annLsh /
  * annPq) recompute buckets, codebooks and codes from the raw
  * embeddings on every invocation; at scale the index build is the
  * expensive OFFLINE job (one full pass + training), and serving must
  * join against a STORED index:
  *
  *  - LSH: the (vec_id, band, bucket) relation persists as parquet.
  *    Serving buckets only the query batch, explodes its probe masks,
  *    and equi-joins the stored relation — the base embeddings are
  *    touched once, in the exact re-rank of the candidate ids.
  *  - PQ: two artifacts — the codebook (subspace, cid, centroid) and
  *    the 6-byte-per-vector code relation (vec_id, s, code). Serving
  *    collects the codebook to the driver (m·k tiny rows), broadcasts
  *    per-query ADC tables, and scans only the stored codes; raw
  *    vectors are read once for the shortlist re-rank.
  *
  * Build and serve compose the SAME private kernels as the in-memory
  * operators (VectorOps.lshBucketize / annLshFrom / pqEncode /
  * annPqFrom), so a served result is bit-identical to the in-memory
  * one — the ann_lsh_serve / ann_pq_serve queries are checked against
  * the very same DuckDB mirrors as ann_lsh / ann_pq.
  *
  * Write discipline matches the engine's tables: zstd, dictionary off
  * (ids and codes are near-unique; see BENCH.md), one overwrite per
  * build (rebuilds are idempotent at the overwrite level).
  */
object AnnIndex {

  private def lshDir(indexDir: String) = s"$indexDir/lsh_buckets"
  private def pqCodebookDir(indexDir: String) = s"$indexDir/pq_codebook"
  private def pqCodesDir(indexDir: String) = s"$indexDir/pq_codes"

  private def write(df: DataFrame, dir: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("compression", "zstd")
      .option("parquet.enable.dictionary", "false")
      .parquet(dir)

  private def lshMetaDir(indexDir: String) = s"$indexDir/lsh_meta"

  /** Materialize the multi-table sign-LSH bucket relation. One pass
    * over the base; the stored rows are (vec_id, band, bucket) — 20
    * bytes each, nTables rows per vector. The plane geometry
    * (nTables, planesPerTable, dim) is persisted alongside — serving
    * reads IT, so a build/serve parameter drift cannot silently
    * produce wrong buckets on the query side.
    */
  def buildLsh(spark: SparkSession, emb: DataFrame, indexDir: String,
               nTables: Int = 16, planesPerTable: Int = 9, dim: Int = 64): Unit = {
    import spark.implicits._
    val planes = VectorOps.hyperplanes(nTables * planesPerTable, dim)
    write(VectorOps.lshBucketize(spark, emb, planes, nTables, planesPerTable),
      lshDir(indexDir))
    write(Seq((nTables, planesPerTable, dim))
      .toDF("n_tables", "planes_per_table", "dim").coalesce(1),
      lshMetaDir(indexDir))
  }

  /** Approximate top-k against a PREBUILT LSH index: identical results
    * to VectorOps.annLsh with the index's build parameters, but the
    * base is never re-bucketed — serve cost is the probe join + one
    * re-rank. Plane geometry comes from the STORED index metadata;
    * only the serve-time knobs (nQueries, k, probeHamming) are
    * caller-chosen.
    */
  def serveLsh(spark: SparkSession, emb: DataFrame, indexDir: String,
               nQueries: Int = 10, k: Int = 5,
               probeHamming: Int = 1): DataFrame = {
    val meta = spark.read.parquet(lshMetaDir(indexDir))
      .select(col("n_tables"), col("planes_per_table"), col("dim")).collect()
    require(meta.length == 1, s"malformed lsh_meta at $indexDir")
    VectorOps.annLshFrom(spark, spark.read.parquet(lshDir(indexDir)), emb,
      nQueries, k, meta(0).getInt(0), meta(0).getInt(1), meta(0).getInt(2),
      probeHamming)
  }

  /** Train PQ codebooks and materialize both index artifacts: the
    * codebook table (subspace, cid, centroid ARRAY<BIGINT>) and the
    * per-vector code relation. Training is the one expensive step —
    * iters passes over the base; encoding is one more.
    */
  def buildPq(spark: SparkSession, emb: DataFrame, indexDir: String,
              m: Int = 8, kCode: Int = 64, iters: Int = 3, dim: Int = 64): Unit = {
    import spark.implicits._
    val codebooks = VectorOps.pqTrain(spark, emb, m, kCode, iters, dim)
    val cbRows = for {
      s <- codebooks.indices
      c <- codebooks(s).indices
    } yield (s, c, codebooks(s)(c).toSeq)
    write(cbRows.toDF("s", "cid", "centroid"), pqCodebookDir(indexDir))
    // from_append=false: these codes were part of the codebook's
    // training set — the staleness metric counts the complement
    write(VectorOps.pqEncode(spark, emb, codebooks, dim)
      .withColumn("from_append", lit(false)), pqCodesDir(indexDir))
  }

  /** Retrain the PQ codebook on the CURRENT corpus and re-encode —
    * the maintenance job behind [[pqStaleness]]: appends encode under
    * a codebook frozen at its last training, so quantization error
    * drifts as the appended share grows. Geometry (m, kCode) comes
    * from the stored codebook; the caller supplies the full current
    * embedding relation (the index stores codes, not raw vectors).
    * After a rebuild the index is bit-identical to a fresh
    * [[buildPq]] over the same relation, and staleness reads 0.
    */
  def rebuildPq(spark: SparkSession, emb: DataFrame, indexDir: String,
                iters: Int = 3): Unit = {
    val codebooks = readCodebooks(spark, indexDir)
    buildPq(spark, emb, indexDir,
      m = codebooks.length, kCode = codebooks(0).length, iters = iters,
      dim = dimOf(codebooks))
  }

  /** Fraction (permille) of stored PQ code rows encoded AFTER the
    * current codebook's training — the retrain-cadence signal: 0 right
    * after build/rebuild, grows with every [[appendPq]] drop. Indexes
    * built before the flag existed read as fully trained (0).
    */
  def pqStaleness(spark: SparkSession, indexDir: String): Long = {
    val codes = spark.read.parquet(pqCodesDir(indexDir))
    if (!codes.columns.contains("from_append")) return 0L
    val r = codes.agg(
      sum(when(col("from_append"), 1L).otherwise(0L)).as("na"),
      count(lit(1)).as("n")).collect()(0)
    if (r.getLong(1) == 0L) 0L else r.getLong(0) * 1000L / r.getLong(1)
  }

  /** Compact the index's append-accumulated small files (thousands of
    * [[appendLsh]]/[[appendPq]] drops leave the bucket/code relations
    * file-open-bound, exactly like the output table CompactJob exists
    * for). Reuses CompactJob's digest-verified atomic swap, clustered
    * on vec_id; served results are bit-identical before and after (the
    * spec asserts it). Returns (table, report) for each relation
    * present.
    */
  def compact(spark: SparkSession, indexDir: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Seq[(String, graft.CompactJob.CompactReport)] = {
    val fsConf = spark.sparkContext.hadoopConfiguration
    // ivf_cells re-clusters on (cell, salt) — the inverted-list
    // locality serving's IN-predicate pruning depends on (the postings
    // discipline); the id-keyed relations cluster on vec_id
    Seq(("lsh_buckets", lshDir(indexDir), "vec_id"),
        ("pq_codes", pqCodesDir(indexDir), "vec_id"),
        ("sq_codes", sqCodesDir(indexDir), "vec_id"),
        ("ivf_cells", ivfCellsDir(indexDir), "cell,salt"))
      .filter { case (_, d, _) =>
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(fsConf).exists(p)
      }
      .map { case (name, d, key) =>
        name -> graft.CompactJob.run(spark, d, targetFileBytes, clusterKey = key)
      }
  }

  /** Rehydrate the driver-side codebook array from the stored table. */
  private def readCodebooks(spark: SparkSession, indexDir: String): Array[Array[Array[Long]]] = {
    val rows = spark.read.parquet(pqCodebookDir(indexDir))
      .select(col("s"), col("cid"), col("centroid"))
      .collect()
    val m = rows.map(_.getInt(0)).max + 1
    val k = rows.map(_.getInt(1)).max + 1
    val out = Array.ofDim[Array[Long]](m, k)
    rows.foreach { r =>
      out(r.getInt(0))(r.getInt(1)) = r.getSeq[Long](2).toArray
    }
    out.map(_.map(c => { require(c != null, "codebook table has holes"); c }))
  }

  /** Vector dimension implied by a codebook: m subspaces × sub
    * components each — serving derives it from the artifact instead of
    * trusting a caller parameter.
    */
  private def dimOf(codebooks: Array[Array[Array[Long]]]): Int =
    codebooks.length * codebooks(0)(0).length

  /** Approximate top-k against a PREBUILT PQ index: identical results
    * to VectorOps.annPq with the index's build parameters — codebooks
    * and codes come from parquet, no training or encoding at serve
    * time; the subspace geometry is implied by the stored codebook.
    */
  def servePq(spark: SparkSession, emb: DataFrame, indexDir: String,
              nQueries: Int = 10, k: Int = 5, shortlist: Int = 100): DataFrame = {
    val codebooks = readCodebooks(spark, indexDir)
    VectorOps.annPqFrom(spark, spark.read.parquet(pqCodesDir(indexDir)),
      codebooks, emb, nQueries, k, shortlist, dimOf(codebooks))
  }

  // -------------------------------------------------------------------
  // SQ8 index — per-dimension scalar quantization (see VectorOps.annSq)
  // -------------------------------------------------------------------

  private def sqMetaDir(indexDir: String) = s"$indexDir/sq_meta"
  private def sqCodesDir(indexDir: String) = s"$indexDir/sq_codes"

  /** Train per-dimension (min, max) and materialize the SQ8 artifacts:
    * a one-row quantizer table (mins, maxs ARRAY<BIGINT>) and the
    * byte-per-dimension code relation. Training is one
    * partial-aggregate pass; encoding one more.
    */
  def buildSq(spark: SparkSession, emb: DataFrame, indexDir: String,
              dim: Int = 64): Unit = {
    import spark.implicits._
    val (mins, maxs) = VectorOps.sqTrain(spark, emb, dim)
    write(Seq((mins.toSeq, maxs.toSeq)).toDF("mins", "maxs").coalesce(1),
      sqMetaDir(indexDir))
    write(VectorOps.sqEncode(spark, emb, mins, maxs)
      .withColumn("from_append", lit(false)), sqCodesDir(indexDir))
  }

  /** Rehydrate the stored quantizer (the geometry travels WITH the
    * index — serve/append cannot drift from build parameters).
    */
  private def readSqMeta(spark: SparkSession, indexDir: String): (Array[Long], Array[Long]) = {
    val rows = spark.read.parquet(sqMetaDir(indexDir))
      .select(col("mins"), col("maxs")).collect()
    require(rows.length == 1, s"malformed sq_meta at $indexDir")
    (rows(0).getSeq[Long](0).toArray, rows(0).getSeq[Long](1).toArray)
  }

  /** Approximate top-k against a PREBUILT SQ8 index — identical
    * results to VectorOps.annSq with the index's quantizer; the base
    * is read once, in the exact re-rank.
    */
  def serveSq(spark: SparkSession, emb: DataFrame, indexDir: String,
              nQueries: Int = 10, k: Int = 5, shortlist: Int = 100): DataFrame = {
    val (mins, maxs) = readSqMeta(spark, indexDir)
    VectorOps.annSqFromQ(spark, spark.read.parquet(sqCodesDir(indexDir)),
      mins, maxs, emb, VectorOps.queriesByIdPrefix(emb, nQueries), k, shortlist)
  }

  /** Arbitrary-query SQ serving. SQ ADC is a broadcast scan by
    * construction (the query batch rides the closure), so this form is
    * for BOUNDED request batches only — the kernel enforces the same
    * 65536 ceiling the LSH/PQ serve guards use; chunk larger batches
    * or use the PQ/LSH serve paths.
    */
  def serveSqQueries(spark: SparkSession, emb: DataFrame, queries: DataFrame,
                     indexDir: String, k: Int = 5, shortlist: Int = 100): DataFrame = {
    val (mins, maxs) = readSqMeta(spark, indexDir)
    VectorOps.annSqFromQ(spark, spark.read.parquet(sqCodesDir(indexDir)),
      mins, maxs, emb, queries.filter(col("q_emb").isNotNull), k, shortlist)
  }

  /** Append newly-arrived vectors encoded under the FROZEN stored
    * quantizer (codes are per-vector independent given (mins, maxs),
    * so append-then-serve equals serving codes of the union encoded
    * under the same frozen quantizer — spec-asserted). Out-of-range
    * values clamp to 0/255; [[sqStaleness]] is the retrain signal.
    * Same disjoint-ids contract as [[appendLsh]].
    */
  def appendSq(spark: SparkSession, newEmb: DataFrame, indexDir: String): Unit = {
    val (mins, maxs) = readSqMeta(spark, indexDir)
    append(VectorOps.sqEncode(spark, newEmb, mins, maxs)
      .withColumn("from_append", lit(true)), sqCodesDir(indexDir))
  }

  /** Permille of stored SQ code rows encoded after the quantizer's
    * training (mirrors [[pqStaleness]]).
    */
  def sqStaleness(spark: SparkSession, indexDir: String): Long = {
    val codes = spark.read.parquet(sqCodesDir(indexDir))
    val r = codes.agg(
      sum(when(col("from_append"), 1L).otherwise(0L)).as("na"),
      count(lit(1)).as("n")).collect()(0)
    if (r.getLong(1) == 0L) 0L else r.getLong(0) * 1000L / r.getLong(1)
  }

  /** Retrain the quantizer on the CURRENT corpus and re-encode —
    * bit-identical to a fresh [[buildSq]]; staleness reads 0 after.
    */
  def rebuildSq(spark: SparkSession, emb: DataFrame, indexDir: String): Unit = {
    val (mins, _) = readSqMeta(spark, indexDir)
    buildSq(spark, emb, indexDir, dim = mins.length)
  }

  // -------------------------------------------------------------------
  // IVF index — coarse k-means cells + probed search (VectorOps.annIvf)
  // -------------------------------------------------------------------

  private def ivfCentroidsDir(indexDir: String) = s"$indexDir/ivf_centroids"
  private def ivfCellsDir(indexDir: String) = s"$indexDir/ivf_cells"

  /** Bounded salt for the cell clustering — the SearchIndex postings
    * discipline: a hot cell (real corpora cluster!) spreads over at
    * most this many cell-sorted slivers instead of one straggler file,
    * and serving's IN(cell,...) predicate still prunes row groups. The
    * salt persists as a column so compaction re-clusters on it.
    */
  private val IvfSaltBuckets = 16

  /** (cell, salt)-clustered write for the inverted-file relation.
    * Dictionary ON — cells and salts repeat heavily (the postings rule,
    * the opposite of the near-unique id/code tables).
    */
  private def writeIvfCells(df: DataFrame, dir: String, mode: SaveMode): Unit =
    df.withColumn("salt",
        pmod(xxhash64(col("vec_id")), lit(IvfSaltBuckets)).cast("int"))
      .repartition(xxhash64(col("cell"), col("salt")))
      .sortWithinPartitions("cell", "vec_id")
      .write.mode(mode)
      .option("compression", "zstd")
      .parquet(dir)

  /** Train the coarse quantizer and materialize the IVF artifacts: a
    * tiny centroid table (cid, centroid ARRAY<BIGINT> — the geometry
    * travels WITH the index) and the (vec_id, cell, salt) inverted-file
    * relation. Training is the expensive step (iters passes); the
    * assignment one more. Serving probes nProbe cells per query and —
    * for bounded batches — reads ONLY those inverted lists off the
    * cell-clustered files.
    */
  def buildIvf(spark: SparkSession, emb: DataFrame, indexDir: String,
               k: Int = 16, iters: Int = 3): Unit = {
    import spark.implicits._
    val centroids = VectorOps.kmeansMilli(spark, emb, k, iters)
    write(centroids.zipWithIndex
      .map { case (c, cid) => (cid, c.toSeq) }.toSeq
      .toDF("cid", "centroid").coalesce(1), ivfCentroidsDir(indexDir))
    writeIvfCells(
      VectorOps.ivfAssign(spark, emb, centroids)
        .withColumn("from_append", lit(false)),
      ivfCellsDir(indexDir), SaveMode.Overwrite)
  }

  /** Rehydrate the stored centroid array (cid-dense, hole-checked). */
  private def readIvfCentroids(spark: SparkSession, indexDir: String): Array[Array[Long]] = {
    val rows = spark.read.parquet(ivfCentroidsDir(indexDir))
      .select(col("cid"), col("centroid")).collect()
    require(rows.nonEmpty, s"malformed ivf_centroids at $indexDir")
    val out = new Array[Array[Long]](rows.map(_.getInt(0)).max + 1)
    rows.foreach(r => out(r.getInt(0)) = r.getSeq[Long](1).toArray)
    out.map(c => { require(c != null, "ivf_centroids table has holes"); c })
  }

  /** Probed top-k against a PREBUILT IVF index — identical results to
    * VectorOps.annIvf with the index's build parameters (same centroid
    * training, same assignment rule, same probe rule, same re-rank
    * contract), but the base is never re-trained or re-assigned: serve
    * cost is the probed-list join plus the exact re-rank of candidates.
    */
  def serveIvf(spark: SparkSession, emb: DataFrame, indexDir: String,
               nQueries: Int = 10, topK: Int = 5, nProbe: Int = 2): DataFrame =
    VectorOps.annIvfFromQ(spark, spark.read.parquet(ivfCellsDir(indexDir)),
      readIvfCentroids(spark, indexDir), emb,
      VectorOps.queriesByIdPrefix(emb, nQueries), topK, nProbe)

  /** Arbitrary-query IVF serving (query_id, q_emb) — broadcast probes
    * + IN-pruned index scan for bounded batches, shuffle fallback
    * otherwise (same guard as the LSH/PQ serve paths).
    */
  def serveIvfQueries(spark: SparkSession, emb: DataFrame, queries: DataFrame,
                      indexDir: String, topK: Int = 5, nProbe: Int = 2): DataFrame = {
    val (q, small) = cleanQueries(queries)
    VectorOps.annIvfFromQ(spark, spark.read.parquet(ivfCellsDir(indexDir)),
      readIvfCentroids(spark, indexDir), emb, q, topK, nProbe,
      broadcastProbes = small)
  }

  /** Append newly-arrived vectors assigned under the FROZEN stored
    * centroids (assignment is per-vector independent given the
    * centroids, so append-then-serve equals serving the union assigned
    * under the same frozen centroids — spec-asserted and
    * batch-associative). [[ivfStaleness]] is the retrain signal; same
    * disjoint-ids contract as [[appendLsh]].
    */
  def appendIvf(spark: SparkSession, newEmb: DataFrame, indexDir: String): Unit =
    writeIvfCells(
      VectorOps.ivfAssign(spark, newEmb, readIvfCentroids(spark, indexDir))
        .withColumn("from_append", lit(true)),
      ivfCellsDir(indexDir), SaveMode.Append)

  /** Permille of stored cell rows assigned after the centroids'
    * training (mirrors [[pqStaleness]]).
    */
  def ivfStaleness(spark: SparkSession, indexDir: String): Long = {
    val r = spark.read.parquet(ivfCellsDir(indexDir)).agg(
      sum(when(col("from_append"), 1L).otherwise(0L)).as("na"),
      count(lit(1)).as("n")).collect()(0)
    if (r.getLong(1) == 0L) 0L else r.getLong(0) * 1000L / r.getLong(1)
  }

  /** Retrain the coarse quantizer on the CURRENT corpus and re-assign —
    * bit-identical to a fresh [[buildIvf]] (k from the stored centroid
    * table); staleness reads 0 after.
    */
  def rebuildIvf(spark: SparkSession, emb: DataFrame, indexDir: String,
                 iters: Int = 3): Unit =
    buildIvf(spark, emb, indexDir,
      k = readIvfCentroids(spark, indexDir).length, iters = iters)

  // -------------------------------------------------------------------
  // arbitrary-query serving — the real request shape
  // -------------------------------------------------------------------

  /** Serve an ARBITRARY query relation (query_id, q_emb) against a
    * stored LSH index — the production request shape (the nQueries
    * forms exist for the oracle harness's vec_id-prefix convention).
    * query_ids need not exist in the base; a matching base vec_id is
    * excluded as the trivial self-hit.
    */
  /** Probe-side relations (LSH bucket probes / PQ ADC tables) are
    * broadcast only when the request batch is provably bounded — a
    * caller passing a 10^8-row query relation would otherwise ship a
    * multi-GB broadcast to every executor (or fail outright at the
    * broadcast ceiling). The size probe is a bounded `limit(N+1)`
    * count, so an unbounded relation costs one cheap action and falls
    * back to a shuffle join; results are identical either way.
    */
  private[ops] val BroadcastQueryLimit = 65536L

  /** Null-embedding query rows are DROPPED up front (a malformed
    * request row must not NPE a task mid-batch; the id simply gets no
    * result rows — the caller's absent-key signal). Returns the clean
    * relation plus whether it is small enough to broadcast probes for.
    */
  private def cleanQueries(queries: DataFrame): (DataFrame, Boolean) = {
    val q = queries.filter(col("q_emb").isNotNull)
    val small = q.limit(BroadcastQueryLimit.toInt + 1).count() <= BroadcastQueryLimit
    (q, small)
  }

  def serveLshQueries(spark: SparkSession, emb: DataFrame, queries: DataFrame,
                      indexDir: String, k: Int = 5, probeHamming: Int = 1): DataFrame = {
    val meta = spark.read.parquet(lshMetaDir(indexDir))
      .select(col("n_tables"), col("planes_per_table"), col("dim")).collect()
    require(meta.length == 1, s"malformed lsh_meta at $indexDir")
    val (q, small) = cleanQueries(queries)
    VectorOps.annLshFromQ(spark, spark.read.parquet(lshDir(indexDir)), emb,
      q, k, meta(0).getInt(0), meta(0).getInt(1),
      meta(0).getInt(2), probeHamming, broadcastProbes = small)
  }

  /** Same for a stored PQ index. */
  def servePqQueries(spark: SparkSession, emb: DataFrame, queries: DataFrame,
                     indexDir: String, k: Int = 5, shortlist: Int = 100): DataFrame = {
    val codebooks = readCodebooks(spark, indexDir)
    val (q, small) = cleanQueries(queries)
    VectorOps.annPqFromQ(spark, spark.read.parquet(pqCodesDir(indexDir)),
      codebooks, emb, q, k, shortlist, dimOf(codebooks),
      broadcastProbes = small)
  }

  // -------------------------------------------------------------------
  // incremental append — the daily-drop serving lifecycle
  // -------------------------------------------------------------------

  private def append(df: DataFrame, dir: String): Unit =
    df.write.mode(SaveMode.Append)
      .option("compression", "zstd")
      .option("parquet.enable.dictionary", "false")
      .parquet(dir)

  /** Append newly-arrived vectors to a stored LSH index WITHOUT
    * touching the existing rows (one pass over the new batch only,
    * plane geometry from the stored metadata). Sign-LSH bucket codes
    * are per-vector independent, so append-then-serve is EXACTLY
    * equal to a full rebuild over the union — the test asserts it.
    * Caller contract: `newEmb` vec_ids are disjoint from the indexed
    * set (the engine's ids are xxhash64-derived; a revisit should
    * compact/rebuild instead).
    */
  def appendLsh(spark: SparkSession, newEmb: DataFrame, indexDir: String): Unit = {
    val meta = spark.read.parquet(lshMetaDir(indexDir))
      .select(col("n_tables"), col("planes_per_table"), col("dim")).collect()
    require(meta.length == 1, s"malformed lsh_meta at $indexDir")
    val (nTables, planesPerTable) = (meta(0).getInt(0), meta(0).getInt(1))
    val planes = VectorOps.hyperplanes(nTables * planesPerTable, meta(0).getInt(2))
    append(VectorOps.lshBucketize(spark, newEmb, planes, nTables, planesPerTable),
      lshDir(indexDir))
  }

  /** Append newly-arrived vectors to a stored PQ index: encode them
    * with the FROZEN stored codebook (the standard serving trade —
    * codebooks retrain on a slow cadence, code appends are cheap and
    * exact under the current codebook; append-then-serve equals
    * serving union codes under the old codebook by construction).
    * Same disjoint-ids contract as [[appendLsh]].
    */
  def appendPq(spark: SparkSession, newEmb: DataFrame, indexDir: String): Unit = {
    val codebooks = readCodebooks(spark, indexDir)
    val encoded = VectorOps.pqEncode(spark, newEmb, codebooks, dimOf(codebooks))
    // match the stored schema: indexes built before the staleness flag
    // existed have no from_append column — appending a wider row would
    // leave the relation schema-split (plain parquet reads pick one
    // file's schema)
    val stored = spark.read.parquet(pqCodesDir(indexDir))
    append(
      if (stored.columns.contains("from_append"))
        encoded.withColumn("from_append", lit(true))
      else encoded,
      pqCodesDir(indexDir))
  }
}
