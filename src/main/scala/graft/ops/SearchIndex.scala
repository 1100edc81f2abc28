package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Lexical (inverted) index materialization — the build/serve split
  * for BM25 retrieval, mirroring ops/AnnIndex's lifecycle: at corpus
  * scale the tokenize+postings aggregation is the expensive OFFLINE
  * job (one full pass over text), and serving must answer request
  * batches from STORED postings without ever rescanning the corpus.
  *
  * Artifacts under `indexDir`:
  *  - `postings`  — (doc_id, dl, term, tf), clustered by term hash and
  *    term-sorted within files, so a small request batch's literal
  *    `term IN (...)` predicate pushes into the parquet scan and
  *    prunes row groups by min/max stats (serve reads a sliver of the
  *    index, not all of it). Dictionary encoding stays ON here —
  *    unlike urls/text (near-unique, see BENCH.md), terms repeat
  *    massively and dictionary-encode well.
  *  - `lex_meta`  — one row (n_docs, sum_dl): the corpus stats BM25
  *    needs. The stats travel WITH the index (the AnnIndex geometry
  *    discipline) so serving cannot drift from the built corpus.
  *
  * Serving composes the SAME scoring kernel as the in-memory search
  * (SearchOps.bm25From), so a served result is bit-identical to
  * bm25Search over the same corpus — bm25_serve is checked against the
  * very same DuckDB mirror as bm25_search.
  *
  * Appends are EXACT: postings rows are per-document independent and
  * the meta stats are associative sums, so append-then-serve equals a
  * full rebuild over the union (stronger than PQ's frozen-codebook
  * trade; spec-asserted). A crash between the postings append and the
  * meta overwrite leaves stats excluding the appended docs — rerun
  * [[build]] (idempotent at the overwrite level) to recover.
  */
object SearchIndex {

  /** Max distinct terms inlined as a pushdown-able IN literal; larger
    * (still bounded) batches gate via a broadcast semi-join instead —
    * identical results, no row-group pruning.
    */
  val TermPushdownLimit = 1024

  private def postingsDir(indexDir: String) = s"$indexDir/postings"
  private def metaDir(indexDir: String) = s"$indexDir/lex_meta"

  /** Term-hash clustering + in-file term sort: co-locates a term's
    * postings and gives parquet row-group min/max stats the serve-time
    * IN predicate can prune on.
    */
  private def clustered(postings: DataFrame): DataFrame = postings
    .repartition(xxhash64(col("term")))
    .sortWithinPartitions("term", "doc_id")

  private def write(df: DataFrame, dir: String, mode: SaveMode): Unit =
    df.write.mode(mode).option("compression", "zstd").parquet(dir)

  /** Materialize the inverted index: one tokenize+aggregate pass for
    * the postings, one scalar pass for the stats.
    */
  def build(spark: SparkSession, docs: DataFrame, indexDir: String): Unit = {
    import spark.implicits._
    val (n, sdl) = SearchOps.corpusStats(docs)
    require(n > 0, "cannot build a lexical index over an empty corpus")
    write(clustered(SearchOps.postingsOf(docs)), postingsDir(indexDir),
      SaveMode.Overwrite)
    write(Seq((n, sdl)).toDF("n_docs", "sum_dl").coalesce(1),
      metaDir(indexDir), SaveMode.Overwrite)
  }

  /** Rehydrate the stored corpus stats (one tiny row). */
  private def readMeta(spark: SparkSession, indexDir: String): (Long, Long) = {
    val rows = spark.read.parquet(metaDir(indexDir))
      .select(col("n_docs"), col("sum_dl")).collect()
    require(rows.length == 1, s"malformed lex_meta at $indexDir")
    (rows(0).getLong(0), rows(0).getLong(1))
  }

  /** Top-k BM25 against the PREBUILT index: bit-identical to
    * SearchOps.bm25Search over the indexed corpus, but the corpus is
    * never rescanned — serve cost is the postings probe (row-group
    * pruned for small batches) + the score aggregation. Null-term
    * request rows are dropped at entry; probe relations ride
    * broadcasts only under the bounded-batch guard (shuffle fallback
    * with identical results).
    */
  def serve(spark: SparkSession, indexDir: String, queryTerms: DataFrame,
            k: Int = 10, probeLimit: Long = AnnIndex.BroadcastQueryLimit,
            pushdownTerms: Int = TermPushdownLimit,
            maxDfPermille: Long = 1000L): DataFrame = {
    val (n, sdl) = readMeta(spark, indexDir)
    val qterms = SearchOps.cleanTerms(queryTerms)
    val bounded = SearchOps.isBounded(qterms, probeLimit)
    val postings = spark.read.parquet(postingsDir(indexDir))
    val termSet = qterms.select("term").distinct()
    // small bounded batch → literal IN predicate (pushes into the
    // parquet scan, prunes term-sorted row groups); larger → semi-join
    val inlined: Option[Seq[String]] =
      if (bounded && pushdownTerms > 0) {
        val ts = termSet.limit(pushdownTerms + 1).collect().map(_.getString(0))
        if (ts.length <= pushdownTerms) Some(ts.toSeq) else None
      } else None
    val gated = inlined match {
      case Some(ts) => postings.filter(col("term").isin(ts: _*))
      case None => postings.join(
        if (bounded) broadcast(termSet) else termSet, Seq("term"), "left_semi")
    }
    SearchOps.bm25From(gated, n, sdl * 1000L / n, qterms, k, bounded,
      maxDfPermille)
  }

  /** Append newly-arrived documents WITHOUT touching existing rows:
    * their postings are per-document independent and the meta stats
    * are sums, so append-then-serve is EXACTLY a rebuild over the
    * union (spec-asserted). Caller contract: `newDocs` doc_ids are
    * disjoint from the indexed set (the engine's ids are
    * xxhash64-derived; a revisit should rebuild instead).
    */
  def append(spark: SparkSession, newDocs: DataFrame, indexDir: String): Unit = {
    import spark.implicits._
    val (dn, dsdl) = SearchOps.corpusStats(newDocs)
    if (dn == 0L) return
    // stats first collected to the driver — the meta overwrite below
    // must not read a dir its own plan lineage depends on
    val (n, sdl) = readMeta(spark, indexDir)
    write(clustered(SearchOps.postingsOf(newDocs)), postingsDir(indexDir),
      SaveMode.Append)
    write(Seq((n + dn, sdl + dsdl)).toDF("n_docs", "sum_dl").coalesce(1),
      metaDir(indexDir), SaveMode.Overwrite)
  }

  /** Compact append-accumulated small postings files (thousands of
    * daily drops leave the relation file-open-bound, exactly like the
    * output table). Digest-verified atomic swap, re-clustered on term;
    * served results are bit-identical before and after (spec).
    */
  def compact(spark: SparkSession, indexDir: String,
              targetFileBytes: Long = 128L * 1024 * 1024): graft.CompactJob.CompactReport =
    graft.CompactJob.run(spark, postingsDir(indexDir), targetFileBytes,
      clusterKey = "term")
}
