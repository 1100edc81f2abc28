package graft.ops

import org.apache.hadoop.fs.Path
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
  *  - `lex_meta`  — append-only (n_docs, sum_dl) DELTA rows, one per
  *    build/append; readers SUM them. Deltas make the meta leg
  *    append-only like the postings leg, so one commit manifest can
  *    cover both (below) — the overwrite-a-stats-row design had an
  *    unfixable crash window between the two writes.
  *  - `_lexlog/`  — per-mutation commit manifests (`m-*.list`, one
  *    `table/filename` line per file the mutation added; written via
  *    temp + atomic rename AFTER both appends — the single commit
  *    point, the IncrementalCurate `_drops` protocol). Writers
  *    reconcile unlisted debris at entry; READERS resolve the
  *    committed file set and read exactly those files, so a crashed
  *    append is invisible to serving even before the next writer
  *    cleans it up. Pre-manifest (legacy) dirs are genesis-adopted.
  *
  * Serving composes the SAME scoring kernel as the in-memory search
  * (SearchOps.bm25From), so a served result is bit-identical to
  * bm25Search over the same corpus — bm25_serve is checked against the
  * very same DuckDB mirror as bm25_search.
  *
  * Appends are EXACT: postings rows are per-document independent and
  * the meta stats are associative sums, so append-then-serve equals a
  * full rebuild over the union (stronger than PQ's frozen-codebook
  * trade; spec-asserted). Single-writer discipline: one build/append/
  * compact at a time (serves are safe concurrent readers).
  */
object SearchIndex {

  /** Max distinct terms inlined as a pushdown-able IN literal; larger
    * (still bounded) batches gate via a broadcast semi-join instead —
    * identical results, no row-group pruning.
    */
  val TermPushdownLimit = 1024

  private val Tables = Seq("postings", "lex_meta", "positions", "deleted_docs")
  private def postingsDir(indexDir: String) = s"$indexDir/postings"
  private def metaDir(indexDir: String) = s"$indexDir/lex_meta"
  private def positionsDir(indexDir: String) = s"$indexDir/positions"
  private def deletedDir(indexDir: String) = s"$indexDir/deleted_docs"
  private def logPath(indexDir: String) = new Path(s"$indexDir/_lexlog")

  private def fsOf(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Bounded salt for the postings clustering: a Zipf-hot term's
    * posting list is O(corpus) rows — hashing on term alone would sink
    * it all into ONE straggler task/file (the skew class CLAUDE.md's
    * uniform url-hash rule exists to avoid). Salting by doc_id mod 16
    * bounds a term's spread to 16 partitions/files: build and compact
    * stay balanced, while the serve-time IN predicate still prunes to
    * at most 16 term-sorted slivers per term. The salt persists as a
    * postings column so compaction can re-cluster on (term, salt).
    */
  private[graft] val SaltBuckets = 16

  /** (term, salt)-hash clustering + in-file term sort: bounded-skew
    * co-location with parquet row-group min/max stats the serve-time
    * IN predicate can prune on.
    */
  private def clustered(postings: DataFrame): DataFrame = postings
    .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(SaltBuckets)).cast("int"))
    .repartition(xxhash64(col("term"), col("salt")))
    .sortWithinPartitions("term", "doc_id")

  private def write(df: DataFrame, dir: String, mode: SaveMode): Unit =
    df.write.mode(mode).option("compression", "zstd").parquet(dir)

  // ---- commit manifests (`_lexlog/m-*.list`) --------------------------

  private def listDataNames(spark: SparkSession, indexDir: String,
                            table: String): Seq[String] = {
    val p = new Path(s"$indexDir/$table")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).iterator.filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }.map(st => s"$table/${st.getPath.getName}").toSeq
  }

  private def allDataNames(spark: SparkSession, indexDir: String): Seq[String] =
    Tables.flatMap(listDataNames(spark, indexDir, _))

  /** `table/filename` entries committed manifests record; None when the
    * index predates the log (legacy: trust the directories).
    */
  private def committedEntries(spark: SparkSession,
                               indexDir: String): Option[Set[String]] = {
    val lp = logPath(indexDir)
    val fs = lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(lp)) None
    else Some(fs.listStatus(lp).iterator
      .filter(st => st.isFile && st.getPath.getName.endsWith(".list"))
      .flatMap { st =>
        val in = fs.open(st.getPath)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      }
      .filter(_.nonEmpty).toSet)
  }

  /** Has a mutation with this caller-chosen id already committed?
    * The manifest IS the commit marker — streaming retries key their
    * idempotence off it (no separate marker file, no window between
    * "append committed" and "marker written").
    */
  def mutationCommitted(spark: SparkSession, indexDir: String,
                        mutationId: String): Boolean = {
    val m = new Path(logPath(indexDir), s"m-$mutationId.list")
    m.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(m)
  }

  private def writeManifest(spark: SparkSession, indexDir: String,
                            entries: Seq[String],
                            mutationId: Option[String] = None): Unit = {
    if (entries.isEmpty) return
    val lp = logPath(indexDir)
    val fs = lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(lp)
    val id = mutationId.getOrElse(java.util.UUID.randomUUID().toString)
    val tmp = new Path(lp, s".tmp-$id")
    val fin = new Path(lp, s"m-$id.list")
    val out = fs.create(tmp, true)
    try out.write((entries.sorted.mkString("\n") + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // rename returns false (not an exception) on several filesystems —
    // an unchecked failure here would let the caller report a commit
    // whose files the next reconcile deletes as debris
    require(fs.rename(tmp, fin), s"manifest commit failed: $tmp -> $fin")
  }

  /** Writer-side rollback of a crashed mutation: delete index data
    * files no manifest lists. Legacy dirs are genesis-adopted first.
    * Returns the deleted entries.
    */
  def reconcile(spark: SparkSession, indexDir: String): Seq[String] =
    committedEntries(spark, indexDir) match {
      case None =>
        val current = allDataNames(spark, indexDir)
        if (current.nonEmpty) writeManifest(spark, indexDir, current)
        Seq.empty
      case Some(ok) =>
        val debris = allDataNames(spark, indexDir).filterNot(ok.contains)
        val fs = fsOf(spark, indexDir)
        debris.foreach(e => fs.delete(new Path(s"$indexDir/$e"), false))
        debris
    }

  /** Full paths of the table's committed-AND-present data files
    * (legacy log-less dirs: every data file).
    */
  private def committedFiles(spark: SparkSession, indexDir: String,
                             table: String): Seq[String] =
    (committedEntries(spark, indexDir) match {
      case None => listDataNames(spark, indexDir, table)
      case Some(ok) => listDataNames(spark, indexDir, table).filter(ok.contains)
    }).map(e => s"$indexDir/$e")

  /** The committed view of an index table: exactly the files manifests
    * record (legacy log-less dirs read whole). A crashed append's
    * debris never reaches a reader through here; a crashed REBUILD
    * (committed entries but files overwritten away) fails loudly.
    */
  private def readCommitted(spark: SparkSession, indexDir: String,
                            table: String): DataFrame = {
    val files = committedFiles(spark, indexDir, table)
    require(files.nonEmpty,
      s"no committed $table files at $indexDir (crashed build? re-run build)")
    spark.read.parquet(files: _*)
  }

  // ---- build / append / serve ----------------------------------------

  /** Materialize the inverted index: one tokenize+aggregate pass for
    * the postings, one scalar pass for the stats. Overwrites any
    * existing index at `indexDir` (rebuilds are idempotent at the
    * overwrite level); the commit log restarts with a fresh genesis.
    */
  /** @param withPositions also materialize the POSITIONAL postings
    *   table (doc_id, pos, term — one row per token, not per distinct
    *   term) so [[servePhrase]] can answer exact-phrase queries from
    *   the stored index. Same (term, salt) clustering + in-file term
    *   sort as the postings, so a phrase batch's IN predicate prunes
    *   its row groups too. Off by default: positions cost O(tokens)
    *   rows vs postings' O(distinct terms) — the standard Lucene-style
    *   index-time trade, chosen per deployment. Appends follow the
    *   stored index's shape automatically.
    */
  def build(spark: SparkSession, docs: DataFrame, indexDir: String,
            mutationId: Option[String] = None,
            withPositions: Boolean = false): Unit = {
    import spark.implicits._
    // Empty-corpus guard BEFORE any index surgery (cheap limit-1 scan,
    // not a corpus pass — the full stats now derive from the postings
    // read-back below).
    require(docs.limit(1).count() > 0,
      "cannot build a lexical index over an empty corpus")
    // The log is NOT deleted up front: a crash mid-rebuild must never
    // leave a log-less mixed state a reader would legacy-adopt (new
    // postings scored with old stats). Instead the overwrites run
    // under the OLD manifests — their entries then name files the
    // overwrite deleted, so readers fail LOUDLY ("no committed files",
    // recovery = re-run build) rather than silently mis-score — the
    // new manifest is the commit point, and only then are the old
    // manifests retired.
    val lp = logPath(indexDir)
    val lfs = lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oldManifests =
      if (!lfs.exists(lp)) Seq.empty[Path]
      else lfs.listStatus(lp).iterator
        .filter(st => st.isFile && st.getPath.getName.endsWith(".list"))
        .map(_.getPath).toSeq
    write(clustered(SearchOps.postingsOf(docs)), postingsDir(indexDir),
      SaveMode.Overwrite)
    // Corpus stats derived from the just-written ARTIFACT instead of a
    // second full corpus pass (r6: the old corpusStats scalar pass
    // tokenized the whole corpus again — at index scale that is a
    // second complete read+split of the input). dl is functionally
    // determined by doc_id (index contract: unique doc ids, non-null
    // text — every doc yields >= 1 posting, split('') == ['']), so
    // distinct (doc_id, dl) pairs reproduce corpusStats exactly —
    // spec-pinned in SearchOpsSpec incl. empty-string and ragged-
    // whitespace texts. The read-back touches postings (term-sized),
    // not the corpus.
    val statsRow = spark.read.parquet(postingsDir(indexDir))
      .select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).cast("long").as("n"),
        coalesce(sum(col("dl")), lit(0L)).cast("long").as("sdl")).collect()(0)
    val (n, sdl) = (statsRow.getLong(0), statsRow.getLong(1))
    // all-degenerate corpora (e.g. every text NULL) produce no
    // postings: fail loud — readers then see the documented
    // crashed-rebuild state (old manifests name overwritten files),
    // recovery = re-run build over a real corpus
    require(n > 0, "cannot build a lexical index over an empty corpus")
    write(Seq((n, sdl)).toDF("n_docs", "sum_dl").coalesce(1),
      metaDir(indexDir), SaveMode.Overwrite)
    if (withPositions)
      write(clustered(SearchOps.positionsOf(docs)), positionsDir(indexDir),
        SaveMode.Overwrite)
    else
      // a rebuild WITHOUT positions over a previously-positional index
      // must not genesis-adopt the stale positional files (they'd
      // disagree with the new postings) — drop the dir outright
      fsOf(spark, indexDir).delete(new Path(positionsDir(indexDir)), true)
    writeManifest(spark, indexDir, allDataNames(spark, indexDir), mutationId)
    // retired entries name already-deleted files — removing them is
    // cleanup, not a commit step (a crash here is harmless)
    oldManifests.foreach(m => lfs.delete(m, false))
  }

  /** True iff the index has a COMMITTED build (a manifest recording a
    * lex_meta file). A crash mid-build leaves dirs but no manifest —
    * callers deciding build-vs-append must key off this, not dir
    * existence, or a partial build gets genesis-adopted as the base.
    */
  def hasCommittedIndex(spark: SparkSession, indexDir: String): Boolean =
    committedEntries(spark, indexDir)
      .exists(_.exists(_.startsWith("lex_meta/")))

  /** True iff the committed index carries the positional artifact
    * (appends follow the stored shape off this, and [[servePhrase]]
    * requires it). Legacy log-less indexes predate positions — false.
    */
  def hasPositions(spark: SparkSession, indexDir: String): Boolean =
    committedEntries(spark, indexDir)
      .exists(_.exists(_.startsWith("positions/")))

  /** Summed stored corpus stats (delta rows over all committed
    * builds/appends).
    */
  private def readMeta(spark: SparkSession, indexDir: String): (Long, Long) = {
    val rows = readCommitted(spark, indexDir, "lex_meta")
      .agg(sum(col("n_docs")).as("n"), sum(col("sum_dl")).as("sdl")).collect()
    require(rows.length == 1 && !rows(0).isNullAt(0),
      s"malformed lex_meta at $indexDir")
    (rows(0).getLong(0), rows(0).getLong(1))
  }

  /** Committed tombstone set, None when no delete has ever committed —
    * callers skip the anti-join entirely on the (hot) tombstone-free
    * path.
    */
  private def tombstonesOpt(spark: SparkSession,
                            indexDir: String): Option[DataFrame] = {
    val files = committedFiles(spark, indexDir, "deleted_docs")
    if (files.isEmpty) None
    else Some(spark.read.parquet(files: _*).select("doc_id").distinct())
  }

  /** Remove documents from the stored index WITHOUT rewriting the
    * postings: deletion appends a tombstone row per victim doc_id plus
    * a NEGATIVE (n_docs, sum_dl) meta delta — both through the same
    * single-manifest commit appends use, so a delete is exactly as
    * crash-atomic as an append (all-or-nothing, idempotent under a
    * replayed mutationId). Serving anti-joins the tombstone set; the
    * corpus stats and per-term df a BM25 score reads then equal a
    * fresh build over the survivors, so delete-then-serve is
    * bit-identical to rebuild-then-serve (spec + the bm25_delete
    * oracle row). Physical removal happens at [[compact]], which
    * applies tombstones to the postings/positions files and drops the
    * tombstone table — the Iceberg delete-file shape. Contract: a
    * tombstoned doc_id stays deleted even if re-appended, until a
    * compact has applied the tombstone. Returns victims actually
    * removed (ids not in the index, or already deleted, count 0).
    */
  def delete(spark: SparkSession, docIds: DataFrame, indexDir: String,
             mutationId: Option[String] = None): Long = {
    import spark.implicits._
    if (mutationId.exists(mutationCommitted(spark, indexDir, _))) return 0L
    reconcile(spark, indexDir)
    val victims = docIds.select(col("doc_id").cast("long").as("doc_id")).distinct()
    val postings = readCommitted(spark, indexDir, "postings")
    val present0 = postings.join(victims, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("dl")).distinct()
    val present = tombstonesOpt(spark, indexDir)
      .fold(present0)(t => present0.join(t, Seq("doc_id"), "left_anti"))
    // stage to scratch: the tombstone append's lineage must NOT read
    // deleted_docs (append → recache invalidation → self-taint; the
    // IncrementalCurate lesson, see CLAUDE.md)
    val scratch = java.nio.file.Files.createTempDirectory("lex-del").toString
    present.coalesce(1).write.mode(SaveMode.Overwrite).parquet(scratch)
    val staged = spark.read.parquet(scratch)
    val stats = staged.agg(count(lit(1)), sum(col("dl"))).collect()(0)
    val nDel = stats.getLong(0)
    if (nDel == 0L) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(scratch))
      return 0L
    }
    val sdlDel = stats.getLong(1)
    val before = allDataNames(spark, indexDir).toSet
    write(staged.select("doc_id").coalesce(1), deletedDir(indexDir), SaveMode.Append)
    write(Seq((-nDel, -sdlDel)).toDF("n_docs", "sum_dl").coalesce(1),
      metaDir(indexDir), SaveMode.Append)
    writeManifest(spark, indexDir,
      allDataNames(spark, indexDir).filterNot(before.contains), mutationId)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(scratch))
    nDel
  }

  /** Total docs the index covers (0 for a missing index) — the
    * freshness denominator callers like IncrementalCurate.lexStaleness
    * compare against their corpus count.
    */
  def indexedDocs(spark: SparkSession, indexDir: String): Long =
    if (committedFiles(spark, indexDir, "lex_meta").isEmpty) 0L
    else readMeta(spark, indexDir)._1

  /** Top-k BM25 against the PREBUILT index: bit-identical to
    * SearchOps.bm25Search over the indexed corpus, but the corpus is
    * never rescanned — serve cost is the postings probe (row-group
    * pruned for small batches) + the score aggregation. Reads only
    * COMMITTED index files (crash debris invisible). Null-term request
    * rows are dropped at entry; probe relations ride broadcasts only
    * under the bounded-batch guard (shuffle fallback with identical
    * results); `maxDfPermille` dials the hot-term cap (default off).
    */
  def serve(spark: SparkSession, indexDir: String, queryTerms: DataFrame,
            k: Int = 10, probeLimit: Long = AnnIndex.BroadcastQueryLimit,
            pushdownTerms: Int = TermPushdownLimit,
            maxDfPermille: Long = 1000L): DataFrame = {
    val (n, sdl) = readMeta(spark, indexDir)
    val qterms = SearchOps.cleanTerms(queryTerms)
    val bounded = SearchOps.isBounded(qterms, probeLimit)
    val postings = readCommitted(spark, indexDir, "postings")
    val termSet = qterms.select("term").distinct()
    val gated = gateByTerms(postings, termSet, bounded, pushdownTerms)
    // deleted docs are invisible: the anti-join runs BEFORE df/score
    // aggregation, and the meta sums already carry the delete's
    // negative delta — scores equal a rebuild over the survivors
    val live = tombstonesOpt(spark, indexDir)
      .fold(gated)(t => gated.join(t, Seq("doc_id"), "left_anti"))
    SearchOps.bm25From(live, n, sdl * 1000L / n, qterms, k, bounded,
      maxDfPermille)
  }

  /** Term gate shared by BM25 and phrase serving: a small bounded
    * batch inlines a literal IN predicate (pushes into the parquet
    * scan, prunes term-sorted row groups); larger batches gate via a
    * semi-join — broadcast when bounded, shuffle otherwise. Identical
    * result rows on every path.
    */
  private def gateByTerms(rel: DataFrame, termSet: DataFrame,
                          bounded: Boolean, pushdownTerms: Int): DataFrame = {
    val inlined: Option[Seq[String]] =
      if (bounded && pushdownTerms > 0) {
        val ts = termSet.limit(pushdownTerms + 1).collect().map(_.getString(0))
        if (ts.length <= pushdownTerms) Some(ts.toSeq) else None
      } else None
    inlined match {
      case Some(ts) => rel.filter(col("term").isin(ts: _*))
      case None => rel.join(
        if (bounded) broadcast(termSet) else termSet, Seq("term"), "left_semi")
    }
  }

  /** Exact-phrase top-k against the PREBUILT positional artifact —
    * bit-identical to SearchOps.phraseSearch over the indexed corpus
    * (the anchor-join kernel phraseFrom is shared verbatim, so
    * phrase_serve checks against phrase_search's oracle SQL), but the
    * corpus text is never rescanned: the phrase batch's term IN
    * predicate prunes the term-sorted positional row groups exactly
    * like BM25 serving. Requires an index built withPositions=true.
    */
  def servePhrase(spark: SparkSession, indexDir: String, phrases: DataFrame,
                  k: Int = 10, probeLimit: Long = AnnIndex.BroadcastQueryLimit,
                  pushdownTerms: Int = TermPushdownLimit): DataFrame = {
    require(hasPositions(spark, indexDir),
      s"no committed positional artifact at $indexDir (build withPositions=true)")
    val q = phrases.filter(col("term").isNotNull)
      .select(col("query_id").cast("long").as("query_id"),
        col("off").cast("long").as("off"), col("term"))
    val bounded = SearchOps.isBounded(q, probeLimit)
    val gated = gateByTerms(readCommitted(spark, indexDir, "positions"),
      q.select("term").distinct(), bounded, pushdownTerms)
    val live = tombstonesOpt(spark, indexDir)
      .fold(gated)(t => gated.join(t, Seq("doc_id"), "left_anti"))
    SearchOps.phraseFrom(live, q, k, bounded)
  }

  /** Append newly-arrived documents WITHOUT touching existing rows:
    * their postings are per-document independent and the meta stats
    * are delta rows, so append-then-serve is EXACTLY a rebuild over
    * the union (spec-asserted). Crash-atomic: unlisted debris from a
    * previous crash is reconciled at entry, the postings and meta
    * delta appends publish through ONE manifest (atomic rename — the
    * commit point), so a crash anywhere mid-append rolls back wholly
    * and a RETRY of the same batch is exact, never doubled. Caller
    * contract: `newDocs` doc_ids are disjoint from the indexed set
    * (the engine's ids are xxhash64-derived; a revisit should rebuild
    * instead). Returns the number of docs appended.
    */
  def append(spark: SparkSession, newDocs: DataFrame, indexDir: String,
             mutationId: Option[String] = None): Long = {
    import spark.implicits._
    if (mutationId.exists(mutationCommitted(spark, indexDir, _))) return 0L
    val (dn, dsdl) = SearchOps.corpusStats(newDocs)
    if (dn == 0L) return 0L
    // appends follow the stored index's shape: a positional index gets
    // the drop's positions too, inside the SAME commit manifest
    val positional = hasPositions(spark, indexDir)
    reconcile(spark, indexDir)
    val before = allDataNames(spark, indexDir).toSet
    write(clustered(SearchOps.postingsOf(newDocs)), postingsDir(indexDir),
      SaveMode.Append)
    write(Seq((dn, dsdl)).toDF("n_docs", "sum_dl").coalesce(1),
      metaDir(indexDir), SaveMode.Append)
    if (positional)
      write(clustered(SearchOps.positionsOf(newDocs)), positionsDir(indexDir),
        SaveMode.Append)
    writeManifest(spark, indexDir,
      allDataNames(spark, indexDir).filterNot(before.contains), mutationId)
    dn
  }

  /** Compact append-accumulated small postings files (thousands of
    * daily drops leave the relation file-open-bound, exactly like the
    * output table). Digest-verified atomic swap, re-clustered on term;
    * served results are bit-identical before and after (spec). The
    * commit log is deleted BEFORE the swap (a stale manifest naming
    * replaced files would make the next reconcile delete the compacted
    * postings) and the compacted index re-adopts into a fresh genesis
    * after — the compactState discipline.
    */
  def compact(spark: SparkSession, indexDir: String,
              targetFileBytes: Long = 128L * 1024 * 1024): graft.CompactJob.CompactReport = {
    reconcile(spark, indexDir)
    // tombstones apply PHYSICALLY here (targeted DeleteJob rewrite of
    // only the files that hold a victim), then drop. Every crash point
    // below genesis-adopts consistently BECAUSE tombstones are
    // idempotent: until their files are deleted (last), serving
    // anti-joins ids that may or may not still have postings rows —
    // identical results either way.
    val tomb = tombstonesOpt(spark, indexDir)
    fsOf(spark, indexDir).delete(logPath(indexDir), true)
    tomb.foreach { t =>
      graft.DeleteJob.run(spark, postingsDir(indexDir), t,
        keyCol = "doc_id", targetFileBytes = targetFileBytes)
      if (fsOf(spark, indexDir).exists(new Path(positionsDir(indexDir))))
        graft.DeleteJob.run(spark, positionsDir(indexDir), t,
          keyCol = "doc_id", targetFileBytes = targetFileBytes)
    }
    // (term, salt) keeps the rewrite balanced under Zipf-hot terms —
    // same bounded-spread trade as the build clustering
    val report = graft.CompactJob.run(spark, postingsDir(indexDir),
      targetFileBytes, clusterKey = "term,salt")
    // a positional index compacts its positions under the same key
    // (and the same fresh genesis below)
    if (fsOf(spark, indexDir).exists(new Path(positionsDir(indexDir))))
      graft.CompactJob.run(spark, positionsDir(indexDir),
        targetFileBytes, clusterKey = "term,salt")
    tomb.foreach(_ => fsOf(spark, indexDir)
      .delete(new Path(deletedDir(indexDir)), true))
    writeManifest(spark, indexDir, allDataNames(spark, indexDir))
    report
  }
}
