package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Term-based retrieval over the corpus — the lexical complement to
  * the ANN family (ops/VectorOps, ops/AnnIndex). A curation team uses
  * this for corpus exploration, contamination triage ("which training
  * docs match this eval question?"), and targeted audits, where an
  * embedding index is the wrong tool because the probe is a literal
  * phrase.
  *
  * Scoring is an integer-exact BM25 variant so the DuckDB oracle can
  * replay it bit-for-bit (the cross-engine float discipline of
  * CLAUDE.md): BM25's tf-saturation term is kept exactly, in milli
  * fixed-point (k1 = 1.2, b = 0.75 → 1200/750 milli); the logarithmic
  * idf is replaced by a scaled reciprocal idf_milli = (N·1000) DIV df
  * clamped at 10^7 (log and reciprocal are both monotone in rarity —
  * ranking quality is preserved while every engine computes the same
  * longs; the clamp keeps idf·tfpart inside 63 bits at any corpus
  * size: contrib ≤ 10^7 · 2.2·10^6 / 10^3 = 2.2·10^10 per term).
  *
  * The scoring kernel ([[bm25From]]) is shared VERBATIM between the
  * in-memory search ([[bm25Search]]) and the stored-index serving path
  * (ops/SearchIndex.serve), so a served result is bit-identical to the
  * in-memory one — bm25_search and bm25_serve check against the SAME
  * DuckDB mirror.
  */
object SearchOps {

  /** k1 in milli (BM25 tf saturation). */
  val K1Milli = 1200L
  /** b in milli (BM25 length normalization). */
  val BMilli = 750L
  /** idf_milli clamp — bounds per-term contribution at any N. */
  val IdfClampMilli = 10000000L

  /** (doc_id, dl, words) projection of a (doc_id, text) relation —
    * whitespace tokens, document length in tokens.
    */
  private def tokenized(docs: DataFrame): DataFrame = docs
    .select(col("doc_id").cast("long").as("doc_id"),
      split(col("text"), " ").as("words"))
    .withColumn("dl", size(col("words")).cast("long"))

  /** Full postings relation (doc_id, dl, term, tf) — one row per
    * distinct (document, term). This is the inverted-index payload
    * SearchIndex materializes; the in-memory search computes the
    * query-gated subset of exactly these rows.
    */
  def postingsOf(docs: DataFrame): DataFrame = tokenized(docs)
    .select(col("doc_id"), col("dl"), explode(col("words")).as("term"))
    .groupBy(col("doc_id"), col("term"), col("dl"))
    .agg(count(lit(1)).as("tf"))

  /** POSITIONAL postings (doc_id, pos, term) — one row per token
    * occurrence (not per distinct term): the artifact exact-phrase
    * serving reads. Same tokenizer as [[postingsOf]], so the two
    * tables can never disagree about a document's terms.
    */
  def positionsOf(docs: DataFrame): DataFrame = tokenized(docs)
    .select(col("doc_id"), posexplode(col("words")).as(Seq("pos", "term")))
    .select(col("doc_id"), col("pos").cast("long").as("pos"), col("term"))

  /** Corpus scalar stats (nDocs, sumDl) — one 2-long row to the
    * driver; the only driver-side state BM25 needs.
    */
  def corpusStats(docs: DataFrame): (Long, Long) = {
    val r = tokenized(docs).agg(count(lit(1)).cast("long").as("n"),
      sum(col("dl")).cast("long").as("sdl")).collect()(0)
    if (r.getLong(0) == 0L) (0L, 0L) else (r.getLong(0), r.getLong(1))
  }

  /** Scoring kernel over an ALREADY term-gated postings relation:
    * df from the gated postings themselves (a term's posting set IS
    * its document set — no corpus-wide df pass), milli fixed-point
    * BM25-variant contribution, per-query row_number top-k.
    *
    * `broadcastProbes` guards the probe-side broadcasts (per-term df,
    * query terms — both bounded by the request batch when the caller
    * verified it): an unbounded query relation falls back to plain
    * shuffle joins with identical results (the AnnIndex guard
    * discipline). The postings relation is NEVER broadcast.
    *
    * All arithmetic is non-negative integer with truncating division
    * (Spark `DIV` == DuckDB `//` on non-negatives); the oracle mirrors
    * the expression order token-for-token.
    */
  private[graft] def bm25From(gatedPostings: DataFrame, nDocs: Long,
                              avgdlMilli: Long, qterms: DataFrame, k: Int,
                              broadcastProbes: Boolean,
                              maxDfPermille: Long = 1000L,
                              exclude: Option[DataFrame] = None): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(nDocs > 0 && avgdlMilli > 0,
      s"corpus stats must be positive: n=$nDocs avgdl_milli=$avgdlMilli")
    def hint(df: DataFrame): DataFrame =
      if (broadcastProbes) broadcast(df) else df
    // Hot-term cap — the lexical skew lever (the near-dup hot-bucket
    // cap's analog): a stopword-like query term matches a constant
    // fraction of the CORPUS, so its posting fan-in to the score
    // aggregation is O(N) rows per term regardless of how selective
    // the rest of the query is. Terms with df > maxDfPermille‰ of the
    // corpus are dropped AFTER the df census (the census itself is one
    // count per term — cheap) and BEFORE the wide score join; their
    // score contribution is bounded by idf ≈ 1000/permille milli
    // (≈1.4 of a rare term's clamped 10^7), so ranking is dominated by
    // the surviving terms. Default 1000 = off (oracle-exact); the
    // 100 TB deployment dials it to ~100-300.
    val dfAll = gatedPostings.groupBy(col("term"))
      .agg(count(lit(1)).as("dfc"))
    val dfRel =
      if (maxDfPermille >= 1000L) dfAll
      else dfAll.filter(col("dfc") * 1000L <= lit(maxDfPermille * nDocs))
    val scored = gatedPostings
      .join(hint(dfRel), Seq("term"))
      .join(hint(qterms), Seq("term"))
      .withColumn("contrib", expr(
        s"(LEAST(${nDocs}L * 1000L DIV dfc, ${IdfClampMilli}L) * " +
          s"((tf * 2200L * 1000000L) DIV (tf * 1000L + " +
          s"(${K1Milli}L * (250L + (${BMilli}L * ((dl * 1000000L) DIV " +
          s"${avgdlMilli}L)) DIV 1000L)) DIV 1000L))) DIV 1000L"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("contrib")).as("score_micro"))
    // Positive exclusion must happen BEFORE the rank window — a
    // post-rank filter would leave excluded docs occupying top-k
    // slots (the hard-negative-mining correctness trap). Id-only
    // anti-join: the pair relation is bounded by the request batch.
    val kept = exclude match {
      case Some(ex) => scored.join(
        ex.select(col("query_id").cast("long").as("query_id"),
          col("doc_id").cast("long").as("doc_id")),
        Seq("query_id", "doc_id"), "left_anti")
      case None => scored
    }
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    kept
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "score_micro")
      .orderBy("query_id", "rank")
  }

  /** Defensive normalization of a (query_id, term) request relation:
    * null terms dropped (a malformed request row must not score),
    * duplicates collapsed.
    */
  private[graft] def cleanTerms(queryTerms: DataFrame): DataFrame = queryTerms
    .filter(col("term").isNotNull)
    .select(col("query_id").cast("long").as("query_id"), col("term"))
    .distinct()

  /** Bounded-request probe guard: one cheap limit(N+1) count decides
    * whether probe relations may ride broadcasts (identical results
    * either way — the AnnIndex.BroadcastQueryLimit discipline).
    */
  private[graft] def isBounded(qterms: DataFrame, probeLimit: Long): Boolean =
    qterms.limit(probeLimit.toInt + 1).count() <= probeLimit

  /** RRF (reciprocal-rank fusion) constant — the standard k=60. */
  val RrfKMilli = 60L

  /** Hybrid retrieval: fuse a lexical ranking (query_id, rank, doc_id)
    * and a vector ranking (query_id, neighbor_id, rank) by
    * reciprocal-rank fusion — the standard way a curation team
    * combines BM25 and embedding retrieval when neither signal alone
    * is trusted (integer-exact: contribution = 10^6 DIV (60 + rank),
    * so the DuckDB oracle replays the fusion bit-for-bit; only RANKS
    * cross the leg boundary, never engine-specific scores, which is
    * both the published RRF rationale and what keeps the fusion
    * cross-engine stable).
    *
    * Scale shape: each leg is already a top-k relation (queries × k
    * rows) — the fusion is a union + one tiny groupBy + a per-query
    * window. Cost lives entirely in the legs, which scale on their own
    * plans (bm25 postings probe; ANN index serve).
    */
  def hybridRrf(lexRanked: DataFrame, vecRanked: DataFrame,
                k: Int = 10): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val lex = lexRanked.select(col("query_id"), col("doc_id"), col("rank"))
    val vec = vecRanked.select(col("query_id"),
      col("neighbor_id").as("doc_id"), col("rank"))
    val fused = lex.unionByName(vec)
      .withColumn("part", expr(s"1000000L DIV (${RrfKMilli}L + rank)"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("part")).as("rrf_micro"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_micro").desc, col("doc_id").asc)
    fused
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "rrf_micro")
      .orderBy("query_id", "rank")
  }

  /** Sentinel rerank score for candidates (or queries) with no stored
    * embedding — sorts after every real cosine, keeps the rank
    * function total without cross-engine NULL-ordering hazards
    * (public: the oracle embeds it).
    */
  val RerankMissingMicro = -2000000L

  /** Retrieve-then-rerank — the second canonical hybrid composition
    * next to [[hybridRrf]]'s rank fusion: the lexical leg nominates
    * its top-k candidates, then each candidate is RE-SCORED by
    * embedding cosine against the query's embedding and the
    * candidate list is re-ordered by that semantic score
    * (integer micro floor, ties to the smaller doc). Candidates or
    * queries without a stored embedding score [[RerankMissingMicro]]
    * — explicitly coalesced on both engines, so the order never
    * depends on an engine's NULL placement.
    *
    * Scale shape: the candidate relation is O(queries × k) — tiny by
    * construction — so both embedding probes are id-keyed joins INTO
    * the embeddings table (AQE broadcasts the candidate side; vectors
    * ride only the k-per-query hit rows, never a corpus-wide
    * shuffle), and the rerank window partitions per query.
    */
  def hybridRerank(lexRanked: DataFrame, emb: DataFrame,
                   k: Int = 5): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val cand = lexRanked.select(col("query_id"), col("doc_id"),
      col("rank").as("lex_rank"))
    val normed = emb.select(col("vec_id").cast("long").as("vec_id"),
      col("embedding"), VectorOps.l2norm(col("embedding")).as("norm"))
    val scored = cand
      .join(normed.select(col("vec_id").as("doc_id"),
        col("embedding").as("d_emb"), col("norm").as("d_norm")),
        Seq("doc_id"), "left")
      .join(normed.select(col("vec_id").as("query_id"),
        col("embedding").as("q_emb"), col("norm").as("q_norm")),
        Seq("query_id"), "left")
      .withColumn("rerank_micro",
        coalesce(
          floor(VectorOps.dot(col("q_emb"), col("d_emb"))
            / (col("d_norm") * col("q_norm")) * 1000000.0).cast("long"),
          lit(RerankMissingMicro)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rerank_micro").desc, col("doc_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("rerank_micro"), col("lex_rank").cast("long").as("lex_rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Top-k BM25-variant search: `queryTerms` is a request relation
    * (query_id BIGINT, term STRING) — one row per distinct query term
    * (deduped defensively here).
    *
    * Scale shape (the 100 TB plan):
    *  - the corpus is scanned twice: a scalar pass for N/avgdl (one
    *    2-long row to the driver) and the postings pass;
    *  - the query-term set semi-joins the exploded token stream BEFORE
    *    any shuffle — only matched postings (a vanishing fraction of
    *    corpus tokens) reach the (doc, term) tf aggregation, so
    *    shuffle bytes are O(matches), not O(corpus tokens);
    *  - df is computed from those matched postings — term-cardinality
    *    rows; no corpus-wide df pass is ever needed;
    *  - top-k is a per-query row_number window — partitions are
    *    per-query, never global.
    * Probe relations (query terms, per-term df) are broadcast only
    * under the bounded-batch guard (`probeLimit`); postings and text
    * never are (the near-dup broadcast invariant). For repeated query
    * batches over a stable corpus, build once and serve from
    * ops/SearchIndex instead — same kernel, no corpus rescan.
    */
  /** Exact PHRASE retrieval — the literal-quote search an audit or
    * contamination triage actually issues ("find every training doc
    * containing this exact sentence"), which term-bag BM25 cannot
    * express: a phrase match requires the query's terms at CONSECUTIVE
    * token positions. Request relation: (query_id, off, term) — one
    * row per phrase token with its 0-based offset.
    *
    * Algorithm (the classic positional-postings anchor join): a token
    * at position `pos` matching the phrase's term at offset `off`
    * votes for anchor `pos - off` (the would-be phrase start); an
    * anchor where every distinct offset voted is one occurrence.
    * Score = occurrence count, top-k by (n_occ DESC, doc_id) — all
    * integer arithmetic, replayed bit-for-bit by the DuckDB oracle.
    *
    * Scale shape: the corpus token stream joins the BROADCAST phrase
    * relation (bounded request batches — the AnnIndex guard, shuffle
    * fallback otherwise), so only phrase-term tokens ever shuffle; the
    * anchor aggregate is keyed (query, doc, anchor) — cardinality
    * bounded by matched tokens, not the corpus. Repeated duplicate
    * request rows collapse via the distinct-offset count. For repeated
    * batches over a stable corpus, serve from the SearchIndex
    * positional artifact instead (same kernel tail, no corpus rescan).
    */
  def phraseSearch(docs: DataFrame, phrases: DataFrame, k: Int = 10,
                   probeLimit: Long = AnnIndex.BroadcastQueryLimit): DataFrame = {
    val q = phrases.filter(col("term").isNotNull)
      .select(col("query_id").cast("long").as("query_id"),
        col("off").cast("long").as("off"), col("term"))
    val bounded = isBounded(q, probeLimit)
    val toks = docs.select(col("doc_id").cast("long").as("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
    phraseFrom(toks, q, k, bounded)
  }

  /** The anchor-join scoring tail over an ALREADY positional token
    * relation (doc_id, pos, term) — shared verbatim by the in-memory
    * search (tokens exploded from text) and the stored-index serving
    * path (tokens read from the positional postings artifact), so both
    * check against the same oracle SQL.
    */
  private[graft] def phraseFrom(toks: DataFrame, q0: DataFrame, k: Int,
                                broadcastProbes: Boolean): DataFrame = {
    def hint(df: DataFrame): DataFrame =
      if (broadcastProbes) broadcast(df) else df
    // Duplicate request rows are collapsed ONCE on the tiny request
    // relation instead of via a distinct-aggregate over the matched
    // token stream: with q distinct, a group (query, doc, anchor) can
    // contain each `off` at most once (the token at anchor+off has ONE
    // term, and only one (query, off, term) row can match it), so
    // count(1) == countDistinct(off) — proven, and it removes the
    // two-phase distinct aggregation from the corpus-sized side.
    val q = q0.distinct()
    val plen = q.groupBy(col("query_id"))
      .agg(countDistinct(col("off")).as("plen"))
    val occ = toks
      .join(hint(q), Seq("term"))
      .select(col("query_id"), col("doc_id"),
        (col("pos") - col("off")).as("anchor"))
      .groupBy(col("query_id"), col("doc_id"), col("anchor"))
      .agg(count(lit(1)).as("n_off"))
      .join(hint(plen), Seq("query_id"))
      .filter(col("n_off") === col("plen"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("n_occ").desc, col("doc_id").asc)
    occ.groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_occ"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("n_occ"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** @param stats precomputed (nDocs, sumDl) — callers that rank the
    *   SAME corpus more than once (PRF's two rankings) pass the stats
    *   through instead of paying the corpus-wide scalar pass per
    *   ranking. Identical results by construction.
    */
  def bm25Search(docs: DataFrame, queryTerms: DataFrame, k: Int = 10,
                 probeLimit: Long = AnnIndex.BroadcastQueryLimit,
                 maxDfPermille: Long = 1000L,
                 exclude: Option[DataFrame] = None,
                 stats: Option[(Long, Long)] = None): DataFrame = {
    val (nDocs, sumDl) = stats.getOrElse(corpusStats(docs))
    require(nDocs > 0, "cannot search an empty corpus")
    val qterms = cleanTerms(queryTerms)
    val bounded = isBounded(qterms, probeLimit)
    val termSet = qterms.select("term").distinct()
    val gated = tokenized(docs)
      .select(col("doc_id"), col("dl"), explode(col("words")).as("term"))
      .join(if (bounded) broadcast(termSet) else termSet, Seq("term"), "left_semi")
      .groupBy(col("doc_id"), col("term"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    bm25From(gated, nDocs, sumDl * 1000L / nDocs, qterms, k, bounded,
      maxDfPermille, exclude)
  }

  /** PRF defaults: feedback depth (top docs mined for expansion
    * terms) and expansion width (terms added per query). Public: the
    * oracle embeds both.
    */
  val PrfFeedbackK = 3
  val PrfExpandN = 2

  /** Pseudo-relevance-feedback query expansion (the RM-family idea,
    * integer-exact): run the original query, mine the top
    * [[PrfFeedbackK]] docs for their [[PrfExpandN]] heaviest
    * non-query terms (summed tf across the feedback docs, ties to
    * the lexicographically smaller term), append them to the query,
    * and re-rank — recall recovery for vocabulary-mismatch queries
    * without a trained model. Both rankings ride the SAME bm25
    * kernel; the oracle replays feedback, mining and the expanded
    * ranking end-to-end.
    *
    * Scale shape: the feedback leg is a k-doc-per-query bm25; term
    * mining touches postings of feedback docs only (semi-join
    * reduced); the expanded query relation stays request-bounded, so
    * the second ranking has the first's plan shape.
    */
  def prfSearch(docs: DataFrame, queryTerms: DataFrame, k: Int = 10): DataFrame = {
    // One corpus-stats pass shared by both rankings, and the feedback
    // ranking (a full bm25 subtree) is materialized once: it is
    // consumed three times below (hit-doc semi-join, candidate join,
    // and transitively the expanded query), so without the checkpoint
    // the whole first ranking replays per consumer inside one action.
    val stats = Some(corpusStats(docs))
    val q0 = cleanTerms(queryTerms).localCheckpoint(false)
    val fb = bm25Search(docs, q0, PrfFeedbackK, stats = stats)
      .select(col("query_id"), col("doc_id"))
      .localCheckpoint(false)
    // No forced broadcast: the feedback doc-id set is k×|queries| and
    // usually tiny, but an unbounded query batch must not ship an
    // unbounded build side — the checkpoint gives AQE an exact size,
    // so it picks BHJ itself whenever the set actually fits (the
    // bm25Search probe-guard discipline).
    val posts = postingsOf(docs)
      .join(fb.select(col("doc_id")).distinct(), Seq("doc_id"), "left_semi")
    val cand = fb.join(posts, Seq("doc_id"))
      .join(q0, Seq("query_id", "term"), "left_anti")
      .groupBy(col("query_id"), col("term"))
      .agg(sum(col("tf")).cast("long").as("s"))
    val win = Window.partitionBy(col("query_id"))
      .orderBy(col("s").desc, col("term").asc)
    // expTerms rides the corpus-wide postings aggregate: the final
    // ranking's bounded-batch guard (a limit+count) would otherwise
    // execute that subtree once for the guard and again for the
    // ranking itself — materialize the (queries × PrfExpandN)-row
    // result once.
    val expTerms = cand.withColumn("rn", row_number().over(win))
      .filter(col("rn") <= PrfExpandN)
      .select(col("query_id"), col("term"))
      .localCheckpoint(false)
    bm25Search(docs, q0.unionByName(expTerms).distinct(), k, stats = stats)
  }

  /** Snippet window size in words (public: the oracle embeds it). */
  val SnippetWindow = 8

  /** Result snippets for a BM25 top-k: for every hit, the
    * [[SnippetWindow]]-word window containing the MOST query-term
    * occurrences (ties to the earliest window), plus the snippet text
    * itself — the contextual preview a search UI renders under each
    * result. Candidate windows begin at matched positions (a standard
    * argmax-preserving reduction: shifting any window right to its
    * first matched term never loses a match), so "earliest" means
    * earliest matched begin — deterministic and integer-exact on both
    * engines.
    *
    * Scale shape: the token stream is semi-join-reduced to HIT docs
    * before positions explode (k×queries docs, not the corpus); the
    * window count is a pair-local range self-join bounded by doc
    * length; snippet texts are fetched for hit docs only. Nothing
    * corpus-sized shuffles beyond the bm25 leg itself.
    */
  def searchSnippets(docs: DataFrame, queryTerms: DataFrame,
                     k: Int = 10): DataFrame = {
    val w = SnippetWindow
    // No forced broadcast()s (the ADVICE probe-guard issue): the
    // hit-doc set is k×|queries| and AQE broadcasts it when it fits,
    // falling back to a shuffle when a pathological batch would not —
    // identical results. No checkpoints here: this is a single-action
    // query whose repeated bm25 subtrees share exchanges via
    // ReuseExchange (measured: checkpointing cost more than it saved).
    val hits = bm25Search(docs, queryTerms, k)
      .select(col("query_id"), col("rank"), col("doc_id"))
    val hitDocs = hits.select(col("doc_id")).distinct()
    val toks = tokenized(docs)
      .join(hitDocs, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), posexplode(col("words")).as(Seq("pos", "term")))
      .withColumn("pos", col("pos").cast("long"))
    val matched = hits.join(toks, Seq("doc_id"))
      .join(cleanTerms(queryTerms), Seq("query_id", "term"))
      .select(col("query_id"), col("doc_id"), col("pos"))
    val counts = matched.as("b").join(matched.as("x"),
        col("x.query_id") === col("b.query_id") &&
          col("x.doc_id") === col("b.doc_id") &&
          col("x.pos").between(col("b.pos"), col("b.pos") + (w - 1).toLong))
      .groupBy(col("b.query_id").as("query_id"), col("b.doc_id").as("doc_id"),
        col("b.pos").as("begin_word"))
      .agg(count(lit(1)).cast("long").as("n_matched"))
    val win = Window.partitionBy(col("query_id"), col("doc_id"))
      .orderBy(col("n_matched").desc, col("begin_word").asc)
    val best = counts.withColumn("rn", row_number().over(win))
      .filter(col("rn") === 1)
      .drop("rn")
    val texts = docs.select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .join(hitDocs, Seq("doc_id"), "left_semi")
    best.join(hits, Seq("query_id", "doc_id"))
      .join(texts, Seq("doc_id"))
      .withColumn("snippet",
        expr(s"array_join(slice(split(text, ' '), CAST(begin_word + 1 AS INT), $w), ' ')"))
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("begin_word"), col("n_matched"), col("snippet"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** DPR-style hard-negative mining for retrieval training data: per
    * query, the top-k BM25-ranked corpus docs EXCLUDING the query's
    * POSITIVES — the query doc itself and its near-duplicates (the
    * MinHash band geometry at the dedup Jaccard floor). Excluding
    * before ranking is the point: a near-verbatim copy of the query
    * doc is an UNLABELED POSITIVE, and training on it as a negative
    * teaches the ranker to push true matches down (the false-negative
    * trap every DPR-family pipeline must mine around). The kept rows
    * are the hard negatives: lexically close enough to rank, known
    * not to be the answer.
    *
    * Scale shape: the near-dup leg is [[graft.ops.TextOps.neardupSearch]]'s
    * bounded-request shape (corpus bands capped before the probe
    * join); the exclusion pair set is O(queries × near-dup fan) ids
    * and anti-joins into the scored relation pre-rank; everything
    * else is the bm25Search plan unchanged.
    */
  def hardNegatives(spark: org.apache.spark.sql.SparkSession,
                    corpus: DataFrame, queries: DataFrame,
                    queryTerms: DataFrame, k: Int = 10): DataFrame = {
    val near = graft.ops.TextOps.neardupSearch(spark, corpus, queries)
      .select(col("query_id"), col("doc_id"))
    val self = queries.select(col("query_id").cast("long").as("query_id"))
      .withColumn("doc_id", col("query_id"))
    bm25Search(corpus, queryTerms, k,
      exclude = Some(near.unionByName(self)))
  }
}
