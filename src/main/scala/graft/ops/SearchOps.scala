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
  */
object SearchOps {

  /** k1 in milli (BM25 tf saturation). */
  val K1Milli = 1200L
  /** b in milli (BM25 length normalization). */
  val BMilli = 750L
  /** idf_milli clamp — bounds per-term contribution at any N. */
  val IdfClampMilli = 10000000L

  /** Top-k BM25-variant search: `queryTerms` is a bounded request
    * relation (query_id BIGINT, term STRING) — one row per distinct
    * query term (deduped defensively here).
    *
    * Scale shape (the 100 TB plan):
    *  - the corpus is scanned twice: a scalar pass for N/avgdl (one
    *    2-long row to the driver) and the postings pass;
    *  - the query-term set is broadcast and SEMI-JOINS the exploded
    *    token stream BEFORE any shuffle — only matched postings (a
    *    vanishing fraction of corpus tokens) reach the (doc, term)
    *    tf aggregation, so shuffle bytes are O(matches), not
    *    O(corpus tokens);
    *  - df is computed from those matched postings (a term's posting
    *    set IS its document set) — term-cardinality rows, broadcast
    *    back; no corpus-wide df pass is ever needed;
    *  - top-k is a per-query row_number window — partitions are
    *    per-query, never global.
    * Only bounded relations (query terms, per-term df) are broadcast —
    * never text or postings (the near-dup broadcast invariant).
    *
    * All arithmetic is non-negative integer with truncating division
    * (Spark `DIV` == DuckDB `//` on non-negatives); the oracle mirrors
    * the expression order token-for-token.
    */
  def bm25Search(docs: DataFrame, queryTerms: DataFrame,
                 k: Int = 10): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val base = docs
      .select(col("doc_id").cast("long").as("doc_id"),
        split(col("text"), " ").as("words"))
      .withColumn("dl", size(col("words")).cast("long"))
    // one 2-long row: corpus size + total token count → avgdl in milli
    val scal = base.agg(count(lit(1)).cast("long").as("n"),
      sum(col("dl")).cast("long").as("sdl")).collect()(0)
    val nDocs = scal.getLong(0)
    val avgdlMilli = scal.getLong(1) * 1000L / nDocs
    val qterms = queryTerms
      .select(col("query_id").cast("long").as("query_id"), col("term"))
      .distinct()
    val termSet = qterms.select("term").distinct()
    val postings = base
      .select(col("doc_id"), col("dl"), explode(col("words")).as("term"))
      .join(broadcast(termSet), Seq("term"), "left_semi")
      .groupBy(col("doc_id"), col("term"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    val dfRel = postings.groupBy(col("term"))
      .agg(count(lit(1)).as("dfc"))
    val scored = postings
      .join(broadcast(dfRel), Seq("term"))
      .join(broadcast(qterms), Seq("term"))
      .withColumn("contrib", expr(
        s"(LEAST(${nDocs}L * 1000L DIV dfc, ${IdfClampMilli}L) * " +
          s"((tf * 2200L * 1000000L) DIV (tf * 1000L + " +
          s"(${K1Milli}L * (250L + (${BMilli}L * ((dl * 1000000L) DIV " +
          s"${avgdlMilli}L)) DIV 1000L)) DIV 1000L))) DIV 1000L"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("contrib")).as("score_micro"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "score_micro")
      .orderBy("query_id", "rank")
  }
}
