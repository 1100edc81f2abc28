package graft.extract

import java.sql.Timestamp

/** Input row — EXACTLY the input-hint shape (BASELINE.json input_hint):
  * Iceberg/parquet table of Common-Crawl-style web pages.
  * `text` is the crawl's noisy pre-extracted text (decoy column — the
  * engine computes its own clean text; the hot path never reads it).
  */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String
)

/** Pruned projection of [[Page]] for the extraction hot path: the
  * pipeline never reads the crawl's noisy `text` column (SURVEY.md §4.2
  * column-pruning contract) — selecting into this type lets Catalyst
  * push the 3-column projection into the scan. `warc_ts` rides along so
  * latest-snapshot dedup can run AFTER extraction (shuffling extracted
  * text, ~25% of the raw html bytes, instead of the html itself).
  */
final case class PageLite(url: String, warc_ts: Timestamp, html: Array[Byte])

/** One candidate text block produced by the tokenizer (the CRAFT
  * "character region" analog, per BASELINE.json north_star: block
  * geometry = (tag, depth, pos), densities from char/link/tag counts).
  */
final case class Block(
    blockId: Int,
    tag: String,
    depth: Int,
    pos: Int,
    text: String,
    nChars: Int,
    nLinkChars: Int,
    nTags: Int
)

/** Tokenized page: the output of stage M1 (SURVEY.md §2.3). */
final case class TokenizedPage(url: String, blocks: Array[Block])

/** Scored page: stage M2 output. `scores`/`linkScores` are primitive
  * Float arrays indexed by blockId (the region/affinity score-map
  * analog of CRAFT, per BASELINE.json north_star: "per-block score
  * arrays as primitive Float arrays"). `linkScores(i)` is the affinity
  * between block i and block i+1 (last entry 0f).
  */
final case class ScoredPage(
    url: String,
    blocks: Array[Block],
    scores: Array[Float],
    linkScores: Array[Float]
)

/** One output span: byte offsets [start, end) into the extracted text
  * (UTF-8 bytes), the source blockId, span kind, and the block score.
  */
final case class Span(start: Int, end: Int, blockId: Int, kind: String, score: Float)

/** Final extracted row (SURVEY.md §1.2 output table) plus metrics
  * fields used by the checkpoint/lineage table.
  */
/** Spans are stored STRUCT-OF-ARRAYS: four parallel primitive arrays
  * (index = span ordinal) instead of ARRAY<STRUCT<...>>. Primitive
  * arrays hit Spark's UnsafeArrayData fast path — no per-element object
  * construction in the encoder, no nested-group assembly in parquet —
  * measured ~30% of pipeline wall-time at 8 cores with the row-form
  * representation. Row-form spans remain available relationally via
  * arrays_zip (see Queries / ExtractPipeline.spansAsStructs). Span kind
  * is uniform ("content") in the current heuristic set and therefore
  * not materialized per span.
  */
final case class ExtractedPage(
    url: String,
    warc_ts: Timestamp,
    text: String,
    span_starts: Array[Int],
    span_ends: Array[Int],
    span_block_ids: Array[Int],
    span_scores: Array[Float],
    n_blocks: Int,
    n_kept: Int,
    bytes_in: Long,
    bytes_out: Long
)

/** Per-logical-partition checkpoint/metrics row (SURVEY.md §2.9).
  * part_id is a STABLE unit: pmod(xxhash64(url), P) — independent of
  * runtime parallelism so resume works across cluster sizes.
  */
final case class PartitionMetrics(
    part_id: Int,
    n_docs: Long,
    n_blocks: Long,
    n_kept: Long,
    bytes_in: Long,
    bytes_out: Long,
    attempt: Int,
    job_id: String
)

/** Extraction heuristic configuration — the analog of the reference's
  * model weights + thresholds (CRAFT text_threshold / link_threshold).
  * Broadcast once per job; pure data, no state.
  *
  * @param textThreshold  keep blocks with score >= this (CRAFT text_threshold analog)
  * @param linkThreshold  merge adjacent kept blocks into one region when
  *                       affinity >= this (CRAFT link/affinity threshold analog)
  * @param blockSep       separator between kept blocks in the output text
  * @param maxHtmlBytes   per-page work cap (canvas_size/mag_ratio analog)
  * @param minChars       size/validity gate (P3): kept blocks must also
  *                       have at least this many chars (0 = off, the
  *                       default — score already rejects empty blocks)
  * @param listItemPrefix rendering knob: prepended to kept `li` blocks
  *                       (e.g. "- " for markdown-ish output). Default ""
  *                       keeps byte-identity with the plain rendering.
  * @param quotePrefix    same for `blockquote` blocks (e.g. "> ")
  */
final case class ExtractorConfig(
    textThreshold: Float = 1.0f,
    linkThreshold: Float = 0.5f,
    blockSep: String = "\n",
    maxHtmlBytes: Int = 4 * 1024 * 1024,
    minChars: Int = 0,
    listItemPrefix: String = "",
    quotePrefix: String = ""
)

object ExtractorConfig {
  val default: ExtractorConfig = ExtractorConfig()
  /** Config used by the oracle queries over documents-derived pages:
    * blocks joined by a single space so extracted text is byte-identical
    * to the source document text (single-space-separated words).
    */
  val spaceJoined: ExtractorConfig = ExtractorConfig(blockSep = " ")
}
