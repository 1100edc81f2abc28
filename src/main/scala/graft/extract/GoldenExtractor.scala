package graft.extract

/** The executable spec (SURVEY.md §5.2.1): single-threaded,
  * dependency-free, pure per-document extraction — tokenize (M1) →
  * score (M2) → group+assemble (M3/M4). The Spark pipeline MUST produce
  * byte-identical output to this function for every page; goldens in
  * tests come from here (the reference tree at /root/reference is empty,
  * SURVEY.md §0, so this function IS the byte-identity oracle).
  */
object GoldenExtractor {

  def extract(html: Array[Byte], cfg: ExtractorConfig): (String, Array[Span]) = {
    val blocks = ContentTokenizer.tokenize(html, cfg)
    val scored = Scorer.score("", blocks)
    Assembler.assemble(scored, cfg)
  }

  def extractPage(p: PageLite, cfg: ExtractorConfig): ExtractedPage = {
    val blocks = ContentTokenizer.tokenize(p.html, cfg)
    val scored = Scorer.score(p.url, blocks)
    val a = Assembler.assembleColumnar(scored, cfg)
    val bytesIn = if (p.html == null) 0L else p.html.length.toLong
    ExtractedPage(
      url = p.url,
      warc_ts = p.warc_ts,
      text = a.text,
      span_starts = a.starts,
      span_ends = a.ends,
      span_block_ids = a.blockIds,
      span_scores = a.scores,
      n_blocks = blocks.length,
      n_kept = a.nSpans,
      bytes_in = bytesIn,
      bytes_out = a.textBytes.toLong // accumulated during assembly, no second pass
    )
  }
}
