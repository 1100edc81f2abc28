package graft.extract

import java.nio.charset.StandardCharsets

/** The executable spec (SURVEY.md §5.2.1): single-threaded,
  * dependency-free, pure per-document extraction — tokenize (M1) →
  * score (M2) → group+assemble (M3/M4). The Spark pipeline MUST produce
  * byte-identical output to this function for every page; goldens in
  * tests come from here (the reference tree at /root/reference is empty,
  * SURVEY.md §0, so this function IS the byte-identity oracle).
  */
object GoldenExtractor {

  def extract(html: Array[Byte], cfg: ExtractorConfig): (String, Array[Span]) = {
    val blocks = HtmlTokenizer.tokenize(html, cfg)
    val scored = Scorer.score("", blocks)
    Assembler.assemble(scored, cfg)
  }

  def extractPage(p: PageLite, cfg: ExtractorConfig): ExtractedPage = {
    val blocks = HtmlTokenizer.tokenize(p.html, cfg)
    val scored = Scorer.score(p.url, blocks)
    val (text, spans) = Assembler.assemble(scored, cfg)
    val bytesIn = if (p.html == null) 0L else p.html.length.toLong
    ExtractedPage(
      url = p.url,
      warc_ts = p.warc_ts,
      text = text,
      spans = spans,
      n_blocks = blocks.length,
      n_kept = spans.length,
      bytes_in = bytesIn,
      bytes_out = text.getBytes(StandardCharsets.UTF_8).length.toLong
    )
  }
}
