package graft.extract

/** Format dispatch for stage M1 (north rule: "HTML boilerplate strip,
  * PDF/layout parse" — ONE pipeline, two parsers): a crawl's `html`
  * BINARY column carries both HTML bytes and PDF bytes; sniff the
  * magic and route. Everything downstream (Scorer, Assembler, spans,
  * byte-identity) is format-agnostic over the Block stream.
  *
  * PDF blocks: one Block per text line, tag "pdf", no link/tag counts
  * (PDF text operators carry no anchors) — so score = nChars and any
  * non-empty line above the threshold is kept, matching the
  * machine-written-PDF reality.
  */
object ContentTokenizer {

  private val PdfMagic: Array[Byte] = "%PDF".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  def isPdf(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 4 &&
      bytes(0) == PdfMagic(0) && bytes(1) == PdfMagic(1) &&
      bytes(2) == PdfMagic(2) && bytes(3) == PdfMagic(3)

  /** Raw document bytes → candidate text blocks, truncated at
    * cfg.maxHtmlBytes like the HTML path (PdfTextExtractor is total on
    * truncated input).
    */
  def tokenize(bytes: Array[Byte], cfg: ExtractorConfig): Array[Block] =
    if (isPdf(bytes)) {
      val capped =
        if (bytes.length <= cfg.maxHtmlBytes) bytes
        else java.util.Arrays.copyOf(bytes, cfg.maxHtmlBytes)
      val lines = PdfTextExtractor.extractLines(capped)
      Array.tabulate(lines.length) { i =>
        Block(i, "pdf", 1, i, lines(i), lines(i).length, 0, 0)
      }
    } else HtmlTokenizer.tokenize(bytes, cfg)
}
