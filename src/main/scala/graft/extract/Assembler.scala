package graft.extract

import java.nio.charset.StandardCharsets

/** Stage M3+M4 — region grouping + deterministic span assembly
  * (SURVEY.md §2.3), the CRNN/CTC-decode analog (BASELINE.json
  * north_star): threshold the score array, coalesce adjacent winning
  * blocks whose affinity clears linkThreshold into regions (the
  * connected-components-merge analog), then assemble the output text —
  * collapse whitespace runs (≡ CTC collapse-repeats; done in the
  * tokenizer), drop boilerplate blocks (≡ drop blanks), join in reading
  * order with a fixed separator.
  *
  * Span offsets are UTF-8 BYTE offsets into the output text — the
  * byte-identity unit of the north rule.
  */
object Assembler {

  private def utf8Len(s: String): Int =
    s.getBytes(StandardCharsets.UTF_8).length

  /** Number of regions among kept blocks (exposed for tests and the
    * relational group_regions cross-check).
    */
  def regionIds(sp: ScoredPage, cfg: ExtractorConfig): Array[Int] = {
    val keep = sp.scores.indices.filter(i => sp.scores(i) >= cfg.textThreshold).toArray
    val ids = new Array[Int](keep.length)
    var region = 0
    var k = 0
    while (k < keep.length) {
      if (k > 0) {
        val prev = keep(k - 1)
        val cur = keep(k)
        val adjacentLinked = cur == prev + 1 && sp.linkScores(prev) >= cfg.linkThreshold
        if (!adjacentLinked) region += 1
      }
      ids(k) = region
      k += 1
    }
    ids
  }

  def assemble(sp: ScoredPage, cfg: ExtractorConfig): (String, Array[Span]) = {
    val n = sp.blocks.length
    val out = new java.lang.StringBuilder(512)
    val spans = Array.newBuilder[Span]
    val sepBytes = utf8Len(cfg.blockSep)
    var byteLen = 0
    var first = true
    var i = 0
    while (i < n) {
      if (sp.scores(i) >= cfg.textThreshold) {
        if (!first) {
          out.append(cfg.blockSep)
          byteLen += sepBytes
        }
        val t = sp.blocks(i).text
        val start = byteLen
        out.append(t)
        byteLen += utf8Len(t)
        spans += Span(start, byteLen, sp.blocks(i).blockId, "content", sp.scores(i))
        first = false
      }
      i += 1
    }
    (out.toString, spans.result())
  }
}
