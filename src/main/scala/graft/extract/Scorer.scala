package graft.extract

/** Stage M2 — block scoring (SURVEY.md §2.3), the CRAFT region/affinity
  * score-map analog (BASELINE.json north_star): per-block scores from
  * text-density, link-density and block geometry, emitted as PRIMITIVE
  * Float arrays (`Array[Float]`, no boxing — Spark stores these as
  * UnsafeArrayData with containsNull=false).
  *
  * Determinism: pure Float arithmetic in a FIXED evaluation order — no
  * parallel reduction, no associativity games (SURVEY.md §7.5), so
  * scores are bitwise-stable across partitionings and retries.
  */
object Scorer {

  /** Geometry/semantics prior per enclosing tag: boilerplate containers
    * are strongly down-weighted, list/table cells mildly.
    */
  def tagPrior(tag: String): Float = tag match {
    case "nav" | "footer" | "header" | "aside" | "form" => 0.1f
    case "li" | "td" | "th" | "dt" | "dd"               => 0.7f
    case _                                              => 1.0f
  }

  /** Region score for one block:
    * textDensity * (1 - linkDensity) * tagPrior, all Float ops.
    */
  def blockScore(b: Block): Float = {
    val textDensity = b.nChars.toFloat / (b.nTags + 1).toFloat
    val denom = if (b.nChars > 0) b.nChars else 1
    val linkDensity = b.nLinkChars.toFloat / denom.toFloat
    textDensity * (1.0f - linkDensity) * tagPrior(b.tag)
  }

  /** Affinity between adjacent blocks i and i+1 (the CRAFT affinity-map
    * analog): 1.0 when same tag at same depth (one logical run of
    * content), else a weak 0.3 link. Last entry is 0.
    */
  def affinity(a: Block, b: Block): Float =
    if (a.tag == b.tag && a.depth == b.depth) 1.0f else 0.3f

  def score(url: String, blocks: Array[Block]): ScoredPage = {
    val n = blocks.length
    val scores = new Array[Float](n)
    val linkScores = new Array[Float](n)
    var i = 0
    while (i < n) {
      scores(i) = blockScore(blocks(i))
      linkScores(i) = if (i + 1 < n) affinity(blocks(i), blocks(i + 1)) else 0.0f
      i += 1
    }
    ScoredPage(url, blocks, scores, linkScores)
  }
}
