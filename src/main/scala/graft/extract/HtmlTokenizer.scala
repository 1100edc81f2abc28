package graft.extract

import java.nio.charset.StandardCharsets

/** Deterministic, dependency-free, single-pass HTML tokenizer: raw page
  * bytes → candidate text blocks (stage M1, SURVEY.md §2.3).
  *
  * The reference's preprocess stage (image decode + resize/normalize,
  * BASELINE.json north_star) maps here: decode bytes, bound per-page
  * work (maxHtmlBytes = the canvas_size cap analog), emit a dense
  * block stream for the scorer.
  *
  * Determinism contract (SURVEY.md §7.5 — byte-identity per url):
  *   - input bytes decoded ONCE as UTF-8 with REPLACE (malformed bytes →
  *     U+FFFD, deterministic across JVMs/locales);
  *   - explicit whitespace set (no locale-sensitive trim);
  *   - fixed entity table; unknown entities pass through literally;
  *   - robust to unclosed/mis-nested tags (bounded stack pops, no scans
  *     past end) — the "curved/irregular" fixture class.
  */
object HtmlTokenizer {

  private val BlockTags: Set[String] = Set(
    "html", "body", "div", "p", "nav", "footer", "header", "aside",
    "section", "article", "main", "table", "thead", "tbody", "tfoot",
    "tr", "td", "th", "ul", "ol", "li", "dl", "dt", "dd",
    "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre", "form",
    "figure", "figcaption", "fieldset", "address", "center"
  )

  /** Content inside these is never page text (metadata / code). */
  private val SkipContentTags: Set[String] =
    Set("script", "style", "title", "noscript", "template", "svg", "iframe", "textarea", "head")

  /** Inline tags counted into a block's nTags (tag-density denominator). */
  private val InlineTags: Set[String] = Set(
    "a", "b", "i", "u", "s", "em", "strong", "span", "code", "small",
    "sup", "sub", "abbr", "cite", "q", "mark", "time", "label", "img", "font"
  )

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == 0x0b || c == '\u00a0'

  private def isNameChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  /** A tag NAME must start with a letter (HTML spec; digits only later,
    * h1..h6) — '<' followed by anything else is literal text ("I <3 u").
    */
  private def isNameStart(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** Tokenize page bytes into blocks. Truncates at cfg.maxHtmlBytes. */
  def tokenize(html: Array[Byte], cfg: ExtractorConfig): Array[Block] = {
    if (html == null || html.isEmpty) return Array.empty
    val bytes =
      if (html.length <= cfg.maxHtmlBytes) html
      else java.util.Arrays.copyOf(html, cfg.maxHtmlBytes)
    // Single deterministic decode; REPLACE is the default for this ctor.
    tokenizeChars(new String(bytes, StandardCharsets.UTF_8))
  }

  def tokenizeChars(s: String): Array[Block] = {
    val n = s.length
    val blocks = Array.newBuilder[Block]
    var nBlocks = 0

    // current-block accumulation state
    val sb = new java.lang.StringBuilder(256)
    var pendingSpace = false
    var nLink = 0
    var nTags = 0
    var inLink = 0
    var curTag = "body"
    // open block-element stack (names); depth = stack size
    var stack = List.empty[String]
    // <pre> nesting: inside pre, whitespace is PRESERVED verbatim (no
    // run collapse); per the HTML spec, one newline immediately after
    // the opening tag is stripped
    var preDepth = 0
    var preJustOpened = false
    var preStripLf = false // pending '\n'-strip after a post-<pre> '\r'

    def flush(): Unit = {
      if (sb.length() > 0) {
        val text = sb.toString
        blocks += Block(nBlocks, curTag, stack.size, nBlocks, text, text.length, nLink, nTags)
        nBlocks += 1
        sb.setLength(0)
      }
      pendingSpace = false
      nLink = 0
      nTags = 0
      inLink = 0 // anchors do not leak across block boundaries (deterministic choice)
    }

    def appendChar(c: Char): Unit = {
      if (preDepth > 0) {
        // verbatim mode; strip the single spec-mandated newline after
        // <pre> — exactly one of "\n", "\r" or "\r\n", never a run
        if (preJustOpened && (c == '\r' || c == '\n')) {
          preJustOpened = false
          preStripLf = c == '\r' // a following '\n' completes the CRLF pair
          return
        }
        preJustOpened = false
        if (preStripLf) {
          preStripLf = false
          if (c == '\n') return
        }
        sb.append(c)
        if (inLink > 0) nLink += 1
      } else if (isWs(c)) {
        if (sb.length() > 0) pendingSpace = true
      } else {
        if (pendingSpace) {
          sb.append(' ')
          if (inLink > 0) nLink += 1
          pendingSpace = false
        }
        sb.append(c)
        if (inLink > 0) nLink += 1
      }
    }

    def appendCodePoint(cp: Int): Unit =
      if (cp <= 0xffff) appendChar(cp.toChar)
      else { // astral plane: surrogate pair (both halves count as chars)
        appendChar(Character.highSurrogate(cp))
        appendChar(Character.lowSurrogate(cp))
      }

    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = s.charAt(i + 1)
        if (c1 == '!') {
          if (s.regionMatches(i, "<![CDATA[", 0, 9)) {
            // CDATA: content is literal text (no tags, no entities)
            val end = s.indexOf("]]>", i + 9)
            val stop = if (end < 0) n else end
            var j = i + 9
            while (j < stop) { appendChar(s.charAt(j)); j += 1 }
            i = if (end < 0) n else end + 3
          } else if (i + 3 < n && s.charAt(i + 2) == '-' && s.charAt(i + 3) == '-') {
            val end = s.indexOf("-->", i + 4)
            i = if (end < 0) n else end + 3
          } else {
            val end = s.indexOf('>', i + 2)
            i = if (end < 0) n else end + 1
          }
        } else if (c1 == '?') {
          val end = s.indexOf('>', i + 2)
          i = if (end < 0) n else end + 1
        } else if (c1 == '/' && (i + 2 >= n || !isNameStart(s.charAt(i + 2)))) {
          // "</" + non-letter is a bogus comment per spec: consume to '>'
          val end = s.indexOf('>', i + 2)
          i = if (end < 0) n else end + 1
        } else if (c1 == '/') {
          // closing tag
          var j = i + 2
          val nameStart = j
          while (j < n && isNameChar(s.charAt(j))) j += 1
          val name = s.substring(nameStart, j).toLowerCase
          val end = s.indexOf('>', j)
          i = if (end < 0) n else end + 1
          if (BlockTags.contains(name)) {
            flush()
            if (stack.contains(name)) {
              while (stack.nonEmpty && stack.head != name) {
                // an ancestor's close tag implicitly pops unclosed
                // children — a popped <pre> must leave verbatim mode,
                // or the REST of the page stays whitespace-preserved
                if (stack.head == "pre" && preDepth > 0) {
                  preDepth -= 1; preJustOpened = false; preStripLf = false
                }
                stack = stack.tail
              }
              if (stack.nonEmpty) stack = stack.tail
            } // unmatched closer: ignore (irregular fixture class)
            curTag = stack.headOption.getOrElse("body")
            if (name == "pre") {
              if (preDepth > 0) preDepth -= 1
              preJustOpened = false
              preStripLf = false
            }
          } else if (name == "a") {
            if (inLink > 0) inLink -= 1
          }
        } else if (isNameStart(c1)) {
          // opening tag: parse name, then scan to '>' honoring quotes
          var j = i + 1
          val nameStart = j
          while (j < n && isNameChar(s.charAt(j))) j += 1
          val name = s.substring(nameStart, j).toLowerCase
          var quote: Char = 0
          var selfClose = false
          var k = j
          var done = false
          while (k < n && !done) {
            val ck = s.charAt(k)
            if (quote != 0) { if (ck == quote) quote = 0 }
            else if (ck == '"' || ck == '\'') quote = ck
            else if (ck == '>') { selfClose = k > j && s.charAt(k - 1) == '/'; done = true }
            k += 1
          }
          i = if (done) k else n
          if (SkipContentTags.contains(name)) {
            if (!selfClose) {
              // skip to matching close tag, case-insensitive, bounded
              val closeIdx = indexOfClose(s, i, name)
              i = closeIdx
            }
          } else if (BlockTags.contains(name)) {
            flush()
            if (!selfClose) {
              stack = name :: stack
              curTag = name
              if (name == "pre") { preDepth += 1; preJustOpened = true }
            }
          } else if (name == "br") {
            if (preDepth > 0) sb.append('\n')
            else if (sb.length() > 0) pendingSpace = true
          } else if (InlineTags.contains(name)) {
            nTags += 1
            if (name == "a" && !selfClose) inLink += 1
          }
          // other unknown/void tags: ignored
        } else {
          appendChar(c); i += 1 // lone '<' is text
        }
      } else if (c == '&') {
        val (cp, len) = decodeEntity(s, i)
        if (len == 0) { appendChar('&'); i += 1 }
        else { appendCodePoint(cp); i += len }
      } else {
        appendChar(c); i += 1
      }
    }
    flush()
    blocks.result()
  }

  /** Find index just past `</name ... >`, case-insensitive; n if absent. */
  private def indexOfClose(s: String, from: Int, name: String): Int = {
    val n = s.length
    var i = from
    val target = "</" + name
    while (i < n) {
      val idx = s.indexOf('<', i)
      if (idx < 0) return n
      if (idx + target.length <= n && s.regionMatches(true, idx, target, 0, target.length)) {
        val after = idx + target.length
        if (after >= n) return n
        val ca = s.charAt(after)
        if (ca == '>' || isWs(ca) || ca == '/') {
          val end = s.indexOf('>', after)
          return if (end < 0) n else end + 1
        }
      }
      i = idx + 1
    }
    n
  }

  /** Decode an entity at s(i)=='&'. Returns (codepoint, consumedLen);
    * consumedLen == 0 means "not an entity -- caller emits '&'
    * literally". Astral-plane numeric entities (&#x1F600;) decode to
    * their real code point and are appended as a surrogate pair; code
    * points outside Unicode or in the surrogate range degrade to
    * U+FFFD (deterministic).
    */
  private def decodeEntity(s: String, i: Int): (Int, Int) = {
    val NotEntity = (0, 0)
    val n = s.length
    val semi = {
      var j = i + 1
      val lim = math.min(n, i + 12) // longest accepted: &#x10FFFF;
      var found = -1
      while (j < lim && found < 0) {
        val cj = s.charAt(j)
        if (cj == ';') found = j
        else if (cj == '&' || cj == '<' || isWs(cj)) j = lim
        else j += 1
      }
      found
    }
    if (semi < 0) return NotEntity
    val body = s.substring(i + 1, semi)
    val len = semi - i + 1
    def checked(cp: Int): (Int, Int) =
      if (cp > 0 && cp <= 0x10ffff && !(cp >= 0xd800 && cp <= 0xdfff)) (cp, len)
      else (0xfffd, len)
    body match {
      case "amp"  => ('&'.toInt, len)
      case "lt"   => ('<'.toInt, len)
      case "gt"   => ('>'.toInt, len)
      case "quot" => ('"'.toInt, len)
      case "apos" => ('\''.toInt, len)
      case "nbsp" => (' '.toInt, len)
      case b if b.startsWith("#x") || b.startsWith("#X") =>
        try checked(Integer.parseInt(b.substring(2), 16))
        catch { case _: NumberFormatException => NotEntity }
      case b if b.startsWith("#") =>
        try checked(Integer.parseInt(b.substring(1)))
        catch { case _: NumberFormatException => NotEntity }
      case _ => NotEntity // unknown entity: emit '&' literally
    }
  }
}
