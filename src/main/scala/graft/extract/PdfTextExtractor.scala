package graft.extract

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{DataFormatException, Inflater}

/** Minimal deterministic PDF text extraction (the north rule's
  * "PDF/layout parse" leg): content-stream text operators only, no
  * fonts/geometry — enough to recover the text runs of machine-written
  * PDFs (reports, invoices, exported docs), which is the bulk of PDF
  * text in a crawl.
  *
  * Supported, all dependency-free:
  *  - stream objects, raw or /FlateDecode (java.util.zip.Inflater);
  *  - BT..ET text blocks; Tj, ', " (show string), TJ (array show);
  *  - line advance operators Td, TD, T* (each starts a new output line);
  *  - literal strings with nested parens and \-escapes (incl. octal,
  *    line continuations), hex strings <...>.
  *
  * Determinism: bytes are decoded as UTF-8 with REPLACE once per line;
  * malformed Flate data or truncated syntax degrades to skipping that
  * stream/token — never throws, same output for same bytes.
  *
  * Out of scope (documented): encrypted PDFs, /ToUnicode CMap remapping,
  * multi-byte font encodings, xref-directed parsing (streams are
  * located by scanning — robust to damaged xref tables, like real
  * crawlers do).
  */
object PdfTextExtractor {

  /** All text lines of the document, in stream order (the block/
    * paragraph analog of the HTML tokenizer).
    */
  def extractLines(pdf: Array[Byte]): Array[String] =
    if (pdf == null || pdf.length < 5) Array.empty
    else streams(pdf).flatMap(linesOf).toArray

  /** Extracted text: lines joined with `sep` (the Assembler join
    * convention; byte-identity unit for PDF-wrapped documents).
    */
  def extractText(pdf: Array[Byte], sep: String): String =
    extractLines(pdf).mkString(sep)

  /** Locate `stream ... endstream` payloads by scanning (not via xref)
    * and Flate-decode those whose object header names /FlateDecode.
    *
    * Two scanning disciplines that matter on real files:
    *  - the header window is the stream's OWN object dict (from the
    *    LAST `obj` before the keyword) — an unrelated earlier dict
    *    mentioning /FlateDecode (xref/object-stream descriptors) must
    *    not leak its filter onto a raw stream;
    *  - a DIRECT /Length locates the payload end exactly — a raw
    *    payload may legally contain the bytes "endstream" (document
    *    text!), so the keyword scan is only the fallback for
    *    absent/indirect/implausible lengths.
    */
  private[extract] def streams(pdf: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var from = 0
    var headerStart = 0
    while (from < pdf.length) {
      val s = indexOf(pdf, "stream", from)
      if (s < 0) { from = pdf.length }
      else {
        // skip the EOL after the `stream` keyword
        var dataStart = s + 6
        if (dataStart < pdf.length && pdf(dataStart) == '\r') dataStart += 1
        if (dataStart < pdf.length && pdf(dataStart) == '\n') dataStart += 1
        val objIdx = lastIndexOfBefore(pdf, "obj", headerStart, s)
        val hdrFrom = if (objIdx < 0) headerStart else objIdx
        val header = new String(pdf, hdrFrom, s - hdrFrom, StandardCharsets.ISO_8859_1)
        val byLength: Option[Int] = directLength(header)
          .map(dataStart + _)
          .filter { pe =>
            pe >= dataStart && pe <= pdf.length && {
              val e = indexOf(pdf, "endstream", pe)
              e >= 0 && eolOnly(pdf, pe, e)
            }
          }
        val (dataEndOpt, eOpt) = byLength match {
          case Some(pe) => (Some(pe), Some(indexOf(pdf, "endstream", pe)))
          case None =>
            val e = indexOf(pdf, "endstream", dataStart)
            if (e < 0) (None, None)
            else {
              var dataEnd = e
              // trailing EOL before `endstream` belongs to the delimiter
              if (dataEnd > dataStart && pdf(dataEnd - 1) == '\n') dataEnd -= 1
              if (dataEnd > dataStart && pdf(dataEnd - 1) == '\r') dataEnd -= 1
              (Some(dataEnd), Some(e))
            }
        }
        (dataEndOpt, eOpt) match {
          case (Some(dataEnd), Some(e)) =>
            val raw = java.util.Arrays.copyOfRange(pdf, dataStart, dataEnd)
            val data = if (header.contains("/FlateDecode")) inflate(raw) else Some(raw)
            data.foreach(out += _)
            from = e + 9
            headerStart = from
          case _ => from = pdf.length
        }
      }
    }
    out.result()
  }

  private val LengthRe = """/Length\s+(\d+)(\s+\d+\s+R)?""".r

  /** The dict's direct /Length, if any (indirect `N 0 R` refs need the
    * xref we deliberately don't parse — fall back to scanning).
    */
  private def directLength(header: String): Option[Int] =
    LengthRe.findAllMatchIn(header).toSeq.lastOption
      .filter(_.group(2) == null)
      .flatMap(_.group(1).toIntOption)

  /** All bytes in [a, b) are EOL/whitespace. */
  private def eolOnly(pdf: Array[Byte], a: Int, b: Int): Boolean = {
    var i = a
    while (i < b) {
      val c = pdf(i)
      if (c != '\r' && c != '\n' && c != ' ' && c != '\t') return false
      i += 1
    }
    true
  }

  private def lastIndexOfBefore(hay: Array[Byte], needle: String,
                                from: Int, until: Int): Int = {
    var last = -1
    var i = indexOf(hay, needle, from)
    while (i >= 0 && i < until) {
      last = i
      i = indexOf(hay, needle, i + 1)
    }
    last
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      val buf = new Array[Byte](8192)
      val out = new ByteArrayOutputStream(data.length * 4)
      var guard = 0
      while (!inf.finished() && !inf.needsInput() && guard < 65536) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        guard += 1
      }
      if (out.size() > 0) Some(out.toByteArray) else None
    } catch {
      case _: DataFormatException => None // corrupt stream: skip, stay total
    } finally inf.end()
  }

  private def indexOf(hay: Array[Byte], needle: String, from: Int): Int = {
    val nb = needle.getBytes(StandardCharsets.ISO_8859_1)
    var i = math.max(from, 0)
    val lim = hay.length - nb.length
    while (i <= lim) {
      var j = 0
      while (j < nb.length && hay(i + j) == nb(j)) j += 1
      if (j == nb.length) return i
      i += 1
    }
    -1
  }

  /** Parse one content stream: text-showing strings between BT/ET,
    * split into lines at the Td, TD, T-star and quote advances.
    */
  private[extract] def linesOf(content: Array[Byte]): Seq[String] = {
    val lines = Seq.newBuilder[String]
    val line = new ByteArrayOutputStream(128)
    // last string/array-of-strings operand awaiting its operator
    var pendingString: Array[Byte] = null
    var pendingArray: Seq[Array[Byte]] = null
    var inText = false

    def flushLine(): Unit = {
      if (line.size() > 0) {
        lines += new String(line.toByteArray, StandardCharsets.UTF_8)
        line.reset()
      }
    }
    def show(bytes: Array[Byte]): Unit = if (bytes != null) line.write(bytes, 0, bytes.length)

    val n = content.length
    var i = 0
    var arrayDepth = 0
    var arrayAcc = Seq.newBuilder[Array[Byte]]

    def record(sBytes: Array[Byte]): Unit =
      if (arrayDepth > 0) arrayAcc += sBytes else pendingString = sBytes

    while (i < n) {
      val c = content(i).toChar
      if (c == '(') {
        val (bytes, next) = literalString(content, i)
        record(bytes); i = next
      } else if (c == '<' && i + 1 < n && content(i + 1).toChar == '<') {
        // skip << … >> dicts as a unit (e.g. /P <</MCID 0>> BDC) — the
        // second '<' must not be misparsed as a hex string whose bytes
        // could later leak into the output
        i = skipDict(content, i)
      } else if (c == '<') {
        val (bytes, next) = hexString(content, i)
        record(bytes); i = next
      } else if (c == '[') {
        arrayDepth += 1; arrayAcc = Seq.newBuilder[Array[Byte]]; i += 1
      } else if (c == ']') {
        if (arrayDepth > 0) { arrayDepth -= 1; pendingArray = arrayAcc.result() }
        i += 1
      } else if (c == '%') { // comment to EOL
        while (i < n && content(i) != '\n' && content(i) != '\r') i += 1
      } else if (isRegular(c)) {
        val start = i
        while (i < n && isRegular(content(i).toChar)) i += 1
        val op = new String(content, start, i - start, StandardCharsets.ISO_8859_1)
        op match {
          case "BT" => inText = true
          case "ET" => if (inText) flushLine(); inText = false
          // every show op CONSUMES its operand — a stale pendingString
          // must never be re-shown by a later operand-less op
          case "Tj" => if (inText) show(pendingString); pendingString = null
          case "'" => if (inText) { flushLine(); show(pendingString) }; pendingString = null
          case "\"" => if (inText) { flushLine(); show(pendingString) }; pendingString = null
          case "TJ" =>
            if (inText && pendingArray != null) pendingArray.foreach(show)
            pendingArray = null
          case "Td" | "TD" | "T*" => if (inText) flushLine()
          case "BI" =>
            // inline image: raw binary follows `ID` — parsing it as
            // tokens would swallow or corrupt real text; skip to `EI`
            i = skipInlineImage(content, i)
          case _ => // numbers, names, other operators: ignored
        }
      } else i += 1
    }
    flushLine()
    lines.result()
  }

  /** Skip a << … >> dict (nested dicts and embedded strings included);
    * returns the index after the closing '>>' (or EOF when truncated).
    */
  private def skipDict(content: Array[Byte], start: Int): Int = {
    val n = content.length
    var depth = 0
    var i = start
    while (i < n) {
      val c = content(i).toChar
      if (c == '<' && i + 1 < n && content(i + 1).toChar == '<') { depth += 1; i += 2 }
      else if (c == '>' && i + 1 < n && content(i + 1).toChar == '>') {
        depth -= 1; i += 2
        if (depth <= 0) return i
      } else if (c == '(') i = literalString(content, i)._2
      else i += 1
    }
    n
  }

  /** Skip a BI … ID <binary> EI inline image: scan for whitespace+"EI"
    * followed by a delimiter/whitespace/EOF (the standard heuristic —
    * the binary has no declared length). Returns the index after EI.
    */
  private def skipInlineImage(content: Array[Byte], start: Int): Int = {
    val n = content.length
    var i = start
    while (i + 2 < n) {
      val w = content(i).toChar
      if ((w == ' ' || w == '\n' || w == '\r' || w == '\t' || w == '\f' || w == 0) &&
        content(i + 1) == 'E' && content(i + 2) == 'I' &&
        (i + 3 >= n || !isRegular(content(i + 3).toChar))) {
        return i + 3
      }
      i += 1
    }
    n
  }

  private def isRegular(c: Char): Boolean =
    !(c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' || c == 0 ||
      c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%')

  /** Literal string at content(i)=='(' — returns (bytes, indexAfter).
    * Balanced nested parens; backslash escapes per the PDF spec.
    */
  private[extract] def literalString(content: Array[Byte], start: Int): (Array[Byte], Int) = {
    val out = new ByteArrayOutputStream(64)
    val n = content.length
    var depth = 1
    var i = start + 1
    while (i < n && depth > 0) {
      val c = content(i).toChar
      if (c == '\\' && i + 1 < n) {
        val e = content(i + 1).toChar
        e match {
          case 'n' => out.write('\n'); i += 2
          case 'r' => out.write('\r'); i += 2
          case 't' => out.write('\t'); i += 2
          case 'b' => out.write('\b'); i += 2
          case 'f' => out.write('\f'); i += 2
          case '(' => out.write('('); i += 2
          case ')' => out.write(')'); i += 2
          case '\\' => out.write('\\'); i += 2
          case '\r' => i += 2; if (i < n && content(i) == '\n') i += 1 // continuation
          case '\n' => i += 2 // continuation
          case d if d >= '0' && d <= '7' =>
            var v = 0; var k = 0; i += 1
            while (k < 3 && i < n && content(i) >= '0' && content(i) <= '7') {
              v = v * 8 + (content(i) - '0'); i += 1; k += 1
            }
            out.write(v & 0xff)
          case other => out.write(other); i += 2 // unknown escape: the char itself
        }
      } else if (c == '(') { depth += 1; out.write('('); i += 1 }
      else if (c == ')') {
        depth -= 1
        if (depth > 0) out.write(')')
        i += 1
      } else { out.write(content(i)); i += 1 }
    }
    (out.toByteArray, i)
  }

  /** Hex string at content(i)=='<' — returns (bytes, indexAfter). */
  private[extract] def hexString(content: Array[Byte], start: Int): (Array[Byte], Int) = {
    val out = new ByteArrayOutputStream(32)
    val n = content.length
    var i = start + 1
    var hi = -1
    var done = false
    while (i < n && !done) {
      val c = content(i).toChar
      if (c == '>') { done = true; i += 1 }
      else {
        val v = Character.digit(c, 16)
        if (v >= 0) {
          if (hi < 0) hi = v
          else { out.write((hi << 4) | v); hi = -1 }
        }
        i += 1
      }
    }
    if (hi >= 0) out.write(hi << 4) // odd digit count: pad low nibble with 0
    (out.toByteArray, i)
  }
}
