package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.PdfTextExtractor
import graft.sources.PdfSource

/** PDF text-extraction goldens: operator coverage, escapes, Flate and
  * raw streams, malformed input totality, and the wrap→extract
  * byte-identity contract that the extract_pdf oracle checks at scale.
  */
class PdfSpec extends AnyFunSuite {

  private def bytes(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)

  private def rawPdf(content: String): Array[Byte] =
    bytes(s"%PDF-1.4\n1 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n%%EOF")

  test("Tj / T* produce one line per show-advance") {
    val pdf = rawPdf("BT (first line) Tj T* (second line) Tj ET")
    assert(PdfTextExtractor.extractLines(pdf).toSeq == Seq("first line", "second line"))
  }

  test("TJ array show with kerning numbers concatenates strings") {
    val pdf = rawPdf("BT [(Hel) -20 (lo) 5 ( world)] TJ ET")
    assert(PdfTextExtractor.extractLines(pdf).toSeq == Seq("Hello world"))
  }

  test("quote operators start a new line before showing") {
    val pdf = rawPdf("BT (a) Tj (b) ' 1 2 (c) \" ET")
    assert(PdfTextExtractor.extractLines(pdf).toSeq == Seq("a", "b", "c"))
  }

  test("literal string escapes: parens, backslash, octal, continuations") {
    val pdf = rawPdf("BT (par\\(en\\)s \\\\slash \\101 nested (inner) ok) Tj ET")
    assert(PdfTextExtractor.extractLines(pdf).toSeq ==
      Seq("par(en)s \\slash A nested (inner) ok"))
  }

  test("hex strings decode, odd digit padded") {
    val pdf = rawPdf("BT <48656C6C6F> Tj T* <4> Tj ET")
    assert(PdfTextExtractor.extractLines(pdf).toSeq == Seq("Hello", "@"))
  }

  test("text outside BT/ET is ignored; comments skipped") {
    val pdf = rawPdf("(not shown) Tj % comment (also not) Tj\nBT (shown) Tj ET (after) Tj")
    assert(PdfTextExtractor.extractLines(pdf).toSeq == Seq("shown"))
  }

  test("FlateDecode streams inflate; corrupt flate is skipped, not thrown") {
    val doc = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val pdf = PdfSource.wrapPdf(1L, doc) // docId 1 -> Flate path
    assert(PdfTextExtractor.extractText(pdf, " ") == doc)
    val raw = PdfSource.wrapPdf(3L, doc) // docId 3 -> raw path
    assert(PdfTextExtractor.extractText(raw, " ") == doc)
    val corrupt = bytes("%PDF-1.4\n1 0 obj << /Filter /FlateDecode >> stream\n\nendstream\n")
    assert(PdfTextExtractor.extractLines(corrupt).isEmpty) // total, no throw
  }

  test("wrap -> extract is byte-identical for texts with PDF delimiters") {
    val tricky = "uses (parens) and \\backslash and more (nested (deep)) words here ok"
    assert(PdfTextExtractor.extractText(PdfSource.wrapPdf(2L, tricky), " ") == tricky)
    assert(PdfTextExtractor.extractText(PdfSource.wrapPdf(3L, tricky), " ") == tricky)
  }

  test("raw stream whose TEXT contains the word endstream round-trips (length-located)") {
    val doc = "the marker endstream appears mid text and extraction must survive it fine"
    // docId 3 -> raw (uncompressed) path: the payload embeds the bytes
    // 'endstream'; /Length must locate the true end, not the first match
    assert(PdfTextExtractor.extractText(PdfSource.wrapPdf(3L, doc), " ") == doc)
    assert(PdfTextExtractor.extractText(PdfSource.wrapPdf(1L, doc), " ") == doc)
  }

  test("an earlier non-stream dict naming /FlateDecode does not misclassify a raw stream") {
    val content = "BT (Hello raw) Tj ET"
    val pdf = bytes(
      "%PDF-1.4\n" +
        "5 0 obj << /Type /XRef /Filter /FlateDecode /DecodeParms 7 >> endobj\n" +
        s"6 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n%%EOF")
    assert(PdfTextExtractor.extractText(pdf, " ") == "Hello raw")
  }

  test("inline images (BI..ID..EI) are skipped: binary never corrupts or swallows text") {
    // image bytes contain '(' and 'BT'-shaped runs that would derail a
    // naive token scan
    val content = "BT (before) Tj ET BI /W 2 /H 2 ID ( BT ( Tj ÿ EI\nBT (after) Tj ET"
    assert(PdfTextExtractor.extractLines(rawPdf(content)).toSeq == Seq("before", "after"))
  }

  test("content-stream dicts are skipped as units; stale show operands never re-emit") {
    // <</MCID 0>> must not be read as a hex string
    assert(PdfTextExtractor.extractLines(
      rawPdf("/P <</MCID 0>> BDC BT (ok) Tj ET")).toSeq == Seq("ok"))
    // ' with a missing operand must NOT re-show the consumed "A"
    assert(PdfTextExtractor.extractLines(rawPdf("BT (A) Tj T* ' ET")).toSeq == Seq("A"))
  }

  test("lying /Length values: fallback to scanning, never throw, deterministic") {
    val content = "BT (survives) Tj ET"
    for (len <- Seq(-5, 0, 3, 10000, Int.MaxValue)) {
      val pdf = bytes(
        s"%PDF-1.4\n1 0 obj << /Length $len >> stream\n$content\nendstream endobj\n%%EOF")
      val got = PdfTextExtractor.extractLines(pdf).toSeq
      assert(got == PdfTextExtractor.extractLines(pdf.clone()).toSeq, s"len=$len")
      if (len <= 0 || len > pdf.length) // implausible: scan fallback recovers
        assert(got == Seq("survives"), s"len=$len got $got")
    }
    // indirect length (N 0 R) cannot be resolved without xref: fallback
    val ind = bytes(
      s"%PDF-1.4\n1 0 obj << /Length 7 0 R >> stream\n$content\nendstream endobj\n%%EOF")
    assert(PdfTextExtractor.extractLines(ind).toSeq == Seq("survives"))
  }

  test("totality on junk and truncated input") {
    assert(PdfTextExtractor.extractLines(null).isEmpty)
    assert(PdfTextExtractor.extractLines(bytes("")).isEmpty)
    assert(PdfTextExtractor.extractLines(bytes("%PDF-1.4 truncated stream")).isEmpty)
    val unterminated = bytes("%PDF\n1 0 obj stream\nBT (x) Tj") // no endstream
    assert(PdfTextExtractor.extractLines(unterminated).isEmpty)
    // determinism on arbitrary bytes
    val junk = Array.tabulate[Byte](512)(i => (i * 31).toByte)
    assert(PdfTextExtractor.extractLines(junk).toSeq ==
      PdfTextExtractor.extractLines(junk.clone()).toSeq)
  }
}
