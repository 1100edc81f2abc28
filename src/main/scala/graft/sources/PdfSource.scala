package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.Deflater

/** Deterministic synthesis of PDF "pages" — the second source format of
  * the extraction engine (north rule: "HTML boilerplate strip,
  * PDF/layout parse"). [[wrapPdf]] emits a small but structurally
  * honest PDF (catalog → pages → page → Flate content stream) whose
  * text operators carry the document's paragraphs; extracting it with
  * PdfTextExtractor and joining lines with " " reproduces the document
  * text byte-identically — same contract as PageSource.wrapHtml.
  */
object PdfSource {

  /** Escape a paragraph for a PDF literal string. */
  private def esc(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' || c == '(' || c == ')') sb.append('\\')
      sb.append(c)
      i += 1
    }
    sb.toString
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    d.setInput(data)
    d.finish()
    val out = new ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) {
      val n = d.deflate(buf)
      out.write(buf, 0, n)
    }
    d.end()
    out.toByteArray
  }

  /** One-page PDF whose content stream shows each paragraph of `text`
    * (8-word chunks, like wrapHtml) as a Tj line. Every third document
    * uses a raw (uncompressed) stream so both decode paths stay
    * exercised; content bytes are UTF-8 (documented simplification —
    * no /ToUnicode remapping).
    */
  def wrapPdf(docId: Long, text: String): Array[Byte] = {
    val content = {
      val sb = new java.lang.StringBuilder(text.length + 256)
      sb.append("BT /F1 12 Tf 72 720 Td\n")
      PageSource.paragraphs(text).foreach { p =>
        sb.append('(').append(esc(p)).append(") Tj T*\n")
      }
      sb.append("ET")
      sb.toString.getBytes(StandardCharsets.UTF_8)
    }
    val flate = docId % 3 != 0
    val payload = if (flate) deflate(content) else content
    val filter = if (flate) " /Filter /FlateDecode" else ""

    val out = new ByteArrayOutputStream(payload.length + 512)
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n")
    w(s"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w(s"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w(s"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${payload.length}$filter >> stream\n")
    out.write(payload, 0, payload.length)
    w("\nendstream endobj\n")
    w("trailer << /Root 1 0 R >>\n%%EOF\n")
    out.toByteArray
  }
}
