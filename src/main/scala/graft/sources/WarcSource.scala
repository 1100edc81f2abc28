package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.time.Instant
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** WARC ingestion leg — the container format real Common-Crawl data
  * ships in. [[buildWarcFile]] synthesizes a structurally honest
  * WARC/1.0 file (warcinfo record, then per page a request record and
  * a response record wrapping the HTTP message; optionally one gzip
  * member per record — the Common-Crawl convention); [[responses]]
  * parses one back to (target uri, capture epoch, HTTP body bytes).
  *
  * Determinism: gzip via GZIPOutputStream (fixed header, MTIME=0);
  * dates via Instant (UTC, no locale). Parsing is total — truncated
  * tails, malformed headers, or undecodable gzip degrade to skipping
  * the rest of that member, never a throw (crawl files are routinely
  * damaged).
  */
object WarcSource {

  private val Crlf = "\r\n"

  private def gzip(data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(data.length / 2 + 64)
    val g = new GZIPOutputStream(bos)
    g.write(data)
    g.close()
    bos.toByteArray
  }

  /** Hard cap on one record's payload (a page, not a file) — a header
    * claiming more is treated as damage, and parsing stops rather than
    * synthesizing records out of payload bytes.
    */
  private val MaxPayload: Long = 1L << 30

  /** Bounded line-and-payload reader over a (possibly gzip) stream —
    * decompression is STREAMED, so memory is O(one record payload),
    * never O(decompressed file) (a ~1 GB .warc.gz expands past the 2 GB
    * byte[] limit; the old whole-file inflate could not run on real
    * Common-Crawl members).
    */
  private final class ByteLines(in: java.io.InputStream) {
    private val buf = new java.io.BufferedInputStream(in, 65536)
    /** Next LF-terminated line (CR stripped), UTF-8, capped at 64 KiB
      * (excess consumed); None at EOF.
      */
    def readLine(): Option[String] = {
      var c = buf.read()
      if (c < 0) return None
      val bos = new ByteArrayOutputStream(128)
      var n = 0
      while (c >= 0 && c != '\n') {
        if (n < 65536) { bos.write(c); n += 1 }
        c = buf.read()
      }
      val b = bos.toByteArray
      val len = if (b.nonEmpty && b(b.length - 1) == '\r') b.length - 1 else b.length
      Some(new String(b, 0, len, StandardCharsets.UTF_8))
    }
    /** Read exactly n bytes (short at EOF — the truncated-tail case). */
    def readN(n: Long): Array[Byte] = {
      val want = math.min(n, MaxPayload).toInt
      val out = new Array[Byte](want)
      var off = 0
      while (off < want) {
        val r = buf.read(out, off, want - off)
        if (r < 0) return java.util.Arrays.copyOf(out, off)
        off += r
      }
      out
    }
  }

  private def record(headers: Seq[(String, String)], payload: Array[Byte]): Array[Byte] = {
    val sb = new java.lang.StringBuilder(256)
    sb.append("WARC/1.0").append(Crlf)
    headers.foreach { case (k, v) => sb.append(k).append(": ").append(v).append(Crlf) }
    sb.append("Content-Length: ").append(payload.length).append(Crlf).append(Crlf)
    val head = sb.toString.getBytes(StandardCharsets.UTF_8)
    val out = new ByteArrayOutputStream(head.length + payload.length + 4)
    out.write(head, 0, head.length)
    out.write(payload, 0, payload.length)
    out.write(s"$Crlf$Crlf".getBytes(StandardCharsets.UTF_8), 0, 4)
    out.toByteArray
  }

  /** One WARC file for the given pages (docId, url, epochSec, html):
    * warcinfo + per page (request, response). With gzipPerRecord each
    * record becomes its own gzip member.
    */
  def buildWarcFile(pages: Seq[(Long, String, Long, Array[Byte])],
                    gzipPerRecord: Boolean): Array[Byte] = {
    val out = new ByteArrayOutputStream(4096)
    def emit(r: Array[Byte]): Unit = {
      val bytes = if (gzipPerRecord) gzip(r) else r
      out.write(bytes, 0, bytes.length)
    }
    emit(record(
      Seq("WARC-Type" -> "warcinfo",
        "WARC-Record-ID" -> "<urn:graft:warcinfo:0>",
        "Content-Type" -> "application/warc-fields"),
      s"software: graft-synth/1.0$Crlf".getBytes(StandardCharsets.UTF_8)))
    pages.foreach { case (docId, url, epochSec, html) =>
      val date = Instant.ofEpochSecond(epochSec).toString
      emit(record(
        Seq("WARC-Type" -> "request",
          "WARC-Target-URI" -> url,
          "WARC-Date" -> date,
          "WARC-Record-ID" -> s"<urn:graft:request:$docId>",
          "Content-Type" -> "application/http; msgtype=request"),
        s"GET /p/$docId HTTP/1.1${Crlf}Host: example$Crlf$Crlf"
          .getBytes(StandardCharsets.UTF_8)))
      val httpHead =
        (s"HTTP/1.1 200 OK${Crlf}Content-Type: text/html; charset=utf-8$Crlf" +
          s"Content-Length: ${html.length}$Crlf$Crlf").getBytes(StandardCharsets.UTF_8)
      val http = new Array[Byte](httpHead.length + html.length)
      System.arraycopy(httpHead, 0, http, 0, httpHead.length)
      System.arraycopy(html, 0, http, httpHead.length, html.length)
      emit(record(
        Seq("WARC-Type" -> "response",
          "WARC-Target-URI" -> url,
          "WARC-Date" -> date,
          "WARC-Record-ID" -> s"<urn:graft:response:$docId>",
          "Content-Type" -> "application/http; msgtype=response"),
        http))
    }
    out.toByteArray
  }

  /** (targetUri, captureEpochSec, httpBodyBytes) per response record.
    * Gzipped input (magic 1f 8b) is decompressed as a STREAM (memory
    * O(one record), concatenated members handled); non-response
    * records are skipped; a record whose Content-Length is missing,
    * negative, or absurd (> 1 GiB) ends parsing — the next boundary
    * cannot be trusted, and real readers degrade the same way. The
    * cursor only ever moves FORWARD (line reads + exact payload
    * reads), so no adversarial header can loop the parser.
    */
  def responses(warc: Array[Byte]): Seq[(String, Long, Array[Byte])] = {
    if (warc == null || warc.length < 4) return Seq.empty
    val out = Seq.newBuilder[(String, Long, Array[Byte])]
    try {
      val raw = new ByteArrayInputStream(warc)
      val in: java.io.InputStream =
        if ((warc(0) & 0xff) == 0x1f && (warc(1) & 0xff) == 0x8b)
          new GZIPInputStream(raw, 8192)
        else raw
      val lines = new ByteLines(in)
      var line = lines.readLine()
      var damaged = false
      while (!damaged && line.isDefined) {
        if (line.exists(_.startsWith("WARC/"))) {
          // header fields up to the blank line
          var fields = Map.empty[String, String]
          var l = lines.readLine()
          while (l.exists(_.nonEmpty)) {
            val s = l.get
            val i = s.indexOf(':')
            if (i > 0) fields += (s.substring(0, i).trim.toLowerCase ->
              s.substring(i + 1).trim)
            l = lines.readLine()
          }
          fields.get("content-length").flatMap(_.toLongOption)
            .filter(len => len >= 0 && len <= MaxPayload) match {
            case None => damaged = true // boundary unknown: stop
            case Some(len) =>
              val payload = lines.readN(len)
              if (fields.get("warc-type").contains("response") && payload.nonEmpty) {
                val bodyAt = indexOf(payload,
                  s"$Crlf$Crlf".getBytes(StandardCharsets.US_ASCII))
                val body =
                  if (bodyAt < 0) Array.empty[Byte]
                  else java.util.Arrays.copyOfRange(payload, bodyAt + 4, payload.length)
                val epoch = fields.get("warc-date")
                  .flatMap(d => scala.util.Try(Instant.parse(d).getEpochSecond).toOption)
                  .getOrElse(0L)
                val uri = fields.getOrElse("warc-target-uri", "")
                if (uri.nonEmpty && body.nonEmpty) out += ((uri, epoch, body))
              }
          }
        }
        if (!damaged) line = lines.readLine()
      }
    } catch {
      case _: java.io.IOException => // damaged gzip/stream: keep prefix
    }
    out.result()
  }

  private def indexOf(hay: Array[Byte], needle: Array[Byte]): Int = {
    var i = 0
    val limit = hay.length - needle.length
    while (i <= limit) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }
}
