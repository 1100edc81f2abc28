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
    /** Read exactly n bytes (short at EOF — the truncated-tail case).
      * Allocation is bounded by bytes ACTUALLY read (64 KiB chunks into
      * a growing buffer), never by the claimed length — a damaged
      * header announcing a huge Content-Length on a few-KB file must
      * not force a transient 1 GiB byte[] per record (an OOM
      * amplification vector with many concurrent tasks).
      */
    def readN(n: Long): Array[Byte] = {
      val want = math.min(n, MaxPayload)
      val bos = new ByteArrayOutputStream(math.min(want, 65536L).toInt)
      val chunk = new Array[Byte](math.min(want, 65536L).toInt max 1)
      var remaining = want
      while (remaining > 0) {
        val r = buf.read(chunk, 0, math.min(remaining, chunk.length.toLong).toInt)
        if (r < 0) return bos.toByteArray
        bos.write(chunk, 0, r)
        remaining -= r
      }
      bos.toByteArray
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

  /** (targetUri, captureEpochSec, httpBodyBytes) per response record,
    * parsed LAZILY — records materialize one at a time as the iterator
    * is consumed, so a flatMap over a multi-GB decompressed WARC file
    * holds O(one record payload) of bodies, never the whole file's (a
    * 1 GB .warc.gz ≈ 3–5 GB of bodies; materializing them per task
    * OOMs any real executor at normal task concurrency).
    *
    * Gzipped input (magic 1f 8b) is decompressed as a STREAM (memory
    * O(one record), concatenated members handled); non-response
    * records are skipped; a record whose Content-Length is missing,
    * negative, or absurd (> 1 GiB) ends parsing — the next boundary
    * cannot be trusted, and real readers degrade the same way. The
    * cursor only ever moves FORWARD (line reads + exact payload
    * reads), so no adversarial header can loop the parser. Any
    * IOException mid-stream (damaged gzip, truncated tail) ends the
    * iterator — the parsed prefix survives, nothing throws.
    */
  def responsesIterator(warc: Array[Byte]): Iterator[(String, Long, Array[Byte])] = {
    if (warc == null || warc.length < 4) return Iterator.empty
    responsesIterator(new ByteArrayInputStream(warc))
  }

  /** Stream form: parse records lazily straight off an InputStream
    * (gzip sniffed from the 2-byte magic via mark/reset) — the seam a
    * filesystem-streaming ingest uses to avoid materializing even the
    * compressed file bytes. Same damage tolerance as the byte[] form.
    */
  def responsesIterator(in: java.io.InputStream): Iterator[(String, Long, Array[Byte])] = {
    val lines =
      try {
        val buffered = new java.io.BufferedInputStream(in, 8192)
        buffered.mark(2)
        val b0 = buffered.read()
        val b1 = buffered.read()
        buffered.reset()
        val stream: java.io.InputStream =
          if (b0 == 0x1f && b1 == 0x8b)
            new GZIPInputStream(buffered, 8192) // header check may throw on damage
          else buffered
        new ByteLines(stream)
      } catch {
        case _: java.io.IOException => return Iterator.empty
      }
    recordIterator(lines)
  }

  private def recordIterator(lines: ByteLines): Iterator[(String, Long, Array[Byte])] =
    new Iterator[(String, Long, Array[Byte])] {
      private var pending: (String, Long, Array[Byte]) = null
      private var done = false
      advance()
      override def hasNext: Boolean = pending != null
      override def next(): (String, Long, Array[Byte]) = {
        if (pending == null) throw new NoSuchElementException("WARC iterator exhausted")
        val r = pending
        advance()
        r
      }
      /** Scan forward to the next valid response record (or EOF/damage). */
      private def advance(): Unit = {
        pending = null
        if (done) return
        try {
          var line = lines.readLine()
          while (pending == null && !done) {
            line match {
              case None => done = true
              case Some(l0) if l0.startsWith("WARC/") =>
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
                  case None => done = true // boundary unknown: stop
                  case Some(len) =>
                    val payload = lines.readN(len)
                    if (fields.get("warc-type").contains("response") && payload.nonEmpty) {
                      val bodyAt = WarcSource.indexOf(payload,
                        s"$Crlf$Crlf".getBytes(StandardCharsets.US_ASCII))
                      val body =
                        if (bodyAt < 0) Array.empty[Byte]
                        else java.util.Arrays.copyOfRange(payload, bodyAt + 4, payload.length)
                      val epoch = fields.get("warc-date")
                        .flatMap(d => scala.util.Try(Instant.parse(d).getEpochSecond).toOption)
                        .getOrElse(0L)
                      val uri = fields.getOrElse("warc-target-uri", "")
                      if (uri.nonEmpty && body.nonEmpty) pending = (uri, epoch, body)
                    }
                    if (pending == null) line = lines.readLine()
                }
              case Some(_) => line = lines.readLine()
            }
          }
        } catch {
          case _: java.io.IOException => done = true; pending = null
        }
      }
    }

  /** Eager form (tests / small files): materializes the full record
    * list. Production paths (IngestJob, extract_warc) flatMap
    * [[responsesIterator]] instead — do NOT add new callers here for
    * anything that sees real crawl files.
    */
  def responses(warc: Array[Byte]): Seq[(String, Long, Array[Byte])] =
    responsesIterator(warc).toSeq

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
