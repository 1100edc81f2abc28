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

  private def gunzipAll(data: Array[Byte]): Array[Byte] = {
    // concatenated gzip members decompress sequentially; the
    // constructor itself throws on a damaged header — keep the prefix
    val out = new ByteArrayOutputStream(data.length * 3 + 64)
    try {
      val in = new GZIPInputStream(new ByteArrayInputStream(data), 8192)
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } catch { case _: java.io.IOException => /* damaged tail: keep prefix */ }
    out.toByteArray
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
    * Gzipped input (magic 1f 8b) is decompressed first; non-response
    * records are skipped; a record without a parseable Content-Length
    * ends parsing (cannot locate the next boundary — the damaged-file
    * degradation real readers use).
    */
  def responses(warc: Array[Byte]): Seq[(String, Long, Array[Byte])] = {
    if (warc == null || warc.length < 4) return Seq.empty
    val plain =
      if ((warc(0) & 0xff) == 0x1f && (warc(1) & 0xff) == 0x8b) gunzipAll(warc)
      else warc
    val out = Seq.newBuilder[(String, Long, Array[Byte])]
    var pos = 0
    while (pos >= 0 && pos < plain.length) {
      pos = indexOf(plain, "WARC/".getBytes(StandardCharsets.US_ASCII), pos)
      if (pos >= 0) {
        val headEnd = indexOf(plain, s"$Crlf$Crlf".getBytes(StandardCharsets.US_ASCII), pos)
        if (headEnd < 0) { pos = -1 }
        else {
          val head = new String(plain, pos, headEnd - pos, StandardCharsets.UTF_8)
          val fields = head.split("\r\n").iterator.flatMap { line =>
            val i = line.indexOf(':')
            if (i > 0) Some(line.substring(0, i).trim.toLowerCase ->
              line.substring(i + 1).trim)
            else None
          }.toMap
          fields.get("content-length").flatMap(s => s.toLongOption) match {
            case None => pos = -1 // boundary unknown: stop (damaged)
            case Some(len) =>
              val payloadStart = headEnd + 4
              val payloadEnd = math.min(plain.length, payloadStart + len.toInt)
              if (fields.get("warc-type").contains("response") &&
                payloadEnd > payloadStart) {
                val payload = java.util.Arrays.copyOfRange(plain, payloadStart, payloadEnd)
                val bodyAt = indexOf(payload, s"$Crlf$Crlf".getBytes(StandardCharsets.US_ASCII), 0)
                val body =
                  if (bodyAt < 0) Array.empty[Byte]
                  else java.util.Arrays.copyOfRange(payload, bodyAt + 4, payload.length)
                val epoch = fields.get("warc-date")
                  .flatMap(d => scala.util.Try(Instant.parse(d).getEpochSecond).toOption)
                  .getOrElse(0L)
                val uri = fields.getOrElse("warc-target-uri", "")
                if (uri.nonEmpty && body.nonEmpty) out += ((uri, epoch, body))
              }
              pos = payloadEnd
          }
        }
      }
    }
    out.result()
  }

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(0, from)
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
