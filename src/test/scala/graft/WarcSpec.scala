package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{PageSource, WarcSource}

/** WARC container leg: record round-trip (plain and per-record gzip),
  * non-response records skipped, damaged input degrades without
  * throwing.
  */
class WarcSpec extends AnyFunSuite {

  private def pages(n: Int) = (0 until n).map { i =>
    val id = i.toLong
    (id, PageSource.urlOf(id), PageSource.EpochBase + id,
      PageSource.wrapHtml(id, s"alpha beta gamma delta doc$i epsilon zeta eta theta"))
  }

  test("round-trip: plain multi-record file yields every response body byte-identically") {
    val ps = pages(4)
    val warc = WarcSource.buildWarcFile(ps, gzipPerRecord = false)
    val got = WarcSource.responses(warc)
    assert(got.size == 4)
    got.zip(ps).foreach { case ((uri, epoch, body), (_, url, ts, html)) =>
      assert(uri == url && epoch == ts)
      assert(body.sameElements(html), s"body bytes differ for $uri")
    }
  }

  test("round-trip: per-record gzip members (the Common-Crawl convention)") {
    val ps = pages(3)
    val warc = WarcSource.buildWarcFile(ps, gzipPerRecord = true)
    assert((warc(0) & 0xff) == 0x1f && (warc(1) & 0xff) == 0x8b)
    val got = WarcSource.responses(warc)
    assert(got.size == 3)
    got.zip(ps).foreach { case ((uri, _, body), (_, url, _, html)) =>
      assert(uri == url && body.sameElements(html))
    }
  }

  test("warcinfo and request records are skipped; only responses surface") {
    val warc = WarcSource.buildWarcFile(pages(2), gzipPerRecord = false)
    val text = new String(warc, StandardCharsets.ISO_8859_1)
    assert(text.contains("WARC-Type: warcinfo") && text.contains("WARC-Type: request"))
    assert(WarcSource.responses(warc).size == 2)
  }

  test("damaged input: truncated tail, garbage, bad gzip — degrade, never throw") {
    val warc = WarcSource.buildWarcFile(pages(3), gzipPerRecord = false)
    // truncating mid-payload loses at most the damaged record
    val cut = java.util.Arrays.copyOf(warc, warc.length * 2 / 3)
    assert(WarcSource.responses(cut).size >= 1)
    assert(WarcSource.responses(Array[Byte](0x1f.toByte, 0x8b.toByte, 0, 0)).isEmpty)
    assert(WarcSource.responses("not a warc at all".getBytes).isEmpty)
    assert(WarcSource.responses(Array.empty[Byte]).isEmpty)
    assert(WarcSource.responses(null).isEmpty)
    // header without Content-Length: parser stops instead of guessing
    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n\r\npayload").getBytes
    assert(WarcSource.responses(noLen).isEmpty)
  }

  test("deterministic bytes: same pages -> same file, gzip included") {
    val a = WarcSource.buildWarcFile(pages(3), gzipPerRecord = true)
    val b = WarcSource.buildWarcFile(pages(3), gzipPerRecord = true)
    assert(a.sameElements(b))
  }
}
