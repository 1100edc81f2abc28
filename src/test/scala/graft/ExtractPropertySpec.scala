package graft

import java.nio.charset.StandardCharsets

import org.scalacheck.{Arbitrary, Gen}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.extract._
import graft.sources.PageSource

/** Property tests (SURVEY.md §5.2.2): the extraction core is total,
  * deterministic and structurally sound on ADVERSARIAL inputs — random
  * byte garbage, random tag soup, random wrapped documents.
  */
class ExtractPropertySpec extends AnyFunSuite {

  /** Seed-fixed sampling: deterministic property evaluation without the
    * scalatestplus bridge (absent from the offline coursier cache).
    */
  private def forAll[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default.withSize(60)
    var i = 0L
    var produced = 0
    while (produced < n) {
      g.apply(params, Seed(i)) match {
        case Some(a) => f(a); produced += 1
        case None    =>
      }
      i += 1
    }
  }

  private val cfg = ExtractorConfig.default

  private val tagSoup: Gen[String] = {
    val frag = Gen.oneOf(
      Gen.alphaNumStr.map(s => s.take(12)),
      Gen.oneOf("<p>", "</p>", "<div>", "</div>", "<a href='x'>", "</a>",
        "<br>", "<!-- c -->", "&amp;", "&#65;", "&bogus;", "<table><tr><td>",
        "</td></tr></table>", "< ", "<script>x<y</script>", "  ", "\n", "\t",
        "<3", "</3 junk>", "</>", "<-", "1 < 2",
        "<b>", "</i>", "<P >", "</SPAN>", "<h1>", "&#x41;", "<x>", "</zz>")
    )
    Gen.listOf(frag).map(_.mkString)
  }

  /** Soup extended with verbatim-mode fragments (pre, CDATA, astral
    * entities) — used by totality/span properties; the whitespace-run
    * property keeps the plain soup because pre blocks legitimately
    * carry whitespace.
    */
  private val tagSoupPre: Gen[String] = {
    val frag = Gen.oneOf(tagSoup,
      Gen.oneOf("<pre>", "</pre>", "<![CDATA[a  b\n]]>", "<![CDATA[", "&#x1F600;"))
    Gen.listOf(frag).map(_.mkString)
  }

  private val rawBytes: Gen[Array[Byte]] =
    Gen.listOf(Arbitrary.arbitrary[Byte]).map(_.toArray)

  test("total + deterministic on random tag soup") {
    forAll(tagSoupPre) { (s: String) =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      val (t1, sp1) = GoldenExtractor.extract(b, cfg)
      val (t2, sp2) = GoldenExtractor.extract(b.clone(), cfg)
      assert(t1 == t2)
      assert(sp1.toSeq == sp2.toSeq)
    }
  }

  test("total + deterministic on arbitrary (invalid-UTF-8) bytes") {
    forAll(rawBytes) { (b: Array[Byte]) =>
      val (t1, _) = GoldenExtractor.extract(b, cfg)
      val (t2, _) = GoldenExtractor.extract(b.clone(), cfg)
      assert(t1 == t2)
    }
  }

  test("spans are well-formed: sorted, non-overlapping, inside the text bytes") {
    forAll(tagSoupPre) { (s: String) =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      val (text, spans) = GoldenExtractor.extract(b, cfg)
      val total = text.getBytes(StandardCharsets.UTF_8).length
      var prevEnd = -1
      spans.foreach { sp =>
        assert(sp.start >= 0 && sp.start <= sp.end && sp.end <= total)
        assert(sp.start > prevEnd)
        prevEnd = sp.end
      }
      // spans slice to non-empty pieces; pieces are never separator-
      // padded UNLESS the page has a <pre> region (verbatim whitespace
      // is the point of pre)
      val bytes = text.getBytes(StandardCharsets.UTF_8)
      val hasPre = s.toLowerCase.contains("<pre")
      spans.foreach { sp =>
        val piece = new String(bytes.slice(sp.start, sp.end), StandardCharsets.UTF_8)
        assert(piece.nonEmpty)
        if (!hasPre) assert(!piece.startsWith(" ") && !piece.endsWith(" "))
      }
    }
  }

  test("whitespace runs never survive into block text") {
    forAll(tagSoup) { (s: String) =>
      HtmlTokenizer.tokenizeChars(s).foreach { blk =>
        assert(!blk.text.contains("  "))
        assert(!blk.text.exists(c => c == '\n' || c == '\t' || c == '\r'))
        assert(blk.text == blk.text.trim)
        assert(blk.nChars == blk.text.length)
        assert(blk.nLinkChars <= blk.nChars)
      }
    }
  }

  test("wrapped-document byte-identity holds for random word sequences") {
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(10))
    val doc = Gen.nonEmptyListOf(word).map(_.mkString(" "))
    forAll(doc) { (text: String) =>
      val (out, _) = GoldenExtractor.extract(
        PageSource.wrapHtml(1L, text), ExtractorConfig.spaceJoined)
      assert(out == text)
    }
  }

  /** The relational run-parity rule the bpe_train/bpe_encode SQL
    * mirrors compute: match positions grouped into consecutive runs,
    * even offsets kept, kept merges shadow the following position.
    * Independent formulation of Bpe.applyMerge's greedy scan.
    */
  private def runParityMerge(syms: Array[String], l: String, r: String): Array[String] = {
    val matches = (0 until syms.length - 1).filter(i => syms(i) == l && syms(i + 1) == r)
    val keep = scala.collection.mutable.Set.empty[Int]
    var runStart = -2
    var prev = -2
    matches.foreach { i =>
      if (i != prev + 1) runStart = i
      if ((i - runStart) % 2 == 0) keep += i
      prev = i
    }
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (keep(i)) { out += (l + r); i += 2 } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  test("BPE greedy scan == the SQL mirror's run-parity rule on adversarial runs") {
    // 2-symbol alphabet maximizes overlapping-run collisions (l == r
    // runs are the only case where greedy and naive-all-matches differ)
    val symSeq = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "ab", "ba"))
      .map(_.toArray)
    val pair = Gen.oneOf(("a", "a"), ("a", "b"), ("b", "a"), ("ab", "ab"),
      ("a", "ab"), ("ab", "a"), ("b", "b"))
    forAll(Gen.zip(symSeq, pair), n = 400) { case (syms, (l, r)) =>
      val greedy = graft.ops.Bpe.applyMerge(syms, l, r)
      val parity = runParityMerge(syms, l, r)
      assert(greedy.toSeq == parity.toSeq,
        s"diverged on ${syms.mkString("[", " ", "]")} merging ($l,$r)")
    }
  }
}
