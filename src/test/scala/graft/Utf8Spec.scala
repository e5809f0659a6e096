package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** UTF-8 / non-ASCII robustness of the text operators, against the
  * committed `fixtures/utf8` corpus (accents, CJK, RTL, NFC-vs-NFD,
  * non-BMP emoji). The cross-engine half of this evidence is the fixture
  * oracle gate (`tools/make_utf8_fixture.py` + `tools/check_oracle.py`:
  * winnow/bpe/fingerprint/pii/dup-ngrams/tokens/gopher all hash-green);
  * these tests pin the Scala-side code-point semantics so a charAt
  * regression cannot land silently.
  */
class Utf8Spec extends AnyFunSuite with SparkTestBase {

  private val dir = "fixtures/utf8"

  test("winnow hashes code points: a k-code-point non-BMP doc is ONE k-gram") {
    // 6 emoji = 12 UTF-16 units but 6 code points; with k=5 there are
    // n = 2 gram positions and a single window — a surrogate-halves
    // (charAt) formulation would see n = 8 and emit a different set
    val text = new String(Array(0x1f600, 0x1f603, 0x1f604, 0x1f680, 0x1f600, 0x1f603), 0, 6)
    assert(text.length == 12 && text.codePointCount(0, text.length) == 6)
    val fps = TextAnalysis.winnow(text, k = 5, w = 4)
    assert(fps.size == 1, s"expected one window minimum, got $fps")
    // independent recompute of the two candidate hashes by the direct
    // polynomial formula over CODE POINTS
    val cps = text.codePoints().toArray
    def gram(start: Int): Long =
      (0 until 5).foldLeft(0L)((h, j) =>
        (h * TextAnalysis.WinnowBase + cps(start + j)) % TextAnalysis.WinnowMod)
    assert(fps.head == math.min(gram(0), gram(1)) ||
           (gram(0) == gram(1) && fps.head == gram(1)),
      "fingerprint must be the window minimum of the code-point k-gram hashes")
  }

  test("fixture-table winnow fingerprints match the local core per doc") {
    val texts = Tables(spark, dir, "documents").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextAnalysis.winnowFingerprints(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    texts.foreach { case (id, t) =>
      val expected = TextAnalysis.winnow(t).toSet
      assert(got.getOrElse(id, Set.empty) == expected, s"doc $id fingerprints")
    }
    // the short and empty docs emit nothing; everything else fingerprints
    assert(texts.count { case (_, t) => t.codePointCount(0, t.length) >= 5 } ==
      got.count(_._2.nonEmpty))
  }

  test("token and BPE counts are code-point-sane on CJK/emoji docs") {
    val rows = TextAnalysis.tokenCounts(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val texts = Tables(spark, dir, "documents").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, t) =>
      val (nTok, nChars) = rows(id)
      assert(nTok == t.split("[ \t\n\r\f]+").count(_.nonEmpty), s"doc $id tokens")
      // n_chars_actual counts code points (SQL length), NOT UTF-16 units
      assert(nChars == t.codePointCount(0, t.length), s"doc $id chars")
    }
    // BPE tier runs without error and bounds: every doc tokenizes
    val bpe = TextAnalysis.bpeTokenCounts(spark, dir).collect()
    assert(bpe.length == texts.size)
    bpe.foreach { r =>
      val id = r.getLong(0)
      if (texts(id).nonEmpty) assert(r.getLong(1) > 0, s"doc $id has no BPE tokens")
    }
  }

  test("NFC and NFD spellings fingerprint differently (no silent normalization)") {
    val nfc = "caf\u00e9 au lait et creme"   // precomposed U+00E9
    val nfd = "cafe\u0301 au lait et creme"  // e + combining acute U+0301
    assert(TextAnalysis.winnow(nfc).toSet != TextAnalysis.winnow(nfd).toSet,
      "operators must hash stored code points, not a normalized form")
  }
}
