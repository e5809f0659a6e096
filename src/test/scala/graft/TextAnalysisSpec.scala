package graft

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite with SparkTestBase {

  test("token counts equal a local whitespace split") {
    val texts = Tables(spark, sf, "documents").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    TextAnalysis.tokenCounts(spark, sf).collect().foreach { r =>
      val expected = texts(r.getLong(0)).split("\\s+").count(_.nonEmpty)
      assert(r.getLong(1) == expected, s"doc ${r.getLong(0)}")
    }
  }

  test("quality scores are in [0,1] and ratios are consistent") {
    TextAnalysis.qualityScore(spark, sf).collect().foreach { r =>
      val q = r.getAs[Double]("quality")
      val stop = r.getAs[Double]("stopword_ratio")
      assert(q >= 0.0 && q <= 1.0)
      assert(stop >= 0.0 && stop <= 1.0)
    }
  }

  test("language ID classifies every document with a known label") {
    val out = TextAnalysis.languageId(spark, sf).collect()
    assert(out.length == Tables(spark, sf, "documents").count())
    val valid = Set("en", "de", "fr", "es", "zh", "und")
    out.foreach(r => assert(valid.contains(r.getString(1))))
  }

  test("fingerprint md5 matches a local MessageDigest on normalized text") {
    val texts = Tables(spark, sf, "documents").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def localMd5(t: String): String =
      MessageDigest.getInstance("MD5")
        .digest(t.trim.toLowerCase.replaceAll("\\s+", " ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    TextAnalysis.fingerprint(spark, sf).collect().take(50).foreach { r =>
      assert(r.getString(1) == localMd5(texts(r.getLong(0))), s"doc ${r.getLong(0)}")
    }
  }
}
