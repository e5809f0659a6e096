package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite with SparkTestBase {

  test("systematic sample selects a stable ~pct slice, identically across runs") {
    val a = Sampling.systematicSample(spark, sf, pct = 10).collect().map(_.getLong(0)).sorted
    val b = Sampling.systematicSample(spark, sf, pct = 10).collect().map(_.getLong(0)).sorted
    assert(a.toSeq == b.toSeq, "systematic sampling must be bit-stable")
    val total = Tables(spark, sf, "documents").count()
    // arithmetic-mod sampling over sequential ids: within a loose band of 10%
    assert(a.length >= total * 0.04 && a.length <= total * 0.2,
      s"sample ${a.length}/$total far from 10%")
    // pct=100 keeps everything; pct=0 keeps nothing
    assert(Sampling.systematicSample(spark, sf, pct = 100).count() == total)
    assert(Sampling.systematicSample(spark, sf, pct = 0).count() == 0)
  }

  test("stratified sample respects per-language fractions within binomial bounds") {
    val fr = Map("en" -> 0.5, "de" -> 1.0, "fr" -> 1.0, "es" -> 0.25, "zh" -> 1.0)
    val byLang = Tables(spark, sf, "documents").groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Sampling.stratifiedSample(spark, sf, fr, seed = 42L).collect()
      .groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    fr.foreach { case (lang, p) =>
      val n = byLang.getOrElse(lang, 0L)
      if (n > 0) {
        val got = sampled.getOrElse(lang, 0L).toDouble
        val mean = n * p
        val sd = math.sqrt(n * p * (1 - p))
        assert(math.abs(got - mean) <= 4 * sd + 1,
          s"$lang: sampled $got of $n at p=$p (expected ~$mean ± ${4 * sd})")
      }
    }
    // seeded: reproducible
    val again = Sampling.stratifiedSample(spark, sf, fr, seed = 42L).collect()
      .map(_.getLong(0)).sorted.toSeq
    val first = Sampling.stratifiedSample(spark, sf, fr, seed = 42L).collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(again == first)
  }

  test("exact-K sample returns exactly K reproducible rows") {
    val a = Sampling.exactKSample(spark, sf, k = 100).collect().map(_.getLong(0)).toSeq
    assert(a.length == 100)
    assert(a.distinct.length == 100)
    val b = Sampling.exactKSample(spark, sf, k = 100).collect().map(_.getLong(0)).toSeq
    assert(a.sorted == b.sorted, "hash-ordered sample must be reproducible")
    // growing K extends the same prefix order (monotone sample family)
    val bigger = Sampling.exactKSample(spark, sf, k = 150).collect().map(_.getLong(0)).toSet
    assert(a.toSet.subsetOf(bigger))
  }

  test("domain cap keeps at most `cap` docs per source and fills small sources fully") {
    val cap = 50
    val bySource = Tables(spark, sf, "documents").groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Sampling.domainCapSample(spark, sf, cap).collect()
      .groupBy(_.getString(2)).view.mapValues(_.length.toLong).toMap
    bySource.foreach { case (src, n) =>
      assert(sampled.getOrElse(src, 0L) == math.min(n, cap.toLong),
        s"source $src: got ${sampled.getOrElse(src, 0L)} of $n at cap $cap")
    }
  }
}
