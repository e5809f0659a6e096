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

  test("hash-stratified twin obeys the same binomial bound and a local predicate recomputation") {
    val fr = Sampling.StratifiedFractions
    val all = Tables(spark, sf, "documents").select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val got = Sampling.stratifiedHashSample(spark, sf, fr).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // exact membership law: hashOrder(doc_id) < floor(f_lang * IdMod)
    val expect = all.filter { case (id, lang) =>
      val ho = (java.lang.Math.floorMod(id, Sampling.IdMod) * Sampling.Mix) % Sampling.IdMod
      ho < math.floor(fr.getOrElse(lang, 0.0) * Sampling.IdMod).toLong
    }.toSet
    assert(got == expect, s"hash-threshold membership mismatch: " +
      s"${(got -- expect).size} extra, ${(expect -- got).size} missing")
    // same statistical law as the RNG tier: per-stratum rate within 4 sigma
    val byLang = all.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val sampled = got.toSeq.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    fr.foreach { case (lang, p) =>
      val n = byLang.getOrElse(lang, 0L)
      if (n > 0) {
        val g = sampled.getOrElse(lang, 0L).toDouble
        val sd = math.sqrt(n * p * (1 - p))
        assert(math.abs(g - n * p) <= 4 * sd + 1,
          s"$lang: sampled $g of $n at p=$p (expected ~${n * p} ± ${4 * sd})")
      }
    }
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

  test("token-budget mixture fills each source's quota and stops at the boundary doc") {
    val budget = 800L
    val got = Sampling.tokenBudgetSample(spark, sf, budget).collect()
    val sources = Tables(spark, sf, "documents").select("source").distinct()
      .collect().map(_.getString(0)).toSet
    val bySource = got.groupBy(_.getString(1))
    // every non-empty source contributes, and every kept doc started
    // strictly inside the budget
    assert(bySource.keySet == sources)
    got.foreach(r => assert(r.getAs[Long]("tok_before") < budget))
    bySource.foreach { case (src, rows) =>
      // the kept rows are a PREFIX in token order: sorted by tok_before,
      // each row's offset is the previous row's offset + its token count
      val ordered = rows.sortBy(_.getAs[Long]("tok_before"))
      ordered.foldLeft(0L) { (expected, r) =>
        assert(r.getAs[Long]("tok_before") == expected, s"gap in $src prefix")
        expected + r.getAs[Long]("n_tok")
      }
    }
    // sources with at least `budget` corpus tokens must FILL their quota
    // (the boundary doc ships, so kept tokens reach the budget); smaller
    // sources ship entirely
    import org.apache.spark.sql.functions.{col, size, split, sum}
    val corpusTokens = Tables(spark, sf, "documents")
      .groupBy("source")
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("tot"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("tot")).toMap
    bySource.foreach { case (src, rows) =>
      val kept = rows.map(_.getAs[Long]("n_tok")).sum
      if (corpusTokens(src) >= budget) assert(kept >= budget, s"$src under-filled: $kept")
      else assert(kept == corpusTokens(src), s"$src should ship entirely")
    }
    // reproducibility
    val again = Sampling.tokenBudgetSample(spark, sf, budget).collect()
    assert(got.map(_.getLong(0)).sorted.toSeq == again.map(_.getLong(0)).sorted.toSeq)
  }

  test("temperature mix allocates sqrt-weighted budgets with the prefix law") {
    import org.apache.spark.sql.functions.{col, size, split}
    val B = 5000L
    val got = Sampling.temperatureMixSample(spark, sf, B).collect()
    assert(got.nonEmpty)
    // local recomputation of the stratum budgets: w = floor(sqrt(tokens)),
    // budget = B*w div Σw — the α=0.5 temperature reweighting
    val strata = Tables(spark, sf, "documents")
      .select(col("lang"), col("source"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getAs[Long]("n_tok")))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val w = strata.view.mapValues(tok => math.floor(math.sqrt(tok.toDouble)).toLong).toMap
    val totalW = w.values.sum
    val budgets = w.view.mapValues(v => B * v / totalW).toMap
    got.foreach { r =>
      val k = (r.getString(1), r.getString(2))
      assert(r.getAs[Long]("budget") == budgets(k), s"stratum $k budget")
      assert(r.getAs[Long]("tok_before") < budgets(k), s"stratum $k over budget")
    }
    // per-stratum prefix law: kept rows form a contiguous token prefix
    got.groupBy(r => (r.getString(1), r.getString(2))).foreach { case (k, rows) =>
      rows.sortBy(_.getAs[Long]("tok_before")).foldLeft(0L) { (expected, r) =>
        assert(r.getAs[Long]("tok_before") == expected, s"gap in $k prefix")
        expected + r.getAs[Long]("n_tok")
      }
    }
    // flattening property: with a ≥4× mass gap, the smaller stratum's
    // budget-per-raw-token exceeds the larger's (sqrt upsamples the tail;
    // the 4× guard keeps integer-floor noise out of the inequality)
    val ms = strata.toSeq.sortBy(_._2)
    val (kMin, mMin) = ms.head
    val (kMax, mMax) = ms.last
    if (mMax >= 4 * mMin && mMin >= 16) {
      assert(BigInt(budgets(kMin) + 1) * mMax >= BigInt(budgets(kMax)) * mMin,
        s"temperature did not flatten: $kMin ($mMin tok) vs $kMax ($mMax tok)")
    }
    // reproducibility
    val again = Sampling.temperatureMixSample(spark, sf, B).collect()
    assert(got.map(_.getLong(0)).sorted.toSeq == again.map(_.getLong(0)).sorted.toSeq)
  }

  test("shard layout: a deterministic permutation into balanced shards") {
    val nShards = 4
    val rows = Sampling.shardLayout(spark, sf, nShards).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = Tables(spark, sf, "documents").count()
    // a permutation: every doc exactly once, (shard, pos) unique, and
    // each shard's positions are exactly 1..|shard|
    assert(rows.length.toLong == total)
    assert(rows.map(_._1).distinct.length == rows.length, "doc appears twice")
    assert(rows.map(r => (r._2, r._3)).distinct.length == rows.length,
      "(shard, pos) collision")
    rows.groupBy(_._2).foreach { case (sid, g) =>
      assert(g.map(_._3).sorted.toSeq == (1L to g.length).toSeq,
        s"shard $sid positions not contiguous from 1")
    }
    // shard id is the locally recomputable hash law (the membership
    // authority shared with every sampler)
    rows.foreach { case (id, sid, _, _) =>
      val ho = (java.lang.Math.floorMod(id, Sampling.IdMod) * Sampling.Mix) % Sampling.IdMod
      assert(sid == ho % nShards, s"doc $id shard law mismatch")
    }
    // it is a SHUFFLE: the concatenated (shard, pos) order must not be
    // the corpus's own id order (curriculum leakage is the failure mode)
    val concatOrder = rows.sortBy(r => (r._2, r._3)).map(_._1).toSeq
    assert(concatOrder != concatOrder.sorted, "layout preserved corpus order")
    // balance: loose binomial band per shard
    val mean = total.toDouble / nShards
    val sd = math.sqrt(total * (1.0 / nShards) * (1 - 1.0 / nShards))
    rows.groupBy(_._2).foreach { case (sid, g) =>
      assert(math.abs(g.length - mean) <= 4 * sd + 1,
        s"shard $sid size ${g.length} far from $mean")
    }
    // deterministic: re-run identical
    val again = Sampling.shardLayout(spark, sf, nShards).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("leakage-safe split from the persisted index equals the recompute path") {
    import org.apache.spark.sql.functions.col
    // the 100 TB shape: stored cluster labels enter as star edges and the
    // split must be IDENTICAL to the pair-recompute path, tuple for tuple
    val Dedup = graft.operators.Dedup
    val idx = java.nio.file.Files.createTempDirectory("leakidx-").toString
    Dedup.buildMinhashIndex(spark, Tables(spark, sf, "documents"), idx, s"$sf#leakspec")
    Dedup.buildClusterState(spark, idx)
    Dedup.buildExactState(spark,
      Tables(spark, sf, "documents").select(col("doc_id"), col("text")), idx)
    def rowsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(rowsOf(Sampling.leakageSafeSplitFromIndex(spark, sf, idx)) ==
           rowsOf(Sampling.leakageSafeSplit(spark, sf)),
      "index-backed split diverged from the recompute split")
  }

  test("leakage-safe split: partitions the corpus and no dup pair straddles the split") {
    import org.apache.spark.sql.functions.{col, md5}
    val D = graft.operators.Dedup
    val split = Sampling.leakageSafeSplit(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // a partition: every document appears exactly once, labels total
    val total = Tables(spark, sf, "documents").count()
    assert(split.size.toLong == total, "split must cover every doc exactly once")
    assert(split.values.forall(v => v._2 == "train" || v._2 == "holdout"))
    // THE guarantee: both endpoints of every generator edge share a split
    val near = D.minhashLshPairs(spark, sf)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val docs = Tables(spark, sf, "documents")
    val exact = docs.select(col("doc_id"), md5(col("text")).as("h")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val exactPairs = exact.groupBy(_._2).values.filter(_.length > 1)
      .flatMap { g => val keep = g.map(_._1).min
                      g.map(_._1).filter(_ != keep).map((_, keep)) }
    for ((a, b) <- near ++ exactPairs) {
      assert(split(a)._2 == split(b)._2,
        s"dup pair ($a, $b) straddles the split: ${split(a)._2} vs ${split(b)._2}")
      assert(split(a)._1 == split(b)._1, s"dup pair ($a, $b) in different clusters")
    }
    // within-cluster consistency comes from hashing the LABEL, not the doc
    split.values.groupBy(_._1).foreach { case (cid, members) =>
      assert(members.map(_._2).toSet.size == 1, s"cluster $cid spans both splits")
    }
    // non-degenerate on this corpus at 20%: both labels appear, and the
    // holdout CLUSTER rate obeys a loose binomial band over clusters
    val clusters = split.values.groupBy(_._1).view.mapValues(_.head._2).toMap
    val nHold = clusters.values.count(_ == "holdout")
    val n = clusters.size
    val (mean, sd) = (n * 0.2, math.sqrt(n * 0.2 * 0.8))
    assert(math.abs(nHold - mean) <= 5 * sd + 1,
      s"holdout clusters $nHold/$n far from 20%")
    // membership law is locally recomputable: hashPct on the cluster label
    split.foreach { case (_, (cid, sp)) =>
      val hold = (java.lang.Math.floorMod(cid, Sampling.IdMod) * Sampling.Mix) % 100 < 20
      assert((sp == "holdout") == hold, s"cluster $cid split disagrees with hashPct")
    }
  }
}
