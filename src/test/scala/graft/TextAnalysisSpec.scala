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

  test("BPE-ish token counts match a local Java-regex scan and bound ws tokens") {
    val texts = Tables(spark, sf, "documents").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pat = java.util.regex.Pattern.compile(TextAnalysis.BpePattern)
    TextAnalysis.bpeTokenCounts(spark, sf).collect().foreach { r =>
      val m = pat.matcher(texts(r.getLong(0)))
      var n = 0
      while (m.find()) n += 1
      assert(r.getLong(1) == n, s"doc ${r.getLong(0)}")
      // BPE pre-tokens split at least as fine as whitespace tokens
      assert(r.getLong(1) >= r.getLong(2), s"doc ${r.getLong(0)}")
    }
  }

  test("winnowing fingerprints: deterministic, and identical docs share identical sets") {
    val fps = TextAnalysis.winnowFingerprints(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(fps.nonEmpty && fps.values.forall(_.nonEmpty))
    // determinism (rolling hash + fixed windows — no run-to-run variance)
    val again = TextAnalysis.winnowFingerprints(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(fps == again)
    // winnowing laws on constructed docs (k=5, w=4):
    //  - identical text => identical fingerprint set;
    //  - any shared substring of length >= w+k-1 (=8) => shared fingerprint
    //    (the MOSS match guarantee);
    //  - disjoint alphabets => disjoint sets
    import spark.implicits._
    val common = "the quick brown fox jumps over the lazy dog"
    val docsDf = Seq(
      (1L, common), (2L, common),
      (3L, s"prefix words here $common and a suffix tail"),
      (4L, "zzzzxxxxqqqqwwwwzzzzxxxx")).toDF("doc_id", "text")
    val law = graft.operators.TextAnalysis.winnowFingerprintsOf(spark, docsDf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(law(1L) == law(2L), "identical docs must fingerprint identically")
    assert(law(1L).intersect(law(3L)).nonEmpty, "long shared substring must share a fingerprint")
    assert(law(1L).intersect(law(4L)).isEmpty, "disjoint alphabets must not collide")
  }

  test("count-min sketch estimates are one-sided within the eps bound") {
    val rows = TextAnalysis.tokenFreqCms(spark, sf, topN = 50, eps = 0.001).collect()
    assert(rows.nonEmpty)
    val totalTokens = TextAnalysis.tokenCounts(spark, sf).collect().map(_.getLong(1)).sum
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"CMS undercounted ${r.getString(0)}: $est < $exact")
      assert(est <= exact + math.max(1, (0.002 * totalTokens).toLong),
        s"CMS overcount on ${r.getString(0)}: $est vs $exact (total $totalTokens)")
    }
  }

  test("portable-hash CMS equals a local sketch recomputation exactly and is one-sided") {
    import graft.functions.PolyHash
    import graft.functions.MinHashSigAggregator.{PermA, PermB, PermC}
    val (depth, width) = (4, 2048)
    val exact = TextAnalysis.vocab(spark, sf, topN = 10000).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // local CMS with the same hash family: counters then min-over-depth
    val counters = scala.collection.mutable.Map.empty[(Int, Long), Long]
    exact.foreach { case (tok, n) =>
      val h = PolyHash.packed60(tok)
      val (hA, hB) = (h >>> 30, h & 1073741823L)
      (0 until depth).foreach { d =>
        val bkt = ((PermA(d) * hA + PermB(d) * hB + PermC(d)) % PolyHash.Mod) % width
        counters((d, bkt)) = counters.getOrElse((d, bkt), 0L) + n
      }
    }
    def localEst(tok: String): Long = {
      val h = PolyHash.packed60(tok)
      val (hA, hB) = (h >>> 30, h & 1073741823L)
      (0 until depth).map { d =>
        counters((d, ((PermA(d) * hA + PermB(d) * hB + PermC(d)) % PolyHash.Mod) % width))
      }.min
    }
    val rows = TextAnalysis.tokenFreqCmsPoly(spark, sf, topN = 100).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tok, tf, est) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(tf == exact(tok))
      assert(est == localEst(tok), s"sketch mismatch on $tok: $est != ${localEst(tok)}")
      assert(est >= tf, s"CMS undercounted $tok: $est < $tf (impossible by construction)")
    }
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

  test("PII scrub removes every email/ip/phone occurrence it counted") {
    val rows = TextAnalysis.piiScrub(spark, sf).collect()
    assert(rows.length == Tables(spark, sf, "documents").count())
    rows.foreach { r =>
      // the deterministic augmentation plants at least one of each kind
      assert(r.getAs[Long]("n_emails") >= 1 && r.getAs[Long]("n_ips") >= 1 &&
             r.getAs[Long]("n_phones") >= 1, s"doc ${r.getLong(0)} missing planted PII")
    }
    // re-scan the scrubbed text for residual PII: scrub the augmented text
    // locally with the same patterns and check nothing matches afterwards
    val texts = Tables(spark, sf, "documents").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.take(50).foreach { r =>
      val id = r.getLong(0)
      val aug = texts(id) + " contact user" + id + "@mail.example.com" +
        " from 10." + (id % 200) + ".0." + (id % 250) +
        " call 555-" + "%04d".format(id % 10000)
      val scrubbed = aug.replaceAll(TextAnalysis.EmailRe, "<EMAIL>")
        .replaceAll(TextAnalysis.Ipv4Re, "<IP>")
        .replaceAll(TextAnalysis.PhoneRe, "<PHONE>")
      assert(!TextAnalysis.EmailRe.r.findFirstIn(scrubbed).isDefined)
      assert(!TextAnalysis.PhoneRe.r.findFirstIn(scrubbed).isDefined)
      assert(r.getAs[Long]("scrub_len") == scrubbed.length.toLong, s"doc $id scrub diverges")
    }
  }

  test("sequence packing: offsets stay under budget and packs fill contiguously per shard") {
    val budget = 512L
    val rows = TextAnalysis.seqPack(spark, sf).collect()
      .map(r => (r.getAs[Long]("shard"), r.getLong(0), r.getAs[Long]("n_tok"),
                 r.getAs[Long]("pack_id"), r.getAs[Long]("pack_offset")))
    assert(rows.length == Tables(spark, sf, "documents").count())
    rows.groupBy(_._1).foreach { case (shard, docs) =>
      var cum = 0L
      docs.sortBy(_._2).foreach { case (_, id, nTok, packId, offset) =>
        assert(offset >= 0 && offset < budget, s"doc $id offset $offset out of range")
        assert(packId == cum / budget, s"doc $id in shard $shard: pack $packId != ${cum / budget}")
        assert(offset == cum % budget, s"doc $id offset mismatch")
        cum += nTok
      }
    }
  }

  test("token-length histogram partitions the corpus and respects the top bucket") {
    val rows = TextAnalysis.tokenLengthHistogram(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == Tables(spark, sf, "documents").count())
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0 && b <= 31)
      assert(r.getAs[Long]("total_tokens") >= r.getAs[Long]("n_docs") * (b * 16).max(1))
    }
  }

  test("duplicate-n-gram stats match a local recomputation") {
    val texts = Tables(spark, sf, "documents").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def gramStats(t: String): (Long, Long, Long) = {
      val w = t.split(" ", -1)
      def counts(n: Int) = (0 to w.length - n)
        .map(i => w.slice(i, i + n).mkString(" "))
        .groupBy(identity).toSeq.map { case (g, gs) => (g.length.toLong, gs.size.toLong) }
      val c2 = counts(2); val c3 = counts(3)
      (c2.collect { case (len, cnt) if cnt >= 2 => cnt * len }.sum,
       c3.collect { case (len, cnt) if cnt >= 2 => cnt * len }.sum,
       if (c2.isEmpty) 0L else c2.map { case (len, cnt) => cnt * len }.max)
    }
    val rows = TextAnalysis.dupNgramStats(spark, sf).collect()
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val (d2, d3, t2) = gramStats(texts(r.getLong(0)))
      assert(r.getAs[Long]("dup2_chars") == d2, s"doc ${r.getLong(0)} dup2")
      assert(r.getAs[Long]("dup3_chars") == d3, s"doc ${r.getLong(0)} dup3")
      assert(r.getAs[Long]("top2_chars") == t2, s"doc ${r.getLong(0)} top2")
      assert(r.getAs[Long]("total_chars") == texts(r.getLong(0)).length.toLong)
    }
  }

  test("length outliers match the exact integer two-sigma law") {
    val rows = Tables(spark, sf, "documents").select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySource = rows.groupBy(_._2)
    val got = TextAnalysis.lengthOutliers(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("is_outlier")).toMap
    assert(got.size == rows.length)
    rows.foreach { case (id, src, x) =>
      val xs = bySource(src).map(_._3)
      val (n, s, q) = (BigInt(xs.length), BigInt(xs.sum), xs.map(v => BigInt(v) * v).sum)
      val dev = n * x - s
      assert(got(id) == (dev * dev > 4 * (n * q - s * s)), s"doc $id outlier flag")
    }
  }

  test("gopher quality gates match a local recomputation") {
    val texts = Tables(spark, sf, "documents").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = TextAnalysis.gopherGates(spark, sf).collect()
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val id = r.getLong(0)
      val t = texts(id)
      val words = """[^ \t\n\r\f\x0B]+""".r.findAllIn(t).toSeq
      val nWords = words.length.toLong
      val wordChars = words.map(w => w.codePointCount(0, w.length).toLong).sum
      val nSymbols = t.count(_ == '#').toLong + """\.\.\.""".r.findAllIn(t).length
      val lines = t.split("\n", -1).toSeq
      val bulletLines = lines.count(l => l.nonEmpty && "-*•".contains(l.head)).toLong
      val ellipsisLines = lines.count(l => l.endsWith("...") || l.endsWith("…")).toLong
      val alphaWords = words.count(_.exists(Character.isLetter)).toLong
      val stopHits = TextAnalysis.GopherStopwords.count(words.toSet).toLong
      assert(r.getAs[Long]("n_words") == nWords, s"doc $id n_words")
      assert(r.getAs[Long]("word_chars") == wordChars, s"doc $id word_chars")
      assert(r.getAs[Long]("n_symbols") == nSymbols, s"doc $id n_symbols")
      assert(r.getAs[Long]("n_lines") == lines.length.toLong, s"doc $id n_lines")
      assert(r.getAs[Long]("bullet_lines") == bulletLines, s"doc $id bullet")
      assert(r.getAs[Long]("ellipsis_lines") == ellipsisLines, s"doc $id ellipsis")
      assert(r.getAs[Long]("alpha_words") == alphaWords, s"doc $id alpha")
      assert(r.getAs[Long]("stop_hits") == stopHits, s"doc $id stop_hits")
      assert(r.getAs[Boolean]("gate_word_count") == (nWords >= 50 && nWords <= 100000L))
      assert(r.getAs[Boolean]("gate_word_len") ==
        (3 * nWords <= wordChars && wordChars <= 10 * nWords))
      assert(r.getAs[Boolean]("gate_symbol") == (10 * nSymbols <= nWords))
      assert(r.getAs[Boolean]("gate_bullet") == (10 * bulletLines <= 9 * lines.length))
      assert(r.getAs[Boolean]("gate_ellipsis") == (10 * ellipsisLines <= 3 * lines.length))
      assert(r.getAs[Boolean]("gate_alpha") == (5 * alphaWords >= 4 * nWords))
      assert(r.getAs[Boolean]("gate_stop") == (stopHits >= 2))
      val all = nWords >= 50 && nWords <= 100000L &&
        3 * nWords <= wordChars && wordChars <= 10 * nWords &&
        10 * nSymbols <= nWords && 10 * bulletLines <= 9 * lines.length &&
        10 * ellipsisLines <= 3 * lines.length && 5 * alphaWords >= 4 * nWords &&
        stopHits >= 2
      assert(r.getAs[Boolean]("passes_all") == all, s"doc $id passes_all")
    }
    // the synthetic vocabulary carries almost none of Gopher's 8 function
    // words, so `passes_all = 0` is the CORRECT verdict here (the stop-word
    // gate is doing its job on non-natural text); assert the battery
    // DISCRIMINATES on a dimension the corpus does vary — word count
    // straddles the ≥50 bound
    assert(rows.map(_.getAs[Boolean]("gate_word_count")).toSet == Set(true, false),
      "word-count gate should discriminate on this corpus")
    assert(rows.forall(!_.getAs[Boolean]("gate_stop")),
      "synthetic text should fail the ≥2-distinct-stop-words gate")
  }

  test("tf-idf top terms: k per doc, non-negative scores, rank ordered") {
    val byDoc = TextAnalysis.tfidfTopTerms(spark, sf).collect()
      .groupBy(_.getLong(0))
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (id, rs) =>
      assert(rs.length <= 5, s"doc $id has ${rs.length} terms")
      val ordered = rs.sortBy(_.getAs[Long]("rnk"))
      assert(ordered.map(_.getAs[Long]("rnk")).toSeq == (1L to rs.length).toSeq)
      ordered.foreach(r => assert(r.getAs[Long]("tfidf_e4") >= 0L, s"doc $id negative tfidf"))
      // scores are non-increasing down the ranks
      ordered.map(_.getAs[Long]("tfidf_e4")).toSeq.sliding(2).foreach { pair =>
        if (pair.length == 2) assert(pair(0) >= pair(1))
      }
    }
  }
}
