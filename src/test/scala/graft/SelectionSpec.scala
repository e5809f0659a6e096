package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Sampling, Selection, TextAnalysis}

/** Laws for the data-selection family (DSIR importance resampling, the
  * stupid-backoff LM scorer) and the chunking operator. The DuckDB hash
  * gates carry cross-engine portability; these specs carry what the gate
  * can't see: an independent driver-side recomputation of the DSIR
  * arithmetic, the separation property that makes each score USEFUL
  * (target-language documents must outscore the rest — otherwise the
  * selector selects noise), the resample's membership/key laws, the
  * backoff tier semantics, and chunking's exact coverage/reconstruction. */
class SelectionSpec extends AnyFunSuite with SparkTestBase {

  private def docRows =
    Tables(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  // -------------------------------------------------------------------
  // DSIR
  // -------------------------------------------------------------------

  /** Driver-side replica of the whole DSIR pipeline (features, bucket
    * counts, smoothing, micro quantization, per-doc sums) — written
    * against the PAPER's definition, not the operator's code path. */
  private lazy val dsirExpected: Map[Long, (Long, Long)] = {
    val rows = docRows
    def feats(text: String): Seq[Long] = {
      val w = text.split(" ", -1)
      (w.map(Selection.dsirBucket) ++
        (0 until w.length - 1).map(i => Selection.dsirBucket(w(i) + " " + w(i + 1)))).toSeq
    }
    val all = rows.flatMap { case (_, lang, t) => feats(t).map(b => (b, lang == "en")) }
    val cr = all.groupBy(_._1).map { case (b, xs) => b -> xs.length.toLong }
    val ct = all.filter(_._2).groupBy(_._1).map { case (b, xs) => b -> xs.length.toLong }
    val rTot = all.length.toLong
    val tTot = all.count(_._2).toLong
    val B = Selection.DsirDim
    def lr(b: Long): Long =
      math.floor((math.log(ct.getOrElse(b, 0L) + 1L) - math.log(tTot + B)
        - math.log(cr(b) + 1L) + math.log(rTot + B)) * 1e6 + 0.5).toLong
    rows.map { case (id, _, t) =>
      val f = feats(t)
      id -> ((f.length.toLong, f.map(lr).sum))
    }.toMap
  }

  test("DSIR scores match an independent driver-side recomputation") {
    val got = Selection.dsirScores(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.nonEmpty && got.size == dsirExpected.size)
    dsirExpected.foreach { case (id, exp) => assert(got(id) == exp, s"doc $id") }
  }

  test("DSIR separates the target distribution: mean en score > mean non-en") {
    val byLang = docRows.map(_._1).zip(docRows.map(_._2)).toMap
    def meanPerFeat(ids: Iterable[Long]): Double = {
      val xs = ids.map(dsirExpected); xs.map(_._2).sum.toDouble / xs.map(_._1).sum
    }
    val (en, rest) = dsirExpected.keys.partition(id => byLang(id) == "en")
    assert(en.nonEmpty && rest.nonEmpty)
    assert(meanPerFeat(en) > meanPerFeat(rest),
      "target-language docs must carry higher importance weight")
  }

  test("Gumbel resample: k rows, keys = score + hash-Gumbel, max-key winners") {
    val k = 20
    val got = Selection.dsirGumbelTopK(spark, sf, k).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(got.length == k)
    def keyOf(id: Long, micro: Long): Long = {
      val h = ((id % Sampling.IdMod) * Sampling.Mix) % Sampling.IdMod
      val u = (h + 1L).toDouble / (Sampling.IdMod + 1L).toDouble
      micro + math.floor(-math.log(-math.log(u)) * 1e6 + 0.5).toLong
    }
    got.foreach { case (id, micro, key) =>
      assert(micro == dsirExpected(id)._2)
      assert(key == keyOf(id, micro), s"doc $id key")
    }
    // the selected set IS the top-k of the full keyed population
    val allKeys = dsirExpected.map { case (id, (_, m)) => (keyOf(id, m), id) }
    val expectIds = allKeys.toSeq.sortBy { case (key, id) => (-key, id) }
      .take(k).map(_._2).toSet
    assert(got.map(_._1).toSet == expectIds)
  }

  // -------------------------------------------------------------------
  // Stupid-backoff LM
  // -------------------------------------------------------------------

  private lazy val sbRows =
    Selection.sbackoffScores(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  test("stupid backoff: totality, n_trans = n_tok - 1, tier counts consistent") {
    val rows = docRows
    assert(sbRows.size == rows.length)
    rows.foreach { case (id, _, t) =>
      val (nTrans, nBg, nOov, _) = sbRows(id)
      assert(nTrans == t.split(" ", -1).length - 1, s"doc $id n_trans")
      assert(nBg >= 0 && nOov >= 0 && nBg + nOov <= nTrans, s"doc $id tiers")
    }
  }

  test("stupid backoff: reference-slice docs hit the bigram tier everywhere") {
    // the model is trained ON the en slice, so every en transition is a
    // seen bigram: n_bg_hit == n_trans and n_oov == 0 — the law that
    // pins the join keys (a key bug would silently shunt to backoff)
    docRows.filter(_._2 == "en").foreach { case (id, _, _) =>
      val (nTrans, nBg, nOov, _) = sbRows(id)
      assert(nBg == nTrans && nOov == 0, s"en doc $id must be fully in-model")
    }
  }

  test("stupid backoff separates languages: en per-transition score is highest") {
    val byLang = docRows.groupBy(_._2).map { case (l, xs) =>
      val ids = xs.map(_._1)
      val s = ids.map(sbRows(_)._4).sum.toDouble
      val n = ids.map(sbRows(_)._1).sum.toDouble
      l -> s / n
    }
    val en = byLang("en")
    byLang.filter(_._1 != "en").foreach { case (l, m) =>
      assert(en > m, s"en mean $en must exceed $l mean $m")
    }
  }

  test("stupid backoff matches an independent driver-side recomputation") {
    // replica written against Brants' definition: en-slice counts, three
    // tiers, micro quantization at model grain, BIGINT doc sums
    val rows = docRows
    val enToks = rows.filter(_._2 == "en").flatMap(_._3.split(" ", -1))
    val c1 = enToks.groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val nTot = enToks.length.toLong
    val c2 = rows.filter(_._2 == "en")
      .flatMap { case (_, _, t) => val w = t.split(" ", -1); w.init.zip(w.tail) }
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    def micro(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    rows.foreach { case (id, _, t) =>
      val w = t.split(" ", -1)
      val trans = w.init.zip(w.tail)
      var sb = 0L; var bg = 0L; var oov = 0L
      trans.foreach { case (w1, w2) =>
        if (c2.contains((w1, w2))) {
          sb += micro(math.log(c2((w1, w2))) - math.log(c1(w1))); bg += 1
        } else if (c1.contains(w2)) {
          sb += micro(math.log(0.4) + math.log(c1(w2)) - math.log(nTot))
        } else {
          sb += micro(math.log(0.4) + math.log(0.4) - math.log(nTot)); oov += 1
        }
      }
      assert(sbRows(id) == ((trans.length.toLong, bg, oov, sb)), s"doc $id")
    }
  }

  test("Brants count cutoff: minCount=1 is bit-identical to today's model; " +
       "pruned bigrams score through the unigram backoff tier exactly") {
    val d = Tables(spark, sf, "documents")
    val mdDefault = freshModelDir("mcdef")
    val md1 = freshModelDir("mc1")
    val md2 = freshModelDir("mc2")
    Selection.buildSelectionModel(spark, d, mdDefault)
    Selection.buildSelectionModel(spark, d, md1, minCount = 1L)
    Selection.buildSelectionModel(spark, d, md2, minCount = 2L)
    def bg(md: String) = spark.read.parquet(s"$md/lm_bigram.parquet").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val bg1 = bg(md1)
    val bg2 = bg(md2)
    assert(bg(mdDefault) == bg2,
      "the DEFAULT stored model must be the PRUNED one (round-16: " +
      "StoredModelMinCount=2 is the deployment default)")
    assert(spark.read.parquet(s"$mdDefault/meta.parquet").head()
      .getLong(6) == Selection.StoredModelMinCount,
      "the cutoff must ride the model meta handshake")
    // driver-side truth: en-slice bigram counts
    val c2 = docRows.filter(_._2 == "en")
      .flatMap { case (_, _, t) => val w = t.split(" ", -1); w.init.zip(w.tail) }
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val kept = c2.filter(_._2 >= 2L).keySet
    assert(kept.nonEmpty && kept.size < c2.size,
      "fixture must exercise the cutoff in both directions")
    assert(bg2.keySet == kept, "pruned table must be exactly the ≥minCount bigrams")
    bg2.foreach { case (p, v) => assert(v == bg1(p), s"surviving bigram $p rescored") }
    def ug(md: String) = spark.read.parquet(s"$md/lm_unigram.parquet").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ug(md2) == ug(md1), "the unigram backoff floor must never be pruned")
    // scoring under the pruned model: a pruned transition falls to the
    // unigram tier — exact three-tier recompute with the cutoff applied
    val got = Selection.scoreWithStoredModel(spark,
        d.select(col("doc_id"), col("text")), md2).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))).toMap
    val enToks = docRows.filter(_._2 == "en").flatMap(_._3.split(" ", -1))
    val c1 = enToks.groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val nTot = enToks.length.toLong
    def micro(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    docRows.foreach { case (id, _, t) =>
      val w = t.split(" ", -1)
      val trans = w.init.zip(w.tail)
      var sb = 0L; var bgc = 0L; var oov = 0L
      trans.foreach { case (w1, w2) =>
        if (c2.getOrElse((w1, w2), 0L) >= 2L) {
          sb += micro(math.log(c2((w1, w2))) - math.log(c1(w1))); bgc += 1
        } else if (c1.contains(w2)) {
          sb += micro(math.log(0.4) + math.log(c1(w2)) - math.log(nTot))
        } else {
          sb += micro(math.log(0.4) + math.log(0.4) - math.log(nTot)); oov += 1
        }
      }
      assert(got(id) == ((trans.length.toLong, bgc, oov, sb)),
        s"doc $id under minCount=2")
    }
  }

  // -------------------------------------------------------------------
  // Chunking
  // -------------------------------------------------------------------

  test("chunking: starts arithmetic, widths exact, overlap reconstructs the doc") {
    val width = 16; val stride = 12
    val chunks = TextAnalysis.chunkWindows(spark, sf, width, stride).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
      .groupBy(_._1)
    docRows.foreach { case (id, _, t) =>
      val toks = t.split(" ", -1)
      val n = toks.length
      val cs = chunks(id).sortBy(_._2)
      assert(cs.length == (n - 1) / stride + 1, s"doc $id chunk count")
      cs.foreach { case (_, idx, start, text, nTok) =>
        assert(start == 1 + idx * stride, s"doc $id chunk $idx start")
        val expToks = toks.slice(start.toInt - 1, math.min(start.toInt - 1 + width, n))
        assert(nTok == expToks.length, s"doc $id chunk $idx n_tok")
        assert(text == expToks.mkString(" "), s"doc $id chunk $idx text")
      }
      // stride-prefix reconstruction: the first `stride` tokens of each
      // chunk plus the final chunk's tail re-assemble the document
      val rebuilt = cs.init.flatMap(c => c._4.split(" ", -1).take(stride)) ++
        cs.last._4.split(" ", -1)
      assert(rebuilt.sameElements(toks), s"doc $id reconstruction")
    }
  }

  // -------------------------------------------------------------------
  // Persisted model + frozen-model scoring + stream leg
  // -------------------------------------------------------------------

  private def freshModelDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-selspec-$tag-").toString

  test("stored-model scoring ≡ the in-memory self-model scorers, column for column") {
    val md = freshModelDir("roundtrip")
    val d = Tables(spark, sf, "documents")
    Selection.buildSelectionModel(spark, d, md)
    val stored = Selection.scoreWithStoredModel(spark,
        d.select(col("doc_id"), col("text")), md).collect()
      .map(r => r.getLong(0) -> r).toMap
    val dsir = Selection.dsirScores(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // the default-built stored model is PRUNED — compare against the
    // pruned self-model twin (the unpruned one is the demonstration tier)
    val sb = Selection.sbackoffScores(spark, sf,
        minCount = Selection.StoredModelMinCount).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(stored.size == dsir.size)
    stored.foreach { case (id, r) =>
      assert((r.getLong(1), r.getLong(2)) == dsir(id), s"doc $id dsir")
      assert((r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)) == sb(id), s"doc $id lm")
    }
  }

  test("the persisted Brants cutoff round-trips build → serve (the meta " +
       "handshake is consulted, not write-only)") {
    val d = Tables(spark, sf, "documents").limit(40)
    val md3 = freshModelDir("cutoff3")
    Selection.buildSelectionModel(spark, d, md3, minCount = 3L)
    assert(Selection.storedModelMinCount(spark, md3) == 3L)
    val mdDef = freshModelDir("cutoffdef")
    Selection.buildSelectionModel(spark, d, mdDef)
    assert(Selection.storedModelMinCount(spark, mdDef) ==
      Selection.StoredModelMinCount)
  }

  test("stored-model threshold admits exactly the offline top-k on the build corpus") {
    val md = freshModelDir("threshold")
    val d = Tables(spark, sf, "documents")
    val k = 25
    Selection.buildSelectionModel(spark, d, md, k)
    val admitted = Selection.scoreWithStoredModel(spark,
        d.select(col("doc_id"), col("text")), md)
      .where(col("admitted")).select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val offline = Selection.dsirGumbelTopK(spark, sf, k)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(admitted == offline,
      "threshold admission must reproduce the offline resample on its own pool")
    // the tie rule is pinned structurally: the persisted boundary row is
    // the offline top-k's weakest admit (min key; max doc_id among its
    // key ties), so a regenerated fixture WITH a tie at the threshold
    // key still admits exactly k of the pool, never a superset
    val meta = spark.read.parquet(s"$md/meta.parquet").head()
    val boundary = Selection.dsirGumbelTopK(spark, sf, k)
      .orderBy(col("key_micro"), col("doc_id").desc).limit(1)
      .select(col("key_micro"), col("doc_id")).head()
    assert((meta.getLong(4), meta.getLong(5)) ==
      ((boundary.getLong(0), boundary.getLong(1))),
      "the persisted threshold must be the offline top-k's boundary row")
  }

  test("a model built under different hyperparameters refuses loudly") {
    val md = freshModelDir("handshake")
    import spark.implicits._
    // a foreign model: wrong dim in the meta handshake
    Seq((512, "en", 1000L, -1000000L, 0L, 0L))
      .toDF("dim", "target_lang", "n_tot", "oov_micro",
        "key_threshold_micro", "key_threshold_doc_id")
      .write.mode("overwrite").parquet(s"$md/meta.parquet")
    val e = intercept[IllegalArgumentException] {
      Selection.scoreWithStoredModel(spark,
        Tables(spark, sf, "documents").select(col("doc_id"), col("text")), md)
    }
    assert(e.getMessage.contains("rebuild the model"))
  }

  test("stream scoring over micro-batches ≡ batch scoring of the union") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val md = freshModelDir("stream")
    val d = Tables(spark, sf, "documents")
    Selection.buildSelectionModel(spark, d, md)
    val rows = d.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)](spark)
    val got = scala.collection.mutable.ArrayBuffer[(Long, Boolean, Long, Long)]()
    val q = graft.streaming.StreamSelect.scoredIngest(
        input.toDF().toDF("doc_id", "text"), md) { scored =>
      got ++= scored.collect().map(r =>
        (r.getLong(0), r.getBoolean(4), r.getLong(3), r.getLong(8)))
    }.start()
    try {
      rows.grouped((rows.length + 2) / 3).foreach { g =>
        input.addData(g.toSeq); q.processAllAvailable()
      }
    } finally q.stop()
    val batch = Selection.scoreWithStoredModel(spark,
        d.select(col("doc_id"), col("text")), md).collect()
      .map(r => (r.getLong(0), r.getBoolean(4), r.getLong(3), r.getLong(8))).toSet
    assert(got.size == rows.length, "every streamed doc scored exactly once")
    assert(got.toSet == batch,
      "per-micro-batch frozen-model scores must equal the batch scores")
  }

  test("chunking: every token position is covered by at least one chunk") {
    val width = 32; val stride = 24
    val cover = TextAnalysis.chunkWindows(spark, sf, width, stride)
      .select(col("doc_id"), col("start"), col("n_tok")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).groupBy(_._1)
    docRows.foreach { case (id, _, t) =>
      val n = t.split(" ", -1).length
      val covered = cover(id).flatMap { case (_, s0, nt) => s0 until (s0 + nt) }.toSet
      assert(covered == (1L to n.toLong).toSet, s"doc $id coverage")
    }
  }
}
