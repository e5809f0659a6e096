package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{QualityModel, Sampling}
import graft.functions.PolyHash

/** Laws for the trained quality classifier (QualityModel) and the
  * soft-dedup reweighting query. The literal twin's DuckDB hash gate
  * carries the cross-engine portability proof; these specs carry the
  * algorithmic laws the gate can't see: an independent driver-side
  * recomputation of the scoring arithmetic, held-out generalization of
  * the trained model, monotone loss descent, and the quantization bound
  * that ties the trained tier to the gated scoring path. */
class QualityModelSpec extends AnyFunSuite with SparkTestBase {

  private def docsAt(dir: String) =
    Tables(spark, dir, "documents").select(col("doc_id"), col("text"))

  test("literal twin matches an independent driver-side recomputation") {
    val (w, b) = QualityModel.literalMicroModel
    val got = QualityModel.scoreLiteralQuery(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    val docs = docsAt(sf).collect()
    assert(docs.nonEmpty && got.size == docs.length)
    docs.foreach { r =>
      val id = r.getLong(0)
      val toks = r.getString(1).split(" ", -1)
      val n = toks.length.toLong
      val dot = toks.map(t => w(QualityModel.bucketOf(t).toInt)).sum
      val numer = 100L * b * n + 100L * dot + w(QualityModel.LenIdx) * math.min(n, 100L) * n
      val z = BigDecimal(numer.toDouble / (n * 100L * QualityModel.WScale).toDouble)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (gn, gz, gp) = got(id)
      assert(gn == n && gp == (numer > 0L), s"doc $id")
      assert(math.abs(gz - z) < 1e-9, s"doc $id: $gz vs $z")
    }
  }

  test("training sample is FIXED-size: the cap binds, is deterministic, and nests") {
    val dir = "/root/testdata/sf0.01" // ~100 docs in the 20 % slice
    val slice = QualityModel.trainSample(spark, dir, Int.MaxValue)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(slice.size > 32, "fixture too small to exercise the cap")
    def ids(cap: Int): Seq[Long] = QualityModel.trainSample(spark, dir, cap)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    val c16 = ids(16)
    assert(c16.length == 16, "the cap must bind below the slice size")
    assert(c16 == ids(16), "the capped selection must be deterministic")
    assert(c16.toSet.subsetOf(ids(32).toSet),
      "caps must nest (hash-order prefix): a budget bump only adds docs")
    // and the default cap never binds at gate scale — today's demonstration
    // trains on the whole 20 % slice, exactly the pre-cap behavior
    assert(ids(QualityModel.MaxTrainDocs).toSet == slice)
  }

  test("trained classifier generalizes: held-out accuracy beats the majority baseline") {
    val dir = "/root/testdata/sf0.01" // 500 docs; sf0.001's ~50 make held-out accuracy a coin flip
    val all = docsAt(dir)
    val labels = QualityModel.weakLabels(spark, dir)
    // deterministic hash 80/20 split in the library's sampling universe
    val splitKey = pmod(pmod(col("doc_id"), lit(Sampling.IdMod)) * lit(Sampling.Mix),
      lit(Sampling.IdMod)) % 100
    val trainDocs = all.where(splitKey >= 20)
    val heldDocs = all.where(splitKey < 20)
    val (model, losses) = QualityModel.train(spark, trainDocs,
      labels.join(trainDocs.select("doc_id"), Seq("doc_id")))
    val (wq, bq) = model.quantized
    val scored = QualityModel.scoreWithMicro(spark, heldDocs, wq, bq)
      .join(labels, Seq("doc_id"))
    val (nHeld, nRight, nPos) = {
      val r = scored.agg(count(lit(1)),
        count_if(col("pred") === (col("y") === 1)), count_if(col("y") === 1)).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    assert(nHeld > 50, s"held-out split unexpectedly small: $nHeld")
    val acc = nRight.toDouble / nHeld
    val majority = math.max(nPos, nHeld - nPos).toDouble / nHeld
    assert(acc >= 0.75 && acc > majority,
      s"held-out accuracy $acc (majority baseline $majority) below the law")
    // loss law: descent end-to-end, and better than the uninformed ln 2
    assert(losses.last < losses.head, s"loss did not descend: ${losses.head} -> ${losses.last}")
    assert(losses.last < math.log(2.0), s"final loss ${losses.last} no better than chance")
  }

  test("quantized scoring tracks the double model within quantization error") {
    val dir = "/root/testdata/sf0.01"
    val all = docsAt(dir)
    val (model, _) = QualityModel.train(spark, all, QualityModel.weakLabels(spark, dir),
      epochs = 10)
    val (wq, bq) = model.quantized
    val got = QualityModel.scoreWithMicro(spark, all, wq, bq)
      .select(col("doc_id"), col("z_e4")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // driver-side DOUBLE scoring of the same docs: z = b + Σ w·tf + w_len·len
    all.collect().foreach { r =>
      val toks = r.getString(1).split(" ", -1)
      val n = toks.length.toDouble
      val z = model.bias + toks.map(t => model.w(QualityModel.bucketOf(t).toInt)).sum / n +
        model.w(QualityModel.LenIdx) * math.min(n, 100.0) / 100.0
      // |quantized − double| ≤ Σ per-term rounding (≤ .5µ each over ≤ n+2
      // terms, tf-scaled) + the e4 rounding of the output itself
      assert(math.abs(got(r.getLong(0)) - z) < 2e-4 + 0.5e-4,
        s"doc ${r.getLong(0)}: quantized ${got(r.getLong(0))} vs double $z")
    }
  }

  test("token bucket hash is the portable PolyHash family") {
    // pin the contract the DuckDB oracle recomputes: base-A polynomial mod
    // the family prime, reduced mod Dim
    assert(QualityModel.bucketOf("the") ==
      PolyHash.poly("the", PolyHash.BaseA) % QualityModel.Dim)
    assert((0 until 64).map(i => QualityModel.bucketOf(s"w$i")).distinct.size > 32,
      "hashing degenerates: 64 common tokens land in <33 of 1024 buckets")
  }

  test("soft-dedup weights: each duplicate group contributes unit mass") {
    import spark.implicits._
    // synthetic groups (the gate corpus has only singleton md5 groups):
    // 3 copies of A, 2 of B, 1 of C
    val df = Seq((1L, "a a a"), (2L, "a a a"), (3L, "a a a"),
      (4L, "b b"), (5L, "b b"), (6L, "c")).toDF("doc_id", "text")
    val got = Sampling.softDedupWeightsDf(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 6, "totality: every copy keeps a row")
    val byId = got.map(t => t._1 -> t).toMap
    assert(Seq(1L, 2L, 3L).forall(byId(_)._2 == 3L))
    assert(byId(4L)._2 == 2L && byId(6L)._2 == 1L)
    assert(math.abs(byId(1L)._3 - 0.3333) < 1e-9 && byId(6L)._3 == 1.0)
    // unit mass per group within e4 rounding
    val mass = got.groupBy(_._2).map { case (_, rows) => rows.map(_._3).sum }
    mass.foreach(m => assert(math.abs(m - 1.0) < 1e-3, s"group mass $m"))
  }
}
