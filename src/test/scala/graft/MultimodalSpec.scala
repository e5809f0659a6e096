package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  test("decode metadata is deterministic and covers every media row") {
    val a = Multimodal.decodeMeta(spark, sf).collect().sortBy(_.media_id)
    val b = Multimodal.decodeMeta(spark, sf).collect().sortBy(_.media_id)
    assert(a.length == Tables(spark, sf, "documents").count())
    assert(a.toSeq == b.toSeq) // fake codec must be reproducible
    a.foreach { m =>
      assert(m.n_bytes > 0 && m.width >= 16 && m.height >= 16)
      assert(Set("image", "audio", "video").contains(m.kind))
    }
  }

  test("feature vectors have the declared fixed dimension") {
    Multimodal.extractFeatures(spark, sf).collect().foreach { f =>
      assert(f.feature.length == Multimodal.FeatureDim)
      assert(f.feature.forall(_ >= 0L)) // exact integer byte-sums
    }
  }

  test("resize respects the pixel-budget bound and is deterministic") {
    val rows = Multimodal.resizeMedia(spark, sf, targetW = 64, targetH = 64).collect()
    assert(rows.length == Tables(spark, sf, "documents").count())
    val budget = 64 * 64 / 8
    rows.foreach { r =>
      val thumb = r.getAs[Array[Byte]]("thumb")
      assert(thumb.length <= budget, s"media ${r.getLong(0)} over budget")
      // reported dims describe the actual payload: target dims only when the
      // codec really downsampled; pass-through rows keep their source dims
      if (r.getAs[Boolean]("resized")) {
        assert(thumb.length == budget)
        assert(r.getAs[Int]("thumb_width") == 64 && r.getAs[Int]("thumb_height") == 64)
      } else {
        assert(r.getAs[Int]("thumb_width") == r.getAs[Int]("src_width"))
        assert(r.getAs[Int]("thumb_height") == r.getAs[Int]("src_height"))
      }
    }
    assert(rows.exists(_.getAs[Boolean]("resized")), "expected at least one real downsample")
    val again = Multimodal.resizeMedia(spark, sf, targetW = 64, targetH = 64).collect()
    assert(rows.map(_.getAs[Array[Byte]]("thumb").toSeq).toSeq ==
           again.map(_.getAs[Array[Byte]]("thumb").toSeq).toSeq)
  }

  test("frame sampling slices the payload without exceeding it") {
    val rows = Multimodal.sampleFrames(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val frame = r.getAs[Array[Byte]]("frame")
      val total = r.getAs[Long]("total_bytes")
      assert(frame.length <= Multimodal.FrameLen)
      assert(r.getAs[Long]("frame_idx") * (Multimodal.FrameLen * 4) < total)
    }
  }

  test("perceptual-hash near-dup: banded pairs == brute force (pigeonhole " +
       "exactness), fingerprint honors the codec's pixel math") {
    import org.apache.spark.sql.functions.col
    // law 1 (pigeonhole): the banded pipeline must EQUAL the all-pairs
    // scan over the same fingerprints at the registered radius
    val fps = Multimodal.phashFingerprints(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val r = Multimodal.PhashMaxHamming
    val brute = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      h = java.lang.Long.bitCount(fa ^ fb) if h <= r
    } yield (a, b, h.toLong)).toSet
    val banded = Multimodal.phashPairs(spark, sf).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(banded == brute,
      s"missing=${brute -- banded} extra=${banded -- brute}")
    assert(fps.nonEmpty)
    // law 2: identical payloads fingerprint identically — asserted on the
    // corpus only when it carries exact text twins (sf-dependent), and
    // always on a PLANTED structure through the same banded pipeline:
    // hamming 0 (twin), hamming ≤ r (flip r low bits), hamming > r (out)
    val nDupTexts = Tables(spark, sf, "documents")
      .groupBy(org.apache.spark.sql.functions.md5(col("text"))).count()
      .filter(col("count") > 1).count()
    if (nDupTexts > 0)
      assert(brute.exists(_._3 == 0L), "exact payload twins must collide at 0")
    locally {
      import spark.implicits._
      val base = 0x155555555555555L // bit 63 structurally 0, like phashOf
      val planted = Seq(
        (1L, base), (2L, base),                     // twin: hamming 0
        (3L, base ^ ((1L << r) - 1L)),              // exactly r low bits
        (4L, base ^ ((1L << (r + 1)) - 1L))         // r+1 bits: outside
      ).toDF("doc_id", "simhash")
      val got = graft.operators.Dedup.simhashPairsFrom(planted, r)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
      // (3,4) differ in bit r alone — hamming 1; (1,4)/(2,4) are r+1 out
      assert(got == Set((1L, 2L, 0L), (1L, 3L, r.toLong), (2L, 3L, r.toLong),
        (3L, 4L, 1L)),
        s"planted structure: $got")
    }
    // law 3 (pixel-path agreement): the fingerprint is a pure function of
    // the codec's 64-pixel thumb — recompute from FakeCodec.resize
    def ahashOf(bytes: Array[Byte]): Long = {
      val t = Multimodal.FakeCodec.resize(bytes, 16, 32)
      val sum = t.map(b => (b & 0xFF).toLong).sum
      (0 until math.min(t.length, 63)).foldLeft(0L) { (fp, i) =>
        if (t.length.toLong * (t(i) & 0xFF) >= sum) fp | (1L << i) else fp
      }
    }
    val probes = Seq(Array.empty[Byte], "x".getBytes("UTF-8"),
      ("y" * 63).getBytes("UTF-8"), ("z" * 64).getBytes("UTF-8"),
      ("near dup body " * 40).getBytes("UTF-8"))
    probes.foreach(p =>
      assert(Multimodal.phashOf(p) == ahashOf(p), s"len=${p.length}"))
    // sub-64-byte payloads fingerprint over their own length: bit i >= m
    // must be zero
    val small = Multimodal.phashOf("abcde".getBytes("UTF-8"))
    assert((small >>> 5) == 0L, "bits past the payload length must be unset")
  }

  test("phash production tiers (round-17): wide == brute at radius 3, " +
       "collapsed == brute among representatives, bucket mass bounded") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val fps = Multimodal.phashFingerprints(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    def brute(pop: Seq[(Long, Long)], r: Int) = (for {
      (a, fa) <- pop; (b, fb) <- pop if a < b
      h = java.lang.Long.bitCount(fa ^ fb) if h <= r
    } yield (a, b, h.toLong)).toSet
    // wide tier: pigeonhole-exact at its reduced radius
    val rw = Multimodal.PhashWideMaxHamming
    val wide = Multimodal.phashPairsWide(spark, sf).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(wide == brute(fps.toSeq, rw),
      s"missing=${brute(fps.toSeq, rw) -- wide} extra=${wide -- brute(fps.toSeq, rw)}")
    // collapsed tier: brute force among min-id exact-fingerprint reps
    val reps = fps.groupBy(_._2).map { case (_, g) => g.minBy(_._1) }.toSeq
    val collapsed = Multimodal.phashPairsCollapsed(spark, sf).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(collapsed == brute(reps, Multimodal.PhashMaxHamming))
    // planted mega-cluster: collapse removes the identical mass entirely
    // (one rep survives, no intra-cluster pairs), and the wide tier's hot
    // bucket means exactly that cluster — the cap trims it OBSERVABLY
    // while the uncapped run stays exact
    val base = 0x155555555555555L
    val cluster = (1L to 50L).map(i => (i, base))
    val outlier = Seq((100L, base ^ 0x7L), (200L, ~base & ~(1L << 63)))
    val planted = (cluster ++ outlier).toDF("doc_id", "simhash")
    val uncapped = graft.operators.Dedup
      .simhashPairsWideFrom(planted, rw, 6, Int.MaxValue)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(uncapped == brute(cluster ++ outlier, rw))
    assert(uncapped.size == 50 * 49 / 2 + 50, "cluster pairs + outlier at radius 3")
    val capped = graft.operators.Dedup
      .simhashPairsWideFrom(planted, rw, 6, bucketCap = 10)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(capped.subsetOf(uncapped) && capped.size < uncapped.size,
      "a sub-cluster bucket cap must trim pairs (observably), never invent them")
    // bucket-population law (the n/256 -> chance claim): on the real
    // corpus the wide keys leave bucket mass at near-dup-cluster grain —
    // max (band,bkey) population is bounded by the largest exact/near
    // cluster + chance, far under the narrow tier's structural n/256 load
    val n = fps.length.toLong
    val wideBuckets = Multimodal.phashFingerprints(spark, sf)
      .select(col("doc_id"), col("simhash"))
    val maxWide = graft.operators.Dedup
      .simhashWideBandedPopulation(wideBuckets, rw, 6)
    assert(maxWide <= math.max(8L, n / 64),
      s"wide-key max bucket $maxWide vs n=$n — keys are not spreading")
  }

  test("phash persisted index (round-17): increment == brute restricted to " +
       "the batch, appended increments converge with the one-shot base") {
    import org.apache.spark.sql.functions.col
    val media = Multimodal.mediaTable(spark, sf)
    val split = graft.operators.Dedup.incrementSplitAt(spark, sf)
    val rw = Multimodal.PhashWideMaxHamming
    val fps = Multimodal.phashFingerprints(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val expected = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      h = java.lang.Long.bitCount(fa ^ fb) if h <= rw
      if a >= split || b >= split
    } yield (a, b, h.toLong)).toSet
    // one-shot base over the old split, pure probe of the new split
    val idx = java.nio.file.Files.createTempDirectory("phidx-law-").toString
    Multimodal.buildPhashIndex(spark, media.filter(col("media_id") < split), idx)
    val got = Multimodal.phashDedupIncrement(spark,
        media.filter(col("media_id") >= split), idx, append = false)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
    // convergence: the same base reached by an APPENDED mid-batch serves
    // the identical probe (arrival-order contract: ids monotone)
    val mid = split / 2
    val idx2 = java.nio.file.Files.createTempDirectory("phidx-law2-").toString
    Multimodal.buildPhashIndex(spark, media.filter(col("media_id") < mid), idx2)
    Multimodal.phashDedupIncrement(spark,
      media.filter(col("media_id") >= mid && col("media_id") < split), idx2)
      .collect()
    val got2 = Multimodal.phashDedupIncrement(spark,
        media.filter(col("media_id") >= split), idx2, append = false)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(got2 == expected, "appended base diverged from the one-shot build")
  }
}
