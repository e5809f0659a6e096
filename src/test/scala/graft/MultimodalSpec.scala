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
}
