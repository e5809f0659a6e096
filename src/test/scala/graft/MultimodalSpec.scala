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
}
