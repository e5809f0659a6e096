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
      assert(f.feature.forall(v => !v.isNaN && !v.isInfinite))
    }
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
