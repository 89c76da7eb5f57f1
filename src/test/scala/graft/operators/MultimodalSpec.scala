package graft.operators

import graft.SparkSpecBase

class MultimodalSpec extends SparkSpecBase {

  test("feature histogram accounts for every payload byte") {
    val feats = Multimodal
      .extractFeatures(Multimodal.mediaFromDocuments(spark, sf001))
      .collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.histogram.sum == f.n_bytes)
      assert(f.brightness >= 0 && f.brightness <= 255)
    }
  }

  test("frame sampling covers the full payload with stride-sized frames") {
    import spark.implicits._
    val media = Multimodal.mediaFromDocuments(spark, sf001)
    val videos = media.filter(_.media_type == "video").collect()
    val frames = Multimodal.sampleFrames(media).collect().groupBy(_.doc_id)
    videos.foreach { v =>
      val expected = v.payload.length / Multimodal.FrameStride + 1
      assert(frames(v.doc_id).length == expected)
      assert(frames(v.doc_id).map(_.frame_idx).sorted.toSeq ==
        (0L until expected.toLong))
    }
  }
}
