package graft.multimodal

import graft.SparkSuite

class MultimodalSpec extends SparkSuite {

  test("decodeAndFeaturize preserves rows, emits fixed-width features, deterministic") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "hello world".getBytes("UTF-8"), "image"),
      Multimodal.MediaRow(2L, Array.fill[Byte](4096)(7), "video"),
      Multimodal.MediaRow(3L, Array.emptyByteArray, "audio")
    ).toDS()
    val out1 = Multimodal.decodeAndFeaturize(spark, media).collect().sortBy(_.media_id)
    val out2 = Multimodal.decodeAndFeaturize(spark, media).collect().sortBy(_.media_id)
    assert(out1.length === 3)
    assert(out1.forall(_.features.length === Multimodal.FeatureDim))
    assert(out1.map(_.n_bytes).toSeq === Seq(11, 4096, 0))
    // video frame sampling stub engages only for video
    assert(out1.find(_.media_id == 2L).get.n_frames > 1)
    assert(out1.find(_.media_id == 1L).get.n_frames === 1)
    // determinism across runs
    out1.zip(out2).foreach { case (a, b) =>
      assert(a.features.toSeq === b.features.toSeq)
      assert((a.width, a.height) === (b.width, b.height))
    }
  }

  test("empty bytes do not divide by zero") {
    import spark.implicits._
    val media = Seq(Multimodal.MediaRow(9L, Array.emptyByteArray, "image")).toDS()
    val out = Multimodal.decodeAndFeaturize(spark, media).collect().head
    assert(out.features.forall(f => !f.isNaN && !f.isInfinite))
  }
}
