package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("decode features are pure functions of the payload") {
    val feats = Multimodal.decodeFeatures(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir).count()
    assert(feats.length === docs)
    feats.foreach { f =>
      assert(f.n_bytes > 0)
      assert(f.width === (f.n_bytes % 640).toInt)
      assert(f.height === (f.n_bytes * 7 % 480).toInt)
      assert(f.checksum.length === 32)
      assert(f.media_type === "text/plain")
    }
  }

  test("frame sampling strides the payload deterministically") {
    val bytes = Array.tabulate[Byte](10)(_.toByte)
    assert(Multimodal.StubCodec.frameSample(bytes, 3).toSeq ===
      Seq[Byte](0, 3, 6, 9))
    assert(Multimodal.StubCodec.frameSample(bytes, 1).toSeq === bytes.toSeq)
    assert(Multimodal.StubCodec.frameSample(Array.emptyByteArray, 4).toSeq
      === Seq.empty)
  }
}
