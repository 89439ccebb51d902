package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("batched extraction produces one deterministic feature row per asset") {
    val assets = Multimodal.syntheticAssets(spark, 20).repartition(3)
    val feats1 = Multimodal.extract(assets, batchSize = 4).collect().sortBy(_.asset_id)
    val feats2 = Multimodal.extract(assets, batchSize = 7).collect().sortBy(_.asset_id)
    assert(feats1.length == 20)
    // Determinism: batch shape must not change the features.
    assert(feats1.map(_.fingerprint).toSeq == feats2.map(_.fingerprint).toSeq)
    assert(feats1.map(_.embedding.toSeq).toSeq == feats2.map(_.embedding.toSeq).toSeq)
    assert(feats1.forall(_.embedding.length == Multimodal.EmbeddingDim))
    assert(feats1.forall(_.frame_prints.length == Multimodal.FrameSamples))
    assert(feats1.map(_.modality).toSet == Set("image", "audio", "video"))
  }

  test("features are a narrow projection (content never in the output schema)") {
    val out = Multimodal.extract(Multimodal.syntheticAssets(spark, 3))
    assert(!out.schema.fieldNames.contains("content"))
    assert(out.schema.fieldNames.toSet ==
      Set("asset_id", "modality", "n_bytes", "fingerprint", "embedding", "frame_prints"))
  }

  test("identical content gives identical features; different content differs") {
    val a = Multimodal.decodeStub(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9))
    val b = Multimodal.decodeStub(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9))
    val c = Multimodal.decodeStub(Array[Byte](9, 8, 7, 6, 5, 4, 3, 2, 1))
    assert(a.toSeq == b.toSeq)
    assert(a.toSeq != c.toSeq)
  }
}
