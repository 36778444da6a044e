package graft

import graft.multimodal._

/** Multimodal plumbing (north-star addendum): schema, batch-shaped decode,
  * deterministic stub features — the Spark-side mechanics that stay when a
  * real codec replaces [[Multimodal.StubCodec]].
  */
class MultimodalSpec extends SparkSpec {

  test("decode pipeline: typed schema, distributed batches, deterministic features") {
    val docs = Tables.load(spark, sf, "documents")
    val assets = Multimodal.assetsFromDocuments(spark, docs)
    val feats = Multimodal.decodeFeatures(spark, assets, batchSize = 64, partitions = 4)
    val rows = feats.collect()
    assert(rows.length == docs.count())
    rows.foreach { f =>
      assert(f.n_bytes > 0)
      assert(f.width == (f.n_bytes % 640 + 16) && f.height == (f.n_bytes % 480 + 16))
      assert(f.features.length == 8)
      assert(math.abs(f.features.sum - 1f) < 1e-3, "histogram must be normalized")
    }
    // determinism: running the decode twice yields identical features
    val again = Multimodal.decodeFeatures(spark, assets, batchSize = 7, partitions = 2)
      .collect().map(f => f.asset_id -> f.features.toSeq).toMap
    rows.foreach(f => assert(again(f.asset_id) == f.features.toSeq))
  }

  test("stub codec matches the q34 oracle arithmetic") {
    val bytes = "hello world".getBytes("UTF-8")
    val (w, h, fr, feats) = Multimodal.StubCodec.decode("image", bytes)
    assert(w == bytes.length % 640 + 16)
    assert(h == bytes.length % 480 + 16)
    assert(fr == bytes.length % 30 + 1)
    assert(feats.length == 8)
  }
}
