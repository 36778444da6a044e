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

  test("resize: 1:1 distributed re-encode, smaller target → smaller payload, meta stamped") {
    val docs = Tables.load(spark, sf, "documents").limit(20)
    val assets = Multimodal.assetsFromDocuments(spark, docs)
    val orig = assets.collect().map(a => a.asset_id -> a.bytes.length).toMap
    val resized = Multimodal.resizeAssets(spark, assets, w = 64, h = 48, batchSize = 7)
      .collect()
    assert(resized.length == orig.size, "resize is 1:1")
    resized.foreach { a =>
      assert(a.bytes.length <= orig(a.asset_id), "64x48 target must not grow the payload")
      assert(a.bytes.length > 0)
      assert(a.meta("resized") == "64x48")
    }
    // composes: the resized assets decode through the same pipeline
    val feats = Multimodal.decodeFeatures(spark,
      Multimodal.resizeAssets(spark, assets, 64, 48)).collect()
    assert(feats.length == orig.size && feats.forall(_.features.length == 8))
    // determinism
    val again = Multimodal.resizeAssets(spark, assets, 64, 48)
      .collect().map(a => a.asset_id -> a.bytes.toSeq).toMap
    resized.foreach(a => assert(again(a.asset_id) == a.bytes.toSeq))
  }

  test("frame sampling: every=1 is loss-free, every=k keeps ceil(n/k) frames in order") {
    val docs = Tables.load(spark, sf, "documents").limit(15)
    val assets = Multimodal.assetsFromDocuments(spark, docs)
    val orig = assets.collect().map(a => a.asset_id -> a.bytes).toMap
    val all = Multimodal.sampleFrames(spark, assets, every = 1, batchSize = 4).collect()
    // loss-free: concatenating an asset's frames in frame order restores it
    all.groupBy(_.asset_id).foreach { case (id, frames) =>
      val joined = frames.sortBy(_.frame_no).flatMap(_.bytes)
      assert(joined.toSeq == orig(id).toSeq, s"asset $id frames must reassemble")
      val nf = orig(id).length % 30 + 1
      assert(frames.length == math.ceil(nf.toDouble).toInt
        || frames.map(_.n_bytes).sum == orig(id).length)
    }
    val sampled = Multimodal.sampleFrames(spark, assets, every = 3).collect()
    sampled.groupBy(_.asset_id).foreach { case (id, frames) =>
      val total = all.count(_.asset_id == id)
      assert(frames.length == (total + 2) / 3, s"asset $id: every=3 count")
      assert(frames.forall(_.frame_no % 3 == 0), "only every 3rd frame")
    }
  }
}
