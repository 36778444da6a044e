package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A binary media asset: bytes are opaque to the engine, metadata is typed.
  * This is the 100 TB contract for image/audio/video columns — media never
  * leaves the executors, is never parsed by the planner, and all pruning /
  * partitioning decisions run on the typed metadata columns only.
  */
final case class Asset(
    asset_id: Long,
    modality: String, // "image" | "audio" | "video"
    bytes: Array[Byte],
    meta: Map[String, String])

/** Decoded features for one asset. `features` is the embedding-shaped output
  * a downstream similarity/dedup stage consumes (see operators.TierThree.q24 /
  * TierFour.q29).
  */
final case class AssetFeatures(
    asset_id: Long,
    modality: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    n_frames: Int,
    features: Array[Float])

/** Multimodal column plumbing (north-star addendum; the reference has no
  * media path at all). The Spark-side mechanics — schema, batch-shaped
  * per-partition decode, feature extraction signature, partitioning — are
  * real and tested ([[graft.MultimodalSpec]]); the codec itself is STUBBED:
  * this container ships no image/audio libraries, so [[StubCodec]] is a
  * deterministic fake that derives pixel-ish metadata and features from the
  * byte stream. Swapping in a real codec changes only [[Codec.decode]].
  *
  * Scale notes:
  *   - decode runs via `mapPartitions` in fixed-size batches: a real codec
  *     amortizes native-library init per batch (the same shape PySpark's
  *     `mapInPandas` gives Arrow batches), and memory stays bounded by
  *     `batchSize × max asset size` regardless of partition row count.
  *   - assets are repartitioned by asset_id before decode so a handful of
  *     giant videos can't skew one executor (range partition on a key, not
  *     on the binary payload).
  */
object Multimodal {

  /** Codec contract: bytes in, (width, height, frames, features) out.
    * Real implementations (JPEG decode + resize, audio frame sampling,
    * video keyframe extraction) plug in here.
    */
  trait Codec extends Serializable {
    def decode(modality: String, bytes: Array[Byte]): (Int, Int, Int, Array[Float])
  }

  /** Deterministic fake standing in for the real decoder (no media libs in
    * this environment). Metadata mirrors q34's oracle arithmetic; features
    * are an 8-dim byte-histogram sketch — deterministic, content-sensitive,
    * and cheap, so tests can assert exact values.
    */
  object StubCodec extends Codec {
    def decode(modality: String, bytes: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      val n = bytes.length
      val hist = new Array[Float](8)
      var i = 0
      while (i < n) { hist((bytes(i) & 0xff) >>> 5) += 1f; i += 1 }
      if (n > 0) { var j = 0; while (j < 8) { hist(j) /= n.toFloat; j += 1 } }
      (n % 640 + 16, n % 480 + 16, n % 30 + 1, hist)
    }
  }

  /** Wrap any DataFrame with (id, string) columns as a fake asset table —
    * the test-corpus adapter (documents.text → UTF-8 bytes as media).
    */
  def assetsFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("asset_id"),
        lit("image").as("modality"),
        col("text").cast("binary").as("bytes"),
        map(lit("source"), coalesce(col("source"), lit(""))).as("meta"))
      .as[Asset]
  }

  /** Batch-shaped distributed decode. One task iterates its partition in
    * `batchSize` groups — the unit a real codec would hand to native code —
    * and emits typed features. No driver-side collection anywhere.
    */
  def decodeFeatures(
      spark: SparkSession,
      assets: Dataset[Asset],
      codec: Codec = StubCodec,
      batchSize: Int = 64,
      partitions: Int = 0): Dataset[AssetFeatures] = {
    import spark.implicits._
    val repart =
      if (partitions > 0) assets.repartition(partitions, col("asset_id"))
      else assets.repartition(col("asset_id"))
    repart.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch hook: a real codec would init/borrow native buffers here
        batch.iterator.map { a =>
          val (w, h, f, feats) = codec.decode(a.modality, a.bytes)
          AssetFeatures(a.asset_id, a.modality, a.bytes.length.toLong, w, h, f, feats)
        }
      }
    }
  }
}
