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

/** One sampled frame of a video-modality asset — the 1:N output shape of
  * [[Multimodal.sampleFrames]]; downstream stages treat each frame as an
  * independent asset-ish row (decode → features → dedup/similarity).
  */
final case class Frame(
    asset_id: Long,
    frame_no: Int,
    n_bytes: Long,
    bytes: Array[Byte])

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

    /** Re-encode `bytes` at target `w × h` (image resize / audio resample).
      * Stubbed deterministically below; a real codec decodes, scales,
      * re-encodes. */
    def resize(modality: String, bytes: Array[Byte], w: Int, h: Int): Array[Byte]

    /** Split a (video-ish) payload into per-frame payloads, in order. */
    def frames(modality: String, bytes: Array[Byte]): Seq[Array[Byte]]
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

    /** Stub resize: uniform byte-stride downsample to ≈ the target pixel
      * share of the original — deterministic, monotone in `w·h`, and the
      * output re-decodes (it is just bytes). */
    def resize(modality: String, bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val (w0, h0, _, _) = decode(modality, bytes)
      val stride = math.max(1L, w0.toLong * h0 / math.max(1L, w.toLong * h)).toInt
      bytes.indices.collect { case i if i % stride == 0 => bytes(i) }.toArray
    }

    /** Stub frame split: the decode rule's frame count, near-equal chunks,
      * loss-free (concatenating all frames restores the payload — pinned in
      * MultimodalSpec). */
    def frames(modality: String, bytes: Array[Byte]): Seq[Array[Byte]] = {
      val (_, _, nf, _) = decode(modality, bytes)
      val size = math.max(1, (bytes.length + nf - 1) / nf)
      bytes.grouped(size).toSeq.take(nf) match {
        case s if bytes.isEmpty => Seq(Array.emptyByteArray)
        case s => s
      }
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

  /** Batch-shaped distributed RESIZE — same task shape as [[decodeFeatures]]
    * (skew-safe repartition by id, per-batch codec hook), 1:1 rows out with
    * the payload re-encoded at `w × h` and the meta stamped `resized=WxH`.
    * Output is an asset table again, so the stages compose (resize →
    * decode → features → similarity). */
  def resizeAssets(
      spark: SparkSession,
      assets: Dataset[Asset],
      w: Int,
      h: Int,
      codec: Codec = StubCodec,
      batchSize: Int = 64): Dataset[Asset] = {
    import spark.implicits._
    assets.repartition(col("asset_id")).mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.iterator.map { a =>
        Asset(a.asset_id, a.modality, codec.resize(a.modality, a.bytes, w, h),
          a.meta + ("resized" -> s"${w}x${h}"))
      })
    }
  }

  /** Batch-shaped distributed FRAME SAMPLING — the 1:N multimodal op: each
    * (video-ish) asset explodes into every `every`-th decoded frame, frame
    * numbers preserved from the full sequence. Repartitioning by id BEFORE
    * the explode keeps a handful of giant videos from skewing one task;
    * the fan-out happens executor-side (iterator flatMap, nothing buffers
    * a whole video's frames beyond the codec's own split). */
  def sampleFrames(
      spark: SparkSession,
      assets: Dataset[Asset],
      every: Int = 1,
      codec: Codec = StubCodec,
      batchSize: Int = 64): Dataset[Frame] = {
    import spark.implicits._
    require(every >= 1, s"every must be >= 1, got $every")
    assets.repartition(col("asset_id")).mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.iterator.flatMap { a =>
        codec.frames(a.modality, a.bytes).iterator.zipWithIndex.collect {
          case (fb, i) if i % every == 0 => Frame(a.asset_id, i, fb.length.toLong, fb)
        }
      })
    }
  }
}
