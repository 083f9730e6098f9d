package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column handling for a training-data pipeline: media
 * payloads travel as opaque `binary` columns with a typed metadata
 * struct, and per-item feature extraction runs as partition-local
 * batch processing (`mapPartitions` over a typed Dataset) — the Scala
 * analogue of `mapInPandas` batch UDFs.
 *
 * The actual codec work (JPEG decode, audio resample, video frame
 * extraction) is STUBBED: this container has no image/audio libraries,
 * so `decodeStub` produces a deterministic fake derived from the bytes.
 * Everything around the stub — schema, encoders, partition batching,
 * feature shapes, pruning — is real and tested (MediaSpec), so swapping
 * the stub for an actual codec changes one function.
 *
 * Scale notes: media rows are large (MBs); the pipeline keeps binary
 * columns OUT of shuffles — features are extracted in the scan stage
 * (narrow mapPartitions), and only the small feature vectors flow
 * downstream. Partition sizing for 100 TB: cap
 * `spark.sql.files.maxPartitionBytes` so one task's batch of decoded
 * frames fits in executor memory.
 */
object MediaPipeline {

  /** Typed metadata carried alongside every payload. */
  final case class MediaMeta(format: String, width: Int, height: Int,
      channels: Int, durationMs: Long)

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
      meta: MediaMeta)

  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      byte_mean: Double, frames_sampled: Int, feature: Array[Float])

  /** Build a synthetic media table from the `documents` fixture: text
    * bytes stand in for encoded payloads (deterministic, no codecs
    * needed). Real deployments read `binaryFile` sources or parquet
    * with a binary column. */
  def syntheticMediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.sources.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val kind = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        MediaRow(id, kind, text.getBytes("UTF-8"),
          MediaMeta(kind match {
            case "image" => "jpeg"; case "audio" => "wav"; case _ => "mp4"
          }, width = (nChars % 640).toInt + 1, height = (nChars % 480).toInt + 1,
            channels = 3, durationMs = nChars * 10))
      }
  }

  /** ??? in spirit — the codec boundary. Deterministic fake "decode":
    * real implementation would JNI/library-decode `payload` into
    * pixels/samples. Keeps the exact signature a real decoder needs:
    * bytes + meta in, fixed-shape float features out.
    *
    * The fake is INTEGER-EXACT by construction: feature j is the sum of
    * bytes at positions ≡ j (mod dim), scaled by 1/256 (a power of two,
    * so every value is a dyadic rational exactly representable in
    * float32). That makes the vectors digestible cross-engine — the
    * x13 oracle recomputes the bucket sums from the text bytes in
    * DuckDB and md5-compares, with zero float-rounding exposure. */
  private def decodeStub(payload: Array[Byte], meta: MediaMeta,
      dim: Int): Array[Float] = {
    val sums = new Array[Int](dim)
    var i = 0
    while (i < payload.length) {
      sums(i % dim) += payload(i) & 0xff
      i += 1
    }
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) { out(j) = sums(j) / 256.0f; j += 1 }
    out
  }

  /** Frame sampling for video payloads: every `stride`-th chunk of the
    * byte stream stands in for a decoded frame. */
  private def sampleFrames(payload: Array[Byte], stride: Int): Int =
    if (payload.isEmpty) 0 else (payload.length + stride - 1) / stride

  /** Partition-local batch feature extraction. One call per partition
    * (not per row) so a real decoder can amortize codec init /
    * model-session startup across the batch — the same batching
    * contract as mapInPandas. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16,
      frameStride: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (codec handles, model session)
      rows.map { r =>
        val feat = decodeStub(r.payload, r.meta, dim)
        val bytes = r.payload.length.toLong
        val mean = if (bytes == 0) 0.0
          else r.payload.map(b => (b & 0xff).toDouble).sum / bytes
        MediaFeatures(r.media_id, r.kind, bytes, mean,
          if (r.kind == "video") sampleFrames(r.payload, frameStride) else 0,
          feat)
      }
    }
  }

  final case class ResizedMedia(media_id: Long, kind: String, w: Int, h: Int,
      pixels: Array[Byte])

  /** Resize stub — the codec boundary again: views the payload as a
    * `meta.width × meta.height` single-channel grid (wrapping over the
    * byte stream) and nearest-neighbor downsamples to `tw × th`.
    * Integer-exact source indexing (`x·W div tw`), so output is
    * deterministic cross-platform; a real implementation swaps this
    * for the library resampler with the identical signature. */
  private def resizeStub(payload: Array[Byte], meta: MediaMeta,
      tw: Int, th: Int): Array[Byte] = {
    val out = new Array[Byte](tw * th)
    if (payload.isEmpty) return out
    var y = 0
    while (y < th) {
      val sy = y * meta.height / th
      var x = 0
      while (x < tw) {
        val sx = x * meta.width / tw
        out(y * tw + x) = payload((sy * meta.width + sx) % payload.length)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Partition-local batch resize (same amortization contract as
    * extractFeatures); image rows only — audio/video pass through the
    * frame-sampling path instead. Output stays narrow: the resized
    * thumbnail (tw×th bytes), never the original payload, flows
    * downstream. */
  def resizeImages(media: Dataset[MediaRow], tw: Int = 32,
      th: Int = 32): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { rows =>
      rows.map(r => ResizedMedia(r.media_id, r.kind, tw, th,
        resizeStub(r.payload, r.meta, tw, th)))
    }
  }

  /** Downstream-safe projection: drop the heavy binary before any wide
    * transformation (the "don't shuffle payloads" rule). */
  def featureFrame(spark: SparkSession, dir: String): DataFrame = {
    val feats = extractFeatures(syntheticMediaTable(spark, dir))
    feats.toDF().select(col("media_id"), col("kind"), col("n_bytes"),
      col("byte_mean"), col("frames_sampled"), col("feature"))
  }
}
