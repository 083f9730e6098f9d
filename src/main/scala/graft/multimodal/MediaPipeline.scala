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
 * The codec boundary dispatches on the payload's REAL container
 * format ([[MediaCodec.sniff]]): recognized PNG/JPEG payloads go
 * through an actual raster decode (`javax.imageio`, JDK-bundled) into
 * luminance-histogram features, and recognized WAV payloads through a
 * real RIFF/PCM16 parse into per-band amplitude features — no
 * external libraries, all pure JDK. Payloads that are NOT decodable
 * media (e.g. this fixture's text-byte stand-ins) fall back to a
 * deterministic byte-fold, keeping the pipeline total: at corpus
 * scale a bad payload must yield a degraded row, never a task crash.
 * x59 exercises the real encode→parse→decode round trip end-to-end;
 * x12/x13 exercise the plumbing + fallback over opaque bytes.
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

  /** The codec boundary: dispatch on the REAL container format. PNG/
    * JPEG → full `javax.imageio` raster decode → luminance histogram;
    * WAV → RIFF/PCM16 parse → per-band mean |amplitude|. Undecodable
    * or unrecognized bytes degrade to the byte-fold fallback — total,
    * never throwing. */
  private[graft] def decode(payload: Array[Byte], meta: MediaMeta,
      dim: Int): Array[Float] =
    MediaCodec.sniff(payload) match {
      case Some("png") | Some("jpeg") =>
        MediaCodec.decodeImage(payload)
          .map(img => luminanceHistogram(MediaCodec.luminance(img), dim))
          .getOrElse(byteFoldFeatures(payload, dim))
      case Some("wav") =>
        MediaCodec.wavSamples(payload)
          .map(samples => bandAmplitudes(samples, dim))
          .getOrElse(byteFoldFeatures(payload, dim))
      case _ => byteFoldFeatures(payload, dim)
    }

  /** Normalized luminance histogram over `dim` equal-width bins —
    * the classic cheap image descriptor; exact dyadic rationals
    * (count / total with total a pixel count) are NOT guaranteed here,
    * but determinism is: integer luminance in, integer bin counts out. */
  private def luminanceHistogram(lum: Array[Int], dim: Int): Array[Float] = {
    val counts = new Array[Int](dim)
    var i = 0
    while (i < lum.length) {
      counts(math.min(lum(i) * dim / 256, dim - 1)) += 1
      i += 1
    }
    val out = new Array[Float](dim)
    val n = math.max(lum.length, 1)
    var j = 0
    while (j < dim) { out(j) = counts(j).toFloat / n; j += 1 }
    out
  }

  /** Mean |amplitude| per time band: the sample stream is split into
    * `dim` contiguous bands, each contributing one feature. */
  private def bandAmplitudes(samples: Array[Short], dim: Int): Array[Float] = {
    val sums = new Array[Long](dim)
    val counts = new Array[Int](dim)
    val n = samples.length
    var i = 0
    while (i < n) {
      val band = math.min(i.toLong * dim / math.max(n, 1), dim - 1).toInt
      sums(band) += math.abs(samples(i).toInt)
      counts(band) += 1
      i += 1
    }
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) {
      out(j) = if (counts(j) == 0) 0f else (sums(j).toDouble / counts(j)).toFloat
      j += 1
    }
    out
  }

  /** Fallback for opaque (non-media) bytes. INTEGER-EXACT by
    * construction: feature j is the sum of bytes at positions ≡ j
    * (mod dim), scaled by 1/256 (a power of two, so every value is a
    * dyadic rational exactly representable in float32). That makes the
    * vectors digestible cross-engine — the x13 oracle recomputes the
    * bucket sums from the text bytes in DuckDB and md5-compares, with
    * zero float-rounding exposure. */
  private def byteFoldFeatures(payload: Array[Byte],
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
        val feat = decode(r.payload, r.meta, dim)
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

  /** Resize — the codec boundary again. Decodable images take the
    * REAL path: `javax.imageio` decode, integer-luminance conversion,
    * nearest-neighbor downsample of actual pixels. Opaque bytes view
    * the payload as a `meta.width × meta.height` single-channel grid
    * (wrapping over the byte stream) and downsample that. Both paths
    * use integer-exact source indexing (`x·W div tw`), deterministic
    * cross-platform. */
  private[multimodal] def resizeAny(payload: Array[Byte], meta: MediaMeta,
      tw: Int, th: Int): Array[Byte] =
    MediaCodec.sniff(payload) match {
      case Some("png") | Some("jpeg") =>
        MediaCodec.decodeImage(payload) match {
          case Some(img) =>
            val lum = MediaCodec.luminance(img)
            val w = img.getWidth; val h = img.getHeight
            val out = new Array[Byte](tw * th)
            var y = 0
            while (y < th) {
              val sy = y * h / th
              var x = 0
              while (x < tw) {
                out(y * tw + x) = lum(sy * w + x * w / tw).toByte
                x += 1
              }
              y += 1
            }
            out
          case None => resizeFallback(payload, meta, tw, th)
        }
      case _ => resizeFallback(payload, meta, tw, th)
    }

  private def resizeFallback(payload: Array[Byte], meta: MediaMeta,
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
        resizeAny(r.payload, r.meta, tw, th)))
    }
  }

  final case class RoundTrip(doc_id: Long, format: String, width: Int,
      height: Int, channels: Int, sample_rate: Int, duration_ms: Long,
      content_sum: Long)

  /** Real-codec round trip over REAL media bytes: per document,
    * synthesize a genuine PNG (even ids) or PCM16 WAV (odd ids) with
    * parameters and content derived arithmetically from
    * (doc_id, n_chars), then run it BACK through the real parsers —
    * [[MediaCodec.probe]] for the header, `javax.imageio` /
    * [[MediaCodec.wavSamples]] for the content sum. Every output value
    * comes from parsing actual container bytes, so an arithmetic
    * oracle over (doc_id, n_chars) hash-verifies that encode → sniff →
    * header-parse → full-decode is faithful end-to-end. Encode and
    * decode happen inside ONE narrow mapPartitions — payload bytes
    * never leave the task, only the scalar metadata row flows on. */
  def roundTripFrame(spark: SparkSession, dir: String): Dataset[RoundTrip] = {
    import spark.implicits._
    graft.sources.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .mapPartitions { rows =>
        rows.map { case (id, nChars) =>
          if (id % 2 == 0) {
            val w = (nChars % 48 + 4).toInt
            val h = (nChars % 32 + 4).toInt
            val png = MediaCodec.encodePng(w, h,
              (x, y) => ((x * 7 + y * 13 + id * 31) % 256).toInt)
            val hdr = MediaCodec.probe(png).getOrElse(
              sys.error(s"png header parse failed for doc $id"))
            // TYPE_BYTE_GRAY decodes to rgb (g,g,g) → luminance == g,
            // and PNG is lossless, so this sum equals the generator's
            val sum = MediaCodec.decodeImage(png)
              .map(img => MediaCodec.luminance(img).foldLeft(0L)(_ + _))
              .getOrElse(-1L)
            RoundTrip(id, hdr.format, hdr.width, hdr.height, hdr.channels,
              hdr.sampleRate, hdr.durationMs, sum)
          } else {
            val sampleRate = (8000 + (nChars % 8) * 1000).toInt
            val channels = (1 + (nChars % 2)).toInt
            val nFrames = (nChars % 5000 + 100).toInt
            val samples = Array.tabulate(nFrames * channels)(i =>
              ((i * 17 + id * 29) % 2001 - 1000).toShort)
            val wav = MediaCodec.encodeWavPcm16(sampleRate, channels, samples)
            val hdr = MediaCodec.probe(wav).getOrElse(
              sys.error(s"wav header parse failed for doc $id"))
            val sum = MediaCodec.wavSamples(wav)
              .map(_.foldLeft(0L)(_ + _)).getOrElse(Long.MinValue)
            RoundTrip(id, hdr.format, hdr.width, hdr.height, hdr.channels,
              hdr.sampleRate, hdr.durationMs, sum)
          }
        }
      }
  }

  // ------------------------------------------------------------------
  // shared 64-bit signature definitions — the ONE place each
  // fingerprint is defined, used by the batch pair queries
  // (x98/x110/x112/x113 via the frames below) AND the ingest-time
  // media near-dup gate (IngestionFlows.mediaIngestFlow), so the gate
  // and the audit can never drift (the ShingleIndex.candidateShingles
  // argument applied to media)
  // ------------------------------------------------------------------

  /** 9×8 point-downsample of a luminance raster (72 ints, row-major
    * 9-wide): grid(r,c) = lum at (c·W/9, r·H/8), floor division. */
  def dhashGridOf(lum: Array[Int], w: Int, h: Int): Array[Int] =
    Array.tabulate(72) { i =>
      val c = i % 9; val r = i / 9
      lum((r * h / 8) * w + (c * w / 9))
    }

  /** dHash bits over the 9×8 grid: bit k (r=k/8, c=k%8) set iff
    * grid(r,c) < grid(r,c+1). */
  def dhashBitsOf(grid: Array[Int]): Long = {
    var bits = 0L
    var k = 0
    while (k < 64) {
      val r = k / 8; val c = k % 8
      if (grid(r * 9 + c) < grid(r * 9 + c + 1)) bits |= (1L << k)
      k += 1
    }
    bits
  }

  /** 65-frame energy envelope of an interleaved PCM16 stream: frame k
    * = exact integer sum of squared samples in [k·n/65, (k+1)·n/65). */
  def audioEnvelopeOf(samples: Array[Short]): Array[Long] = {
    val n = samples.length
    Array.tabulate(65) { k =>
      var s = 0L
      var i = k * n / 65
      val end = (k + 1) * n / 65
      while (i < end) {
        val v = samples(i).toLong
        s += v * v
        i += 1
      }
      s
    }
  }

  /** Sign bits over a 65-bin envelope: bit k set iff E[k] < E[k+1]. */
  def envelopeBitsOf(en: Array[Long]): Long = {
    var bits = 0L
    var k = 0
    while (k < 64) {
      if (en(k) < en(k + 1)) bits |= (1L << k)
      k += 1
    }
    bits
  }

  /** 65-bin sampled-frame luminance envelope of an AVI clip: bin k =
    * the 72-point dHash-grid sum of sampled frame k·F/65 (decodes
    * ONLY the 65 sampled frames — per-clip cost ∝ sample count). */
  def videoEnvelopeOf(avi: Array[Byte], w: Int, h: Int,
      offs: Array[Int]): Option[Array[Long]] = {
    val out = new Array[Long](65)
    var k = 0
    while (k < 65) {
      MediaCodec.aviFrameLuma(avi, w, h, offs(k * offs.length / 65)) match {
        case None => return None
        case Some(lum) =>
          var s = 0L
          var p = 0
          while (p < 72) {
            s += lum(((p / 9) * h / 8) * w + (p % 9) * w / 9)
            p += 1
          }
          out(k) = s
      }
      k += 1
    }
    Some(out)
  }

  /** 64-bit perceptual fingerprint of raw media bytes, dispatched on
    * the sniffed container: image dHash for PNG/JPEG, energy-gradient
    * fp for WAV, sampled-frame luminance fp for AVI. None for
    * undecodable/foreign bytes (the gate refuses those as
    * `media_unreadable` — total, never throws: MediaCodec contract). */
  def mediaFp(bytes: Array[Byte]): Option[(String, Long)] =
    MediaCodec.sniff(bytes) match {
      case Some("png") | Some("jpeg") =>
        MediaCodec.decodeImage(bytes).map { img =>
          val grid = dhashGridOf(MediaCodec.luminance(img),
            img.getWidth, img.getHeight)
          ("image", dhashBitsOf(grid))
        }
      case Some("wav") =>
        MediaCodec.wavSamples(bytes)
          .map(ss => ("audio", envelopeBitsOf(audioEnvelopeOf(ss))))
      case Some("avi") =>
        for {
          hdr <- MediaCodec.aviInfo(bytes)
          offs <- MediaCodec.aviFrameOffsets(bytes)
          en <- videoEnvelopeOf(bytes, hdr.width, hdr.height, offs)
        } yield ("video", envelopeBitsOf(en))
      case _ => None
    }

  /** Per-image perceptual signature: the 64-bit dHash (difference
    * hash — row-wise luminance gradient signs over a 9×8 downsample;
    * Krawetz's classic near-dup fingerprint) plus the downsampled
    * grid itself so candidate pairs can be re-verified against exact
    * raster distance without re-decoding. */
  final case class DHashRow(doc_id: Long, dhash: Long, grid: Array[Int])

  /** dHash over the fixture's even-doc_id PNGs — synthesis, REAL
    * raster decode (javax.imageio via MediaCodec, same path x59
    * proves lossless) and hashing all inside ONE narrow mapPartitions:
    * payload bytes never leave the task, only (id, 8-byte hash,
    * 72-int grid) flows downstream — the "don't shuffle payloads"
    * rule. Downsample is deterministic point sampling on the integer
    * grid (x = c·W/9, y = r·H/8, floor division): bit k (k = 8r+c) is
    * set iff grid[r][c] < grid[r][c+1]. Point sampling rather than
    * area averaging keeps the signature integer-exact and
    * oracle-reproducible; both are standard dHash variants. */
  def dhashFrame(spark: SparkSession, dir: String): Dataset[DHashRow] = {
    import spark.implicits._
    graft.sources.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
      .filter(col("doc_id") % 2 === 0)
      .as[(Long, Long)]
      .mapPartitions { rows =>
        rows.map { case (id, nChars) =>
          val w = (nChars % 48 + 4).toInt
          val h = (nChars % 32 + 4).toInt
          val png = MediaCodec.encodePng(w, h,
            (x, y) => ((x * 7 + y * 13 + id * 31) % 256).toInt)
          val img = MediaCodec.decodeImage(png).getOrElse(
            sys.error(s"png decode failed for doc $id"))
          val grid = dhashGridOf(MediaCodec.luminance(img), w, h)
          DHashRow(id, dhashBitsOf(grid), grid)
        }
      }
  }

  /** PNG-vs-JPEG dHash stability row: the same raster pushed through
    * the LOSSLESS and the LOSSY JDK codec, both decoded through the
    * real imageio path and hashed with the shared dHash definitions.
    * `dhash` is the PNG-side hash (arithmetically oracle-checkable —
    * the x98 recompute); `jpeg_hamming` is the bit distance the lossy
    * round trip introduced. */
  final case class JpegDHashRow(doc_id: Long, dhash: Long,
      jpeg_hamming: Int)

  /** Lossy-decode robustness frame (x116): real crawls are mostly
    * JPEG, so the dHash near-dup story must survive a LOSSY round
    * trip, not just x98's lossless PNGs. Per qualifying doc (rasters
    * wide enough that the 9×8 downsample steps ≥ 2 px per cell —
    * below that, adjacent grid cells sample the SAME pixel, the
    * gradient is 0, and codec noise flips the < comparison
    * arbitrarily; real crawl images are far above this floor), ONE
    * narrow mapPartitions: synthesize the x98 raster, encode PNG
    * (lossless) AND JPEG (JDK encoder, default quality — byte-
    * deterministic, the x59 precedent), decode BOTH through imageio,
    * hash both through the shared grid/bits definitions. Payloads
    * never leave the task. */
  def jpegDhashFrame(spark: SparkSession, dir: String)
      : Dataset[JpegDHashRow] = {
    import spark.implicits._
    graft.sources.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
      .filter(col("doc_id") % 2 === 0 &&
        col("n_chars") % 48 >= 14 && col("n_chars") % 32 >= 12)
      .as[(Long, Long)]
      .mapPartitions { rows =>
        rows.map { case (id, nChars) =>
          val w = (nChars % 48 + 4).toInt
          val h = (nChars % 32 + 4).toInt
          def pix(x: Int, y: Int): Int =
            ((x * 7 + y * 13 + id * 31) % 256).toInt
          val png = MediaCodec.encodePng(w, h, pix)
          val gridP = dhashGridOf(MediaCodec.luminance(
            MediaCodec.decodeImage(png).getOrElse(
              sys.error(s"png decode failed for doc $id"))), w, h)
          val bitsP = dhashBitsOf(gridP)
          // the same raster as gray RGB through the lossy codec
          val jpg = MediaCodec.encodeJpeg(w, h,
            (x, y) => pix(x, y) * 0x010101)
          val gridJ = dhashGridOf(MediaCodec.luminance(
            MediaCodec.decodeImage(jpg).getOrElse(
              sys.error(s"jpeg decode failed for doc $id"))), w, h)
          val bitsJ = dhashBitsOf(gridJ)
          JpegDHashRow(id, bitsP,
            java.lang.Long.bitCount(bitsP ^ bitsJ))
        }
      }
  }

  /** Per-clip acoustic signature: 64-bit energy-gradient fingerprint
    * (the audio analogue of [[DHashRow]] — Haitsma–Kalker-style sign
    * bits over a coarse energy envelope) plus the 65-frame energy
    * envelope itself so candidate pairs re-verify against exact
    * envelope distance without re-decoding. */
  final case class AudioFpRow(doc_id: Long, afp: Long, energies: Array[Long])

  /** Audio fingerprint over the fixture's odd-doc_id WAVs — synthesis,
    * REAL RIFF/PCM16 decode (MediaCodec.wavSamples, the path x59
    * proves faithful) and hashing all inside ONE narrow mapPartitions:
    * payload bytes never leave the task, only (id, 8-byte hash,
    * 65-long envelope) flows downstream. The interleaved sample stream
    * is split into 65 contiguous frames on the integer grid (frame k =
    * samples [k·n/65, (k+1)·n/65), floor division — the same
    * deterministic point partitioning as dHash's downsample); frame
    * energy is the exact integer sum of squared samples; bit k is set
    * iff E[k] < E[k+1]. All-integer, so the DuckDB oracle recomputes
    * hash, Hamming and envelope-L1 arithmetically from
    * (doc_id, n_chars). */
  def audioFpFrame(spark: SparkSession, dir: String): Dataset[AudioFpRow] = {
    import spark.implicits._
    graft.sources.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
      .filter(col("doc_id") % 2 === 1)
      .as[(Long, Long)]
      .mapPartitions { rows =>
        rows.map { case (id, nChars) =>
          val sampleRate = (8000 + (nChars % 8) * 1000).toInt
          val channels = (1 + (nChars % 2)).toInt
          val nFrames = (nChars % 5000 + 100).toInt
          val pcm = Array.tabulate(nFrames * channels)(i =>
            ((i * 17 + id * 29) % 2001 - 1000).toShort)
          val wav = MediaCodec.encodeWavPcm16(sampleRate, channels, pcm)
          val samples = MediaCodec.wavSamples(wav).getOrElse(
            sys.error(s"wav decode failed for doc $id"))
          val en = audioEnvelopeOf(samples)
          AudioFpRow(id, envelopeBitsOf(en), en)
        }
      }
  }

  /** Per-clip video signature row: real-parse header fields (width/
    * height/fps/frame count/duration), a 64-bit temporal fingerprint
    * (sign bits over the 65-bin sampled-frame luminance envelope —
    * the video analogue of [[AudioFpRow]]'s energy gradient), and the
    * envelope itself for exact candidate re-verification. */
  final case class VideoRow(doc_id: Long, width: Int, height: Int,
      fps: Int, n_frames: Int, duration_ms: Long, vfp: Long,
      sums: Array[Long])

  /** Video probe + frame-sample over the fixture's doc_id%3==0 AVIs —
    * synthesis, REAL RIFF/AVI parse and SAMPLED-frame DIB decode all
    * inside ONE narrow mapPartitions: payload bytes never leave the
    * task, only (id, header ints, 8-byte hash, 65-long envelope)
    * flows downstream. The fixture clip is "same footage per
    * parameter class, one branded frame per doc": a luminance ramp
    * over (x, y, frame) shared by every doc with equal (w, h, F,
    * slope) classes, plus a +64 watermark on frame doc_id%F — the
    * realistic near-dup story (same clip, one corrupted/branded
    * frame) that makes fingerprints of same-class docs differ in at
    * most the watermark bins. Frame SAMPLING is the honest kind: the
    * movi chunk index ([[MediaCodec.aviFrameOffsets]]) seeks straight
    * to the 65 sampled frames (k·F/65 on the integer grid) and decodes
    * ONLY those — at 100 TB the decode cost is 65 frames per clip
    * regardless of clip length. Envelope bin k = the 72-point dHash
    * downsample grid sum of sampled frame k; bit k set iff
    * S(k) < S(k+1). All-integer, so the DuckDB oracle recomputes
    * header, envelope, hash, Hamming and L1 arithmetically from
    * (doc_id, n_chars). */
  def videoFrame(spark: SparkSession, dir: String): Dataset[VideoRow] = {
    import spark.implicits._
    graft.sources.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
      .filter(col("doc_id") % 3 === 0)
      .as[(Long, Long)]
      .mapPartitions { rows =>
        rows.map { case (id, nChars) =>
          val w = (nChars % 24 + 8).toInt
          val h = (nChars % 16 + 8).toInt
          val fps = (5 * (nChars % 4 + 1)).toInt
          val nF = (nChars % 16 + 65).toInt
          val slope = (nChars % 7 + 3).toInt
          val wmFrame = (id % nF).toInt
          val avi = MediaCodec.encodeAviDib(w, h, fps, nF, (x, y, f) =>
            (7 * x + 13 * y + f * slope +
              (if (f == wmFrame) 64 else 0)) % 256)
          val hdr = MediaCodec.aviInfo(avi).getOrElse(
            sys.error(s"avi header parse failed for doc $id"))
          val offs = MediaCodec.aviFrameOffsets(avi).getOrElse(
            sys.error(s"avi movi index failed for doc $id"))
          val sums = videoEnvelopeOf(avi, hdr.width, hdr.height, offs)
            .getOrElse(sys.error(s"avi frame decode failed for doc $id"))
          VideoRow(id, hdr.width, hdr.height, hdr.sampleRate, offs.length,
            hdr.durationMs, envelopeBitsOf(sums), sums)
        }
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
