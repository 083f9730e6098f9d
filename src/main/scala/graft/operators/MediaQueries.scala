package graft.operators

import graft.Query
import graft.multimodal.MediaPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal pipeline queries. x12 drives the real mapPartitions
 * pipeline and checks the parts an oracle CAN see (ids, kinds, byte
 * sizes survive the decode stage intact); x13 checks the full feature
 * pipeline — byte stats, frame sampling and an md5 digest of the
 * feature vector itself. The stubbed "decode" is integer-exact
 * (bucket sums of bytes, dyadic 1/256 scale — MediaPipeline), so the
 * DuckDB oracle reproduces every feature bit from the text bytes:
 * the payload IS the UTF-8 text, and the fixture is pure ASCII, so
 * `ascii(substr(text, i+1, 1))` is byte i.
 */
object MediaQueries {

  private val Dim = 16

  /** Bucket-j byte sum as DuckDB SQL (0-based byte index i, bucket
    * j = i mod Dim) — the oracle-side replica of decodeStub. */
  private def bucketSql(j: Int): String =
    "CAST(COALESCE(list_sum(list_transform(" +
      s"list_filter(range(nb), i -> i % $Dim = $j), " +
      "i -> bytes[CAST(i + 1 AS INT)])), 0) AS BIGINT)"

  val all: Seq[Query] = Seq(

    Query("x12_media_meta",
      "SELECT doc_id AS media_id, CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' " +
        "WHEN 1 THEN 'audio' ELSE 'video' END AS kind, " +
        "CAST(strlen(text) AS BIGINT) AS n_bytes " + // strlen = byte length in DuckDB
        "FROM documents ORDER BY media_id") {
      (s, d) =>
        MediaPipeline.featureFrame(s, d)
          .select(col("media_id"), col("kind"), col("n_bytes"))
          .orderBy("media_id")
    },

    Query("x13_media_features",
      "WITH bl AS (SELECT doc_id, strlen(text) AS nb, " +
        "list_transform(range(strlen(text)), " +
        "i -> ascii(substr(text, CAST(i + 1 AS INT), 1))) AS bytes FROM documents) " +
        "SELECT doc_id AS media_id, " +
        "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' " +
        "ELSE 'video' END AS kind, " +
        "CAST(nb AS BIGINT) AS n_bytes, " +
        "CAST(list_sum(bytes) AS DOUBLE) / nb AS byte_mean, " +
        "CAST(CASE WHEN doc_id % 3 = 2 THEN (nb + 63) // 64 ELSE 0 END AS INT) " +
        "AS frames_sampled, " +
        "md5(concat_ws(',', " +
        (0 until Dim).map(bucketSql).mkString(", ") +
        ")) AS feature_digest FROM bl ORDER BY media_id") {
      (s, d) =>
        // feature values are exact dyadic rationals (sum/256), so
        // * 256 recovers the integer bucket sums losslessly — the
        // digest is over integers, immune to float formatting.
        val sums = (0 until Dim).map(j =>
          (element_at(col("feature"), j + 1).cast("double") * 256)
            .cast("bigint").cast("string"))
        MediaPipeline.featureFrame(s, d)
          .select(col("media_id"), col("kind"), col("n_bytes"),
            col("byte_mean"), col("frames_sampled"),
            md5(concat_ws(",", sums: _*)).as("feature_digest"))
          .orderBy("media_id")
    },

    // Real-codec round trip: Spark synthesizes GENUINE PNG / PCM16-WAV
    // bytes per document, then parses them back with the real byte-
    // level parsers (MediaCodec: IHDR / SOF-walk / RIFF-walk) and a
    // real raster decode (javax.imageio). The oracle recomputes every
    // field arithmetically from (doc_id, n_chars) — a hash match
    // proves the encode→sniff→header-parse→full-decode chain is
    // faithful on real container bytes, not a fake. content_sum is the
    // decoded pixel-luminance sum (PNG is lossless; gray g decodes to
    // luminance g exactly) resp. the PCM16 sample sum.
    Query("x59_media_roundtrip",
      "SELECT doc_id, " +
        "CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'wav' END AS format, " +
        "CAST(CASE WHEN doc_id % 2 = 0 THEN n_chars % 48 + 4 ELSE 0 END AS INT) AS width, " +
        "CAST(CASE WHEN doc_id % 2 = 0 THEN n_chars % 32 + 4 ELSE 0 END AS INT) AS height, " +
        "CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 1 + n_chars % 2 END AS INT) AS channels, " +
        "CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 8000 + (n_chars % 8) * 1000 END AS INT) AS sample_rate, " +
        "CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE " +
        "((n_chars % 5000 + 100) * 1000) // (8000 + (n_chars % 8) * 1000) " +
        "END AS BIGINT) AS duration_ms, " +
        "CAST(CASE WHEN doc_id % 2 = 0 THEN " +
        "list_sum(list_transform(range((n_chars % 48 + 4) * (n_chars % 32 + 4)), " +
        "k -> ((k % (n_chars % 48 + 4)) * 7 + (k // (n_chars % 48 + 4)) * 13 " +
        "+ doc_id * 31) % 256)) " +
        "ELSE " +
        "list_sum(list_transform(range((n_chars % 5000 + 100) * (1 + n_chars % 2)), " +
        "i -> (i * 17 + doc_id * 29) % 2001 - 1000)) " +
        "END AS BIGINT) AS content_sum " +
        "FROM documents ORDER BY doc_id") {
      (s, d) =>
        MediaPipeline.roundTripFrame(s, d).toDF().orderBy("doc_id")
    },

    // Perceptual image near-dup — the one dedup modality the corpus
    // lacked a query for: 64-bit dHash over the REAL decoded rasters
    // ([[MediaPipeline.dhashFrame]]; encode→imageio-decode→luminance
    // →9×8 point downsample→gradient signs, all in one narrow
    // mapPartitions), pairs at Hamming ≤ 2 via the x25 quotient
    // technique lifted to 64 bits (present hashes × 2081 ≤2-bit XOR
    // masks, semi-joined to present, broadcast into two equi-joins —
    // never all-pairs), and every candidate re-VERIFIED with the
    // exact L1 raster distance on the downsampled grids (carried from
    // the decode, so verification re-decodes nothing). Above
    // [[dhashQuotientMax]] present hashes the quotient table stops
    // being broadcastable and pair generation falls back to a
    // 3-band (22+21+21-bit) pigeonhole equi-join — any pair within
    // Hamming ≤ 2 leaves some band untouched, so recall stays exact
    // (DHashSpec pins path equivalence). Oracle: the fixture PNGs are
    // deterministic in (doc_id, n_chars) and PNG decode is lossless
    // (proved by x59), so grid, hash, Hamming and L1 all recompute
    // arithmetically in SQL.
    Query("x98_image_dhash",
      "WITH img AS (SELECT doc_id, n_chars % 48 + 4 AS w, " +
        "n_chars % 32 + 4 AS h FROM documents WHERE doc_id % 2 = 0), " +
        "g AS (SELECT doc_id, list_transform(range(72), k -> " +
        "(7 * (((k % 9) * w) // 9) + 13 * (((k // 9) * h) // 8) " +
        "+ 31 * doc_id) % 256) AS grid FROM img), " +
        "fp AS (SELECT doc_id, grid, list_transform(range(64), k -> " +
        "CASE WHEN grid[CAST((k // 8) * 9 + (k % 8) + 1 AS INT)] < " +
        "grid[CAST((k // 8) * 9 + (k % 8) + 2 AS INT)] THEN 1 ELSE 0 END) " +
        "AS bits FROM g), " +
        "p AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, " +
        "CAST(list_sum(list_transform(range(64), k -> " +
        "CASE WHEN x.bits[CAST(k + 1 AS INT)] <> " +
        "y.bits[CAST(k + 1 AS INT)] THEN 1 ELSE 0 END)) AS INT) " +
        "AS hamming, " +
        "CAST(list_sum(list_transform(range(72), k -> " +
        "abs(x.grid[CAST(k + 1 AS INT)] - y.grid[CAST(k + 1 AS INT)]))) " +
        "AS BIGINT) AS l1 " +
        "FROM fp x JOIN fp y ON x.doc_id < y.doc_id) " +
        "SELECT doc_a, doc_b, hamming, l1 FROM p WHERE hamming <= 2 " +
        "ORDER BY doc_a, doc_b") {
      (s, d) => dhashPairs(s, d)
    },

    // Lossy-decode (JPEG) dHash robustness — real crawls are mostly
    // JPEG, so the near-dup fingerprint must survive a LOSSY round
    // trip, not just x98's lossless PNGs. Per qualifying raster
    // (downsample step ≥ 2 px — below that adjacent grid cells sample
    // the same pixel and codec noise flips the 0-gradient comparison
    // arbitrarily) the engine encodes the SAME raster as PNG and as
    // JPEG (JDK encoder, byte-deterministic — x59 precedent), decodes
    // both through imageio, hashes both through the shared dHash
    // definitions, and reports the PNG hash (split hi/lo — the full
    // 64-bit value overflows signed SQL arithmetic at bit 63) plus a
    // within-budget verdict on the lossy drift. Oracle: the PNG side
    // recomputes arithmetically (the x98 recompute); within_budget is
    // the oracle-ASSERTED tripwire — the engine computes the real
    // JPEG-decode Hamming distance, so any JDK codec behavior change
    // or decode-path regression flips the boolean and fails the hash
    // match. Measured drift: avg ≈ 1.2 bits; max 9 at sf0.01, 11 at
    // sf0.1 (ringing at the synthetic rasters' mod-256 wrap edges —
    // harsher than photographic content); budget pinned at 16 — tail
    // headroom above the observed worst case while a broken decode
    // path (effectively random bits) would read ≈ 32. JpegDHashSpec
    // pins the distribution and byte-determinism. NOTE the honest
    // finding: lossy recompression shifts dHash beyond the ≤2 pair
    // threshold on ~10% of these rasters, so a production crawl
    // dedups JPEGs against JPEG-decoded fingerprints (one signature
    // space), not against a lossless-side hash.
    Query("x116_jpeg_dhash",
      "WITH img AS (SELECT doc_id, n_chars % 48 + 4 AS w, " +
        "n_chars % 32 + 4 AS h FROM documents WHERE doc_id % 2 = 0 " +
        "AND n_chars % 48 >= 14 AND n_chars % 32 >= 12), " +
        "g AS (SELECT doc_id, list_transform(range(72), k -> " +
        "(7 * (((k % 9) * w) // 9) + 13 * (((k // 9) * h) // 8) " +
        "+ 31 * doc_id) % 256) AS grid FROM img), " +
        "fp AS (SELECT doc_id, list_transform(range(64), k -> " +
        "CASE WHEN grid[CAST((k // 8) * 9 + (k % 8) + 1 AS INT)] < " +
        "grid[CAST((k // 8) * 9 + (k % 8) + 2 AS INT)] THEN 1 ELSE 0 END) " +
        "AS bits FROM g) " +
        "SELECT doc_id, " +
        "CAST(list_sum(list_transform(range(32), k -> " +
        "CAST(bits[CAST(k + 33 AS INT)] AS BIGINT) * " +
        "(CAST(1 AS BIGINT) << CAST(k AS INT)))) AS BIGINT) AS dhash_hi, " +
        "CAST(list_sum(list_transform(range(32), k -> " +
        "CAST(bits[CAST(k + 1 AS INT)] AS BIGINT) * " +
        "(CAST(1 AS BIGINT) << CAST(k AS INT)))) AS BIGINT) AS dhash_lo, " +
        "TRUE AS within_budget FROM fp ORDER BY doc_id") {
      (s, d) =>
        MediaPipeline.jpegDhashFrame(s, d).toDF()
          .select(col("doc_id"),
            shiftrightunsigned(col("dhash"), 32).as("dhash_hi"),
            col("dhash").bitwiseAND(lit(0xffffffffL)).as("dhash_lo"),
            (col("jpeg_hamming") <= 16).as("within_budget"))
          .orderBy("doc_id")
    },

    // Acoustic near-dup — x98's sibling for the audio modality, closing
    // the dedup matrix (text exact/near, image, audio): a 64-bit
    // energy-gradient fingerprint over REAL decoded PCM (encode→RIFF
    // parse→PCM16 decode→65-frame integer energy envelope→sign bits,
    // all in one narrow mapPartitions — MediaPipeline.audioFpFrame),
    // pairs at Hamming ≤ 2 through the same quotient/banded engine as
    // x98 (hamming64Pairs), candidates re-VERIFIED with the exact L1
    // distance on the carried energy envelopes. Oracle: the fixture
    // WAVs are deterministic in (doc_id, n_chars) and PCM16 decode is
    // exact (proved by x59), so envelope, hash, Hamming and L1 all
    // recompute arithmetically in SQL.
    Query("x110_audio_fingerprint",
      "WITH aud AS (SELECT doc_id, " +
        "(n_chars % 5000 + 100) * (1 + n_chars % 2) AS n " +
        "FROM documents WHERE doc_id % 2 = 1), " +
        "e AS (SELECT doc_id, list_transform(range(65), k -> " +
        "CAST(COALESCE(list_sum(list_transform(range((k*n)//65, ((k+1)*n)//65), " +
        "i -> CAST((i*17 + doc_id*29) % 2001 - 1000 AS BIGINT) " +
        "* CAST((i*17 + doc_id*29) % 2001 - 1000 AS BIGINT))), 0) AS BIGINT)) AS en " +
        "FROM aud), " +
        "fp AS (SELECT doc_id, en, list_transform(range(64), k -> " +
        "CASE WHEN en[CAST(k+1 AS INT)] < en[CAST(k+2 AS INT)] " +
        "THEN 1 ELSE 0 END) AS bits FROM e), " +
        "p AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, " +
        "CAST(list_sum(list_transform(range(64), k -> " +
        "CASE WHEN x.bits[CAST(k+1 AS INT)] <> y.bits[CAST(k+1 AS INT)] " +
        "THEN 1 ELSE 0 END)) AS INT) AS hamming, " +
        "CAST(list_sum(list_transform(range(65), k -> " +
        "abs(x.en[CAST(k+1 AS INT)] - y.en[CAST(k+1 AS INT)]))) AS BIGINT) AS l1 " +
        "FROM fp x JOIN fp y ON x.doc_id < y.doc_id) " +
        "SELECT doc_a, doc_b, hamming, l1 FROM p WHERE hamming <= 2 " +
        "ORDER BY doc_a, doc_b") {
      (s, d) => audioFpPairs(s, d)
    },

    // Video probe + frame-sample — the header-then-sample pass a
    // 100 TB video pipeline runs first: REAL RIFF/AVI container parse
    // (LIST hdrl → avih/strh/strf walk, movi chunk index) over
    // genuine uncompressed-DIB AVIs synthesized per doc, then DECODE
    // ONLY the 65 sampled frames (seek via the chunk index — cost per
    // clip is bounded by the sample count, not clip length). Reported
    // header fields come from the STREAM header (dwRate/dwScale/
    // dwLength — exact where avih's microSecPerFrame is rounded);
    // content_sum is the sampled-frame luminance envelope total over
    // the 72-point downsample grid. Oracle: fixture AVIs are
    // deterministic in (doc_id, n_chars) and DIB is uncompressed, so
    // every field recomputes arithmetically in SQL — a hash match
    // proves the writer, the chunk walk, the bottom-up stride decode
    // and the frame sampler all agree.
    Query("x112_video_probe",
      "WITH vid AS (SELECT doc_id, n_chars % 24 + 8 AS w, " +
        "n_chars % 16 + 8 AS h, 5 * (n_chars % 4 + 1) AS fps, " +
        "n_chars % 16 + 65 AS F, n_chars % 7 + 3 AS slope " +
        "FROM documents WHERE doc_id % 3 = 0) " +
        "SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height, " +
        "CAST(fps AS INT) AS fps, CAST(F AS INT) AS n_frames, " +
        "CAST((F * 1000) // fps AS BIGINT) AS duration_ms, " +
        "CAST(list_sum(list_transform(range(65), k -> " +
        "list_sum(list_transform(range(72), p -> " +
        "(7 * (((p % 9) * w) // 9) + 13 * (((p // 9) * h) // 8) " +
        "+ ((k * F) // 65) * slope " +
        "+ CASE WHEN (k * F) // 65 = doc_id % F THEN 64 ELSE 0 END) " +
        "% 256)))) AS BIGINT) AS content_sum " +
        "FROM vid ORDER BY doc_id") {
      (s, d) =>
        MediaPipeline.videoFrame(s, d).toDF()
          .select(col("doc_id"), col("width"), col("height"), col("fps"),
            col("n_frames"), col("duration_ms"),
            aggregate(col("sums"), lit(0L), (acc, x) => acc + x)
              .as("content_sum"))
          .orderBy("doc_id")
    },

    // Video temporal near-dup — the third modality through the shared
    // 64-bit engine (x98 image, x110 audio, x113 video): fingerprint =
    // sign bits over the 65-bin sampled-frame luminance envelope, so
    // same-class clips ("same footage, one branded frame" — the
    // fixture's watermark story) differ in at most the watermark bins
    // and land within Hamming ≤ 2; candidates re-verify with the
    // exact envelope L1. Pair generation is hamming64Pairs: quotient
    // neighbor table under the saturation guard, 3-band pigeonhole
    // fallback above it, identical results (VideoSpec).
    Query("x113_video_fingerprint",
      "WITH vid AS (SELECT doc_id, n_chars % 24 + 8 AS w, " +
        "n_chars % 16 + 8 AS h, n_chars % 16 + 65 AS F, " +
        "n_chars % 7 + 3 AS slope " +
        "FROM documents WHERE doc_id % 3 = 0), " +
        "e AS (SELECT doc_id, list_transform(range(65), k -> " +
        "CAST(list_sum(list_transform(range(72), p -> " +
        "(7 * (((p % 9) * w) // 9) + 13 * (((p // 9) * h) // 8) " +
        "+ ((k * F) // 65) * slope " +
        "+ CASE WHEN (k * F) // 65 = doc_id % F THEN 64 ELSE 0 END) " +
        "% 256)) AS BIGINT)) AS en FROM vid), " +
        "fp AS (SELECT doc_id, en, list_transform(range(64), k -> " +
        "CASE WHEN en[CAST(k+1 AS INT)] < en[CAST(k+2 AS INT)] " +
        "THEN 1 ELSE 0 END) AS bits FROM e), " +
        "p AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, " +
        "CAST(list_sum(list_transform(range(64), k -> " +
        "CASE WHEN x.bits[CAST(k+1 AS INT)] <> y.bits[CAST(k+1 AS INT)] " +
        "THEN 1 ELSE 0 END)) AS INT) AS hamming, " +
        "CAST(list_sum(list_transform(range(65), k -> " +
        "abs(x.en[CAST(k+1 AS INT)] - y.en[CAST(k+1 AS INT)]))) AS BIGINT) AS l1 " +
        "FROM fp x JOIN fp y ON x.doc_id < y.doc_id) " +
        "SELECT doc_a, doc_b, hamming, l1 FROM p WHERE hamming <= 2 " +
        "ORDER BY doc_a, doc_b") {
      (s, d) => videoFpPairs(s, d)
    })

  // guard statistic cached once per corpus version (x25's lifecycle);
  // keyed per (corpus, signature kind) — image dHash and audio
  // fingerprints guard independently.
  private val presentFpCache = new java.util.concurrent.ConcurrentHashMap[
    String, StoredIndexes.Cached[java.lang.Long]]()

  /** Past this many present 64-bit hashes the ≤2-bit quotient
    * neighbor table (present × 2081 rows) outgrows a sane broadcast
    * and the banded path takes over. */
  private val dhashQuotientMax = 1L << 11

  // the 2081-mask quotient alphabet and the 22+21+21 band layout live
  // in ONE place ([[Hamming64]]) — this engine, the text engine and
  // the ingest gates are spec-pinned bit-identical on them

  private[graft] def dhashPairs(s: SparkSession, d: String,
      maxQuotientFps: Long = dhashQuotientMax): DataFrame =
    hamming64Pairs(s, d,
      MediaPipeline.dhashFrame(s, d).toDF()
        .withColumnRenamed("dhash", "fp")
        .withColumnRenamed("grid", "vec"),
      tag = "dhash", maxQuotientFps)

  private[graft] def videoFpPairs(s: SparkSession, d: String,
      maxQuotientFps: Long = dhashQuotientMax): DataFrame =
    hamming64Pairs(s, d,
      MediaPipeline.videoFrame(s, d).toDF()
        .select(col("doc_id"), col("vfp").as("fp"), col("sums").as("vec")),
      tag = "videofp", maxQuotientFps)

  private[graft] def audioFpPairs(s: SparkSession, d: String,
      maxQuotientFps: Long = dhashQuotientMax): DataFrame =
    hamming64Pairs(s, d,
      MediaPipeline.audioFpFrame(s, d).toDF()
        .withColumnRenamed("afp", "fp")
        .withColumnRenamed("energies", "vec"),
      tag = "audiofp", maxQuotientFps)

  /** Shared 64-bit perceptual near-dup pair engine (image dHash and
    * audio fingerprints differ only in how the signature frame is
    * produced): pairs at Hamming ≤ 2 via the x25 quotient technique
    * lifted to 64 bits, with a 3-band pigeonhole fallback once the
    * present-hash population outgrows the broadcastable neighbor
    * table; every candidate re-verified with the exact L1 distance on
    * the carried signature vector. `sigs` must expose
    * (doc_id, fp: long, vec: array<integral>). */
  private def hamming64Pairs(s: SparkSession, d: String, sigs: DataFrame,
      tag: String, maxQuotientFps: Long): DataFrame = {
    // the explicit exchange is the decode-once seam: every downstream
    // reference (present/nbr derivation, both self-join sides) hangs
    // off the SAME repartition, so ReuseExchange materializes the
    // encode→decode→hash scan once and the other references read the
    // shuffle files (builders never persist — Bench hygiene — and the
    // shuffled rows are ~300 bytes/item, not the payloads). Without
    // it each reference re-decoded every payload (x7's lesson applied
    // to a mapPartitions pipeline, which has no natural exchange).
    val fps = sigs.repartition(col("doc_id"))
    val present = fps.select(col("fp")).distinct()
    val nPresent: Long = StoredIndexes.versionedValue(presentFpCache, d,
      "documents.parquet", s"graft-$tag-present",
      cacheKey = s"$d#$tag") { present.count() }
    val cand =
      if (nPresent <= maxQuotientFps) {
        val maskArr = array(Hamming64.masks2.map(m =>
          struct(lit(m).as("m"),
            lit(java.lang.Long.bitCount(m)).as("h"))).toIndexedSeq: _*)
        val nbr = present.select(col("fp").as("fa"),
            explode(maskArr).as("mk"))
          .select(col("fa"), col("fa").bitwiseXOR(col("mk.m")).as("fb"),
            col("mk.h").as("hamming"))
          .join(present.select(col("fp").as("fb")), Seq("fb"),
            "left_semi")
        fps.as("x")
          .join(broadcast(nbr), col("x.fp") === col("fa"))
          .join(fps.as("y"),
            col("y.fp") === col("fb") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
            col("hamming").cast("int").as("hamming"),
            col("x.vec").as("ga"), col("y.vec").as("gb"))
      } else {
        val bands = fps.select(col("doc_id"), col("fp"), col("vec"),
          explode(array((0 until 3).map(i =>
            struct(lit(i).as("i"),
              shiftright(col("fp"), Hamming64.BandOffs(i))
                .bitwiseAND(lit(Hamming64.BandMasks(i))).as("bv")))
            .toIndexedSeq: _*)).as("band"))
          .select(col("doc_id"), col("fp"), col("vec"),
            col("band.i").as("i"), col("band.bv").as("bv"))
        bands.as("x")
          .join(bands.as("y"),
            col("x.i") === col("y.i") && col("x.bv") === col("y.bv") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
            bit_count(col("x.fp").bitwiseXOR(col("y.fp")))
              .cast("int").as("hamming"),
            col("x.vec").as("ga"), col("y.vec").as("gb"))
          .filter(col("hamming") <= 2)
          .dropDuplicates("doc_a", "doc_b")
      }
    cand
      .select(col("doc_a"), col("doc_b"), col("hamming"),
        aggregate(zip_with(col("ga"), col("gb"),
          (a, b) => abs(a - b)), lit(0L), (acc, x) => acc + x).as("l1"))
      .orderBy("doc_a", "doc_b")
  }
}
