package graft.operators

import graft.Query
import graft.multimodal.MediaPipeline
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
    })
}
