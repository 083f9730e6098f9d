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
    })
}
