package graft.operators

import graft.Query
import graft.multimodal.MediaPipeline
import org.apache.spark.sql.functions._

/**
 * Multimodal pipeline queries. x12 drives the real mapPartitions
 * pipeline and checks the parts an oracle CAN see (ids, kinds, byte
 * sizes survive the decode stage intact); x13 exposes the stubbed
 * feature vectors (rows-only check + MediaSpec determinism tests).
 */
object MediaQueries {

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

    Query.unchecked("x13_media_features") {
      (s, d) =>
        MediaPipeline.featureFrame(s, d).orderBy("media_id")
    })
}
