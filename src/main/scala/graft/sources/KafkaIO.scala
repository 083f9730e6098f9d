package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/**
 * Kafka source/sink bindings (SURVEY O1/O3/O4). Thin, config-complete
 * wrappers over Spark's Kafka connector; the connector jar
 * (spark-sql-kafka-0-10) ships with any real Spark distribution but is
 * absent from this offline test image, so these paths are exercised in
 * deployment, not in the local suite — MemoryStream drives the same
 * flow code in tests (FlowsSpec).
 *
 * Semantics mapping:
 *  - O4 at-least-once manual-commit consumption → checkpointed offsets
 *    (exactly-once with the flows' idempotent MERGEs).
 *  - the reference's one-in-flight-message backpressure
 *    (inventario/main.go:50,58) → maxOffsetsPerTrigger.
 *  - O1's transactional outbox (every table write also publishes its
 *    post-image) → call `publish` inside the same foreachBatch that
 *    merges the table.
 */
object KafkaIO {

  /** O4 — subscribe a streaming reader to topics. Value arrives as the
    * connector's raw bytes; CdcCodec handles the string-quoted JSON. */
  def readTopics(spark: SparkSession, bootstrap: String, topics: Seq[String],
      maxOffsetsPerTrigger: Option[Long] = None): DataFrame = {
    val base = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topics.mkString(","))
      .option("startingOffsets", "earliest")
      .option("failOnDataLoss", "false")
    maxOffsetsPerTrigger.foreach(n => base.option("maxOffsetsPerTrigger", n))
    base.load()
      .select(col("topic"), col("partition"), col("offset"),
        col("key").cast("string").as("key"),
        col("value").cast("string").as("value"))
  }

  /** O24 — content-based routing: one subscription, per-topic branches. */
  def route(stream: DataFrame, topic: String): DataFrame =
    stream.filter(col("topic") === topic)

  /** O3 — batch publish of (key, value) rows to a topic. */
  def publish(df: DataFrame, bootstrap: String, topic: String): Unit =
    df.select(col("key").cast("string"), col("value").cast("string"))
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .save()

  /** O1-style streaming sink: post-image stream → topic. */
  def sink(df: DataFrame, bootstrap: String, topic: String,
      checkpoint: String): DataStreamWriter[Row] =
    df.select(col("key").cast("string"), col("value").cast("string"))
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
}
