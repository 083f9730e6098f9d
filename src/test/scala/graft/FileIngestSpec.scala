package graft

import java.nio.file.Files
import graft.streaming.{FlowMetrics, IngestionFlows}
import graft.tables.TableStore
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/**
 * S13 — file-drop ingestion: the batch-upload path every large corpus
 * actually has next to its streaming one (crawl dumps land as parquet
 * files in a directory; the pipeline tails the directory). Spark's
 * file source tracks processed FILES in the checkpoint the way the
 * Kafka path tracks offsets, so the same `documentIngestFlow` runs
 * unmodified over file drops, with per-file exactly-once pickup and
 * restart-resume. Also exercises the `FlowMetrics` listener: every
 * micro-batch must land one telemetry row (flow, input rows, trigger
 * latency, state rows) in the queryable `flow_metrics` table.
 */
class FileIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val docSchema = new StructType()
    .add("doc_id", LongType).add("text", StringType)

  private def run(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    q.processAllAvailable(); q.stop()
  }

  test("S13: directory-tail ingestion picks up each dropped file exactly once; metrics land per batch") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-filedrop").toString
    val landing = Files.createTempDirectory("graft-landing").toString
    val ckpt = Files.createTempDirectory("graft-filedrop-ckpt").toString
    val store = new TableStore(spark, root)
    val flows = new IngestionFlows(spark, store, root,
      checkpointRoot = Some(ckpt))
    val metrics = FlowMetrics.attach(spark, store)

    def drop(name: String, rows: (Long, String)*): Unit =
      rows.toSeq.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$landing/$name")

    def ingestOnce(): Unit =
      run(flows.documentIngestFlow(
        spark.readStream.schema(docSchema)
          .parquet(s"$landing/*").select(col("doc_id"), col("text"))))

    try {
      // file 1: two distinct docs
      drop("f1", (11L, "alpha beta gamma delta epsilon zeta"),
        (12L, "unrelated text about broker offsets and checkpoints"))
      ingestOnce()
      assert(store.load("documents").count() === 2)

      // file 2 dropped AFTER the first run: a near-dup of 11 plus a
      // fresh doc; the restarted stream must process ONLY the new file
      // (file-tracking checkpoint), drop the near-dup, admit the rest
      drop("f2", (13L, "alpha beta gamma delta epsilon zeta"),
        (14L, "genuinely novel content nothing shares"))
      ingestOnce()
      val log = store.load("ingest_log").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(log(13L) === false, "near-dup of stored corpus must drop")
      assert(log(14L) === true)
      assert(store.load("documents").count() === 4) // 13 appended, flagged

      // restart with nothing new: no reprocessing, corpus unchanged
      val before = store.load("ingest_log").count()
      ingestOnce()
      assert(store.load("ingest_log").count() === before,
        "restart replayed already-processed files")

      // observability: each processed micro-batch landed one metrics
      // row for this flow with real progress numbers. The listener bus
      // delivers asynchronously — wait for the rows, don't race them.
      def flowRows() =
        if (!store.exists("flow_metrics")) Array.empty[org.apache.spark.sql.Row]
        else store.load("flow_metrics")
          .filter(col("flow") === "document_ingest").collect()
      def ingested() = flowRows().map(_.getAs[Long]("input_rows")).sum
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (ingested() < 4 && System.nanoTime() < deadline)
        Thread.sleep(200)
      val m = flowRows()
      assert(m.nonEmpty, "no telemetry rows for document_ingest")
      assert(ingested() >= 4, "metrics under-count the ingested rows")
      assert(m.forall(_.getAs[Long]("trigger_ms") >= 0))
      assert(metrics.failedWrites === 0)
    } finally {
      FlowMetrics.detach(spark, metrics)
      graft.tables.TempDirs.delete(root)
      graft.tables.TempDirs.delete(landing)
      graft.tables.TempDirs.delete(ckpt)
    }
  }

  test("S13 over JSONL drops: the common corpus-dump format rides the same flow") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-jsonl").toString
    val landing = Files.createTempDirectory("graft-jsonl-landing").toString
    val ckpt = Files.createTempDirectory("graft-jsonl-ckpt").toString
    val store = new TableStore(spark, root)
    val flows = new IngestionFlows(spark, store, root,
      checkpointRoot = Some(ckpt))

    // crawl dumps land as newline-delimited JSON; the file source only
    // changes format — schema is DECLARED (no inference pass over a
    // 100 TB landing zone), checkpointed file tracking is identical
    def dropJsonl(name: String, lines: String*): Unit = {
      val dir = Files.createDirectories(
        java.nio.file.Paths.get(landing, name))
      Files.write(dir.resolve("part-0.jsonl"),
        lines.mkString("\n").getBytes("UTF-8"))
      ()
    }
    def ingestOnce(): Unit =
      run(flows.documentIngestFlow(
        spark.readStream.schema(docSchema)
          .json(s"$landing/*").select(col("doc_id"), col("text"))))

    try {
      dropJsonl("j1",
        """{"doc_id": 21, "text": "first jsonl document body here"}""",
        """{"doc_id": 22, "text": "second jsonl document, different"}""")
      ingestOnce()
      assert(store.load("documents").count() === 2)
      // second drop: exact near-dup of 21 drops, novel doc admits
      dropJsonl("j2",
        """{"doc_id": 23, "text": "first jsonl document body here"}""",
        """{"doc_id": 24, "text": "completely new material appears"}""")
      ingestOnce()
      val log = store.load("ingest_log").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(log(23L) === false && log(24L) === true)
      // replay: file-tracking checkpoint skips both processed files
      val before = store.load("ingest_log").count()
      ingestOnce()
      assert(store.load("ingest_log").count() === before)
    } finally {
      graft.tables.TempDirs.delete(root)
      graft.tables.TempDirs.delete(landing)
      graft.tables.TempDirs.delete(ckpt)
    }
  }
}
