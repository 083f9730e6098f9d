package graft

import java.nio.file.Files
import graft.streaming.PackingFlow
import graft.tables.TableStore
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S19 — pack-on-ingest: the per-shard offset survives batches AND
  * restarts, the streamed manifest equals the batch (x100-shape)
  * manifest over the same arrival order, and replays append nothing. */
class PackingFlowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("offsets continue across batches and restarts; replay is a no-op; windows tile") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val root = Files.createTempDirectory("graft-packflow").toString
      val store = new TableStore(spark, root)
      val ms = MemoryStream[(Long, String, String)]
      def df = ms.toDS().toDF("doc_id", "lang", "text")
      def run(): Unit = {
        val q = PackingFlow.flow(store, df, w = 10,
          checkpointRoot = Some(root))
        q.processAllAvailable(); q.stop()
      }
      def manifest(): Seq[(String, Long, Long, Long, Long)] =
        store.load("packing_manifest").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).toSeq.sorted

      // batch 1: en gets 7 + 8 tokens (doc 2 straddles window 0→1),
      // es gets 4
      ms.addData(
        (1L, "en", "a b c d e f g"),
        (2L, "en", "h i j k l m n o"),
        (10L, "es", "uno dos tres cuatro"))
      run()
      assert(manifest() === Seq(
        ("en", 0L, 1L, 0L, 7L), // doc1 fills tokens 0-6 of window 0
        ("en", 0L, 2L, 0L, 3L), // doc2 tokens 0-2 complete window 0
        ("en", 1L, 2L, 3L, 8L), // doc2 tokens 3-7 open window 1
        ("es", 0L, 10L, 0L, 4L)).sorted)

      // batch 2 AFTER RESTART: en offset must resume at 15 (window 1
      // has 5 of 10 tokens) — doc 3's 6 tokens split 5/1
      ms.addData((3L, "en", "p q r s t u"))
      run()
      assert(manifest().filter(_._3 == 3L) === Seq(
        ("en", 1L, 3L, 0L, 5L),
        ("en", 2L, 3L, 5L, 6L)).sorted,
        "offset state did not survive the restart")

      // source-level redelivery of doc 3 in a LATER batch: the
      // operator's TTL dedup map must drop it BEFORE the offset moves
      // (an anti-join-only dedup would silently advance the offset and
      // leave a permanent hole in the tiling — the review scenario)
      val before = store.load("packing_manifest").count()
      ms.addData((3L, "en", "p q r s t u"))
      run()
      assert(store.load("packing_manifest").count() === before)
      // ...and the NEXT doc must continue at the UN-advanced offset:
      // en has 21 tokens packed, so doc 4's 3 tokens are window 2
      // tokens [21,24) — contiguous with doc 3's single token at 20
      ms.addData((4L, "en", "v w x"))
      run()
      assert(manifest().filter(_._3 == 4L) ===
        Seq(("en", 2L, 4L, 0L, 3L)),
        "redelivered duplicate advanced the offset — tiling hole")

      // tiling invariant on the full manifest: per (lang, window)
      // token sums are exactly w except each shard's open last window
      val m = manifest()
      val perWin = m.groupBy(s => (s._1, s._2)).view
        .mapValues(_.map(s => s._5 - s._4).sum).toMap
      val lastWin = m.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      perWin.foreach { case ((lang, wd), tok) =>
        if (wd < lastWin(lang)) assert(tok === 10L)
        else assert(tok >= 1 && tok <= 10)
      }
      graft.tables.TempDirs.delete(root)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf
          .set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf
          .unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("dedup horizon: within-horizon duplicates drop; beyond-horizon ones evict and re-pack (the documented trade)") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val root = Files.createTempDirectory("graft-packhzn").toString
      val store = new TableStore(spark, root)
      val ms = MemoryStream[(Long, String, String)]
      def run(): Unit = {
        val q = PackingFlow.flow(store, ms.toDS().toDF("doc_id", "lang", "text"),
          w = 10, checkpointRoot = Some(root), horizonTokens = 8L)
        q.processAllAvailable(); q.stop()
      }
      def rowsFor(id: Long) = store.load("packing_manifest")
        .filter(col("doc_id") === id).count()
      ms.addData((1L, "en", "a b c")) // offset 0→3; packed@0
      run()
      // duplicate while offset-0 is within 8 tokens of cur=3: dropped
      ms.addData((1L, "en", "a b c"))
      run()
      assert(rowsFor(1L) === 1L)
      // push the offset 9 tokens past doc 1's pack position → evicted
      ms.addData((2L, "en", "d e f g h i j k l"))
      run()
      // beyond-horizon duplicate re-packs at the NEW offset (the
      // documented horizon trade; appendUnique keys on
      // (doc_id, window_id), and doc 1 re-packs into window 1 ≠ 0)
      ms.addData((1L, "en", "a b c"))
      run()
      assert(rowsFor(1L) === 2L,
        "beyond-horizon duplicate should have re-packed")
      graft.tables.TempDirs.delete(root)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf
          .set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf
          .unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("trainer handoff: tailing the manifest via changesBetween reconstructs the x100 batch manifest") {
    // the consumer-side proof for S19: a training job that bootstraps
    // from the current manifest version and then reads ONLY version
    // deltas (changesBetween — O(change) on the append-only chain)
    // ends holding exactly the manifest x100's batch form computes
    // over the same corpus prefix. Parity precondition: arrival order
    // = doc_id order (x100 packs by doc_id; the stream packs by
    // arrival — a production loader's append order IS its pack order).
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
    val root = Files.createTempDirectory("graft-packparity").toString
    val store = new TableStore(spark, root)
    val ms = MemoryStream[(Long, String, String)]
    def df = ms.toDS().toDF("doc_id", "lang", "text")
    val docs = Seq(
      (1L, "en", "a b c d e f g"),
      (2L, "en", "h i j k l m n o"),
      (3L, "es", "uno dos tres cuatro"),
      (4L, "en", "p q r s t u"),
      (5L, "es", "cinco seis siete ocho nueve diez once doce"),
      (6L, "en", "v w x"))
    val batches = Seq(docs.take(2), docs.slice(2, 4), docs.drop(4))
    type Span = (String, Long, Long, Long, Long)
    def spansOf(d: org.apache.spark.sql.DataFrame): Seq[Span] =
      d.select("lang", "window_id", "doc_id", "start_tok", "end_tok")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
    val tailed = scala.collection.mutable.ArrayBuffer[Span]()
    var lastV = -1
    batches.foreach { b =>
      ms.addData(b: _*)
      val q = PackingFlow.flow(store, df, w = 10,
        checkpointRoot = Some(root))
      q.processAllAvailable(); q.stop()
      val v = store.version("packing_manifest")
      val delta =
        if (lastV < 0) store.loadVersion("packing_manifest", v)
        else store.changesBetween("packing_manifest", lastV, v,
          Seq("doc_id", "window_id"))
      if (lastV >= 0) {
        // incremental reads are pure inserts on the append-only chain
        val ops = delta.select("_op").distinct()
          .collect().map(_.getString(0)).toSeq
        assert(ops.forall(_ == "insert"), s"non-insert delta: $ops")
      }
      val newSpans = spansOf(delta)
      // delta-only: nothing the consumer already holds is re-delivered
      assert(newSpans.toSet.intersect(tailed.toSet).isEmpty,
        "changesBetween re-delivered already-consumed spans")
      tailed ++= newSpans
      lastV = v
    }
    // the tailed accumulation IS the manifest...
    assert(tailed.sorted.toSeq ===
      spansOf(store.load("packing_manifest")).sorted)
    // ...and the manifest IS x100's batch answer over the same corpus:
    // write the same docs as a documents table and run the DECLARED
    // batch query on it
    val dir = graft.tables.TempDirs.scratch("graft-packparity-corpus")
    docs.toDF("doc_id", "lang", "text")
      .write.parquet(s"$dir/documents.parquet")
    // x100's declared form uses W=256; recompute its shape at w=10 via
    // the same code path the flow's spans must match — the public
    // query runs at the production W, so parity here replays the x100
    // expression chain at the test window width
    val batch = {
      import org.apache.spark.sql.expressions.Window
      val t = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("lang"),
          size(graft.functions.TextFns.tokens(col("text")))
            .cast("long").as("n"))
        .filter(col("n") > 0)
      val shard = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      t.withColumn("off", coalesce(sum(col("n")).over(shard), lit(0L)))
        .withColumn("window_id", explode(sequence(
          floor(col("off") / 10).cast("long"),
          floor((col("off") + col("n") - 1) / 10).cast("long"))))
        .select(col("lang"), col("window_id"), col("doc_id"),
          greatest(lit(0L), col("window_id") * 10 - col("off"))
            .as("start_tok"),
          least(col("n"), (col("window_id") + 1) * 10 - col("off"))
            .as("end_tok"))
    }
    assert(tailed.sorted.toSeq === spansOf(batch).sorted,
      "streamed manifest diverges from the x100 batch manifest")
    graft.tables.TempDirs.delete(dir)
    graft.tables.TempDirs.delete(root)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf
          .set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf
          .unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
