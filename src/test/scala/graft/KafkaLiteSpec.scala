package graft

import java.nio.file.Files
import graft.sources.Tables
import graft.sources.kafkalite.{KafkaLiteBroker, KafkaLiteClient, KafkaLiteSourceProvider, KafkaLiteTopicAdmin}
import graft.streaming.Flows
import graft.tables.TableStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * KafkaLite wire + Spark-source coverage (VERDICT r10 ask #4: the
 * consumer topology was MemoryStream-only; these tests drive it over a
 * REAL broker socket — produce → subscribe → parse → merge — plus the
 * one semantics MemoryStream cannot express: stop, produce more,
 * restart from the checkpoint, and resume exactly past the consumed
 * offsets). The production path keeps the genuine connector (KafkaIO);
 * KafkaLite is its in-sandbox twin with the same observable contract.
 */
class KafkaLiteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def q(doc: String): String =
    "\"" + doc.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def withBroker[A](f: KafkaLiteBroker => A): A = {
    val b = new KafkaLiteBroker()
    try f(b) finally b.close()
  }

  // ---- wire protocol --------------------------------------------------

  test("wire: create/list/delete topics is idempotent over the socket") {
    withBroker { b =>
      val c = new KafkaLiteClient("localhost", b.port)
      try {
        assert(c.createTopic("t1", 3))
        assert(!c.createTopic("t1", 3)) // already exists → false, no error
        assert(c.createTopic("t2", 1))
        assert(c.listTopics() === Set("t1", "t2"))
        assert(c.partitionsOf("t1") === Some(3))
        assert(c.partitionsOf("absent") === None)
        assert(c.deleteTopic("t2"))
        assert(!c.deleteTopic("t2"))
        assert(c.listTopics() === Set("t1"))
      } finally c.close()
    }
  }

  test("topic names outside Kafka's charset are rejected; offsets round-trip") {
    withBroker { b =>
      val c = new KafkaLiteClient("localhost", b.port)
      try {
        // '=' and ';' are the offset encoding's delimiters — a topic
        // carrying them could never restart from its own checkpoint
        for (bad <- Seq("a=b", "a;b", "a/b", "", "a b"))
          assert(intercept[RuntimeException](c.createTopic(bad, 1))
            .getMessage.contains("illegal topic name"), s"accepted '$bad'")
        assert(c.createTopic("legal.name_1-x", 1))
      } finally c.close()
    }
    // the parser splits at the LAST '=' regardless (legacy robustness)
    import graft.sources.kafkalite.KafkaLiteOffset
    val o = KafkaLiteOffset(Map(("t.x", 3) -> 42L, ("t.y", 0) -> 7L))
    assert(KafkaLiteOffset.parse(o.json()) === o)
  }

  test("wire: produce/fetch preserves per-partition order and offsets; key routing is sticky") {
    withBroker { b =>
      val c = new KafkaLiteClient("localhost", b.port)
      try {
        c.createTopic("t", 4)
        // same key must land in the same partition across produce calls
        c.produceStrings("t", Seq(("k1", "a"), ("k2", "b"), ("k1", "c")))
        c.produceStrings("t", Seq(("k1", "d")))
        val byPart = (0 until 4).map(p =>
          p -> c.fetch("t", p, 0L, 100).map(r => new String(r.value)))
        val k1Part = byPart.filter(_._2.contains("a"))
        assert(k1Part.size === 1)
        assert(k1Part.head._2.filter(Set("a", "c", "d")) === Seq("a", "c", "d"),
          "same-key records out of order within their partition")
        // offsets: latest == record count, fetch from mid-offset works
        val p = k1Part.head._1
        val (lo, hi) = c.offsets("t", p)
        assert(lo === 0L)
        assert(c.fetch("t", p, hi - 1, 10).map(_.offset) === Seq(hi - 1))
        // unknown topic → error surfaced client-side, connection survives
        val err = intercept[RuntimeException](c.fetch("nope", 0, 0L, 1))
        assert(err.getMessage.contains("unknown topic"))
        assert(c.listTopics() === Set("t")) // connection still usable
      } finally c.close()
    }
  }

  test("O5 over the wire: TopicAdmin round-trip runs unconditionally in-sandbox") {
    withBroker { b =>
      val admin = new KafkaLiteTopicAdmin("localhost", b.port)
      try {
        assert(admin.ensureTopic("boletia.eventos", 2, 1))
        assert(!admin.ensureTopic("boletia.eventos", 2, 1)) // boot-time re-create tolerated
        assert(graft.sources.TopicAdmin.ensureTopics(admin,
          Seq("boletia.eventos", "boletia.inventario", "boletia.reservas"))
          === Seq("boletia.inventario", "boletia.reservas"))
        assert(admin.listTopics().size === 3)
        assert(admin.deleteTopic("boletia.eventos"))
      } finally admin.close()
    }
  }

  // ---- Spark batch read ----------------------------------------------

  test("batch read: one InputPartition per broker partition, full snapshot") {
    withBroker { b =>
      val c = new KafkaLiteClient("localhost", b.port)
      try {
        c.createTopic("snap", 3)
        c.produceStrings("snap", (1 to 50).map(i => (s"k$i", s"v$i")))
        val df = KafkaLiteSourceProvider.readBatch(
          spark, "localhost", b.port, Seq("snap"))
        assert(df.count() === 50)
        assert(df.select("value").collect().map(_.getString(0)).toSet
          === (1 to 50).map(i => s"v$i").toSet)
        // partition column reflects broker partitioning (≤3 distinct)
        val parts = df.select("partition").distinct().collect().map(_.getInt(0))
        assert(parts.forall(p => p >= 0 && p < 3))
      } finally c.close()
    }
  }

  test("batch read: column pruning and limit reach the scan") {
    withBroker { b =>
      val c = new KafkaLiteClient("localhost", b.port)
      try {
        c.createTopic("prune", 2)
        c.produceStrings("prune", (1 to 40).map(i => (s"k$i", s"v$i")))
        val df = KafkaLiteSourceProvider.readBatch(
          spark, "localhost", b.port, Seq("prune")).select("value")
        val scan = df.queryExecution.executedPlan.collectLeaves()
          .map(_.toString).mkString("\n")
        // the physical scan's output must be the pruned single column —
        // metadata columns not deserialized/shipped per record
        assert(scan.contains("value") && !scan.contains("offset"),
          s"scan did not prune columns:\n$scan")
        assert(df.count() === 40)
        // limit pushdown caps the per-partition fetch range: with
        // limit 3 over 2 partitions the scan surfaces at most 6 rows
        // (Spark's global Limit still trims to exactly 3 — partial push)
        val limited = KafkaLiteSourceProvider.readBatch(
          spark, "localhost", b.port, Seq("prune")).limit(3)
        assert(limited.collect().length === 3)
        val scanned = limited.queryExecution.executedPlan.collectLeaves()
          .head.metrics("numOutputRows").value
        assert(scanned <= 6,
          s"limit not pushed: scan surfaced $scanned of 40 rows")
      } finally c.close()
    }
  }

  // ---- streaming: checkpoint-resume ----------------------------------

  test("streaming resume: restart from checkpoint consumes only new offsets") {
    withBroker { b =>
      val c = new KafkaLiteClient("localhost", b.port)
      try {
        c.createTopic("resume", 2)
        c.produceStrings("resume", (1 to 10).map(i => (s"k$i", s"v$i")))
        val ckpt = Files.createTempDirectory("graft-klite-ckpt").toString
        val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
        def runOnce(): Unit = {
          val qry = KafkaLiteSourceProvider
            .readTopics(spark, "localhost", b.port, Seq("resume"))
            .writeStream
            .option("checkpointLocation", ckpt)
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
              batch.select("value").collect().foreach(r => seen.add(r.getString(0)))
            }
            .start()
          try qry.processAllAvailable() finally qry.stop()
        }
        runOnce()
        assert(seen.size === 10)
        // restart with nothing new: no reprocessing
        runOnce()
        assert(seen.size === 10, "restart replayed already-committed offsets")
        // produce 5 more, restart: exactly the 5 new ones arrive
        c.produceStrings("resume", (11 to 15).map(i => (s"k$i", s"v$i")))
        runOnce()
        assert(seen.size === 15)
        val all = seen.toArray(Array.empty[String]).toSet
        assert(all === (1 to 15).map(i => s"v$i").toSet)
        graft.tables.TempDirs.delete(ckpt)
      } finally c.close()
    }
  }

  // ---- streaming: S1 + consumer saga over the socket -----------------

  test("S1 over the socket: produce post-image → subscribe → parse → merge") {
    withBroker { b =>
      val admin = new KafkaLiteTopicAdmin("localhost", b.port)
      admin.ensureTopic("boletia.eventos", 2, 1)
      import spark.implicits._
      val msg = q("""{"_id": {"$oid": "619c1b9190812c00013e29c1"}, "nombre": "Opera Boheme", "capacidad": 20, "categoria": "Opera", "estado": "A"}""")
      KafkaLiteSourceProvider.publish(
        Seq(("k", msg)).toDF("key", "value"), "localhost", b.port,
        "boletia.eventos")
      val root = Files.createTempDirectory("graft-klite-s1").toString
      val store = new TableStore(spark, root)
      store.init("eventos", Tables.eventos(spark).limit(0))
      store.init("inventario", Tables.inventario(spark).limit(0))
      val flows = new Flows(spark, store)
      val stream = KafkaLiteSourceProvider
        .readTopics(spark, "localhost", b.port, Seq("boletia.eventos"))
      val qry = flows.eventCreationFlow(stream.select(col("value")))
      try qry.processAllAvailable() finally qry.stop()
      val evs = store.load("eventos").collect()
      assert(evs.length === 1)
      assert(evs.head.getString(1) === "Opera Boheme")
      val inv = store.load("inventario").collect()
      assert(inv.length === 1 && inv.head.getInt(2) === 20)
      admin.close()
      graft.tables.TempDirs.delete(root)
    }
  }

  test("consumer saga over the socket with restart: S2 register + S3 return + organizer cascade resume from checkpoint") {
    withBroker { b =>
      val admin = new KafkaLiteTopicAdmin("localhost", b.port)
      graft.sources.TopicAdmin.ensureTopics(admin,
        Seq("boletia.inventario", "boletia.reservas"), partitions = 2)
      val root = Files.createTempDirectory("graft-klite-saga").toString
      val ckpt = Files.createTempDirectory("graft-klite-saga-ckpt").toString
      val store = new TableStore(spark, root)
      store.init("eventos", Tables.eventos(spark))
      store.init("inventario", Tables.inventario(spark))
      store.init("reservas", Tables.reservas(spark))
      val fixtureRows = Tables.reservas(spark).count()
      val c = new KafkaLiteClient("localhost", b.port)

      def runSaga(): Unit = {
        val flows = new Flows(spark, store, checkpointRoot = Some(ckpt))
        val stream = KafkaLiteSourceProvider.readTopics(spark, "localhost",
          b.port, Seq("boletia.inventario", "boletia.reservas"))
        val qry = flows.consumerFlow(
          stream.select(col("topic"), col("value")))
        try qry.processAllAvailable() finally qry.stop()
      }

      // --- S2: a NEW admitted-reservation post-image (fresh idres not in
      // the fixture) registers exactly one DetReserva row
      val admitted = q("""{"_id": {"$oid": "619c1ca490812c00013e29c3"}, "nombre": "Opera Boheme", "capacidad": 14, "categoria": "Opera", "estado": "A", "idres": {"$oid": "aaaaaaaaaaaaaaaa00000001"}, "email": "nuevo@x.com", "canres": 2}""")
      c.produceStrings("boletia.inventario", Seq(("Opera Boheme", admitted)))
      runSaga()
      assert(store.load("reservas").count() === fixtureRows + 1)
      val reg = store.load("reservas")
        .filter(col("id") === "aaaaaaaaaaaaaaaa00000001").collect()
      assert(reg.length === 1 && reg.head.getString(1) === "Opera Boheme"
        && reg.head.getInt(4) === 2)

      // --- restart leg: S3 customer cancel + organizer cancel arrive
      // AFTER the first run committed its offsets; the S2 message is
      // NOT re-fetched (offset log), and the new messages apply once.
      c.produceStrings("boletia.reservas", Seq(("619c1dae4b21200001952449",
        q("""{"_id": {"$oid": "619c1dae4b21200001952449"}, "evento": "Opera Boheme", "estado": "X", "email": "pepediaz@gmail.com", "cantidad": 3}"""))))
      c.produceStrings("boletia.inventario", Seq(("Opera Rigoletto",
        q("""{"_id": {"$oid": "619c1ca490812c00013e29c4"}, "nombre": "Opera Rigoletto", "capacidad": 27, "categoria": "Opera", "estado": "C"}"""))))
      runSaga()
      // X message returned pepediaz's 3 seats: 17 → 20
      assert(store.load("inventario").filter(col("nombre") === "Opera Boheme")
        .collect().head.getInt(2) === 20)
      // organizer cancel cascaded: inventario C, ana's active reserva C
      assert(store.load("inventario").filter(col("nombre") === "Opera Rigoletto")
        .collect().head.getString(4) === "C")
      val res2 = store.load("reservas").collect()
        .map(r => r.getString(0) -> r.getString(2)).toMap
      assert(res2("61a2a4c9a80e2a0001a93f36") === "C")
      // still exactly one registration — the S2 message was not replayed
      assert(store.load("reservas").count() === fixtureRows + 1)

      c.close(); admin.close()
      graft.tables.TempDirs.delete(root); graft.tables.TempDirs.delete(ckpt)
    }
  }

  test("S18 over the wire with restart: timers and tombstones survive checkpoint resume; return stays once-only") {
    // the deployment shape a real restart lands in: the hold is taken
    // in one process lifetime, the broker keeps receiving while the
    // consumer is DOWN, and the restarted consumer must (a) fire the
    // pre-restart hold's timer off RocksDB state, (b) still hold the
    // pre-restart settle's tombstone so a late redelivered hold cannot
    // re-arm, and (c) return seats exactly once.
    withBroker { b =>
      val prevProvider =
        spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        import spark.implicits._
        val c = new KafkaLiteClient("localhost", b.port)
        c.createTopic("boletia.holds", 2)
        def tsMs(s: String): Long =
          java.sql.Timestamp.valueOf(s"2026-01-01 $s").getTime
        def send(id: String, evento: String, cant: Int, kind: String,
            t: String): Unit = {
          c.produceStrings("boletia.holds", Seq((id,
            s"""{"id":"$id","evento":"$evento","cantidad":$cant,""" +
              s""""kind":"$kind","tsMs":${tsMs(t)}}""")))
          ()
        }
        val root = Files.createTempDirectory("graft-klite-s18").toString
        val store = new TableStore(spark, root)
        store.init("inventario",
          Seq(("Opera", 96, "Cultural", "A"))
            .toDF("nombre", "capacidad", "categoria", "estado"))
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "id string, evento string, cantidad int, kind string, tsMs long")
        def run(): Unit = {
          val events = KafkaLiteSourceProvider
            .readTopics(spark, "localhost", b.port, Seq("boletia.holds"))
            .select(from_json(col("value"), schema).as("j"))
            .select(col("j.id"), col("j.evento"), col("j.cantidad"),
              col("j.kind"),
              (col("j.tsMs").cast("double") / 1000).cast("timestamp")
                .as("ts"))
            .as[graft.streaming.HoldExpiry.HoldEvent]
          val qry = graft.streaming.HoldExpiry.flow(store, events,
            timeoutMs = 60000L, checkpointRoot = Some(root),
            watermarkDelay = "30 minutes")
          try qry.processAllAvailable() finally qry.stop()
        }
        def cap(): Int = store.load("inventario")
          .select("capacidad").collect().head.getInt(0)
        def expiredIds(): Seq[String] =
          if (!store.exists("expired_holds")) Seq.empty
          else store.load("expired_holds").select("id").collect()
            .map(_.getString(0)).toSeq.sorted

        // NOTE the cadence difference from the MemoryStream spec: the
        // kafkalite source goes through Spark's generic AvailableNow
        // wrapper, which does NOT run the trailing no-data micro-batch
        // MemoryStream gets — so a run's own max-ts watermark becomes
        // visible to timers in the NEXT lifetime's data batch. That is
        // exactly a restarting consumer's cadence, and it makes every
        // expiry below fire off CHECKPOINT-RESTORED timer state by
        // construction.

        // lifetime 1: r1 holds 5, r2 holds 3 and settles in time
        send("r1", "Opera", 5, "hold", "10:00:00")
        send("r2", "Opera", 3, "hold", "10:00:00")
        send("r2", "Opera", 3, "confirm", "10:00:30")
        run()
        assert(expiredIds() === Seq.empty && cap() === 96)

        // broker keeps receiving while the consumer is down: a LATE
        // redelivery of r2's hold (after its settle, inside the 30 min
        // watermark delay → it reaches the processor and must hit the
        // RESTORED tombstone) plus a heartbeat lifting the watermark
        // to 10:30 for the next lifetime
        send("r2", "Opera", 3, "hold", "10:00:00")
        send("hb", "Opera", 1, "hold", "11:00:00")
        run() // lifetime 2: watermark still 09:30:30 → nothing fires
        assert(expiredIds() === Seq.empty && cap() === 96)

        // lifetime 3: batch watermark 10:30 → r1's 10:01 timer (armed
        // two restarts ago) fires; r2's tombstone held — no r2 expiry
        send("hb2", "Opera", 1, "hold", "12:00:00")
        run()
        assert(expiredIds() === Seq("r1"),
          "pre-restart timer must fire off restored state")
        assert(cap() === 101, "exactly r1's 5 seats returned")

        // lifetime 4: batch watermark 11:30 → hb's 11:01 fires; the
        // twice-restored r2 tombstone still never expires
        send("hb3", "Opera", 1, "hold", "13:00:00")
        run()
        assert(expiredIds() === Seq("hb", "r1"))
        assert(cap() === 102)
        // once-only across all four lifetimes
        assert(store.load("expired_holds").groupBy("id").count()
          .filter(col("count") > 1).isEmpty)
        c.close()
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
}
