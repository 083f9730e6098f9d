package graft

import java.nio.file.Files
import graft.sources.Tables
import graft.streaming.Flows
import graft.tables.TableStore
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The keyed-state admission variant must reproduce the batch-MERGE
  * flow's golden scenarios (FlowsSpec S2/S5b/S5/S8/O16) — decisions
  * from the Spark state store instead of per-batch table reloads, same
  * final table states. Cross-batch behavior is exercised by keeping
  * ONE streaming query alive across multiple addData rounds: state
  * carries over in the state store, not via a reservas anti-join. */
// lifecycle message with an explicit kind (top-level for encoders)
case class LReq(id: String, evento: String, email: String, cantidad: Int,
    seq: Long, kind: String)

class StatefulAdmissionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def seededEvent(cap: Int): (TableStore, Flows) = {
    val root = Files.createTempDirectory("graft-sadm").toString
    val store = new TableStore(spark, root)
    store.init("eventos", Tables.eventos(spark).limit(0))
    store.init("reservas", Tables.reservas(spark).limit(0))
    import spark.implicits._
    store.init("inventario", Seq(
      Tables.Inventario("619c1ca490812c00013e29c3", "Opera Boheme", cap,
        "Opera", "A", null, null, 0)).toDF()
      .withColumn("canres", lit(null).cast("int")))
    // long-running trigger: these tests feed multiple addData rounds
    // through ONE live query (AvailableNow would stop at first drain)
    (store, new Flows(spark, store,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)))
  }

  test("S2+S8 stateful: in-order admission, oversell + unknown event rejected; cross-batch state persists (S5)") {
    val (store, flows) = seededEvent(20)
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Req](spark, 4)
    val q = flows.admissionFlowStateful(ms.toDS().toDF())
    try {
      ms.addData(
        Req("619c1dae4b21200001952449", "Opera Boheme", "pepediaz@gmail.com", 3, 1),
        Req("619c1dae4b2120000195244b", "Opera Boheme", "maria@gmail.com", 18, 2), // 17 < 18
        Req("619c1dae4b2120000195244c", "Opera Boheme", "luis@gmail.com", 17, 3),  // fits exactly
        Req("619c1dae4b2120000195244d", "Nope", "x@gmail.com", 1, 4))              // unknown
      q.processAllAvailable()
      val inv = store.load("inventario").collect().head
      assert(inv.getInt(2) === 0) // 20 - 3 - 17
      assert(inv.getString(5) === "619c1dae4b2120000195244c")
      assert(inv.getInt(7) === 17)
      assert(store.load("reservas").orderBy("id").collect()
        .map(_.getString(0)).toSeq ===
        Seq("619c1dae4b21200001952449", "619c1dae4b2120000195244c"))
      assert(store.load("rechazos").orderBy("id").collect()
        .map(r => (r.getString(0), r.getString(4))).toSeq === Seq(
        ("619c1dae4b2120000195244b", "sin_capacidad"),
        ("619c1dae4b2120000195244d", "no_existe")))
      // S5: redelivery in a LATER micro-batch — the seen-state, not a
      // table anti-join, makes it a no-op (no new rows, no decrement)
      ms.addData(
        Req("619c1dae4b21200001952449", "Opera Boheme", "pepediaz@gmail.com", 3, 1))
      q.processAllAvailable()
      assert(store.load("inventario").collect().head.getInt(2) === 0)
      assert(store.load("reservas").count() === 2)
      // capacity freed? it wasn't — a NEW id is still rejected
      ms.addData(
        Req("619c1dae4b2120000195244e", "Opera Boheme", "ana@gmail.com", 1, 9))
      q.processAllAvailable()
      assert(store.load("reservas").count() === 2)
      assert(store.load("rechazos").filter(col("id") === "619c1dae4b2120000195244e")
        .collect().head.getString(4) === "sin_capacidad")
    } finally q.stop()
  }

  test("S5b stateful: duplicate ids WITHIN one batch decrement once") {
    val (store, flows) = seededEvent(20)
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Req](spark, 4)
    val q = flows.admissionFlowStateful(ms.toDS().toDF())
    try {
      ms.addData(
        Req("619c1dae4b21200001952449", "Opera Boheme", "pepediaz@gmail.com", 3, 1),
        Req("619c1dae4b21200001952449", "Opera Boheme", "pepediaz@gmail.com", 3, 2))
      q.processAllAvailable()
      assert(store.load("inventario").collect().head.getInt(2) === 17) // not 14
      assert(store.load("reservas").count() === 1)
    } finally q.stop()
  }

  test("O16 stateful: invalid requests rejected before touching state") {
    val (store, flows) = seededEvent(20)
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Req](spark, 4)
    val q = flows.admissionFlowStateful(ms.toDS().toDF())
    try {
      ms.addData(
        Req("619c1dae4b21200001952449", "Opera Boheme", "a@b", 0, 1),
        Req("619c1dae4b2120000195244a", "Opera Boheme", "a@b", -5, 2),
        Req("NOT-A-HEX-ID-AT-ALL-0000", "Opera Boheme", "a@b", 3, 3))
      q.processAllAvailable()
      assert(store.load("inventario").collect().head.getInt(2) === 20)
      assert(store.load("reservas").count() === 0)
      assert(store.load("rechazos").collect().map(_.getString(4)).sorted.toSeq ===
        Seq("cantidad_invalida", "cantidad_invalida", "id_invalido"))
    } finally q.stop()
  }

  test("unified lifecycle: returns free capacity, organizer cancel closes the event — one state owner") {
    val (store, flows) = seededEvent(20)
    implicit val sql = spark.sqlContext
    import spark.implicits._
    store.replace("eventos", Seq(Tables.Evento("619c1ca490812c00013e29c3",
      "Opera Boheme", 20, "Opera", "A")).toDF())
    val ms = MemoryStream[LReq](spark, 4)
    val q = flows.admissionFlowStateful(ms.toDS().toDF())
    try {
      // batch 1: two admissions exhaust capacity
      ms.addData(
        LReq("619c1dae4b21200001952449", "Opera Boheme", "pepe@x.y", 3, 1, "req"),
        LReq("619c1dae4b2120000195244a", "Opera Boheme", "maria@x.y", 17, 2, "req"))
      q.processAllAvailable()
      assert(store.load("inventario").collect().head.getInt(2) === 0)
      // batch 2, seq order: seat return (+3), redelivered return
      // (no-op), then a request of 2 that only fits BECAUSE the return
      // freed seats — capacity flows return→request inside one fold
      ms.addData(
        LReq("619c1dae4b21200001952449", "Opera Boheme", "pepe@x.y", 3, 10, "ret"),
        LReq("619c1dae4b21200001952449", "Opera Boheme", "pepe@x.y", 3, 11, "ret"),
        LReq("619c1dae4b2120000195244c", "Opera Boheme", "luis@x.y", 2, 12, "req"))
      q.processAllAvailable()
      val inv = store.load("inventario").collect().head
      assert(inv.getInt(2) === 1) // 0 + 3 (once) - 2
      assert(inv.getString(5) === "619c1dae4b2120000195244c") // widened echo
      // the return does NOT delete the registration (the reservas
      // service owns the A→X transition upstream) — 3 rows registered
      assert(store.load("reservas").count() === 3)
      // batch 3, seq order: organizer cancel, then a request that must
      // reject because estado is no longer 'A'
      ms.addData(
        LReq(null, "Opera Boheme", null, 0, 20, "cancel"),
        LReq("619c1dae4b2120000195244d", "Opera Boheme", "ana@x.y", 1, 21, "req"))
      q.processAllAvailable()
      val inv2 = store.load("inventario").collect().head
      assert(inv2.getString(4) === "C")
      assert(store.load("eventos").collect().head.getString(4) === "C")
      // cascade: every still-active reservation of the event → 'C'
      val estados = store.load("reservas").collect().map(_.getString(2)).toSeq
      assert(estados.nonEmpty && estados.forall(_ == "C"))
      // estado≠'A' rejections are labeled evento_cerrado — the same
      // motivo the batch admissionFlow derives from the inventario
      // estado (engines agree; FlowsSpec asserts the parity)
      assert(store.load("rechazos")
        .filter(col("id") === "619c1dae4b2120000195244d")
        .collect().head.getString(4) === "evento_cerrado")
      // batch 4: a seat return AFTER the organizer cancel is a no-op on
      // capacity (estado guard — parity with the batch fold, which only
      // applies returns to active events)
      ms.addData(
        LReq("619c1dae4b2120000195244a", "Opera Boheme", "maria@x.y", 17, 30, "ret"))
      q.processAllAvailable()
      assert(store.load("inventario").collect().head.getInt(2) === 1)
    } finally q.stop()
  }

  test("restart safety: fresh-checkpoint restart + redelivered request does not double-decrement") {
    val (store, flows) = seededEvent(20)
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val req = LReq("619c1dae4b21200001952449", "Opera Boheme", "pepe@x.y", 3, 1, "req")
    val ms1 = MemoryStream[LReq](spark, 4)
    val q1 = flows.admissionFlowStateful(ms1.toDS().toDF())
    try { ms1.addData(req); q1.processAllAvailable() } finally q1.stop()
    assert(store.load("inventario").collect().head.getInt(2) === 17)
    // SECOND query = restart with a lost checkpoint (fresh MemoryStream,
    // fresh state store). init must reseed `seen` from the reservas
    // registry, so the redelivered request is a duplicate, not a fresh
    // admission against the already-decremented snapshot.
    val ms2 = MemoryStream[LReq](spark, 4)
    val q2 = flows.admissionFlowStateful(ms2.toDS().toDF())
    try {
      ms2.addData(req)
      q2.processAllAvailable()
      assert(store.load("inventario").collect().head.getInt(2) === 17) // not 14
      assert(store.load("reservas").count() === 1)
      // and a redelivered RETURN after restart must not double-inflate:
      // apply it once in this run …
      ms2.addData(LReq("619c1dae4b21200001952449", "Opera Boheme", "pepe@x.y", 3, 5, "ret"))
      q2.processAllAvailable()
      assert(store.load("inventario").collect().head.getInt(2) === 20)
    } finally q2.stop()
    // … then restart again: `returned` reseeds from devoluciones
    val ms3 = MemoryStream[LReq](spark, 4)
    val q3 = flows.admissionFlowStateful(ms3.toDS().toDF())
    try {
      ms3.addData(LReq("619c1dae4b21200001952449", "Opera Boheme", "pepe@x.y", 3, 5, "ret"))
      q3.processAllAvailable()
      assert(store.load("inventario").collect().head.getInt(2) === 20) // not 23
    } finally q3.stop()
  }

  test("TTL eviction: duplicate arriving after eviction is still a no-op via registry reseed") {
    val (store, flows0) = seededEvent(1000)
    // horizon of 10 offsets — ids recorded >10 behind high-water evict
    val flows = new Flows(spark, store,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
      dedupHorizon = 10L)
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val dup = Req("619c1dae4b21200001952449", "Opera Boheme", "pepe@x.y", 3, 1)
    val ms1 = MemoryStream[Req](spark, 4)
    val q1 = flows.admissionFlowStateful(ms1.toDS().toDF())
    try {
      ms1.addData(dup)
      q1.processAllAvailable()
      // push the key's high-water far past seq 1 + horizon → the dup
      // id's state entry is evicted (state stays bounded)
      ms1.addData((100 to 105).map(i =>
        Req(f"aaaaaaaaaaaaaaaaaaaa$i%04d", "Opera Boheme", s"u$i@x.y", 1, i.toLong)): _*)
      q1.processAllAvailable()
      assert(store.load("inventario").collect().head.getInt(2) === 991)
    } finally q1.stop()
    // restart: the registry reseed re-arms dedup for ALL history, so the
    // ancient duplicate is still a no-op even though state evicted it
    val ms2 = MemoryStream[Req](spark, 4)
    val q2 = flows.admissionFlowStateful(ms2.toDS().toDF())
    try {
      ms2.addData(dup)
      q2.processAllAvailable()
      assert(store.load("inventario").collect().head.getInt(2) === 991) // not 988
      assert(store.load("reservas").count() === 7)
    } finally q2.stop()
  }

  test("restart + large absolute offsets: reseeded dedup survives the first horizon-crossing batch") {
    val (store, flows0) = seededEvent(1000)
    val flows = new Flows(spark, store,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
      dedupHorizon = 10L)
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val dup = Req("619c1dae4b21200001952449", "Opera Boheme", "pepe@x.y", 3, 1)
    val ms1 = MemoryStream[Req](spark, 4)
    val q1 = flows.admissionFlowStateful(ms1.toDS().toDF())
    try { ms1.addData(dup); q1.processAllAvailable() } finally q1.stop()
    assert(store.load("inventario").collect().head.getInt(2) === 997)
    // restart with a lost checkpoint; the run resumes at ABSOLUTE stream
    // offsets far past 0 (real Kafka offsets, not a fresh counter).
    // Batch 1 alone pushes high-water > horizon — if registry seeds were
    // anchored at 0 they would all evict here; re-anchoring at the run's
    // first offset keeps them until the run itself spans the horizon.
    val ms2 = MemoryStream[Req](spark, 4)
    val q2 = flows.admissionFlowStateful(ms2.toDS().toDF())
    try {
      ms2.addData((0 to 2).map(i =>
        Req(f"bbbbbbbbbbbbbbbbbbbb$i%04d", "Opera Boheme", s"v$i@x.y", 1,
          1000000L + i)): _*)
      q2.processAllAvailable()
      assert(store.load("inventario").collect().head.getInt(2) === 994)
      // batch 2 of the SAME run: redelivery of the pre-restart request.
      // seq-0 seeding would have evicted its dedup entry in batch 1 and
      // double-decremented capacity here.
      ms2.addData(dup.copy(seq = 1000003L))
      q2.processAllAvailable()
      assert(store.load("inventario").collect().head.getInt(2) === 994) // not 991
      assert(store.load("reservas").count() === 4)
      // the re-anchored seed still ages out once the run's own traffic
      // covers the horizon past the restart point — state stays bounded
      ms2.addData(Req(f"cccccccccccccccccccc0001", "Opera Boheme", "w@x.y", 1,
        1000050L))
      q2.processAllAvailable()
      assert(store.load("inventario").collect().head.getInt(2) === 993)
    } finally q2.stop()
  }

  test("TTL eviction: state size plateaus over a long replay (unit, TestGroupState)") {
    import org.apache.spark.sql.streaming.TestGroupState
    import graft.streaming.{InvState, SReq, StatefulAdmission}
    val horizon = 50L
    var st = InvState(1000000L, "A", Map.empty, Map.empty)
    var maxSeen = 0
    (0 until 40).foreach { b =>
      val state = TestGroupState.create[InvState](
        org.apache.spark.api.java.Optional.of(st),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
        0L, org.apache.spark.api.java.Optional.empty[Long](),
        hasTimedOut = false)
      val batch = (0 until 25).map { i =>
        val seq = b * 25L + i
        SReq(f"aaaaaaaaaaaaaaaa$seq%08d", "E", "u@x.y", 1, seq, null, "req")
      }
      StatefulAdmission.admit(horizon)("E", batch.iterator, state)
      st = state.get
      maxSeen = math.max(maxSeen, st.seen.size)
    }
    // 1000 requests replayed; without eviction seen would hold 1000 ids.
    // With horizon 50 it plateaus at ~horizon (never the whole history).
    assert(maxSeen <= horizon + 25,
      s"state did not plateau: max seen size $maxSeen")
    assert(st.seen.size <= horizon + 25)
    // the capacity effects of evicted entries are NOT undone
    assert(st.capacidad === 1000000L - 1000L)
  }

  test("property: lifecycle invariants hold across random message mixes and batch splits (unit, TestGroupState)") {
    import org.apache.spark.sql.streaming.TestGroupState
    import graft.streaming.{InvState, SReq, StatefulAdmission}
    // 60 seeded cases: random capacity, random create/req/ret/cancel
    // mix over a small id pool (forcing redelivery duplicates), random
    // seq gaps (TTL interplay), random batch boundaries. The fold must
    // keep the conservation + idempotence invariants for EVERY split —
    // batching is an operational accident, not a semantic input.
    (0 until 60).foreach { seed =>
      val rnd = new scala.util.Random(1000 + seed)
      val cap0 = 5L + rnd.nextInt(30)
      // horizon beyond any generated offset span: in-run dedup is only
      // an invariant while entries are inside the TTL window (eviction
      // + re-admission beyond it is the documented contract, covered
      // by the TTL cases above)
      val horizon = 100000L
      val ids = Vector.tabulate(8)(i => f"aaaaaaaaaaaaaaaaaaaa$i%04d")
      var seq = rnd.nextInt(1000).toLong
      val msgs = (0 until 40 + rnd.nextInt(40)).map { _ =>
        seq += 1 + rnd.nextInt(10)
        val id = ids(rnd.nextInt(ids.size))
        rnd.nextInt(10) match {
          case k if k < 6 => SReq(id, "E", "u@x.y", 1 + rnd.nextInt(4), seq, null, "req")
          case k if k < 8 => SReq(id, "E", "u@x.y", 1 + rnd.nextInt(4), seq, null, "ret")
          case 8          => SReq(null, "E", null, 0, seq, null, "cancel")
          case _          => SReq(id.reverse, "E", null, 10 + rnd.nextInt(20), seq, null, "create")
        }
      }
      // random batch boundaries (1..msgs.length batches)
      val batches = {
        val cuts = (0 until msgs.length).filter(_ => rnd.nextBoolean())
        val bounds = (0 +: cuts :+ msgs.length).distinct.sorted
        bounds.sliding(2).map { case Seq(a, b) => msgs.slice(a, b) }
          .filter(_.nonEmpty).toSeq
      }
      var st = InvState(cap0, "A", Map.empty, Map.empty)
      val log = scala.collection.mutable.ArrayBuffer.empty[graft.streaming.AdmitEvent]
      batches.foreach { b =>
        val state = TestGroupState.create[InvState](
          org.apache.spark.api.java.Optional.of(st),
          org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
          0L, org.apache.spark.api.java.Optional.empty[Long](),
          hasTimedOut = false)
        log ++= StatefulAdmission.admit(horizon)("E", b.iterator, state)
        if (state.exists) st = state.get
      }
      val admits = log.filter(_.kind == "admit")
      val returns = log.filter(_.kind == "return")
      val cancels = log.filter(_.kind == "cancel")
      val ctx = s"seed=$seed batches=${batches.length}"
      // conservation: final capacity = initial - admitted + returned
      assert(st.capacidad ===
        cap0 - admits.map(_.cantidad.toLong).sum + returns.map(_.cantidad.toLong).sum,
        s"$ctx conservation")
      // oversell: capacity after every state-changing event >= 0
      assert(log.forall(e => e.kind == "reject" || e.capacidad >= 0),
        s"$ctx oversell")
      // idempotence: within-horizon duplicates collapse — an id admits
      // at most once, a reservation returns at most once
      assert(admits.map(_.id).distinct.size === admits.size, s"$ctx dup admit")
      assert(returns.map(_.id).distinct.size === returns.size, s"$ctx dup return")
      // cancel is terminal and idempotent: at most one cancel event,
      // estado ends C iff one was applied, and no batch AFTER the
      // cancel's admits anything (within the cancel's own batch the
      // seq sort already orders it against later requests)
      assert(cancels.size <= 1, s"$ctx dup cancel")
      assert((st.estado == "C") === cancels.nonEmpty, s"$ctx estado")
      if (cancels.nonEmpty) {
        val cOrd = log.indexWhere(_.kind == "cancel")
        assert(log.drop(cOrd + 1).forall(e =>
          e.kind != "admit" && e.kind != "return"), s"$ctx change after cancel")
      }
    }
  }

  test("create lifecycle kind: event created after query start becomes admittable") {
    val (store, flows) = seededEvent(20)
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[LReq](spark, 4)
    val q = flows.admissionFlowStateful(ms.toDS().toDF())
    try {
      // a request for a not-yet-created event → no_existe
      ms.addData(LReq("619c1dae4b2120000195244e", "Concierto Jazz", "a@x.y", 2, 1, "req"))
      q.processAllAvailable()
      assert(store.load("rechazos").filter(col("evento") === "Concierto Jazz")
        .collect().head.getString(4) === "no_existe")
      // create (capacity 10), then requests — same key, later batch
      ms.addData(
        LReq("ffffffffffffffffffff0001", "Concierto Jazz", null, 10, 5, "create"),
        LReq("619c1dae4b2120000195244f", "Concierto Jazz", "b@x.y", 4, 6, "req"))
      q.processAllAvailable()
      val inv = store.load("inventario").filter(col("nombre") === "Concierto Jazz")
        .collect().head
      assert(inv.getInt(2) === 6) // 10 - 4
      assert(inv.getString(4) === "A")
      assert(store.load("eventos").filter(col("nombre") === "Concierto Jazz")
        .count() === 1)
      assert(store.load("reservas").filter(col("id") === "619c1dae4b2120000195244f")
        .count() === 1)
      // duplicate create is a silent first-wins no-op (S1 parity)
      ms.addData(LReq("ffffffffffffffffffff0002", "Concierto Jazz", null, 99, 9, "create"))
      q.processAllAvailable()
      assert(store.load("inventario").filter(col("nombre") === "Concierto Jazz")
        .collect().head.getInt(2) === 6) // capacity NOT reset to 99
    } finally q.stop()
  }

  test("stateful admission never oversells under per-key contention (property)") {
    val (store, flows) = seededEvent(50)
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Req](spark, 8)
    val q = flows.admissionFlowStateful(ms.toDS().toDF())
    try {
      // 40 competing requests of 3 seats for a 50-seat event → exactly
      // 16 admissions (48 seats), 24 sold-out rejections
      val reqs = (1 to 40).map(i =>
        Req(f"aaaaaaaaaaaaaaaaaaaa$i%04d", "Opera Boheme", s"u$i@x.y", 3, i.toLong))
      ms.addData(reqs: _*)
      q.processAllAvailable()
      assert(store.load("inventario").collect().head.getInt(2) === 2) // 50 - 48
      assert(store.load("reservas").count() === 16)
      assert(store.load("rechazos").filter(col("motivo") === "sin_capacidad")
        .count() === 24)
      // the fold is ordered: the first 16 seq values admit
      assert(store.load("reservas").orderBy("id").collect().map(_.getString(0)).toSeq
        === (1 to 16).map(i => f"aaaaaaaaaaaaaaaaaaaa$i%04d"))
    } finally q.stop()
  }
}
