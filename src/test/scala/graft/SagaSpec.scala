package graft

import java.nio.file.Files
import graft.sources.Tables
import graft.streaming.Flows
import graft.tables.TableStore
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The complete README transcript (reference §README.md:59-311) as one
  * chained saga across all flows sharing one store: create events →
  * admit reservations → customer cancel → organizer cancel →
  * notifications — asserting the B-table end state and the capacity
  * invariant after every stage. */
class SagaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def q(doc: String): String =
    "\"" + doc.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def run(qry: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    qry.processAllAvailable(); qry.stop()
  }

  private def invariantHolds(store: TableStore, originals: Map[String, Int]): Unit = {
    val caps = store.load("inventario").collect()
      .map(r => r.getString(1) -> r.getInt(2)).toMap
    val active = store.load("reservas").filter(col("estado") === "A")
      .groupBy("evento").agg(sum("cantidad").as("s")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // conservation only for events never organizer-cancelled (a 'C'
    // cascade keeps capacity where it was, like the reference)
    originals.foreach { case (n, cap0) =>
      if (store.load("inventario").filter(col("nombre") === n)
          .collect().head.getString(4) == "A")
        assert(caps(n) + active.getOrElse(n, 0L) === cap0, s"invariant broken for $n")
    }
  }

  test("full saga: create → admit → customer cancel → organizer cancel → notify") {
    val root = Files.createTempDirectory("graft-saga").toString
    val store = new TableStore(spark, root)
    store.init("eventos", Tables.eventos(spark).limit(0))
    store.init("inventario", Tables.inventario(spark).limit(0))
    store.init("reservas", Tables.reservas(spark).limit(0))
    val flows = new Flows(spark, store)
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val originals = Map("Opera Boheme" -> 20, "Opera Rigoletto" -> 30)

    // 1. create two events (README.md:59-122)
    val ev = MemoryStream[String]
    ev.addData(
      q("""{"_id": {"$oid": "619c1b9190812c00013e29c1"}, "nombre": "Opera Boheme", "capacidad": 20, "categoria": "Opera", "estado": "A"}"""),
      q("""{"_id": {"$oid": "619c1b9190812c00013e29c2"}, "nombre": "Opera Rigoletto", "capacidad": 30, "categoria": "Opera", "estado": "A"}"""))
    run(flows.eventCreationFlow(ev.toDF()))
    invariantHolds(store, originals)

    // 2. reservations: pepe 3 + 2 on Boheme, ana 3 on Rigoletto
    val rq = MemoryStream[Req]
    rq.addData(
      Req("619c1dae4b21200001952449", "Opera Boheme", "pepediaz@gmail.com", 3, 1),
      Req("619c1dae4b2120000195244a", "Opera Boheme", "pepediaz@gmail.com", 2, 2),
      Req("61a2a4c9a80e2a0001a93f36", "Opera Rigoletto", "ana@gmail.com", 3, 3))
    run(flows.admissionFlow(rq.toDS().toDF()))
    assert(store.load("inventario").filter(col("nombre") === "Opera Boheme")
      .collect().head.getInt(2) === 15)
    invariantHolds(store, originals)

    // 3. pepe cancels the 2-seat reservation (README.md:193-206)
    val cx = MemoryStream[CancelId]
    cx.addData(CancelId("619c1dae4b2120000195244a"))
    run(flows.cancellationFlow(cx.toDS().toDF()))
    assert(store.load("inventario").filter(col("nombre") === "Opera Boheme")
      .collect().head.getInt(2) === 17)
    invariantHolds(store, originals)

    // 4. organizers cancel Rigoletto → cascade
    val co = MemoryStream[CancelName]
    co.addData(CancelName("Opera Rigoletto"))
    run(flows.organizerCancelFlow(co.toDS().toDF()))
    val res = store.load("reservas").collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(res("619c1dae4b21200001952449") === "A")
    assert(res("619c1dae4b2120000195244a") === "X")
    assert(res("61a2a4c9a80e2a0001a93f36") === "C")
    invariantHolds(store, originals)

    // 5. notifications for the reservas post-images of steps 2-4
    val nt = MemoryStream[String]
    nt.addData(
      q("""{"_id": {"$oid": "619c1dae4b21200001952449"}, "evento": "Opera Boheme", "estado": "A", "email": "pepediaz@gmail.com", "cantidad": 3}"""),
      q("""{"_id": {"$oid": "619c1dae4b2120000195244a"}, "evento": "Opera Boheme", "estado": "X", "email": "pepediaz@gmail.com", "cantidad": 2}"""),
      q("""{"_id": {"$oid": "61a2a4c9a80e2a0001a93f36"}, "evento": "Opera Rigoletto", "estado": "C", "email": "ana@gmail.com", "cantidad": 3}"""))
    run(flows.notificationFlow(nt.toDF()))
    val notes = store.load("notificaciones").collect().map(_.getString(3))
    assert(notes.exists(_.endsWith("está confirmada")))
    assert(notes.exists(_.endsWith("a petición suya")))
    assert(notes.exists(_.endsWith("por los organizadores")))

    // end state matches the seeded B-table fixture world
    val finalInv = store.load("inventario").orderBy("nombre").collect()
      .map(r => (r.getString(1), r.getInt(2), r.getString(4)))
    assert(finalInv.toSeq === Seq(("Opera Boheme", 17, "A"),
      ("Opera Rigoletto", 27, "C")))
  }
}
