package graft

import java.nio.file.Files
import graft.sources.Tables
import graft.streaming.Flows
import graft.tables.TableStore
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class Msg(topic: String, value: String)

/** Consumer-side CDC parity (S2/S3/S4/S5/S6 from raw topic messages —
  * the inventario/main.go dispatch loop, replayed on the FIXTURES.md §3
  * wire shapes). */
class ConsumerFlowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def q(doc: String): String =
    "\"" + doc.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def invMsg(cap: Int, extra: String = ""): String =
    q(s"""{"_id": {"$$oid": "619c1ca490812c00013e29c3"}, "nombre": "Opera Boheme", "capacidad": $cap, "categoria": "Opera", "estado": "A"$extra}""")

  private def store0(): (TableStore, Flows) = {
    val root = Files.createTempDirectory("graft-consumer").toString
    val store = new TableStore(spark, root)
    store.init("eventos", Tables.eventos(spark))
    store.init("inventario", Tables.inventario(spark))
    store.init("reservas", Tables.reservas(spark).limit(0))
    (store, new Flows(spark, store))
  }

  private def run(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    q.processAllAvailable(); q.stop()
  }

  test("admitted-reservation message registers via DetReserva projection; echoes dropped; redelivery idempotent") {
    val (store, flows) = store0()
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Msg]
    val admitted = invMsg(17,
      """, "idres": {"$oid": "619c1dae4b21200001952449"}, "email": "pepediaz@gmail.com", "canres": 3""")
    ms.addData(
      Msg("boletia.inventario", invMsg(20)), // creation echo → drop
      Msg("boletia.inventario", admitted),   // insert reservation
      Msg("boletia.inventario", admitted),   // redelivery → idempotent
      Msg("boletia.inventario", invMsg(20,
        """, "idres": {"$oid": "619c1dae4b21200001952449"}, "email": "pepediaz@gmail.com", "canres": -1""")), // seat-return echo → drop
      Msg("boletia.reservas",
        q("""{"_id": {"$oid": "ffffffffffffffff00000001"}, "evento": "Opera Boheme", "estado": "A", "email": "x@y", "cantidad": 3}"""))) // creation echo → drop
    run(flows.consumerFlow(ms.toDS().toDF()))
    val res = store.load("reservas").collect()
    assert(res.length === 1)
    assert(res.head.getString(0) === "619c1dae4b21200001952449")
    assert(res.head.getString(1) === "Opera Boheme")
    assert(res.head.getInt(4) === 3)
    // echoes changed nothing else (S6): inventario untouched
    assert(store.load("inventario").filter(col("nombre") === "Opera Boheme")
      .collect().head.getInt(2) === 17)
  }

  test("scan hygiene: each message's value is evaluated once per batch (no double parse)") {
    // a nondeterministic counting UDF wraps `value` upstream of the
    // flow; nondeterminism makes it a projection barrier Catalyst
    // cannot duplicate, so the accumulator counts PHYSICAL evaluations
    // of the message payload. consumerFlow persists the source batch
    // and each topic branch's parsed frame before the dead-letter
    // probe, so every payload is read exactly once per micro-batch —
    // the r4 cut ran the probe pre-persist and paid an extra
    // topic-scan+from_json per batch.
    val (store, flows) = store0()
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("value-evals")
    val counted = udf((s: String) => { acc.add(1); s }).asNondeterministic()
    val ms = MemoryStream[Msg]
    val msgs = Seq(
      Msg("boletia.inventario", invMsg(20)),
      Msg("boletia.inventario", invMsg(17,
        """, "idres": {"$oid": "619c1dae4b21200001952449"}, "email": "pepediaz@gmail.com", "canres": 3""")),
      Msg("boletia.reservas",
        q("""{"_id": {"$oid": "619c1dae4b21200001952449"}, "evento": "Opera Boheme", "estado": "X", "email": "pepediaz@gmail.com", "cantidad": 3}""")),
      Msg("boletia.inventario", q("""not json at all"""))) // dead-letter row
    ms.addData(msgs: _*)
    run(flows.consumerFlow(ms.toDS().toDF()
      .select(col("topic"), counted(col("value")).as("value"))))
    assert(store.load("reservas").count() === 1)
    assert(store.load("dead_letter").count() === 1)
    assert(acc.value === msgs.length,
      s"expected ${msgs.length} payload evaluations, saw ${acc.value}")
  }

  test("customer-cancel message returns seats; organizer-cancel message cascades") {
    val (store, flows) = store0()
    store.init("reservas", Tables.reservas(spark))
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Msg]
    ms.addData(
      // X message: pepediaz cancels 3 seats of Boheme (17 → 20)
      Msg("boletia.reservas",
        q("""{"_id": {"$oid": "619c1dae4b21200001952449"}, "evento": "Opera Boheme", "estado": "X", "email": "pepediaz@gmail.com", "cantidad": 3}""")),
      // organizer cancels Rigoletto → inventario C + active reservas C
      Msg("boletia.inventario",
        q("""{"_id": {"$oid": "619c1ca490812c00013e29c4"}, "nombre": "Opera Rigoletto", "capacidad": 27, "categoria": "Opera", "estado": "C"}""")))
    run(flows.consumerFlow(ms.toDS().toDF()))
    assert(store.load("inventario").filter(col("nombre") === "Opera Boheme")
      .collect().head.getInt(2) === 20)
    // redelivered X message in a later batch must NOT inflate capacity
    val ms2 = MemoryStream[Msg]
    ms2.addData(Msg("boletia.reservas",
      q("""{"_id": {"$oid": "619c1dae4b21200001952449"}, "evento": "Opera Boheme", "estado": "X", "email": "pepediaz@gmail.com", "cantidad": 3}""")))
    run(flows.consumerFlow(ms2.toDS().toDF()))
    assert(store.load("inventario").filter(col("nombre") === "Opera Boheme")
      .collect().head.getInt(2) === 20) // still 20, not 23
    assert(store.load("inventario").filter(col("nombre") === "Opera Rigoletto")
      .collect().head.getString(4) === "C")
    val res = store.load("reservas").collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(res("61a2a4c9a80e2a0001a93f36") === "C") // ana's active → cascaded
    assert(res("619c1dae4b2120000195244a") === "X") // history untouched
  }
}
