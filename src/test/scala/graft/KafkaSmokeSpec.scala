package graft

import java.nio.file.Files
import graft.sources.{KafkaIO, Tables}
import graft.streaming.Flows
import graft.tables.TableStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Opt-in wire smoke for the Kafka bindings (SURVEY O1/O3/O4): this
  * image ships no broker and no spark-sql-kafka connector jar, so the
  * test CANCELS unless `SPARK_GRAFT_KAFKA_URL` points at a reachable
  * broker AND the connector is on the classpath (any real Spark
  * distribution). When it runs, it drives one produce → consume →
  * parse → merge round-trip of the S1 event-creation flow over the
  * wire — the only part of O1/O3/O4 MemoryStream cannot exercise. */
class KafkaSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def q(doc: String): String =
    "\"" + doc.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  test("S1 round-trip over a real broker (opt-in via SPARK_GRAFT_KAFKA_URL)") {
    val url = sys.env.get("SPARK_GRAFT_KAFKA_URL")
    assume(url.isDefined,
      "SPARK_GRAFT_KAFKA_URL not set — Kafka wire smoke skipped")
    assume(scala.util.Try(Class.forName(
      "org.apache.spark.sql.kafka010.KafkaSourceProvider")).isSuccess,
      "spark-sql-kafka connector not on the classpath")
    import spark.implicits._
    val topic = s"graft_smoke_${System.nanoTime()}"
    val msg = q(s"""{"_id": {"$$oid": "619c1b9190812c00013e29c1"}, """ +
      """"nombre": "Opera Boheme", "capacidad": 20, """ +
      """"categoria": "Opera", "estado": "A"}""")
    // O3: publish the outbox-quoted post-image
    KafkaIO.publish(Seq(("k", msg)).toDF("key", "value"), url.get, topic)
    // O4 → O2/O17: subscribe and run the S1 flow end to end
    val root = Files.createTempDirectory("graft-kafka-smoke").toString
    val store = new TableStore(spark, root)
    store.init("eventos", Tables.eventos(spark).limit(0))
    store.init("inventario", Tables.inventario(spark).limit(0))
    val flows = new Flows(spark, store)
    val stream = KafkaIO.readTopics(spark, url.get, Seq(topic))
    val qry = flows.eventCreationFlow(stream.select(col("value")))
    try qry.processAllAvailable() finally qry.stop()
    val evs = store.load("eventos").collect()
    assert(evs.length === 1)
    assert(evs.head.getString(1) === "Opera Boheme")
    val inv = store.load("inventario").collect()
    assert(inv.length === 1 && inv.head.getInt(2) === 20)
    graft.tables.TempDirs.delete(root)
  }
}
