package graft

import graft.streaming.NotificationWriter
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.scalatest.funsuite.AnyFunSuite

/** O8 error policy: config errors acked, transport errors retried. */
class NotificationWriterSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("id", StringType), StructField("email", StringType),
    StructField("subject", StringType), StructField("body", StringType)))

  private def row(email: String): Row =
    new GenericRowWithSchema(Array("r1", email, "s", "b"), schema)

  test("delivers through the injected transport") {
    val sent = collection.mutable.ArrayBuffer.empty[(String, String, String)]
    val w = new NotificationWriter((e, s, b) => sent += ((e, s, b)))
    assert(w.open(0, 0))
    w.process(row("a@b.c"))
    w.close(null)
    assert(sent.toSeq === Seq(("a@b.c", "s", "b")))
  }

  test("config errors are logged and acked (message consumed)") {
    val w = new NotificationWriter((_, _, _) =>
      throw NotificationWriter.ConfigError("no SES credentials"))
    w.open(0, 0)
    w.process(row("a@b.c")) // must NOT throw
    w.close(null)
  }

  test("transport errors propagate (batch retried)") {
    val w = new NotificationWriter((_, _, _) =>
      throw new RuntimeException("connection reset"))
    w.open(0, 0)
    intercept[RuntimeException] { w.process(row("a@b.c")) }
  }
}
