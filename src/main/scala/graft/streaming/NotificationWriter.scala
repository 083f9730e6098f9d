package graft.streaming

import org.apache.spark.sql.{ForeachWriter, Row}

/**
 * O8 — per-row notification sink (notificaciones/main.go:91-137) as a
 * pluggable `ForeachWriter`. The transport is injected so tests use a
 * recording function and production plugs SES/SMTP.
 *
 * Error policy mirrors the reference exactly
 * (notificaciones/main.go:119-135):
 *  - configuration errors (bad credentials / unverified sender —
 *    `ConfigError`) are logged and ACKED: the message is consumed and
 *    the flow continues (the reference tolerates a cluster without SES
 *    credentials);
 *  - transport errors propagate → the micro-batch fails and Spark
 *    retries it (at-least-once on the sink side).
 */
object NotificationWriter {
  final case class ConfigError(msg: String) extends RuntimeException(msg)
}

final class NotificationWriter(send: (String, String, String) => Unit)
    extends ForeachWriter[Row] {
  @transient private var opened = false

  override def open(partitionId: Long, epochId: Long): Boolean = {
    opened = true
    true
  }

  override def process(r: Row): Unit = {
    val (email, subject, body) =
      (r.getString(r.fieldIndex("email")), r.getString(r.fieldIndex("subject")),
        r.getString(r.fieldIndex("body")))
    try send(email, subject, body)
    catch {
      case e: NotificationWriter.ConfigError =>
        // log + ack (reference: "Email no enviado" path)
        System.err.println(s"[notify] config error, message acked: ${e.msg}")
    }
  }

  override def close(errorOrNull: Throwable): Unit = { opened = false }
}
