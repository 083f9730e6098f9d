package graft.sources.kafkalite

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import graft.sources.TopicAdmin

/** One fetched record. Offsets are per-partition monotone, 0-based. */
final case class LiteRecord(partition: Int, offset: Long,
    key: Array[Byte], value: Array[Byte])

/**
 * Blocking client for [[KafkaLiteBroker]]'s wire protocol. One socket,
 * request/response in lockstep; calls synchronize on the connection so
 * a client instance may be shared. Spark readers/writers instead create
 * one client per task (see KafkaLiteSource) — the pattern a real
 * connector uses, so nothing here assumes same-JVM locality.
 */
final class KafkaLiteClient(host: String, port: Int) extends AutoCloseable {

  private val sock = new Socket(host, port)
  sock.setTcpNoDelay(true)
  private val in = new DataInputStream(sock.getInputStream)
  private val out = new DataOutputStream(sock.getOutputStream)

  override def close(): Unit = sock.close()

  // ---- framing --------------------------------------------------------

  import Wire.{readStr, readBytes, writeStr, writeBytes}

  private def call(write: DataOutputStream => Unit): DataInputStream =
    this.synchronized {
      val buf = new java.io.ByteArrayOutputStream()
      write(new DataOutputStream(buf))
      out.writeInt(buf.size()); buf.writeTo(out); out.flush()
      val len = in.readInt()
      val payload = new Array[Byte](len); in.readFully(payload)
      val resp = new DataInputStream(new java.io.ByteArrayInputStream(payload))
      if (resp.readByte() != 0)
        throw new RuntimeException(s"kafkalite: ${readStr(resp)}")
      resp
    }

  // ---- API ------------------------------------------------------------

  def createTopic(topic: String, partitions: Int): Boolean = {
    val r = call { o => o.writeByte(1); writeStr(o, topic); o.writeInt(partitions) }
    r.readByte() == 1
  }

  def listTopics(): Set[String] = {
    val r = call(_.writeByte(2))
    (0 until r.readInt()).map(_ => readStr(r)).toSet
  }

  def deleteTopic(topic: String): Boolean = {
    val r = call { o => o.writeByte(3); writeStr(o, topic) }
    r.readByte() == 1
  }

  /** Number of partitions, or None when the topic does not exist. */
  def partitionsOf(topic: String): Option[Int] = {
    val r = call { o => o.writeByte(4); writeStr(o, topic) }
    val n = r.readInt(); if (n < 0) None else Some(n)
  }

  /** Append records; partition -1 routes by key hash. Returns base offset. */
  def produce(topic: String, partition: Int,
      records: Seq[(Array[Byte], Array[Byte])]): Long = {
    val r = call { o =>
      o.writeByte(5); writeStr(o, topic); o.writeInt(partition)
      o.writeInt(records.length)
      records.foreach { case (k, v) => writeBytes(o, k); writeBytes(o, v) }
    }
    r.readLong()
  }

  /** Convenience: string records routed by key hash. */
  def produceStrings(topic: String, records: Seq[(String, String)]): Long =
    produce(topic, -1, records.map { case (k, v) =>
      (if (k == null) null else k.getBytes(UTF_8),
       if (v == null) null else v.getBytes(UTF_8))
    })

  def fetch(topic: String, partition: Int, offset: Long,
      max: Int): Seq[LiteRecord] = {
    val r = call { o =>
      o.writeByte(6); writeStr(o, topic); o.writeInt(partition)
      o.writeLong(offset); o.writeInt(max)
    }
    (0 until r.readInt()).map { _ =>
      LiteRecord(partition, r.readLong(), readBytes(r), readBytes(r))
    }
  }

  /** (earliest, latest) for one partition. latest = next offset to write. */
  def offsets(topic: String, partition: Int): (Long, Long) = {
    val r = call { o => o.writeByte(7); writeStr(o, topic); o.writeInt(partition) }
    (r.readLong(), r.readLong())
  }
}

/** O5 over the wire — [[TopicAdmin]] with the same idempotence contract
  * as the kafka-clients-backed [[graft.sources.KafkaTopicAdmin]], but
  * runnable unconditionally in the offline suite (TopicAdminSpec). */
final class KafkaLiteTopicAdmin(host: String, port: Int)
    extends TopicAdmin with AutoCloseable {
  private val client = new KafkaLiteClient(host, port)
  override def ensureTopic(topic: String, partitions: Int,
      replicas: Short): Boolean = client.createTopic(topic, partitions)
  override def listTopics(): Set[String] = client.listTopics()
  override def deleteTopic(topic: String): Boolean = client.deleteTopic(topic)
  override def close(): Unit = client.close()
}
