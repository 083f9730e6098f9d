package graft.sources.kafkalite

import java.io.{DataInputStream, DataOutputStream, EOFException, IOException}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicBoolean
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/**
 * KafkaLite — a minimal in-process message broker with Kafka SEMANTICS
 * (named topics, numbered partitions, append-only logs addressed by
 * monotone offsets, earliest/latest queries, key-hash partition
 * routing) over a simple length-prefixed TCP protocol.
 *
 * Purpose: the offline image ships neither a Kafka broker nor the
 * kafka-clients / spark-sql-kafka jars, so the reference's broker-borne
 * topology (pcKafka.go:55-86: every service talks through topics) could
 * previously only be exercised via MemoryStream. KafkaLite closes that
 * seam: the consumer saga (Flows.consumerFlow) and the topic-admin
 * surface (O5) run over a REAL socket with REAL offset bookkeeping —
 * including stop → produce-more → restart-from-checkpoint resume, which
 * MemoryStream cannot express. On a real cluster the production path
 * stays KafkaIO (the genuine connector); KafkaLite is the in-sandbox
 * twin with the same observable contract.
 *
 * Protocol (all frames: i32 payload length, then payload):
 *   request  = u8 opcode ++ fields
 *   response = u8 status (0 ok / 1 error) ++ (error: str message | ok: fields)
 * Strings are i32 length + UTF-8 bytes; byte arrays are i32 length +
 * bytes, with length -1 meaning null.
 *
 * Opcodes:
 *   1 CREATE_TOPIC  topic:str partitions:i32        → created:u8
 *   2 LIST_TOPICS                                   → n:i32 (topic:str)*
 *   3 DELETE_TOPIC  topic:str                       → deleted:u8
 *   4 METADATA      topic:str                       → partitions:i32 (-1 absent)
 *   5 PRODUCE       topic:str partition:i32 n:i32 (key:bytes value:bytes)*
 *                                                   → baseOffset:i64
 *     (partition -1 = route by hash(key) % numPartitions, null key → 0)
 *   6 FETCH         topic:str partition:i32 offset:i64 max:i32
 *                                                   → n:i32 (offset:i64 key:bytes value:bytes)*
 *   7 OFFSETS       topic:str partition:i32         → earliest:i64 latest:i64
 *
 * Concurrency: one daemon thread per connection; per-partition appends
 * synchronize on the partition log (same guarantee as Kafka: ordering
 * within a partition, none across partitions).
 */
final class KafkaLiteBroker(port0: Int = 0) extends AutoCloseable {
  import Wire.{readStr, readBytes, writeStr, writeBytes}

  /** One partition's log: (key, value) pairs; index == offset. */
  private final class PartitionLog {
    private val records = new ArrayBuffer[(Array[Byte], Array[Byte])]()
    def append(batch: Seq[(Array[Byte], Array[Byte])]): Long =
      records.synchronized {
        val base = records.length.toLong
        records ++= batch
        base
      }
    def read(from: Long, max: Int): Seq[(Long, Array[Byte], Array[Byte])] =
      records.synchronized {
        val lo = math.max(0L, from).toInt
        val hi = math.min(records.length.toLong, lo.toLong + max).toInt
        (lo until hi).map(i => (i.toLong, records(i)._1, records(i)._2))
      }
    def latest: Long = records.synchronized(records.length.toLong)
  }

  private val topics = new ConcurrentHashMap[String, Array[PartitionLog]]()
  private val server = new ServerSocket(port0)
  private val closed = new AtomicBoolean(false)

  /** Bound port (pass 0 to let the OS pick — the test-suite default). */
  def port: Int = server.getLocalPort

  private val acceptor = new Thread(() => {
    while (!closed.get()) {
      try {
        val sock = server.accept()
        val t = new Thread(() => serve(sock), "kafkalite-conn")
        t.setDaemon(true)
        t.start()
      } catch {
        case _: IOException if closed.get() => // shutdown race
        case _: IOException => // accept hiccup; keep serving
      }
    }
  }, "kafkalite-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  override def close(): Unit =
    if (closed.compareAndSet(false, true)) server.close()

  private def serve(sock: Socket): Unit = {
    sock.setTcpNoDelay(true)
    val in = new DataInputStream(sock.getInputStream)
    val rawOut = new DataOutputStream(sock.getOutputStream)
    try {
      while (true) {
        val len = in.readInt()
        val payload = new Array[Byte](len); in.readFully(payload)
        val req = new DataInputStream(
          new java.io.ByteArrayInputStream(payload))
        val buf = new java.io.ByteArrayOutputStream()
        val out = new DataOutputStream(buf)
        try {
          out.writeByte(0) // ok (overwritten below on error)
          handle(req.readByte(), req, out)
        } catch {
          case e: Exception =>
            buf.reset()
            out.writeByte(1)
            writeStr(out, Option(e.getMessage).getOrElse(e.getClass.getName))
        }
        rawOut.writeInt(buf.size())
        buf.writeTo(rawOut)
        rawOut.flush()
      }
    } catch {
      case _: EOFException | _: IOException => // client gone
    } finally sock.close()
  }

  private def handle(op: Byte, req: DataInputStream,
      out: DataOutputStream): Unit = op match {
    case 1 => // CREATE_TOPIC
      val topic = readStr(req); val parts = req.readInt()
      require(parts > 0, s"partitions must be > 0, got $parts")
      // Kafka's legal-name charset; beyond parity it keeps topic names
      // out of the streaming offset encoding's delimiters (= ; / \n)
      require(topic.nonEmpty && topic.forall(c =>
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9') || c == '.' || c == '_' || c == '-'),
        s"illegal topic name '$topic' (allowed: [a-zA-Z0-9._-])")
      val created = topics.putIfAbsent(topic,
        Array.fill(parts)(new PartitionLog)) == null
      out.writeByte(if (created) 1 else 0)
    case 2 => // LIST_TOPICS
      val names = topics.keySet().asScala.toSeq.sorted
      out.writeInt(names.length); names.foreach(writeStr(out, _))
    case 3 => // DELETE_TOPIC
      out.writeByte(if (topics.remove(readStr(req)) != null) 1 else 0)
    case 4 => // METADATA
      val logs = topics.get(readStr(req))
      out.writeInt(if (logs == null) -1 else logs.length)
    case 5 => // PRODUCE
      val topic = readStr(req); val part = req.readInt(); val n = req.readInt()
      val recs = (0 until n).map(_ => (readBytes(req), readBytes(req)))
      val logs = topics.get(topic)
      require(logs != null, s"unknown topic: $topic")
      if (part >= 0) {
        require(part < logs.length, s"$topic has ${logs.length} partitions")
        out.writeLong(logs(part).append(recs))
      } else {
        // key-hash routing, Kafka-style: same key → same partition
        // (ONE routing function for grouping AND the return below)
        val route = (k: Array[Byte]) =>
          if (k == null) 0
          else math.floorMod(java.util.Arrays.hashCode(k), logs.length)
        val byPart = recs.groupBy { case (k, _) => route(k) }
        // deterministic return: the base offset of the FIRST record's
        // partition (an unordered map's headOption would hand back an
        // arbitrary partition's base for multi-key batches)
        val bases = byPart.map { case (p, rs) => p -> logs(p).append(rs) }
        out.writeLong(recs.headOption.map { case (k, _) => route(k) }
          .flatMap(bases.get).getOrElse(0L))
      }
    case 6 => // FETCH
      val topic = readStr(req); val part = req.readInt()
      val from = req.readLong(); val max = req.readInt()
      val logs = topics.get(topic)
      require(logs != null, s"unknown topic: $topic")
      require(part >= 0 && part < logs.length,
        s"$topic has ${logs.length} partitions, asked $part")
      val recs = logs(part).read(from, max)
      out.writeInt(recs.length)
      recs.foreach { case (off, k, v) =>
        out.writeLong(off); writeBytes(out, k); writeBytes(out, v)
      }
    case 7 => // OFFSETS
      val topic = readStr(req); val part = req.readInt()
      val logs = topics.get(topic)
      require(logs != null, s"unknown topic: $topic")
      require(part >= 0 && part < logs.length,
        s"$topic has ${logs.length} partitions, asked $part")
      out.writeLong(0L); out.writeLong(logs(part).latest)
    case other =>
      throw new IllegalArgumentException(s"unknown opcode $other")
  }
}
