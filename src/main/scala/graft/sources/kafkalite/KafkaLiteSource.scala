package graft.sources.kafkalite

import java.util
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownLimit, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * Spark DataSource V2 binding for [[KafkaLiteBroker]] — the in-sandbox
 * twin of the spark-sql-kafka connector (KafkaIO.readTopics shape:
 * topic/partition/offset/key/value), supporting BOTH micro-batch
 * streaming reads (offset-range planning per partition, checkpointed by
 * Spark's offset log → stop/restart resumes exactly where it left off,
 * the at-least-once contract of O4) and batch reads (earliest→latest
 * snapshot).
 *
 * Scale shape: one InputPartition per (topic, partition) — reader tasks
 * connect to the broker FROM THE EXECUTOR (a fresh client per task; no
 * driver-side collection), so the plan is the same one a 1000-executor
 * cluster would run, merely with local[n] threads standing in for
 * executors. Offsets ride Spark's checkpoint, not broker state —
 * exactly how the real connector does it (group-less consumption).
 *
 * Usage:
 *   spark.readStream.format("graft.sources.kafkalite.KafkaLiteSourceProvider")
 *     .option("host", h).option("port", p).option("subscribe", "a,b").load()
 */
class KafkaLiteSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaLiteSourceProvider.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KafkaLiteTable(
      properties.get("host"),
      properties.get("port").toInt,
      properties.get("subscribe").split(",").map(_.trim).filter(_.nonEmpty))
}

object KafkaLiteSourceProvider {
  val schema: StructType = new StructType()
    .add("topic", StringType).add("partition", IntegerType)
    .add("offset", LongType).add("key", StringType).add("value", StringType)

  /** Reader-side convenience mirroring KafkaIO.readTopics. */
  def readTopics(spark: SparkSession, host: String, port: Int,
      topics: Seq[String]): DataFrame =
    spark.readStream.format(classOf[KafkaLiteSourceProvider].getName)
      .option("host", host).option("port", port.toString)
      .option("subscribe", topics.mkString(",")).load()

  /** Batch snapshot (earliest → latest at planning time). */
  def readBatch(spark: SparkSession, host: String, port: Int,
      topics: Seq[String]): DataFrame =
    spark.read.format(classOf[KafkaLiteSourceProvider].getName)
      .option("host", host).option("port", port.toString)
      .option("subscribe", topics.mkString(",")).load()

  /** O3 — distributed publish: each task opens its own producer socket
    * (no driver round-trip), mirroring KafkaIO.publish. Expects
    * (key, value) string columns; extra columns ignored. */
  def publish(df: DataFrame, host: String, port: Int, topic: String): Unit =
    df.selectExpr("cast(key as string) as key", "cast(value as string) as value")
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val batch = rows.map(r => (r.getString(0), r.getString(1))).toSeq
        if (batch.nonEmpty) {
          val c = new KafkaLiteClient(host, port)
          try c.produceStrings(topic, batch) finally c.close()
          ()
        }
      }
}

final class KafkaLiteTable(host: String, port: Int, topics: Array[String])
    extends Table with SupportsRead {
  override def name(): String = s"kafkalite(${topics.mkString(",")})@$host:$port"
  override def schema(): StructType = KafkaLiteSourceProvider.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns
        with SupportsPushDownLimit {
      // column pruning: a query over `value` alone must not deserialize
      // and ship topic/partition/offset/key for every record — at
      // broker-borne 100 TB the payload column is the bulk, but the
      // metadata columns are still real bytes per record
      private var pruned: StructType = KafkaLiteSourceProvider.schema
      override def pruneColumns(requiredSchema: StructType): Unit =
        // preserve source column order regardless of projection order
        pruned = StructType(KafkaLiteSourceProvider.schema.fields
          .filter(f => requiredSchema.fieldNames.contains(f.name)))
      // limit pushdown: cap each partition's fetched range at `limit`
      // records (offsets are dense, so [from, from+limit) is exact per
      // partition). Partial push — Spark keeps its global Limit since
      // multiple partitions each contribute up to `limit`.
      private var limit: Option[Int] = None
      override def pushLimit(n: Int): Boolean = { limit = Some(n); false }
      override def build(): Scan = new KafkaLiteScan(host, port, topics,
        pruned, limit)
    }
}

final class KafkaLiteScan(host: String, port: Int, topics: Array[String],
    pruned: StructType, limit: Option[Int]) extends Scan {
  override def readSchema(): StructType = pruned
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new KafkaLiteMicroBatchStream(host, port, topics, pruned)
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val c = new KafkaLiteClient(host, port)
      try topics.flatMap { t =>
        val parts = c.partitionsOf(t).getOrElse(
          throw new IllegalArgumentException(s"unknown topic: $t"))
        (0 until parts).map { p =>
          val (lo, hi) = c.offsets(t, p)
          val capped = limit.fold(hi)(n => math.min(hi, lo + n))
          KafkaLiteInputPartition(host, port, t, p, lo, capped)
        }
      } finally c.close()
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new KafkaLiteReaderFactory(pruned.fieldNames)
  }
}

/** Streaming offset: per-(topic,partition) next-offset map, serialized
  * as ONE line of sorted `topic/partition=offset` entries joined by
  * `;` — Spark's HDFSMetadataLog stores one LINE per source, so the
  * encoding must stay newline-free (a multi-line json() reads back as
  * extra phantom sources on restart). */
final case class KafkaLiteOffset(next: Map[(String, Int), Long]) extends Offset {
  override def json(): String =
    next.toSeq.sortBy { case ((t, p), _) => (t, p) }
      .map { case ((t, p), o) => s"$t/$p=$o" }.mkString(";")
}

object KafkaLiteOffset {
  def parse(json: String): KafkaLiteOffset =
    KafkaLiteOffset(json.split(";").filter(_.nonEmpty).map { entry =>
      // split at the LAST delimiters: the broker validates topic names
      // against [a-zA-Z0-9._-], but stay robust to any legacy name by
      // never letting an embedded '=' or '/' shift the parse
      val eq = entry.lastIndexOf('=')
      val tp = entry.substring(0, eq); val off = entry.substring(eq + 1)
      val slash = tp.lastIndexOf('/')
      ((tp.substring(0, slash), tp.substring(slash + 1).toInt), off.toLong)
    }.toMap)
}

final class KafkaLiteMicroBatchStream(host: String, port: Int,
    topics: Array[String],
    pruned: StructType = KafkaLiteSourceProvider.schema)
    extends MicroBatchStream {

  private def withClient[A](f: KafkaLiteClient => A): A = {
    val c = new KafkaLiteClient(host, port)
    try f(c) finally c.close()
  }

  /** Current end offsets across all subscribed topics' partitions.
    * Partition count is re-read every batch, so topics growing
    * partitions between batches pick up the new ones (from offset 0). */
  override def latestOffset(): Offset = withClient { c =>
    KafkaLiteOffset(topics.flatMap { t =>
      val parts = c.partitionsOf(t).getOrElse(
        throw new IllegalArgumentException(s"unknown topic: $t"))
      (0 until parts).map(p => ((t, p), c.offsets(t, p)._2))
    }.toMap)
  }

  override def initialOffset(): Offset = withClient { c =>
    KafkaLiteOffset(topics.flatMap { t =>
      val parts = c.partitionsOf(t).getOrElse(
        throw new IllegalArgumentException(s"unknown topic: $t"))
      (0 until parts).map(p => ((t, p), 0L))
    }.toMap)
  }

  override def deserializeOffset(json: String): Offset =
    KafkaLiteOffset.parse(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KafkaLiteOffset].next
    val e = end.asInstanceOf[KafkaLiteOffset].next
    e.toSeq.sortBy { case ((t, p), _) => (t, p) }.flatMap { case ((t, p), hi) =>
      val lo = s.getOrElse((t, p), 0L) // new partition since `start`
      if (hi > lo) Some(KafkaLiteInputPartition(host, port, t, p, lo, hi))
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KafkaLiteReaderFactory(pruned.fieldNames)

  override def commit(end: Offset): Unit = () // offsets live in Spark's log
  override def stop(): Unit = ()
}

final case class KafkaLiteInputPartition(host: String, port: Int,
    topic: String, partition: Int, from: Long, until: Long)
    extends InputPartition

final class KafkaLiteReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KafkaLiteInputPartition]
    new PartitionReader[InternalRow] {
      private val client = new KafkaLiteClient(p.host, p.port)
      private var cursor = p.from
      private var buffer: Iterator[LiteRecord] = Iterator.empty
      private var current: LiteRecord = _

      override def next(): Boolean = {
        if (!buffer.hasNext && cursor < p.until) {
          val max = math.min(4096L, p.until - cursor).toInt
          buffer = client.fetch(p.topic, p.partition, cursor, max).iterator
        }
        if (buffer.hasNext) {
          current = buffer.next(); cursor = current.offset + 1
          cursor <= p.until || { current = null; false }
        } else false
      }

      override def get(): InternalRow =
        InternalRow.fromSeq(fields.toIndexedSeq.map {
          case "topic" => UTF8String.fromString(p.topic)
          case "partition" => p.partition
          case "offset" => current.offset
          case "key" =>
            if (current.key == null) null else UTF8String.fromBytes(current.key)
          case "value" =>
            if (current.value == null) null
            else UTF8String.fromBytes(current.value)
        })

      override def close(): Unit = client.close()
    }
  }
}
