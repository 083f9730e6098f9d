package graft

import java.nio.file.Files
import graft.streaming.Flows
import graft.tables.TableStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming throughput bench: pushes every lineitem row of
  * SPARK_GRAFT_SF_DIR through the FULL admission flow (validation,
  * redelivery dedup, per-key fold, table swaps, rejection log) as one
  * micro-batch and prints one JSON line with requests/sec.
  *
  * Context for the number: the reference consumes ONE message at a
  * time per topic partition (single-partition topics, blocking
  * channel, commit-per-message — clientes.yaml:151, inventario/
  * main.go:50-66), so its ceiling is a few hundred messages/sec per
  * consumer. The flow here admits the same semantics per key with
  * cross-key parallelism. */
object StreamBench {
  case class R(id: String, evento: String, email: String, cantidad: Int, seq: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val root = Files.createTempDirectory("graft-streambench").toString
    val store = new TableStore(spark, root)
    store.init("inventario", spark.read.parquet(s"$sfDir/part.parquet").select(
      col("p_partkey").cast("string").as("id"),
      col("p_partkey").cast("string").as("nombre"),
      (col("p_size") * 1000).as("capacidad"),
      lit("Cat").as("categoria"), lit("A").as("estado"),
      lit(null).cast("string").as("idres"),
      lit(null).cast("string").as("email"),
      lit(null).cast("int").as("canres")))
    store.init("reservas", graft.sources.Tables.reservas(spark).limit(0))

    val requests = spark.read.parquet(s"$sfDir/lineitem.parquet").select(
      lower(md5(concat(col("l_orderkey"), lit("-"), col("l_linenumber"),
        lit("-"), col("l_partkey")))).substr(1, 24).as("id"),
      col("l_partkey").cast("string").as("evento"),
      lit("e@y.z").as("email"),
      col("l_quantity").cast("int").as("cantidad"),
      (col("l_orderkey") * 10 + col("l_linenumber")).as("seq"))
      .as[R].collect()

    val flows = new Flows(spark, store)
    // multi-partition source: a single-partition MemoryStream would
    // serialize every scan of the 600k-row batch through one thread
    val ms = MemoryStream[R](spark, cpus.toInt)
    val tAdd = System.nanoTime()
    ms.addData(requests.toSeq)
    val addSecs = (System.nanoTime() - tAdd) / 1e9
    val t0 = System.nanoTime()
    val q = flows.admissionFlow(ms.toDS().toDF())
    q.processAllAvailable(); q.stop()
    val secs = (System.nanoTime() - t0) / 1e9
    System.err.println(f"[streambench] addData encode: $addSecs%.1fs, flow: $secs%.1fs")
    val n = requests.length
    val admitted = store.load("reservas").count()
    println(s"""{"metric":"admission_throughput","requests":$n,""" +
      s""""admitted":$admitted,"sec":$secs,"req_per_sec":${(n / secs).toLong},"sf":"$sfDir"}""")
    spark.stop()
  }
}
