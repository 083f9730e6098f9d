package graft.tools
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** One-off: per-batch wall-clock of the gated document-ingest flow at
  * sf0.1 (10 chunks), with Spark job names visible — identifies which
  * store op dominates a trigger. */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobT = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val site = Option(js.properties)
            .map(_.getProperty("callSite.short", "?")).getOrElse("?")
          jobT.put(js.jobId, (System.nanoTime(), site)); ()
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobT.remove(je.jobId)).foreach { case (t0, site) =>
            val d = (System.nanoTime() - t0) / 1e9
            println(f"[job] $d%.2fs  $site")
          }
        }
      })
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val root = Files.createTempDirectory("graft-ingprobe").toString
    val store = new graft.tables.TableStore(spark, root)
    val flows = new graft.streaming.IngestionFlows(spark, store, root,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
      quality = graft.streaming.IngestQuality(minTokens = 2),
      sourceCapPct = Some(3))
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"),
        col("source").cast("string"))
      .as[(Long, String, String)].collect()
    val ms = MemoryStream[(Long, String, String)](spark, 32)
    val q = flows.documentIngestFlow(ms.toDS().toDF("doc_id", "text", "source"))
    val chunk = (docs.length + 9) / 10
    docs.grouped(chunk).zipWithIndex.foreach { case (c, i) =>
      val t0 = System.nanoTime()
      ms.addData(c.toSeq)
      q.processAllAvailable()
      println(s"[probe] batch $i: ${(System.nanoTime()-t0)/1e9}s")
    }
    q.stop()
    spark.stop()
    graft.tables.TempDirs.delete(root)
  }
}
