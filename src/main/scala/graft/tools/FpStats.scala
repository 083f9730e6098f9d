package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: distinct simhash fingerprint count per SF dir (sizes the
  * x25 quotient neighbor table). */
object FpStats {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (d <- args) {
      val docs = graft.sources.Tables.table(spark, d, "documents")
      val fps = graft.operators.DedupQueries.simhash64FpsOf(docs)
      val n = fps.select(col("f")).distinct().count()
      println(s"[fpstats] $d distinct_fps=$n docs=${docs.count()}")
    }
    spark.stop()
  }
}
