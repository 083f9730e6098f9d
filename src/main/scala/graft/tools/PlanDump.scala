package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dump the FORMATTED physical plan of named queries as markdown
  * sections — the generator for PLANS.md entries (run at sf0.001 like
  * the existing sections so the file stays small and stable). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"<<<PLAN $name>>>")
      println(s"## $name")
      println("```")
      println(formatted.trim)
      println("```")
      println(s"<<<END $name>>>")
    }
    spark.stop()
  }
}
