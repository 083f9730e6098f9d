package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Print the EXECUTED plan (with runtime metrics) of a named query —
  * the iterate-until-it's-the-plan-you-want loop. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def walk(p: org.apache.spark.sql.execution.SparkPlan, depth: Int): Unit = {
      val interesting = p.metrics.filter { case (k, m) =>
        (k.contains("time") || k.contains("Time") || k == "numOutputRows" ||
          k == "numFiles" || k.contains("spill")) && m.value > 0
      }.map { case (k, m) => s"$k=${m.value}" }.mkString(" ")
      println(s"[metrics] ${"  " * depth}${p.nodeName} $interesting")
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan, depth + 1)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan, depth + 1)
        case r: org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec =>
          r.children.foreach(walk(_, depth + 1))
        case other => other.children.foreach(walk(_, depth + 1))
      }
    }
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t0 = System.nanoTime()
      df.collect()
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"[explain] ==== $name (${"%.3f".format(sec)} s) ====")
      walk(df.queryExecution.executedPlan, 0)
    }
    spark.stop()
  }
}
