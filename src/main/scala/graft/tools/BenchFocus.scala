package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Focused bench for iterating on individual queries: runs the named
  * queries (args; default the dedup trio) ROUNDS times each inside one
  * JVM and prints per-round seconds, so a change's effect can be read
  * against the box's minute-to-minute noise (±40% per single run —
  * BENCH history shows identical code ranging 2–10s) instead of one
  * sample. Same session config and noop-write forcing as Bench. */
object BenchFocus {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_FOCUS_ROUNDS", "5").toInt
    val names = if (args.nonEmpty) args.toSeq
      else Seq("x7_ngram_jaccard", "x8_minhash_lsh", "x36_contamination")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "60s")
    // ad-hoc conf experiments (A/B a planner rule or threshold without
    // editing this tool): SPARK_GRAFT_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def exec(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach(exec) // warmup: codegen + index builds
    val times = (1 to rounds).map { r =>
      val row = names.map(n => n -> exec(n))
      System.gc()
      row
    }
    names.zipWithIndex.foreach { case (n, i) =>
      val xs = times.map(_(i)._2)
      println(f"[focus] $n%-22s min=${xs.min}%.3f med=${xs.sorted.apply(xs.size / 2)}%.3f max=${xs.max}%.3f")
    }
    spark.stop()
  }
}
