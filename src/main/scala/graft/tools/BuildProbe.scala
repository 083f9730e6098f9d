package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the stored-index BUILD tier (r18: the builds
  * were never profiled — they are excluded from the bench's timed
  * `value` by design, but at corpus scale they ARE the pipeline).
  * Forces each fingerprint-versioned build in a fresh JVM and prints
  * StoredIndexes.buildLog — min-of-1 per JVM by construction, so A/B
  * runs compare one cold build against one cold build in the same
  * window. Not part of the engine. */
object BuildProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only: Set[String] = args.toSet
    def on(k: String) = only.isEmpty || only(k)
    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[build] $label total=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    if (on("postings"))
      t("postings")(graft.operators.PostingsIndex.forDir(spark, sfDir))
    if (on("simhash"))
      t("simhash")(graft.operators.SimhashIndex.forDir(spark, sfDir))
    if (on("shingle"))
      t("shingle")(graft.operators.ShingleIndex.forDir(spark, sfDir))
    if (on("bucketed")) // forDir is object-private: force via its query
      t("bucketed")(graft.SparkEntry.queries("x37_colocated_join")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    if (on("srp"))
      t("srp")(graft.SparkEntry.queries("x150_srp_radius_curve")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    import scala.jdk.CollectionConverters._
    graft.operators.StoredIndexes.buildLog.asScala.toSeq.sortBy(_._1)
      .foreach { case (k, v) => println(f"[buildlog] $k ${v.toDouble}%.2fs") }
    spark.stop()
  }
}
