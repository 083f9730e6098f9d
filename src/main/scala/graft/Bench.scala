package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Each query is forced through a `noop`-format write so the full plan
  * materializes (a bare count() would let Catalyst prune projections).
  * One untimed warmup PASS over the suite amortizes JVM/codegen cost,
  * then two timed passes over the whole suite give two time-separated
  * samples per query; the recorded time is their min (contention noise
  * is one-sided) — steady-state execution, what a long-lived cluster
  * actually sees.
  *
  * Hygiene between queries: nothing in any query builder persists or
  * caches (verified — a cached subtree would both pin storage memory
  * and let a later run silently read an earlier run's cache), and an
  * explicit GC tick runs after each query OUTSIDE the timed section.
  * Spark's ContextCleaner releases broadcast/shuffle/RDD state only
  * when driver-side references are garbage-collected; across 70+
  * queries × 2 runs on one JVM, waiting for organic GC lets dead
  * state accumulate until allocation-heavy queries pay for it in GC
  * thrash (observed: 20–100× degradation late in a run). The JSON
  * line carries per-query GC seconds so any regression is visible in
  * the recorded artifact, not just locally. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // safety net: periodic ContextCleaner GC every 60s instead of the
      // 30min default (a full bench run can finish inside one default
      // interval, i.e. with zero cleanups)
      .config("spark.cleaner.periodicGC.interval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // Executed-plan fingerprint per timed run, recorded next to the
    // times so an anomalous sample is attributable from the artifact
    // alone (r10's x39 and r11's x72 ~17 s anomalies each cost a full
    // adjudication cycle because the artifact could not distinguish
    // an AQE plan-flip from environment noise). The fingerprint is a
    // compact node census of the FINAL adaptive plan: join strategies
    // actually chosen, exchange/reuse counts, scans, explodes, and
    // observed spill — identical fingerprints across runs/rounds rule
    // out a plan flip; a changed one names the node class that moved.
    def fingerprint(root: org.apache.spark.sql.execution.SparkPlan): String = {
      import org.apache.spark.sql.execution.adaptive._
      val counts = scala.collection.mutable.LinkedHashMap[String, Int]()
      var spill = 0L
      def walk(n: org.apache.spark.sql.execution.SparkPlan): Unit = {
        val name = n.nodeName
        val key =
          if (name.contains("BroadcastHashJoin")) "BHJ"
          else if (name.contains("SortMergeJoin")) "SMJ"
          else if (name.contains("ShuffledHashJoin")) "SHJ"
          else if (name.contains("BroadcastNestedLoopJoin")) "BNLJ"
          else if (name.contains("CartesianProduct")) "CART"
          else if (name.contains("ReusedExchange")) "REX"
          else if (name.contains("Exchange")) "EX"
          else if (name.contains("Generate")) "GEN"
          else if (name.contains("Scan")) "SCAN"
          else null
        if (key != null) counts.update(key, counts.getOrElse(key, 0) + 1)
        n.metrics.foreach { case (k, m) =>
          if (k.toLowerCase.contains("spill") && m.value > 0) spill += m.value
        }
        n match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: QueryStageExec => walk(q.plan)
          case o => o.children.foreach(walk)
        }
      }
      walk(root)
      val parts = counts.map { case (k, v) => s"$k$v" }.toSeq ++
        (if (spill > 0) Seq(s"SPILL${spill >> 20}M") else Nil)
      parts.mkString("+")
    }
    val planHolder = new java.util.concurrent.atomic.AtomicReference[String](null)
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        try planHolder.set(fingerprint(qe.executedPlan))
        catch { case _: Throwable => () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    })
    // The listener bus is async and some query builders run their own
    // driver-side jobs during construction, so after the noop write
    // returns we wait (untimed) until the LAST delivered fingerprint —
    // the write's own, FIFO order — is stable.
    def drainPlan(): String = {
      var last: String = null
      var stable = 0
      var waited = 0
      while (stable < 3 && waited < 3000) {
        Thread.sleep(50); waited += 50
        val cur = planHolder.get()
        if (cur != null && cur == last) stable += 1
        else { last = cur; stable = 0 }
      }
      if (last == null) "none" else last
    }

    def gcSeconds(): Double = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime.max(0L)).sum / 1e3
    }

    val names = SparkEntry.queries.keys.toSeq.sorted

    // One untimed warmup PASS over the whole suite, then two timed
    // PASSES — i.e. the two samples of a query are separated by a full
    // suite traversal (~30s+), not run back-to-back. Back-to-back
    // min-of-2 still records contention spikes: a sustained busy window
    // on a shared VM poisons BOTH adjacent samples (r10: x39 recorded
    // 16.5s in the driver artifact vs a 0.66-1.08s local band).
    // Interleaving makes the two samples independent draws, so min-of-2
    // actually rejects one-sided noise. Per-run times are kept in the
    // artifact ("runs") so a consumer can see both samples, and "gc" is
    // the GC delta of the run that produced the min.
    def timedPass(): Map[String, (Double, Double, String)] = names.map { name =>
      val fn = SparkEntry.queries(name)
      try {
        planHolder.set(null)
        val g0 = gcSeconds()
        val t0 = System.nanoTime()
        exec(fn)
        val sec = (System.nanoTime() - t0) / 1e9
        val gc = gcSeconds() - g0
        val fp = drainPlan() // untimed: async listener-bus drain
        System.gc() // untimed: release dead broadcast/shuffle refs now
        (name, (sec, gc, fp))
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          (name, (-1.0, 0.0, "failed"))
      }
    }.toMap

    names.foreach { name => // warmup: codegen + parquet footer caches
      try exec(SparkEntry.queries(name))
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name warmup failed: ${e.getMessage}") }
    }
    System.gc()
    val passes = Seq(timedPass(), timedPass())
    val results = names.map { name =>
      val samples = passes.map(_(name))
      val ok = samples.filter(_._1 >= 0)
      val (sec, gc, _) = if (ok.isEmpty) (-1.0, 0.0, "failed") else ok.minBy(_._1)
      (name, sec, gc, samples.map(_._1), samples.map(_._3))
    }
    // the driver records a bounded TAIL of stdout: keep the line short
    // (3-decimal times) and put the headline total LAST so a front-
    // truncated capture still contains it (BENCH_r03 lost its total to
    // exactly this). The full line is also written to bench_out.json.
    def r3(v: Double): Double = math.round(v * 1000) / 1e3
    val qs = results.map { case (k, v, _, _, _) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val gcs = results.map { case (k, _, g, _, _) => "\"" + k + "\":" + r3(g) }
      .mkString("{", ",", "}")
    val runs = results.map { case (k, _, _, rs, _) =>
      "\"" + k + "\":" + rs.map(r3).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // per-run plan fingerprints; runs of one query almost always agree,
    // so collapse to one string when they do (a 2-element array is the
    // plan-flip signal)
    val plans = results.map { case (k, _, _, _, fps) =>
      val v =
        if (fps.distinct.size == 1) "\"" + fps.head + "\""
        else fps.map("\"" + _ + "\"").mkString("[", ",", "]")
      "\"" + k + "\":" + v
    }.mkString("{", ",", "}")
    // amortized build cost of the stored indexes (IVF/SRP/shingle),
    // paid during warmup: the timed numbers above are probe-only by
    // design (build-once/probe-many serving accounting), and this
    // section is what keeps that honest in the recorded artifact
    val builds = {
      import scala.jdk.CollectionConverters._
      graft.operators.StoredIndexes.buildLog.asScala.toSeq.sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + r3(v) }
        .mkString("{", ",", "}")
    }
    val total = r3(results.map(_._2).filter(_ >= 0).sum)
    val line =
      s"""{"metric":"total","unit":"sec","sf":"$sfDir","protocol":"min-of-2-interleaved","queries":$qs,"gc":$gcs,"runs":$runs,"plan":$plans,"build":$builds,"value":$total}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      (line + "\n").getBytes)
    catch { case _: Throwable => () }
    println(line)
    spark.stop()
  }
}
