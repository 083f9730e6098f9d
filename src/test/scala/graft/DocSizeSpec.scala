package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.scalatest.funsuite.AnyFunSuite

/** Doc-size scaling audit for the per-row HOF surfaces (the x65
  * lesson: higher-order functions are CodegenFallback, and an
  * interpreted per-row chain can turn superlinear under size/memory
  * pressure — 19 s → 0.39 s when x65 was fused). x68's
  * transform/slice/array_distinct chain and x84's winnow explode are
  * per-row-bounded BY DESIGN; this pins that the bound actually holds
  * at 50 kB documents: two corpora with the SAME total token count
  * but 10× different per-doc size must do comparable WORK (linear in
  * doc size ⇒ equal work; a quadratic per-doc term would show up as
  * ~10×). The metric is summed executor CPU time, not wall-clock:
  * ThreadMXBean CPU nanoseconds don't advance while a task is
  * descheduled, so shared-VM contention — which lifts wall-clock
  * 25–50% and flaked the r12 form of this suite — mostly cancels out
  * of the ratio. */
class DocSizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** nDocs docs of `tokens` tokens each, fixture schema, seeded. */
  private def writeCorpus(nDocs: Int, tokens: Int): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-docsize").toString
    val langs = Seq("en", "es", "de", "fr", "zh")
    val rows = (0 until nDocs).map { id =>
      val rnd = new scala.util.Random(id * 7919 + tokens)
      // small vocabulary → realistic repetition for array_distinct /
      // winnow minima; occasional longer words vary gram hashes
      val text = Array.fill(tokens)("w" + rnd.nextInt(500)).mkString(" ")
      (id.toLong, text, langs(id % langs.length), "web",
        text.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** Runs the query and returns the summed executor CPU seconds of
    * every task it scheduled (the noop write executes the full plan). */
  private def cpuSecondsOf(name: String, dir: String): Double = {
    val cpuNs = new AtomicLong(0L)
    val l = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) {
          cpuNs.addAndGet(t.taskMetrics.executorCpuTime); ()
        }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      // task-end events deliver async: drain the listener bus EXACTLY
      // (stability polling is a heuristic that can exit early across a
      // mid-drain stall and silently truncate the CPU sum)
      TestSpark.drainListenerBus(spark)
    } finally spark.sparkContext.removeSparkListener(l)
    cpuNs.get() / 1e9
  }

  private def minOf3(body: => Double): Double = (1 to 3).map(_ => body).min

  // ~340k tokens either way: 400 × ~5 kB docs vs 40 × ~50 kB docs
  private lazy val smallDir = writeCorpus(400, 850)
  private lazy val bigDir = writeCorpus(40, 8500)

  private def linearCheck(query: String): Unit = {
    // warmup: codegen + parquet footer caches + stored-index builds
    cpuSecondsOf(query, smallDir); cpuSecondsOf(query, bigDir)
    val cSmall = minOf3(cpuSecondsOf(query, smallDir))
    val cBig = minOf3(cpuSecondsOf(query, bigDir))
    // linear ⇒ ratio ≈ 1 (same total tokens); quadratic per-doc ⇒ ~10×.
    // 3× + a 0.5 cpu-s floor absorbs GC-time attribution noise while
    // still failing decisively on a superlinear regression.
    assert(cBig <= 3.0 * cSmall + 0.5,
      f"$query superlinear in doc size: $cSmall%.2f cpu-s on 400×850-token " +
        f"docs vs $cBig%.2f cpu-s on 40×8500-token docs (same total tokens)")
  }

  test("x68 intra-doc dedup chain is linear in doc size at 50 kB docs") {
    linearCheck("x68_intradoc_dedup")
  }

  test("x84 split-leakage winnow pass is linear in doc size at 50 kB docs") {
    linearCheck("x84_split_leakage")
  }

  test("x85 span removal is linear in doc size at 50 kB docs") {
    linearCheck("x85_span_removal")
  }

  test("x95 min-run span removal is linear in doc size at 50 kB docs") {
    linearCheck("x95_span_removal_runs")
  }
}
