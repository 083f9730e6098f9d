package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Doc-size scaling audit for the per-row HOF surfaces (the x65
  * lesson: higher-order functions are CodegenFallback, and an
  * interpreted per-row chain can turn superlinear under size/memory
  * pressure — 19 s → 0.39 s when x65 was fused). x68's
  * transform/slice/array_distinct chain and x84's winnow explode are
  * per-row-bounded BY DESIGN; this pins that the bound actually holds
  * at 50 kB documents: two corpora with the SAME total token count
  * but 10× different per-doc size must run in comparable wall-clock
  * (linear in doc size ⇒ equal work; a quadratic per-doc term would
  * show up as ~10×). */
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

  private def runQ(name: String, dir: String): Unit = {
    SparkEntry.queries(name)(spark, dir)
      .write.format("noop").mode("overwrite").save()
  }

  private def minOf3(body: => Unit): Double =
    (1 to 3).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }.min

  // ~340k tokens either way: 400 × ~5 kB docs vs 40 × ~50 kB docs
  private lazy val smallDir = writeCorpus(400, 850)
  private lazy val bigDir = writeCorpus(40, 8500)

  private def linearCheck(query: String): Unit = {
    runQ(query, smallDir); runQ(query, bigDir) // warmup: codegen+footers
    val tSmall = minOf3(runQ(query, smallDir))
    val tBig = minOf3(runQ(query, bigDir))
    // linear ⇒ ratio ≈ 1 (same total tokens); quadratic per-doc ⇒ ~10×.
    // 3× + a 0.3 s floor absorbs shared-VM noise while still failing
    // decisively on a superlinear regression.
    assert(tBig <= 3.0 * tSmall + 0.3,
      f"$query superlinear in doc size: $tSmall%.2f s on 400×850-token docs " +
        f"vs $tBig%.2f s on 40×8500-token docs (same total tokens)")
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
}
