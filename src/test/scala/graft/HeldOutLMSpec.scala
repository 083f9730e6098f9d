package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Held-out stupid-backoff scoring (x97): all three rungs of the
  * Brants '07 ladder — seen bigram, bigram→unigram backoff, and the
  * OOV penalty the corpus fixture cannot reach (its eval vocabulary
  * is train-covered) — verified against hand-computed scores on a
  * synthetic split. doc_ids are chosen by their md5 bucket: 1,2 are
  * train (<80), 5 is val (80–89), 8 is test (>=90). */
class HeldOutLMSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def corpus(rows: (Long, String)*): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-heldout").toString
    rows.toSeq.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(dir: String): Map[String, org.apache.spark.sql.Row] =
    SparkEntry.queries("x97_backoff_lm")(spark, dir)
      .collect().map(r => r.getAs[String]("split") -> r).toMap

  test("all three rungs score as specified; OOV rung reachable") {
    // train: "a b" ×2 and "a c" — model: c(a)=3, c(b)=2(=b twice via
    // doc 2), c(c)=1, N=6; bigrams: (a,b)=2, (b,a)=1, (a,c)=1
    // wait — keep it explicit: doc1 = "a b a b", doc2 = "a c"
    //   unigrams: a=3, b=2, c=1, N=6
    //   bigrams: "a b"=2, "b a"=1, "a c"=1
    val dir = corpus(
      (1L, "a b a b"),
      (2L, "a c"),
      // val doc 5: bigrams "a b" (seen), "b c" (unseen, both known →
      // backoff), "c zzz" (zzz OOV → penalty)
      (5L, "a b c zzz"),
      // test doc 8: single seen bigram
      (8L, "a c"))
    val out = run(dir)
    val lnAB = math.log(2.0 / 3.0) // c(ab)/c(a)
    val lnBC = math.log(0.4) + math.log(1.0 / 6.0) // α·c(c)/N
    val vExp = BigDecimal((lnAB + lnBC + -10.0) / 3.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val v = out("val")
    assert(v.getAs[Long]("n_docs") === 1L)
    assert(v.getAs[Double]("avg_lp") === vExp)
    assert(v.getAs[Long]("n_backoff") === 1L)
    assert(v.getAs[Long]("n_oov") === 1L)
    val t = out("test")
    val tExp = BigDecimal(math.log(1.0 / 3.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(t.getAs[Double]("avg_lp") === tExp)
    assert(t.getAs[Long]("n_backoff") === 0L && t.getAs[Long]("n_oov") === 0L)
  }

  test("eval docs with fewer than 2 tokens are out of frame; train docs never scored") {
    val dir = corpus(
      (1L, "x y x y"),
      (5L, "x"), // 1 token: no bigram, no row
      (8L, "y x"))
    val out = run(dir)
    assert(!out.contains("val"))
    assert(out("test").getAs[Long]("n_docs") === 1L)
    assert(out.size === 1) // train never appears in the output
  }
}
