package graft

import graft.functions.TextFns
import graft.operators.DedupQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** x7's hot-shingle correction path is dead code at fixture scale (max
  * df 25 < MaxDf 64) — this spec drives it with a stop-phrase corpus
  * and a low cutoff so the df-cutoff actually prunes, and checks the
  * reported pairs against brute-force exact Jaccard over the full
  * shingle sets. */
class DedupHotPathSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val stop = "lorem ipsum dolor sit amet consectetur"

  test("stop-phrase corpus: hot correction restores exact jaccard; hot-only pairs stay unreported") {
    import spark.implicits._
    val docs = Seq(
      (0L, s"$stop alpha beta gamma delta epsilon zeta eta theta"),
      (1L, s"$stop alpha beta gamma delta epsilon zeta eta theta"),
      (2L, s"$stop unique2 content2 here2 words2 one2 two2 three2"),
      (3L, s"$stop other3 stuff3 goes3 here3 four3 five3 six3"),
      (4L, stop), // hot-only duplicate pair (4,5): every shingle hot
      (5L, stop)
    ).toDF("doc_id", "text")
    val maxDf = 2

    // the cutoff must actually prune here, unlike on the fixture
    val ex = docs.select(col("doc_id"),
      explode(TextFns.shingles(TextFns.tokens(col("text")))).as("g"))
    val hotCount = ex.groupBy("g").count().filter(col("count") > maxDf).count()
    assert(hotCount > 0, "corpus must produce hot shingles")

    val got = DedupQueries.ngramJaccardPairs(docs, maxDf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // brute-force exact pairs over the FULL shingle sets
    val sh = docs.select(col("doc_id"),
      TextFns.shingles(TextFns.tokens(col("text"))).as("s"))
      .withColumn("n", size(col("s")))
    val a = sh.select(col("doc_id").as("doc_a"), col("s").as("sa"),
      col("n").as("na"))
    val b = sh.select(col("doc_id").as("doc_b"), col("s").as("sb"),
      col("n").as("nb"))
    val exact = a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= 0.8)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // (4,5) is an exact duplicate but shares only hot shingles — the
    // documented recall limit of any df-cutoff index: no candidate row
    assert(exact.contains((4L, 5L, 1.0)))
    val expected = exact - ((4L, 5L, 1.0))
    assert(expected.nonEmpty, "corpus must contain reportable near-dups")
    // (0,1) shares hot AND cold shingles: reported, and its jaccard is
    // the exact full-set value (the hot correction term at work —
    // cold-count alone would understate the intersection)
    assert(expected.contains((0L, 1L, 1.0)))
    assert(got === expected)
  }
}
