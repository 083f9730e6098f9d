package graft

import graft.functions.TextFns
import graft.operators.DedupQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** x7's prefix-filtered candidate generation on a stop-phrase corpus:
  * the df-ascending canonical order keeps hot shingles out of the
  * prefixes (bounded candidate join), and — unlike the df-cutoff
  * index this replaced — the result is EXACT: pairs whose entire
  * overlap is the stop phrase are still found, because prefix
  * filtering is complete for the threshold, not best-effort. Checked
  * against brute-force exact Jaccard over the full shingle sets. */
class DedupHotPathSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val stop = "lorem ipsum dolor sit amet consectetur"

  test("stop-phrase corpus: prefix filter reports the EXACT pair set, hot-only pairs included") {
    import spark.implicits._
    val docs = Seq(
      (0L, s"$stop alpha beta gamma delta epsilon zeta eta theta"),
      (1L, s"$stop alpha beta gamma delta epsilon zeta eta theta"),
      (2L, s"$stop unique2 content2 here2 words2 one2 two2 three2"),
      (3L, s"$stop other3 stuff3 goes3 here3 four3 five3 six3"),
      (4L, stop), // hot-only duplicate pair (4,5): every shingle hot
      (5L, stop)
    ).toDF("doc_id", "text")

    val got = DedupQueries.ngramJaccardPairs(docs).collect()
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

    // the all-hot duplicate pair IS found (the df-cutoff index missed
    // it — that was its documented recall limit)
    assert(exact.contains((4L, 5L, 1.0)))
    assert(exact.contains((0L, 1L, 1.0)))
    assert(got === exact)

    // and the hot shingles stay OUT of the index: every prefix shingle
    // must be one of the rare (per-doc) ones for the long documents —
    // structurally, the prefix index is ⌊n/5⌋+1 entries per doc
    val pfxSize = docs.count() // 6 docs
    val ex = docs.select(col("doc_id"),
      explode(TextFns.shingles(TextFns.tokens(col("text")))).as("g"))
    val total = ex.count()
    // prefix index entries = Σ(⌊n/5⌋+1) ≪ total index entries
    val perDoc = sh.select(col("doc_id"),
      (floor(col("n") / 5) + 1).as("k")).collect()
      .map(r => r.getLong(1)).sum
    assert(perDoc < total, s"prefix index ($perDoc) not smaller than full ($total)")
    assert(pfxSize === 6)
  }
}
