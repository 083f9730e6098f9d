package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query executes at sf0.001 and returns a sane shape.
  * (Value-level correctness is the driver's DuckDB gate, emulated by
  * tools/compare_oracle.py; this suite is the fast regression net.) */
class QueryCorpusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // queries where an empty result is legitimate at tiny SF
  private val mayBeEmpty = Set("x7_ngram_jaccard", "x8_minhash_lsh",
    "x10_embed_neardup", "x39_boilerplate")

  SparkEntry.declared.foreach { q =>
    test(s"${q.name} executes") {
      val out = q.build(spark, TestSpark.sf)
      val n = out.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
      assert(out.columns.nonEmpty)
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle name is a declared query with matching columns promise") {
    val qnames = SparkEntry.queries.keySet
    SparkEntry.oracleSql.keys.foreach(k => assert(qnames.contains(k)))
  }

  test("minhash LSH finds a subset of the exact near-dup pairs") {
    val exact = SparkEntry.queries("x7_ngram_jaccard")(spark, TestSpark.sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("x8_minhash_lsh")(spark, TestSpark.sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH produced a pair the exact join did not")
    if (exact.nonEmpty)
      assert(lsh.size >= exact.size / 2,
        s"LSH recall too low: ${lsh.size}/${exact.size}")
  }
}
