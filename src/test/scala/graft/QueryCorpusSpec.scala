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

  test("x40 canonical corpus = documents minus x34's non-canonical members") {
    val all = graft.sources.Tables.table(spark, TestSpark.sf, "documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val nonCanonical = SparkEntry.queries("x34_dedup_clusters")(spark, TestSpark.sf)
      .filter(org.apache.spark.sql.functions.not(
        org.apache.spark.sql.functions.col("canonical")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val kept = SparkEntry.queries("x40_dedup_canonical")(spark, TestSpark.sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === (all -- nonCanonical))
  }

  test("x120 canonical is the max-quality member of its x34 cluster") {
    import org.apache.spark.sql.functions._
    val members = SparkEntry.queries("x34_dedup_clusters")(spark, TestSpark.sf)
      .select("doc_id", "cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(members.nonEmpty, "fixture has no near-dup clusters")
    val q = graft.sources.Tables.table(spark, TestSpark.sf, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        size(array_distinct(split(col("text"), " "))).cast("long").as("dt"),
        col("n_chars"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val expected = members.groupBy(_._2).map { case (cl, ms) =>
      val best = ms.map(_._1).maxBy(id => (q(id)._1, q(id)._2, -id))
      cl -> ((best, ms.length.toLong))
    }
    val got = SparkEntry.queries("x120_quality_canonical")(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (cl, (best, n)) =>
      val (canonical, nMembers, moved) = got(cl)
      assert(canonical === best, s"cluster $cl elected $canonical, want $best")
      assert(nMembers === n, s"cluster $cl member count")
      assert(moved === (best != cl), s"cluster $cl moved flag")
    }
  }

  test("x122 quality corpus = documents minus x120's losing cluster members") {
    val all = graft.sources.Tables.table(spark, TestSpark.sf, "documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val winners = SparkEntry.queries("x120_quality_canonical")(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val losers = SparkEntry.queries("x34_dedup_clusters")(spark, TestSpark.sf)
      .select("doc_id", "cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .collect { case (doc, cl) if winners(cl) != doc => doc }.toSet
    val kept = SparkEntry.queries("x122_quality_corpus")(spark, TestSpark.sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === (all -- losers))
    assert(losers.nonEmpty, "fixture must exercise the drop path")
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
