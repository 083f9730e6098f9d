package graft

import graft.functions.expressions.TextExpressions
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Null-element and misuse contracts for the codegen text expressions:
  * the declared `containsNull = true` inputs must not NPE, and the
  * semantics must match the HOF/relational formulations the
  * expressions replace (null poisons the long-valued folds; min-style
  * reductions skip nulls; wrong input types fail at analysis). */
class TextNullSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("flagged/flaggedCount/flaggedSpans: edge arrays (empty, all-flagged, boundary runs)") {
    import spark.implicits._
    import graft.functions.TextFns
    val lex = Seq("bad", "worse")
    val df = Seq(
      (1L, Seq[String]()),                                   // empty: 0/0
      (2L, Seq("bad", "worse", "ok", "bad")),                // 3 flagged, 2 runs
      (3L, Seq("bad", "bad")),                               // all-flagged: 1 run
      (4L, Seq("ok", "fine"))                                // clean: 0/0
    ).toDF("id", "ts")
    val rows = df.select(col("id"),
        TextFns.flaggedCount(TextFns.flagged(col("ts"), lex)).as("n"),
        TextFns.flaggedSpans(TextFns.flagged(col("ts"), lex)).as("sp"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the empty array is the review-caught case: sequence(0, -1) is
    // DESCENDING and its i = -1 leg would hit element_at(fl, 0) — the
    // guard must short-circuit to 0 spans, not error
    assert(rows.toSeq === Seq((1L, 0L, 0L), (2L, 3L, 2L),
      (3L, 2L, 1L), (4L, 0L, 0L)))
  }

  test("flaggedSpans property: engine equals a naive run counter on 500 seeded random arrays") {
    import spark.implicits._
    import graft.functions.TextFns
    val lex = Seq("x")
    // seeded RNG keeps runs reproducible without a resolver-side
    // scalacheck (the InvariantSpec doctrine); lengths 0..24 cover
    // the empty array, the all-flagged array and every boundary shape
    val rng = new scala.util.Random(1616L)
    val cases: Seq[(Int, Seq[String])] = (0 until 500).map { i =>
      val n = rng.nextInt(25)
      (i, Seq.fill(n)(if (rng.nextBoolean()) "x" else "o"))
    }
    def refSpans(ts: Seq[String]): Long = {
      var spans = 0L; var in = false
      ts.foreach { t =>
        val f = t == "x"
        if (f && !in) spans += 1
        in = f
      }
      spans
    }
    val got = cases.toDF("id", "ts")
      .select(col("id"),
        TextFns.flaggedCount(TextFns.flagged(col("ts"), lex)).as("n"),
        TextFns.flaggedSpans(TextFns.flagged(col("ts"), lex)).as("sp"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    cases.foreach { case (i, ts) =>
      assert(got(i) === ((ts.count(_ == "x").toLong, refSpans(ts))),
        s"case $i: ${ts.mkString(" ")}")
    }
  }

  test("rolling_fp and simhash16: null element → null result (fold poisoning)") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[String]("a", "b", "c")),
      (2L, Seq[String]("a", null, "c")),
      (3L, Seq[String]())
    ).toDF("id", "ts")
    val rows = df.select(col("id"),
        TextExpressions.rolling_fp(col("ts")).as("fp"),
        TextExpressions.simhash16(col("ts")).as("sh"))
      .orderBy("id").collect()
    assert(!rows(0).isNullAt(1) && !rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1), "null token must null the fingerprint")
    assert(rows(1).isNullAt(2), "null token must null the simhash")
    // empty array: fold of nothing is the seed (0), not null
    assert(rows(2).getLong(1) === 0L)
  }

  test("simhash64: bit arithmetic matches the reference fold; null poisons; dup-multiset invariance") {
    import spark.implicits._
    // reference recompute: big-endian first 8 md5 bytes per token,
    // per-bit ±1 sign counts — the definition the DuckDB oracle's
    // hex-digit arithmetic mirrors
    def ref(tokens: Seq[String]): Long = {
      val counts = new Array[Int](64)
      tokens.foreach { t =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8"))
        val v = (0 until 8).foldLeft(0L)((a, i) => (a << 8) | (d(i) & 0xffL))
        (0 until 64).foreach(j =>
          counts(j) += (if (((v >>> j) & 1L) == 1L) 1 else -1))
      }
      (0 until 64).foldLeft(0L)((a, j) =>
        if (counts(j) > 0) a | (1L << j) else a)
    }
    val toks = Seq("alpha", "beta", "gamma", "中文", "x")
    val df = Seq(
      (1L, toks),
      (2L, toks ++ toks),                  // duplicated multiset
      (3L, Seq[String]("a", null, "c")),   // null poisoning
      (4L, Seq[String]())
    ).toDF("id", "ts")
    val rows = df.select(col("id"),
        TextExpressions.simhash64(col("ts")).as("f"))
      .orderBy("id").collect()
    assert(rows(0).getLong(1) === ref(toks))
    // duplicating every token preserves all sign counts → identical
    // fingerprint (the Hamming-0 twin construction the election
    // specs use)
    assert(rows(1).getLong(1) === rows(0).getLong(1))
    assert(rows(2).isNullAt(1), "null token must null the simhash")
    assert(rows(3).getLong(1) === 0L)
  }

  test("minhash_bands: null shingles skipped (array_min semantics)") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[String]("x y z", "p q r")),
      (2L, Seq[String]("x y z", null, "p q r")), // same non-null content
      (3L, Seq[String](null, null))
    ).toDF("id", "s")
    val rows = df.select(col("id"),
        TextExpressions.minhash_bands(col("s")).as("b"))
      .orderBy("id").collect()
    assert(rows(0).getSeq[String](1) === rows(1).getSeq[String](1),
      "null shingles must not change the signature")
    assert(rows(2).getSeq[String](1).forall(_ == null),
      "all-null set behaves like empty: null bands")
  }

  test("shingles over a null-bearing token array: concat_ws skip semantics") {
    import spark.implicits._
    val withNull = Seq(Seq[String]("a", null, "b", "c"))
      .toDF("ts").select(TextExpressions.shingles_distinct(col("ts")).as("s"))
    // concat_ws skips nulls: ("a", null, "b") → "a b"
    assert(withNull.collect().head.getSeq[String](0) ===
      Seq("a b", "b c"))
  }

  test("shingles_all: duplicates kept in order; empty below n; HOF parity") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "b", "a", "b", "a")), // repeats must survive
      (2L, Seq("x")),                     // shorter than n → EMPTY
      (3L, Seq("a", null, "b"))           // concat_ws skips nulls
    ).toDF("id", "ts")
    val rows = df.select(col("id"),
        TextExpressions.shingles_all(col("ts"), 2).as("g"))
      .orderBy("id").collect()
    assert(rows(0).getSeq[String](1) === Seq("a b", "b a", "a b", "b a"))
    assert(rows(1).getSeq[String](1) === Seq.empty)
    assert(rows(2).getSeq[String](1) === Seq("a", "b"))
    // distinct-by-first-occurrence of shingles_all == shingles_distinct
    val both = df.select(
        array_distinct(TextExpressions.shingles_all(col("ts"), 2)).as("a"),
        TextExpressions.shingles_distinct(col("ts"), 2).as("d"))
      .collect()
    both.foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
    // HOF parity where the sequence formulation is well-defined (n ≤ len)
    val hof = df.filter(size(col("ts")) >= 2)
      .select(col("id"), transform(sequence(lit(0), size(col("ts")) - 2),
        i => concat_ws(" ", col("ts")(i), col("ts")(i + 1))).as("g"))
      .orderBy("id").collect()
    val exprSide = df.filter(size(col("ts")) >= 2)
      .select(col("id"), TextExpressions.shingles_all(col("ts"), 2).as("g"))
      .orderBy("id").collect()
    assert(exprSide.map(_.getSeq[String](1)).toSeq ===
      hof.map(_.getSeq[String](1)).toSeq)
  }

  test("char_ngrams: HOF parity, short-string emptiness, multibyte chars") {
    import spark.implicits._
    val df = Seq(
      (1L, "abcdefg"),
      (2L, "aaaa"),      // duplicates collapse
      (3L, "ab"),        // shorter than n → EMPTY (the sequence+substr
                         // HOF would fabricate junk via a descending range)
      (4L, ""),
      (5L, "héllo wörld") // char (not byte) offsets
    ).toDF("id", "text")
    val rows = df.select(col("id"),
        TextExpressions.char_ngrams(col("text"), 3).as("g"))
      .orderBy("id").collect()
    assert(rows(0).getSeq[String](1) ===
      Seq("abc", "bcd", "cde", "def", "efg"))
    assert(rows(1).getSeq[String](1) === Seq("aaa", "aa" + "a").distinct)
    assert(rows(2).getSeq[String](1) === Seq.empty)
    assert(rows(3).getSeq[String](1) === Seq.empty)
    // parity with array_distinct(transform(sequence(...), substr))
    // where that formulation is well-defined (len >= n)
    val hof = df.filter(length(col("text")) >= 3)
      .select(col("id"), array_distinct(transform(
        sequence(lit(1), length(col("text")) - 2),
        i => col("text").substr(i, lit(3)))).as("g"))
      .orderBy("id").collect()
    val exprSide = df.filter(length(col("text")) >= 3)
      .select(col("id"), TextExpressions.char_ngrams(col("text"), 3).as("g"))
      .orderBy("id").collect()
    assert(exprSide.map(_.getSeq[String](1)).toSeq ===
      hof.map(_.getSeq[String](1)).toSeq)
  }

  test("misuse fails at analysis time, not codegen") {
    import spark.implicits._
    val df = Seq((1, "not an array")).toDF("id", "s")
    val e = intercept[Exception] {
      df.select(TextExpressions.simhash16(col("s"))).collect()
    }
    assert(e.isInstanceOf[AnalysisException] ||
      e.getMessage.contains("array<string>"),
      s"expected analysis error, got: ${e.getClass} ${e.getMessage}")
  }
}
