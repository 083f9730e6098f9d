package graft

import graft.operators.{CurationQueries, PostingsIndex, TextQueries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r17 stored inverted postings index — the serving structure
  * behind x94/x133/x128 and `GET /search?q=`.
  *
  * Three layers of pins:
  *  1. CONTENT: every stored postings row (doc and chunk granularity)
  *     and both 1-row stats tables recomputed DRIVER-SIDE from raw
  *     fixture text with plain Scala loops — independent of every
  *     Spark expression the build uses (the CurationSpec stored-DSIR
  *     doctrine). The sf-corpus content pin is the driver gate itself
  *     (x141 + x94/x133/x128 hash-match DuckDB's recompute-from-raw).
  *  2. PLAN: the BM25 probes scan ONLY index tables — no `documents`
  *     scan anywhere in the serving plan (the r16 verdict's weak) —
  *     and the term filter is PUSHED into the token-clustered parquet
  *     scan.
  *  3. LIFECYCLE: append-only ingest extends the index O(batch) and
  *     lands byte-equal to a full rebuild; foreign appends and
  *     in-place rewrites are detected and rebuild (VectorIndex's
  *     checked contract).
  */
class PostingsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val W = 32
  private val S = 24
  private val MinTail = 8

  /** Driver-side truth: (docPostings, chunkPostings, stats, cstats)
    * from raw (doc_id, text) pairs — plain Scala, no Spark
    * expressions. Tokenizer mirror: split(" ", -1), Spark's split
    * semantics (trailing empties kept). */
  private def truth(docs: Seq[(Long, String)]) = {
    val nonNull = docs.filter(_._2 != null)
    val toks = nonNull.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val docPost = toks.flatMap { case (id, ts) =>
      ts.zipWithIndex.groupBy(_._1).map { case (tok, occ) =>
        (tok, id, ts.length, occ.size.toDouble,
          occ.map(_._2).sorted.toSeq)
      }
    }.toSet
    def maxCid(n: Int): Long =
      math.max(math.floor((n - MinTail).toDouble / S).toLong, 0L)
    val chunkPost = toks.flatMap { case (id, ts) =>
      val n = ts.length
      ts.zipWithIndex.flatMap { case (tok, p) =>
        val lo = math.max(math.floor((p - W).toDouble / S).toLong + 1, 0L)
        val hi = (p / S).toLong
        (lo to math.min(hi, maxCid(n)))
          .map(c => ((tok, id, c), math.min(W.toLong, n - c * S)))
      }
    }.groupBy(_._1).map { case ((tok, id, c), occ) =>
      (tok, id, c, occ.head._2, occ.size.toDouble)
    }.toSet
    val nTokens = toks.map(_._2.length.toLong).sum
    val chunks = toks.flatMap { case (_, ts) =>
      val n = ts.length
      (0L to math.max(math.floor((n - MinTail).toDouble / S).toLong, 0L))
        .map(c => math.min(W.toLong, n - c * S))
    }
    (docPost, chunkPost, (nTokens, nonNull.size.toLong, docs.size.toLong),
      (chunks.size.toLong, chunks.sum))
  }

  private def writeDocs(dir: String, docs: Seq[(Long, String)]): Unit =
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")

  // word soup long enough to cross several 24-stride chunk windows,
  // with repeated terms (tf > 1) and a null-text row
  private val fixture: Seq[(Long, String)] =
    (0L until 20L).map { i =>
      val words = (0 until (10 + (i * 7 % 60)).toInt).map { j =>
        Seq("alpha", "beta", "gamma", "delta", s"w${(i + j) % 13}")(
          ((i + j) % 5).toInt)
      }
      i -> words.mkString(" ")
    } :+ (20L -> null.asInstanceOf[String])

  test("stored postings/cpostings/stats recompute from raw text driver-side") {
    val dir = java.nio.file.Files.createTempDirectory("graft-post").toString
    writeDocs(dir, fixture)
    val ps = PostingsIndex.forDir(spark, dir)
    val (dp, cp, st, cst) = truth(fixture)
    val gotDp = ps.load("postings").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getDouble(3), r.getSeq[Int](4).toSeq)).toSet
    assert(gotDp === dp)
    // positional invariant: tf == |pos| on every stored row
    assert(gotDp.forall { case (_, _, _, tf, pos) => tf == pos.size })
    val gotCp = ps.load("cpostings").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(gotCp === cp)
    val gotSt = ps.load("stats").head
    assert((gotSt.getLong(0), gotSt.getLong(1), gotSt.getLong(2)) === st)
    val gotCst = ps.load("cstats").head
    assert((gotCst.getLong(0), gotCst.getLong(1)) === cst)
    // both 1-row tables stamp the corpus row count they reflect
    assert(gotCst.getLong(2) === fixture.size.toLong)
    assert(gotSt.getLong(2) === fixture.size.toLong)
    graft.tables.TempDirs.delete(dir)
  }

  test("ingest retry after a partial failure heals instead of duplicating") {
    // simulate an absorption that died after its FIRST write: the
    // corpus grew, the batch's doc-postings landed, nothing else did
    // (no cpostings, no stats commit). The retry must anti-join away
    // the landed rows, append the missing ones, and fold stats ONCE.
    val dir = java.nio.file.Files.createTempDirectory("graft-pheal").toString
    val base = fixture.take(15)
    val delta = fixture.drop(15)
    writeDocs(dir, base)
    val ps0 = PostingsIndex.forDir(spark, dir)
    delta.toDF("doc_id", "text").write.mode("append")
      .parquet(s"$dir/documents.parquet")
    ps0.append("postings",
      PostingsIndex.docPostingsOf(delta.toDF("doc_id", "text")))
    // retry = a plain ingest call over the same handed delta
    val ps1 = PostingsIndex.ingest(spark, dir, delta.toDF("doc_id", "text"))
    assert(ps1 eq ps0, "heal must ride the incremental path, not rebuild")
    val (dp, cp, st, cst) = truth(fixture)
    val gotDp = ps1.load("postings").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getDouble(3), r.getSeq[Int](4).toSeq))
    assert(gotDp.length === gotDp.toSet.size, "duplicate postings rows")
    assert(gotDp.toSet === dp)
    assert(ps1.load("cpostings").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet === cp)
    val s1 = ps1.load("stats").head
    assert((s1.getLong(0), s1.getLong(1), s1.getLong(2)) === st)
    val c1 = ps1.load("cstats").head
    assert((c1.getLong(0), c1.getLong(1)) === cst)
    assert(c1.getLong(2) === fixture.size.toLong)
    graft.tables.TempDirs.delete(dir)
  }

  test("BM25 probes scan only the index: no documents scan, pushed term filter") {
    val d = TestSpark.sf
    PostingsIndex.forDir(spark, d) // build outside the probe plan
    val doc = TextQueries.bm25ScoredFor(spark, d, Seq("hash", "join"))
    doc.collect()
    val pd = doc.queryExecution.executedPlan.toString
    assert(!pd.contains("documents.parquet"),
      s"doc-level serving probe still scans the corpus:\n$pd")
    assert(pd.contains("PushedFilters") && pd.contains("token"),
      s"term filter not pushed into the postings scan:\n$pd")
    val ch = CurationQueries.chunkBm25For(spark, d, Seq("hash", "join"))
    ch.collect()
    val pc = ch.queryExecution.executedPlan.toString
    assert(!pc.contains("documents.parquet"),
      s"chunk-level serving probe still scans the corpus:\n$pc")
    assert(pc.contains("PushedFilters") && pc.contains("token"),
      s"term filter not pushed into the cpostings scan:\n$pc")
  }

  test("phrase probe: adjacency, self-overlap, absent-term cases vs driver truth") {
    val dir = java.nio.file.Files.createTempDirectory("graft-phr").toString
    writeDocs(dir, Seq(
      (1L, "a b c x a b c"), // two exact occurrences
      (2L, "a b x c"),       // all terms, no 3-adjacency
      (3L, "a a a"),         // self-overlap fixture for "a a"
      (4L, "b c a"),         // all terms, wrong order
      (5L, "a b"),           // missing term → candidate filter drops it
      (6L, null)))
    def run(ph: Seq[String]) =
      TextQueries.phraseMatchesFor(spark, dir, ph).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(Seq("a", "b", "c")) === Map(1L -> 2L))
    // repeated-token phrase: intersecting pos("a") with itself
    // shifted by 1 is exactly the self-adjacency condition
    assert(run(Seq("a", "a")) === Map(3L -> 2L))
    // probe plan: index-only, term filter pushed
    val q = TextQueries.phraseMatchesFor(spark, dir, Seq("a", "b", "c"))
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("documents.parquet"),
      s"phrase probe still scans the corpus:\n$p")
    assert(p.contains("PushedFilters") && p.contains("token"),
      s"term filter not pushed into the phrase probe:\n$p")
    graft.tables.TempDirs.delete(dir)
  }

  test("proximity probe: order, span bound, anchor count vs driver truth") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prox").toString
    writeDocs(dir, Seq(
      (1L, "a x b x x c"),        // ordered, span 5 → within span=6, not 4
      (2L, "c b a"),              // all terms, wrong order → no match
      (3L, "a b c x x x a x b c"), // two anchors at span≥3
      (4L, "a x x x x x x b c"),  // span 8 → outside span=6
      (5L, "a b"),                // missing term → candidate filter drops
      (6L, null)))
    def run(span: Int) =
      TextQueries.proximityMatchesFor(spark, dir, Seq("a", "b", "c"), span)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(6) === Map(1L -> 1L, 3L -> 2L))
    assert(run(4) === Map(3L -> 2L))
    assert(run(8) === Map(1L -> 1L, 3L -> 2L, 4L -> 1L))
    // driver brute force across every doc and both spans, independent
    // of the array algebra: all (p1<p2<p3) triples in order within span
    val docs = Seq(1L -> "a x b x x c", 2L -> "c b a",
      3L -> "a b c x x x a x b c", 4L -> "a x x x x x x b c", 5L -> "a b")
    for (span <- Seq(4, 6, 8)) {
      val want = docs.flatMap { case (id, t) =>
        val ts = t.split(" ", -1)
        def pos(w: String) = ts.zipWithIndex.collect { case (x, p) if x == w => p }
        val n = pos("a").count(p1 => pos("b").exists(p2 => p2 > p1 &&
          p2 <= p1 + span && pos("c").exists(p3 => p3 > p2 && p3 <= p1 + span)))
        if (n > 0) Some(id -> n.toLong) else None
      }.toMap
      assert(run(span) === want, s"span=$span")
    }
    // plan: index-only, term filter pushed
    val q = TextQueries.proximityMatchesFor(spark, dir, Seq("a", "b", "c"), 6)
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("documents.parquet"))
    assert(p.contains("PushedFilters") && p.contains("token"))
    graft.tables.TempDirs.delete(dir)
  }

  test("prefix-vocab probe: range pushdown, values vs driver truth") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pfx").toString
    writeDocs(dir, fixture)
    val q = TextQueries.prefixVocabFor(spark, dir, "w")
    val got = q.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = fixture.filter(_._2 != null)
      .flatMap { case (id, t) => t.split(" ", -1).map(id -> _) }
      .filter(_._2.startsWith("w"))
      .groupBy(_._2)
      .map { case (tok, occ) =>
        (tok, occ.map(_._1).distinct.size.toLong, occ.size.toLong)
      }.toSet
    assert(got === want)
    assert(got.nonEmpty)
    // the prefix pushes into the token-sorted scan as a range — the
    // third pushdown class after IN (x94/x144) and point lookups
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("documents.parquet"),
      s"prefix probe still scans the corpus:\n$p")
    assert(p.contains("StringStartsWith"),
      s"prefix not pushed into the postings scan:\n$p")
    graft.tables.TempDirs.delete(dir)
  }

  test("best-window probe matches brute force incl. tie → smallest start") {
    val dir = java.nio.file.Files.createTempDirectory("graft-win").toString
    val docs = Seq(
      (1L, "q x x q q x x x x x q"), // tie between anchors 0 and 3
      (2L, "x q r"),                 // two terms, one window
      (3L, "x x x"),                 // no hits → absent from output
      (4L, null))
    writeDocs(dir, docs)
    val terms = Set("q", "r")
    val w = 4
    val expect = docs.collect { case (id, t) if t != null =>
      val hits = t.split(" ", -1).zipWithIndex
        .collect { case (tok, p) if terms(tok) => p }
      if (hits.isEmpty) None
      else {
        val best = hits.map(p => (hits.count(h => h >= p && h < p + w), p))
          .sortBy { case (c, p) => (-c, p) }.head
        Some((id, best._2.toLong, best._1.toLong))
      }
    }.flatten.toSet
    val got = TextQueries.bestWindowFor(spark, dir, terms.toSeq.sorted, w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expect)
    assert(got.contains((1L, 0L, 2L))) // the tie really broke to 0, not 3
    graft.tables.TempDirs.delete(dir)
  }

  test("ingest: append-only batch folds in O(batch) and equals a rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ping").toString
    val base = fixture.take(15)
    val delta = fixture.drop(15)
    writeDocs(dir, base)
    val ps0 = PostingsIndex.forDir(spark, dir)
    delta.toDF("doc_id", "text").write.mode("append")
      .parquet(s"$dir/documents.parquet")
    val ps1 = PostingsIndex.ingest(spark, dir,
      delta.toDF("doc_id", "text"))
    assert(ps1 eq ps0, "append-only ingest must not rebuild")
    // grown index == full-corpus truth, stats folded exactly
    val (dp, cp, st, cst) = truth(fixture)
    assert(ps1.load("postings").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getDouble(3), r.getSeq[Int](4).toSeq)).toSet === dp)
    assert(ps1.load("cpostings").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet === cp)
    val s1 = ps1.load("stats").head
    assert((s1.getLong(0), s1.getLong(1), s1.getLong(2)) === st)
    val c1 = ps1.load("cstats").head
    assert((c1.getLong(0), c1.getLong(1)) === cst)
    // and forDir serves the grown entry without rebuilding
    assert(PostingsIndex.forDir(spark, dir) eq ps0)
    // foreign append (corpus grew by more than the handed delta):
    // the covered-rows check forces a rebuild, never a partial index
    val extra = Seq((21L, "alpha beta"), (22L, "gamma delta"))
    val handed = Seq((21L, "alpha beta"))
    extra.toDF("doc_id", "text").write.mode("append")
      .parquet(s"$dir/documents.parquet")
    val ps2 = PostingsIndex.ingest(spark, dir, handed.toDF("doc_id", "text"))
    assert(!(ps2 eq ps1), "foreign append must rebuild")
    assert(ps2.load("stats").head.getLong(2) === fixture.size + 2L)
    // in-place rewrite with the SAME row count (an upsert): the
    // listing check detects it and rebuilds — a zero-row delta keeps
    // counts equal, content must still win
    writeDocs(dir, fixture ++ extra)
    val ps3 = PostingsIndex.ingest(spark, dir,
      handed.toDF("doc_id", "text").limit(0))
    assert(!(ps3 eq ps2), "same-count in-place rewrite must rebuild")
    graft.tables.TempDirs.delete(dir)
  }

  test("compact merges ingest segments, preserves content AND the sort/pushdown") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pcmp").toString
    // three ingest batches → three appended segments per table
    writeDocs(dir, fixture.take(8))
    PostingsIndex.forDir(spark, dir)
    Seq(fixture.slice(8, 14), fixture.slice(14, 21)).foreach { delta =>
      delta.toDF("doc_id", "text").write.mode("append")
        .parquet(s"$dir/documents.parquet")
      PostingsIndex.ingest(spark, dir, delta.toDF("doc_id", "text"))
    }
    val st = PostingsIndex.forDir(spark, dir)
    val before = st.load("postings").inputFiles.length
    val (dp, cp, _, _) = truth(fixture)
    PostingsIndex.compact(spark, dir)
    // fewer files (three segments merged into one sorted segment)
    assert(st.load("postings").inputFiles.length < before,
      s"compact did not reduce the file count (was $before)")
    // content byte-identical
    assert(st.load("postings").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getDouble(3), r.getSeq[Int](4).toSeq)).toSet === dp)
    assert(st.load("cpostings").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet === cp)
    // the sort survived: probes still push and skip
    val q = TextQueries.bm25ScoredFor(spark, dir, Seq("alpha", "beta"))
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("token"))
    assert(!p.contains("documents.parquet"))
    graft.tables.TempDirs.delete(dir)
  }

  test("empty and null-text batches fold as zeros, not nulls") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pnul").toString
    writeDocs(dir, fixture.take(5))
    val ps0 = PostingsIndex.forDir(spark, dir)
    val st0 = ps0.load("stats").head
    val nullBatch = Seq((30L, null.asInstanceOf[String]))
    nullBatch.toDF("doc_id", "text").write.mode("append")
      .parquet(s"$dir/documents.parquet")
    val ps1 = PostingsIndex.ingest(spark, dir,
      nullBatch.toDF("doc_id", "text"))
    assert(ps1 eq ps0)
    val st1 = ps1.load("stats").head
    assert(st1.getLong(0) === st0.getLong(0)) // token total unchanged
    assert(st1.getLong(1) === st0.getLong(1)) // doc count unchanged
    assert(st1.getLong(2) === st0.getLong(2) + 1) // rows grew
    graft.tables.TempDirs.delete(dir)
  }
}
