package graft

import graft.operators.{CurationQueries, DedupQueries}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r15 curation composites: hybrid-retrieval fusion arithmetic, DSIR
  * weight recompute, span-containment completeness on an adversarial
  * fixture, and chunking coverage invariants. */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def sf = TestSpark.sf

  // ------------------------------------------------------------- x128
  test("x128: rrf is exactly the rank formula and arms stay consistent") {
    val rows = CurationQueries.hybridFused(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      val lex = Option(r.get(1)).map(_.asInstanceOf[Long])
      val den = Option(r.get(2)).map(_.asInstanceOf[Long])
      assert(lex.nonEmpty || den.nonEmpty, "a fused doc must come from an arm")
      lex.foreach(k => assert(k >= 1 && k <= 20))
      den.foreach(k => assert(k >= 1 && k <= 20))
      val expect = lex.map(k => 1.0 / (60 + k)).getOrElse(0.0) +
        den.map(k => 1.0 / (60 + k)).getOrElse(0.0)
      assert(math.abs(r.getDouble(3) - expect) < 5e-7,
        s"rrf mismatch for doc ${r.get(0)}: ${r.getDouble(3)} vs $expect")
    }
    // descending rrf with doc_id tie-break (the declared order)
    val rrfs = rows.map(r => (-r.getDouble(3), r.getLong(0)))
    assert(rrfs.sameElements(rrfs.sorted), "fused order must be (rrf desc, doc_id)")
    // the dense arm's rank-1 is the query vector itself (cosine 1.0),
    // so doc 0 must appear with den_rank 1 wherever it fuses
    rows.find(_.getLong(0) == 0L).foreach { r =>
      assert(r.getLong(2) == 1L, "doc 0 (the query vector) must be dense rank 1")
    }
  }

  // ------------------------------------------------------------- x129
  /** Driver-side DSIR weight recompute from raw text for an arbitrary
    * target language — verifies the STORED per-(corpus, target) table,
    * not just the build plan. */
  private def dsirRecomputeFor(targetLang: String): Unit = {
    val docs = Tables.table(spark, sf, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val B = 64
    def bucket(tok: String): Int = {
      val m = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      val hex = m.map("%02x".format(_)).mkString.take(4)
      Integer.parseInt(hex, 16) % B
    }
    val docBk = docs.map { case (id, lang, text) =>
      (id, lang, text.split(" ", -1).map(bucket).groupBy(identity)
        .map { case (k, v) => k -> v.length.toLong })
    }
    val ct = Array.fill(B)(0L); val cr = Array.fill(B)(0L)
    docBk.foreach { case (_, lang, m) =>
      m.foreach { case (bk, c) =>
        cr(bk) += c; if (lang == targetLang) ct(bk) += c
      }
    }
    val tt = ct.sum; val tr = cr.sum
    val lr = Array.tabulate(B)(bk => math.log(
      ((ct(bk) + 1).toDouble / (tt + B)) / ((cr(bk) + 1).toDouble / (tr + B))))
    val want = docBk.map { case (id, _, m) =>
      id -> m.map { case (bk, c) => c * lr(bk) }.sum
    }.toMap
    val got = CurationQueries.dsirWeights(spark, sf,
        CurationQueries.DsirTarget.lang(targetLang)).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, w) =>
      assert(math.abs(w - want(id)) < 1e-3, s"doc $id: $w vs ${want(id)}")
    }
  }

  test("x129: weights equal an independent driver-side recompute") {
    dsirRecomputeFor("en")
  }

  test("x143: a NON-default target's stored weights recompute from raw text") {
    // the parameterized-target build (r17): same pipeline, 'de' as the
    // target distribution, its own stored table
    dsirRecomputeFor("de")
    // per-(corpus, target) cache entries coexist — the default build
    // is not evicted by the variant, and both serve from cache
    val en = graft.operators.DsirIndex.forDir(spark, sf)
    val de = graft.operators.DsirIndex.forDir(spark, sf,
      CurationQueries.DsirTarget.lang("de"))
    assert(!(en eq de), "distinct targets must be distinct builds")
    assert(graft.operators.DsirIndex.forDir(spark, sf) eq en)
    assert(graft.operators.DsirIndex.forDir(spark, sf,
      CurationQueries.DsirTarget.lang("de")) eq de)
    // a doc-id-set target is a usable knob too (the curated-seed
    // workflow): weights exist for every scored doc and the target
    // docs rank high against themselves
    val seed = graft.operators.CurationQueries.DsirTarget.docIds(Seq(1L, 2L, 3L))
    val w = CurationQueries.dsirWeights(spark, sf, seed)
    assert(w.count() === Tables.table(spark, sf, "documents")
      .filter(col("text").isNotNull).count())
  }

  test("x129 build: the corpus scan+explode stage is reused, not recomputed") {
    // the BUILD plan (runs once per corpus version inside DsirIndex):
    // the 64-row log-ratio table must derive from the doc-bucket
    // aggregate's own exchange, not a second tokenize pass
    val df = CurationQueries.dsirWeightsRaw(spark, sf)
    df.collect() // AQE finalizes the plan during execution
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
      s"dc pipeline executed twice:\n$p")
  }

  test("x129/x134 probe the stored weight table, never the corpus") {
    // probes ride DsirIndex's build-once table: neither declared plan
    // may scan documents.parquet (the r15 shape re-ran the full
    // tokenize pass per invocation — x134 paid x129's pipeline twice)
    Seq("x129_dsir_selection", "x134_dsir_resample").foreach { q =>
      val p = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!p.contains("documents.parquet"),
        s"$q probe still scans the corpus:\n$p")
    }
    // and the index is served from cache on a second touch (same
    // TableStore instance — the fingerprint hit path)
    val a = graft.operators.DsirIndex.forDir(spark, sf)
    val b = graft.operators.DsirIndex.forDir(spark, sf)
    assert(a eq b, "unchanged corpus must serve the cached index")
  }

  test("x134: sample keys are weight + deterministic Gumbel; noise reorders") {
    val got = SparkEntry.queries("x134_dsir_resample")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.nonEmpty && got.length <= 50)
    got.foreach { case (id, w, key) =>
      val m = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val u = (Integer.parseInt(
        m.map("%02x".format(_)).mkString.take(6), 16) + 0.5) / 16777216.0
      val gum = -math.log(-math.log(u))
      // dsir_weight rounds to 4 and sample_key to 6, so the recompute
      // agrees within the combined rounding slack
      assert(math.abs((key - w) - gum) < 6e-5,
        s"doc $id: key $key != weight $w + gumbel $gum")
    }
    // the noise must actually matter: the resample is NOT the pure
    // weight top-k (otherwise the Gumbel leg is dead code)
    val topByWeight = CurationQueries.dsirWeights(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, w) => (-w, id) }.take(got.length).map(_._1).toSet
    assert(got.map(_._1).toSet != topByWeight,
      "Gumbel noise should reorder the sample away from the pure top-k")
  }

  // ------------------------------------------------------------- x130
  test("x130: finds the embedded-span doc, skips near-dups, misses nothing") {
    import spark.implicits._
    // base doc with distinctive runs; A = a contiguous interior span of
    // base (span containment, low Jaccard); D = exact copy of base
    // (near-dup, must be EXCLUDED by the jaccard < 0.8 guard); C, E =
    // unrelated docs sharing no runs
    val words = (0 until 60).map(i => s"w$i")
    val base = words.mkString(" ")
    val span = words.slice(20, 40).mkString(" ")
    val other = (0 until 60).map(i => s"v$i").mkString(" ")
    val other2 = (0 until 30).map(i => s"u$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, span), (3L, other), (4L, base), (5L, other2))
      .toDF("doc_id", "text")
    val got = DedupQueries.spanContainmentPairs(
      DedupQueries.winnowSetsOf(docs)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // the span is contained in base AND in base's exact copy; the
    // (1,4) twin pair itself is a near-dup (jaccard 1) and must NOT
    // appear — that's x7/x8/x25's catch, not this query's
    assert(got.map(p => (p._1, p._2)).toSet == Set((1L, 2L), (2L, 4L)),
      s"expected the two (base-ish, span) pairs, got ${got.toSeq}")
    got.foreach { case (_, _, cont, jac) =>
      assert(cont >= 0.6 && cont <= 1.0)
      assert(jac < 0.8, "a containment pair must sit below the near-dup bar")
    }
    // completeness oracle: brute-force all-pairs verify over the same
    // fp sets must agree (the prefix probe may only add candidates the
    // exact verify rejects, never lose a qualifying pair)
    val sz = docs
      .select(col("doc_id"), graft.functions.TextFns.winnowFps(
        split(col("text"), " ")).as("fps"))
      .withColumn("n", size(col("fps")))
    val brute = sz.as("a").join(sz.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter",
        size(array_intersect(col("a.fps"), col("b.fps"))))
      .filter(col("inter") * 10 >= least(col("a.n"), col("b.n")) * 6 &&
        col("inter") * 5 < (col("a.n") + col("b.n") - col("inter")) * 4)
      .select(col("a.doc_id"), col("b.doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(brute.toSet == got.map(p => (p._1, p._2)).toSet,
      "prefix-probe candidates must be complete for containment >= 0.6")
  }

  // ------------------------------------------------------------- x131
  test("x131: chunks cover every token, respect W/S/tail rules, fp parity") {
    val chunks = CurationQueries.chunkFrame(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val docs = Tables.table(spark, sf, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(chunks.keySet == docs.keySet, "every non-null doc must chunk")
    chunks.foreach { case (id, cs) =>
      val n = docs(id)
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._2 == 0L, s"doc $id must emit chunk 0")
      // contiguous chunk ids (stride admission never skips a window)
      assert(sorted.map(_._2).sameElements(sorted.indices.map(_.toLong)))
      sorted.foreach { case (_, cid, ntok, _) =>
        val st = cid * 24
        assert(ntok == math.min(32, n - st),
          s"doc $id chunk $cid: n_tok $ntok for start $st of $n")
        if (cid > 0) assert(n - st >= 8, "tails under 8 tokens must drop")
      }
      // coverage: the last emitted chunk reaches the end of the doc
      // (dropped tails are inside the previous chunk's 8-token overlap)
      val (_, lastCid, lastTok, _) = sorted.last
      assert(lastCid * 24 + lastTok >= n, s"doc $id tail uncovered")
    }
    // a single-chunk doc's fp is x5's whole-doc rolling fingerprint
    val oneChunk = chunks.filter { case (id, cs) =>
      cs.length == 1 && docs(id) <= 32 }
    assert(oneChunk.nonEmpty, "fixture should hold a <=32-token doc")
    val fps = Tables.table(spark, sf, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), graft.functions.TextFns.fingerprint(
        split(col("text"), " ")).as("fp")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    oneChunk.foreach { case (id, cs) =>
      assert(cs.head._4 == fps(id), s"doc $id single-chunk fp != doc fp")
    }
  }

  // ------------------------------------------------------------- x133
  test("x133: arithmetic chunk meta is row-identical to the slice pipeline") {
    val meta = CurationQueries.chunkMeta(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val slices = CurationQueries.chunkFrame(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(meta === slices,
      "chunkMeta (token-count arithmetic) must equal chunkRowsOf (slices)")
  }

  test("x133: top chunks carry the exact per-chunk term frequencies") {
    import org.apache.spark.sql.functions.{col => c}
    val docs = Tables.table(spark, sf, "documents")
      .filter(c("text").isNotNull)
      .select(c("doc_id"), c("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    val terms = Set("hash", "join", "filter")
    val got = SparkEntry.queries("x133_chunk_bm25")(spark, sf).collect()
    assert(got.length == 10)
    got.foreach { r =>
      val (id, cid) = (r.getLong(0), r.getLong(1))
      val ts = docs(id)
      val ck = ts.slice((cid * 24).toInt,
        math.min(cid * 24 + 32, ts.length).toInt)
      assert(ck.exists(terms), s"chunk ($id,$cid) in the top-10 must hold a term")
      assert(r.getDouble(2) > 0.0)
    }
  }

  test("x133: chunk arithmetic matches slices for every length 1..200") {
    // the fixture corpus only exercises the token counts it happens to
    // contain; this drives the chunkMeta/chunkRowsOf pair through every
    // doc length a boundary could hide in (tail exactly 8, exactly 7,
    // multiples of the stride, single-token, sub-window)
    import spark.implicits._
    val docs = (1 to 200).map(n =>
      (n.toLong, (0 until n).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val slices = CurationQueries.chunkRowsOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // arithmetic twin over the same lengths, recomputed in plain Scala
    val want = (1 to 200).flatMap { n =>
      (0 to math.max((n - 8) / 24, 0)).filter(i => i == 0 || n - i * 24 >= 8)
        .map(i => (n.toLong, i.toLong, math.min(32, n - i * 24).toLong))
    }.toSet
    assert(slices === want)
    // coverage: every token position of every length is inside a chunk
    (1 to 200).foreach { n =>
      val covered = want.collect { case (d, i, len) if d == n =>
        (i * 24) until (i * 24 + len) }.flatten.toSet
      assert(covered === (0 until n).toSet, s"length $n has uncovered tokens")
    }
  }

  // ------------------------------------------------------------- x132
  test("x132: dup-chunk groups agree with a recount over the chunk frame") {
    val chunks = CurationQueries.chunkFrame(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(4)))
    val want = chunks.groupBy(_._2)
      .map { case (key, occ) => key -> ((occ.map(_._1).distinct.length,
        occ.length)) }
      .filter(_._2._1 > 1)
    val got = SparkEntry.queries("x132_dup_chunks")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1).toInt, r.getLong(2).toInt)))
      .toMap
    assert(got.nonEmpty, "fixture should hold cross-doc duplicate chunks")
    // top-50 is a subset of the recount with identical counts
    got.foreach { case (key, counts) =>
      assert(want.get(key).contains(counts),
        s"key $key: $counts vs ${want.get(key)}")
    }
    if (want.size <= 50) assert(got.keySet == want.keySet)
  }
}
