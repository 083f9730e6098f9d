package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query executes at sf0.001 and returns a sane shape.
  * (Value-level correctness is the driver's DuckDB gate, emulated by
  * tools/compare_oracle.py; this suite is the fast regression net.) */
class QueryCorpusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // queries where an empty result is legitimate at tiny SF
  private val mayBeEmpty = Set("x7_ngram_jaccard", "x8_minhash_lsh",
    "x10_embed_neardup", "x39_boilerplate",
    // the 50-doc corpus holds no span-subset document (the first one
    // appears at sf0.01 — the driver gate and CurationSpec's fixture
    // cover the non-empty path)
    "x130_span_containment")

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

  test("x123 curriculum: per-lang permutation, staged by quality, shuffled within stage") {
    val rows = SparkEntry.queries("x123_curriculum_order")(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val byPos = rs.sortBy(_._2)
      assert(byPos.map(_._2).toSeq === (1L to rs.length).toSeq,
        s"$lang: pos must be a 1..n permutation")
      val stages = byPos.map(_._4)
      assert(stages.zip(stages.tail).forall { case (a, b) => a <= b },
        s"$lang: stage must be non-decreasing along the schedule")
      assert(stages.distinct.sorted.toSeq === (1L to stages.distinct.length).toSeq)
    }
    // the intra-stage order is a genuine shuffle somewhere: at least
    // one stage emits docs out of doc_id order
    val shuffled = rows.groupBy(r => (r._1, r._4)).exists { case (_, rs) =>
      val ids = rs.sortBy(_._2).map(_._3)
      ids.length > 2 && ids.toSeq != ids.sorted.toSeq
    }
    assert(shuffled, "every stage came out doc_id-sorted — no shuffle happened")
  }

  test("x124 pairs: positives are x34 cluster members, negatives are far band-collisions") {
    val pairs = SparkEntry.queries("x124_contrastive_pairs")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val clusters = SparkEntry.queries("x34_dedup_clusters")(spark, TestSpark.sf)
      .select("doc_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nearDup = SparkEntry.queries("x25_simhash_neardup")(spark, TestSpark.sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pos = pairs.filter(_._3 == "pos")
    val neg = pairs.filter(_._3 == "neg")
    assert(pos.nonEmpty && neg.nonEmpty, "fixture must exercise both classes")
    pos.foreach { case (a, b, _, _) =>
      assert(clusters(b) === a, s"positive ($a,$b) must anchor b's cluster")
    }
    assert(pos.length === clusters.count { case (doc, cl) => doc != cl },
      "every non-anchor member mines exactly one positive")
    neg.foreach { case (a, b, _, h) =>
      assert(h >= 3 && h <= 6, s"negative ($a,$b) hamming $h out of range")
      assert(!nearDup((a, b)), s"negative ($a,$b) is actually a near-dup")
    }
    // the scale guard: at most k=3 negatives per anchor (the uncapped
    // band set goes quadratic under fingerprint-space saturation —
    // measured 2.5M pairs at sf0.1)
    neg.groupBy(_._1).foreach { case (a, ns) =>
      assert(ns.length <= 3, s"anchor $a carries ${ns.length} negatives")
    }
    // class disjointness: no pair may be labeled both ways, and no
    // negative may join two docs of the SAME component (closure
    // chains reach Hamming 3–6 — review-caught double labels)
    val posSet = pos.map(p => (p._1, p._2)).toSet
    neg.foreach { case (a, b, _, _) =>
      assert(!posSet((a, b)), s"($a,$b) labeled both pos and neg")
      assert(clusters.get(a).isEmpty || clusters.get(b).isEmpty ||
        clusters(a) != clusters(b), s"($a,$b) negative within one component")
    }
  }

  test("x125 scorecard columns re-derive from x121 and x25") {
    val docs = graft.sources.Tables.table(spark, TestSpark.sf, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val cap = SparkEntry.queries("x121_source_cap")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(3)))
    val paired = SparkEntry.queries("x25_simhash_neardup")(spark, TestSpark.sf)
      .select("doc_a", "doc_b").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val card = SparkEntry.queries("x125_source_scorecard")(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4))))
      .toMap
    val expCapped = cap.filter(!_._3).groupBy(_._2).view.mapValues(_.length.toLong)
    val expPaired = paired.toSeq.map(docs).groupBy(identity).view.mapValues(_.length.toLong)
    card.foreach { case (src, (nDocs, nPair, nCapped)) =>
      assert(nCapped === expCapped.getOrElse(src, 0L), s"$src capped count")
      assert(nPair === expPaired.getOrElse(src, 0L), s"$src pair participation")
      assert(nDocs === docs.values.count(_ == src), s"$src doc count")
    }
    assert(card.values.exists(_._3 > 0) || expCapped.isEmpty,
      "cap column never exercised")
  }

  test("x126 funnel: monotone survivorship, stage anchors re-derive") {
    val rows = SparkEntry.queries("x126_retention_funnel")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._2).toSeq ===
      Seq("all", "exact_dedup", "near_dedup", "quality",
        "decontaminated", "source_cap"))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3 && b._4 <= a._4,
        s"funnel grew from ${a._2} to ${b._2}")
    }
    val q21 = SparkEntry.queries("q21_dedup_exact")(spark, TestSpark.sf)
      .collect().head
    assert(rows(0)._3 === q21.getLong(0), "stage 0 = corpus doc count")
    assert(rows(1)._3 === q21.getLong(1), "stage 1 = q21's distinct-text count")
    // the near-dup stage drops exactly x40's drop list ∩ exact-dedup
    // survivors; the decontamination stage drops x86's roster ∩ prior
    // survivors — re-derive both counts from the anchor queries
    val x40Kept = SparkEntry.queries("x40_dedup_canonical")(spark, TestSpark.sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val exactKept = graft.sources.Tables.table(spark, TestSpark.sf, "documents")
      .groupBy("text").agg(org.apache.spark.sql.functions.min(
        org.apache.spark.sql.functions.col("doc_id")).as("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows(2)._3 === (exactKept & x40Kept).size.toLong,
      "stage 2 = exact-dedup survivors that x40 keeps")
    val x86Dropped = SparkEntry.queries("x86_decontaminate")(spark, TestSpark.sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows(4)._3 >= rows(5)._3 && rows(3)._3 - rows(4)._3 <=
      x86Dropped.size.toLong,
      "stage 4 drops at most x86's roster")
    assert(rows(5)._3 > 0, "the full funnel must leave survivors")
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
