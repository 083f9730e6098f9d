package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scale-shape audit: the physical plans must have the properties that
  * keep these queries viable at 100 TB — predicate pushdown to the
  * scan, column pruning, broadcast joins for dims, top-k instead of
  * global sort. Regressions here are performance bugs even when
  * results stay correct. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString

  test("x90: plan construction triggers zero jobs (stats scalar rides in-plan)") {
    // GET /query/x90_pmi_bigrams/plan must not execute anything: the
    // bigram denominator is a 1-row broadcast from the stored stats
    // table, not a driver `.head`. Warm the fingerprint-cached model
    // build first (lawful first-touch metadata), then assert the plan
    // build itself schedules no QUERY-EXECUTION job. (DataFrameReader
    // .parquet fires a tiny footer/schema-inference job per table read
    // — bounded metadata every builder pays, lawful under the /plan
    // contract — so those are excluded by stage callsite.)
    graft.operators.UnigramLM.forDir(spark, TestSpark.sf)
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.add(j.stageInfos.map(_.name).mkString(";")); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      SparkEntry.queries("x90_pmi_bigrams")(spark, TestSpark.sf)
        .queryExecution.executedPlan.toString
      // listener delivery is async; drain the bus exactly before
      // reading the job log
      TestSpark.drainListenerBus(spark)
    } finally spark.sparkContext.removeSparkListener(l)
    val exec = jobs.toArray(Array.empty[String])
      .filterNot(_.startsWith("parquet at "))
    assert(exec.isEmpty,
      s"building x90's plan ran execution jobs: ${exec.mkString(", ")}")
  }

  test("q2_point: predicate pushed to parquet scan") {
    val p = plan("q2_point")
    assert(p.contains("PushedFilters") && p.contains("c_custkey"),
      s"no pushdown in:\n$p")
    assert(p.matches("(?s).*PushedFilters: \\[[^\\]]*EqualTo\\(c_custkey,42\\).*"),
      s"point predicate not pushed:\n$p")
  }

  test("q1_scan: column pruning reaches the scan") {
    val p = plan("q1_scan")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("r_comment"), "reads columns it does not need")
  }

  test("q16_join3: dimension joins are broadcast, not shuffled") {
    val p = plan("q16_join3")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dim join shuffled:\n$p")
  }

  test("q9_semijoin: broadcast left-semi") {
    val p = plan("q9_semijoin")
    assert(p.contains("LeftSemi"), s"not a semi join:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"semi join not broadcast:\n$p")
  }

  test("q13_topk: TakeOrderedAndProject, no global sort") {
    val p = plan("q13_topk")
    assert(p.contains("TakeOrderedAndProject"), s"top-k does a full sort:\n$p")
  }

  test("q18_tpch1: partial aggregation before the shuffle") {
    val p = plan("q18_tpch1")
    assert(p.contains("partial_"), s"no map-side combine:\n$p")
  }

  test("x7_ngram_jaccard: inverted-index join is an equi-join, not cartesian") {
    val p = plan("x7_ngram_jaccard")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"near-dup join degenerated to a cross product:\n$p")
  }

  test("x7: the prefix-index self-join reuses one exchange (pipeline computed once)") {
    // the candidate join's two sides are the same prefix pipeline —
    // ReuseExchange must dedupe them, or every run pays the shingle
    // explode + two windows twice
    val df = SparkEntry.queries("x7_ngram_jaccard")(spark, TestSpark.sf)
    df.collect() // AQE finalizes the plan during execution
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
      s"prefix pipeline executed twice:\n$p")
  }

  test("no query degenerates to a cross product except the intended all-pairs ones") {
    // crossJoin-by-design: ONLY the single-row broadcasts remain — the
    // query-vector joins and x47's scalar total-bigram-count join
    // (x10's all-pairs baseline is gone — LSH-prefiltered since r7, so
    // no declared query carries an O(n²) join anymore)
    val intended = Set("q23_knn", "x9_knn_cosine", "x11_ann_lsh",
      "x20_ann_ivf", "x47_colloc_lift",
      "x61_tfidf", // 1-row corpus-count broadcast into the score
      "x83_triangles", // 1-row edges × 1-row triangles combine
      "x90_pmi_bigrams", // 1-row stored-stats (N_b) broadcast
      "x94_bm25", // 1-row stored-stats (N, avglen) broadcast
      "x97_backoff_lm", // 1-row stored-stats (N_train) broadcast
      "x107_tpch22", // 1-row (Σbal, n) population-screen broadcast
      "x118_cluster_split", // 1-row straddling-invariant broadcast
      "x121_source_cap", // 1-row corpus-cap broadcast
      "x125_source_scorecard", // same 1-row cap broadcast via sourceCapScores
      "x126_retention_funnel", // same 1-row cap broadcast via sourceCapScores
      "x128_hybrid_retrieval", // x94's 1-row stats broadcast in the lexical arm
      "x133_chunk_bm25", // 1-row chunk-stats (nch, avgdl) broadcast
      "x137_ann_recall", // 8-row query-vector broadcast in the exact arm
      "x138_srp_recall", // same 8-row bounded query-vector broadcast
      "x142_ivf_recall_curve", // same 8-row query broadcast + the ≤Cells-row
                               // widths broadcast (rank ≤ w is a range join)
      "x150_srp_radius_curve", // same 8-row query broadcast + the K+1-row
                               // radii broadcast (crad ≤ r is a range join)
      "x151_pq_rerank_curve", // same 8-row query broadcast + the ≤6-row
                              // depth-grid broadcast (rn ≤ depth range join)
      "x152_ivfadc", // 1-row query-vector broadcast in the re-rank arm
      "x153_filtered_ivfadc", // same 1-row re-rank broadcast
      "x154_filtered_recall") // the gridRecallFrame 8-row query +
                              // grid range-join broadcasts
    // (x108's 1-row max broadcast is NOT exempt: Catalyst converts its
    // cross+equality into an equi BroadcastHashJoin on the decimal sum)
    SparkEntry.declared.filterNot(q => intended(q.name)).foreach { q =>
      val p = q.build(spark, TestSpark.sf).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"${q.name} plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"${q.name} plans a nested-loop join")
    }
  }

  test("x27/x28: star-join dims broadcast, filters pushed, partial agg") {
    Seq("x27_mktshare", "x28_profit").foreach { n =>
      val p = plan(n)
      assert(p.contains("BroadcastHashJoin"), s"$n: dims not broadcast:\n$p")
      assert(p.matches("(?s).*PushedFilters: \\[[^\\]]*EqualTo\\(p_type,.*"),
        s"$n: part filter not pushed to the scan:\n$p")
      // r18: the revenue aggregate is dsum128 (two-long exact buffer);
      // the pinned property is unchanged — a partial_* combine runs
      // map-side before the exchange
      assert(p.contains("partial_sum") || p.contains("partial_dsum128"),
        s"$n: no map-side combine:\n$p")
    }
  }

  test("x101/x102/x105/x106: tranche-3 TPC-H scale shapes") {
    // Q4: quarter filter pushed to the orders scan; correlated EXISTS
    // plans as a semi join, never a cartesian
    val p4 = plan("x101_tpch4")
    assert(p4.contains("LeftSemi"), s"Q4 exists not a semi join:\n$p4")
    assert(p4.matches("(?s).*PushedFilters: \\[[^\\]]*Than[^\\]]*o_orderdate.*"),
      s"Q4 quarter filter not pushed:\n$p4")
    // Q6: single scan, zero joins, predicates at the scan
    val p6 = plan("x102_tpch6")
    assert(!p6.contains("Join"), s"Q6 grew a join:\n$p6")
    assert(p6.matches("(?s).*PushedFilters: \\[[^\\]]*l_discount.*"),
      s"Q6 discount filter not pushed:\n$p6")
    // Q17: part pruned then broadcast; the correlated average is ONE
    // window pass over the joined frame, never a self-join of it
    val p17 = plan("x105_tpch17")
    assert(p17.contains("BroadcastHashJoin"), s"Q17 part not broadcast:\n$p17")
    assert(p17.contains("Window"), s"Q17 lost its window avg:\n$p17")
    assert(!p17.contains("SortMergeJoin"), s"Q17 self-joined the frame:\n$p17")
    // Q18: the HAVING aggregate partial-combines before the shuffle
    // and the report is a top-k, not a global sort
    val p18 = plan("x106_tpch18")
    assert(p18.contains("partial_sum"), s"Q18 no map-side combine:\n$p18")
    assert(p18.contains("TakeOrderedAndProject"), s"Q18 global sort:\n$p18")
  }

  test("x108/x109: Q15 reuses the revenue aggregate; Q21 is one fact shuffle") {
    // Q15: the max-side and probe-side of the argmax share the same
    // scan+partial-agg subtree — ReuseExchange must dedupe it (one
    // lineitem read), and the supplier name join broadcasts
    val df15 = SparkEntry.queries("x108_tpch15")(spark, TestSpark.sf)
    df15.collect()
    val p15 = df15.queryExecution.executedPlan.toString
    assert(p15.contains("ReusedExchange") || p15.contains("ReusedQueryStage"),
      s"Q15 computes the revenue aggregate twice:\n$p15")
    assert(p15.contains("BroadcastHashJoin"), s"Q15 supplier not broadcast:\n$p15")
    // Q21: the (order,supplier) group-by and both order-partitioned
    // windows are satisfied by the orders-join's own partitioning —
    // exactly 3 hash exchanges total (two join inputs + the final
    // O(suppliers) name count), a window (not a self-join), and a
    // top-k (not a global sort)
    val p21 = plan("x109_tpch21")
    val nShuffles = "Exchange hashpartitioning".r.findAllIn(p21).length
    assert(nShuffles <= 3, s"Q21 grew a 4th shuffle ($nShuffles):\n$p21")
    assert(p21.contains("Window"), s"Q21 lost its window counts:\n$p21")
    assert(!p21.contains("CartesianProduct"), s"Q21 cartesian:\n$p21")
    assert(p21.contains("TakeOrderedAndProject"), s"Q21 global sort:\n$p21")
  }

  test("x45/x46: date+segment filters pushed, dims broadcast, top-k not global sort") {
    Seq("x45_tpch3" -> "c_mktsegment", "x46_tpch10" -> "l_returnflag")
      .foreach { case (n, filtered) =>
        val p = plan(n)
        assert(p.contains("BroadcastHashJoin"), s"$n: dims not broadcast:\n$p")
        assert(p.matches(s"(?s).*PushedFilters: \\[[^\\]]*EqualTo\\($filtered,.*"),
          s"$n: $filtered filter not pushed to the scan:\n$p")
        assert(p.matches("(?s).*PushedFilters: \\[[^\\]]*Than\\(o_orderdate,.*"),
          s"$n: order-date range not pushed to the scan:\n$p")
        // r18: revenue is dsum128 — the pinned map-side-combine
        // property is aggregate-name-agnostic
        assert(p.contains("partial_sum") || p.contains("partial_dsum128"),
          s"$n: no map-side combine:\n$p")
        assert(p.contains("TakeOrderedAndProject"), s"$n: top-k does a full sort:\n$p")
      }
  }

  test("x47: counts partial-aggregate, unigram joins broadcast, top-k not global sort") {
    val p = plan("x47_colloc_lift")
    assert(p.contains("partial_count"), s"no map-side combine:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"unigram join not broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k does a full sort:\n$p")
  }

  test("x25: pairs come from the broadcast fingerprint neighbor table — no banding explode") {
    val p = plan("x25_simhash_neardup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"quotient join degenerated:\n$p")
    // the Hamming-≤2 candidate structure is the distributed neighbor
    // table (bounded by the 2^16 fp space), broadcast into two
    // fingerprint equi-joins
    assert(p.contains("BroadcastHashJoin"), s"neighbor join not broadcast:\n$p")
    // the only explode allowed is the 137-mask expansion over the
    // DISTINCT-fp aggregate (≤2^16 rows at any corpus size); the r7
    // corpus-scale banding explode fed straight off the document scan
    val lines = p.linesIterator.toIndexedSeq
    val gens = lines.zipWithIndex.filter(_._1.contains("Generate"))
    assert(gens.nonEmpty, s"mask expansion missing:\n$p")
    gens.foreach { case (_, i) =>
      assert(lines(i + 1).contains("HashAggregate"),
        s"explode input is not the bounded fp aggregate:\n$p")
    }
  }

  test("x33: interval predicate rides a hash equi-join, not a nested loop") {
    val p = plan("x33_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join degenerated to O(n*m):\n$p")
    assert(p.contains("__bin"), s"bin bucketing missing from the join:\n$p")
  }

  test("x49: user filter pushed to the scan, both frames share one Window pass") {
    val p = plan("x49_window_frame")
    assert(p.matches("(?s).*PushedFilters: \\[[^\\]]*Than\\(user_id,30\\).*"),
      s"user filter not pushed to the scan:\n$p")
    // the moving-average and cumulative frames share PARTITION BY +
    // ORDER BY, so Catalyst must evaluate them in ONE Window operator
    // over one user_id shuffle — a second Window would double the sort
    assert(p.linesIterator.count(_.contains("- Window ")) == 1,
      s"frames did not collapse into one Window pass:\n$p")
    assert(!p.contains("Join"), s"frame computation grew a join:\n$p")
  }

  test("x60: sessionization rides ONE user_id exchange end-to-end") {
    val p = plan("x60_sessionize")
    // lag window, running-sum window and the (user_id, sess_id)
    // aggregate must all reuse the single user_id hash exchange —
    // HashPartitioning(user_id) satisfies the aggregate's clustering
    // because the partition keys are a subset of the grouping keys.
    // (The only other exchange is the rangepartitioning for the
    // deterministic output ORDER BY.)
    val hashEx = p.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(hashEx == 1, s"expected exactly 1 hash exchange, got $hashEx:\n$p")
    assert(!p.contains("Join"), s"sessionization grew a join:\n$p")
  }

  test("x61: stored-postings probe, df broadcast; top-3 pushed below the shuffle") {
    val p = plan("x61_tfidf")
    assert(p.contains("BroadcastHashJoin"),
      s"vocabulary df join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"df join shuffled both sides:\n$p")
    // r17: the tf frame comes from the STORED postings index — the
    // plan must carry NO documents scan and NO tokenize explode (the
    // stored rows are the corpus's distinct (doc,term) pairs); the
    // positional payload must be column-pruned away
    assert(!p.contains("documents.parquet"), s"corpus scan crept back:\n$p")
    assert(!p.linesIterator.exists(_.contains("explode")), s"plan shape:\n$p")
    assert(!p.contains("pos#"), s"positional payload not pruned:\n$p")
    assert(p.contains("partial_count"), s"counts lack map-side combine:\n$p")
    // rank<=3 must become a WindowGroupLimit evaluated partially
    // BEFORE the doc_id exchange — only ≤3 rows per (doc, partition)
    // travel the wire, not the full scored tf table
    assert(p.linesIterator.exists(l =>
      l.contains("WindowGroupLimit") && l.contains("Partial")),
      s"top-k not pushed below the shuffle:\n$p")
  }

  test("x50: dims broadcast into the edge pass; no cartesian growth from iteration") {
    val p = plan("x50_pagerank")
    assert(p.contains("BroadcastHashJoin"), s"dims not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"superstep join degenerated:\n$p")
    assert(p.contains("partial_count"), s"edge counts lack map-side combine:\n$p")
  }

  test("x26: scoring is a single narrow scan — no join, no second explode") {
    // the profile is learned eagerly (100 rows collected at build time)
    // and baked into the scoring expressions as literals, so the
    // declared plan is scan → project(argmax cascade) → aggregate:
    // stronger than the old broadcast-join shape (which re-scanned the
    // trigram explode a second time for scoring)
    val p = plan("x26_langid_trigram")
    assert(!p.contains("Join"), s"scoring still joins:\n$p")
    assert(!p.contains("Generate"), s"scoring still explodes trigrams:\n$p")
    assert(p.contains("partial_count"), s"no map-side combine:\n$p")
  }

  test("bucketed fact-fact join: sort-merge with ZERO exchange on the bucket key") {
    import graft.sources.Tables
    import graft.tables.TableStore
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft-bkt").toString
    val store = new TableStore(spark, root)
    store.replaceBucketed("orders_b",
      Tables.table(spark, TestSpark.sf, "orders"),
      bucketBy = Seq("o_orderkey"), numBuckets = 8,
      sortBy = Seq("o_orderkey"))
    store.replaceBucketed("lineitem_b",
      Tables.table(spark, TestSpark.sf, "lineitem"),
      bucketBy = Seq("l_orderkey"), numBuckets = 8,
      sortBy = Seq("l_orderkey"))
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // restore-by-unset when the conf was never set: the old restore
    // turned an UNSET adaptive threshold into an explicit 10MB, which
    // leaked into later suites in the shared session and flipped
    // SkewWindowSpec's forced-SMJ plan to a runtime BHJ (suite-order
    // flake)
    val prevAq = util.Try(spark.conf.get(
      "spark.sql.adaptive.autoBroadcastJoinThreshold")).toOption
      .flatMap(Option(_)) // unset optional confs read back as null
    // disable broadcast so the test exercises the co-located merge
    // path (a broadcast join would trivially have no exchange)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val j = store.load("orders_b")
        .join(store.load("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"))
      assert(j.count() > 0)
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected a sort-merge join:\n$p")
      // both the join AND the aggregation ride the bucket layout's
      // HashPartitioning — neither fact table shuffles at all
      assert(!p.contains("Exchange"),
        s"bucketed join/agg still shuffles:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      prevAq.fold(
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", _))
      spark.catalog.listTables().collect()
        .filter(_.name.startsWith("graft_")).foreach(t =>
          spark.sql(s"DROP TABLE IF EXISTS ${t.name}"))
      graft.tables.TempDirs.delete(root)
    }
  }

  test("dynamic partition pruning: dim filter prunes the partitioned fact at runtime") {
    // the date-partitioned-fact ⋈ filtered-dim shape: at 100 TB the
    // dim filter must reach the fact scan as a RUNTIME partition
    // filter (DPP) — static pruning can't see through the join, and
    // reading every date directory to then discard 29/30 of the rows
    // is the canonical scale failure
    import graft.sources.Tables
    import graft.tables.TableStore
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    val store = new TableStore(spark, root)
    store.replace("events_p",
      Tables.table(spark, TestSpark.sf, "events")
        .withColumn("d", to_date(col("ts"))),
      partitionBy = Seq("d"))
    try {
      val fact = store.load("events_p")
      val dim = fact.select(col("d").as("dim_d")).distinct()
        .withColumn("tag", when(dayofmonth(col("dim_d")) === 1, "keep"))
        .filter(col("tag") === "keep")
      val j = fact.join(dim, col("d") === col("dim_d"))
        .groupBy("d").agg(count(lit(1)).as("n"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("dynamicpruning"),
        s"no DPP filter on the fact scan:\n$p")
      assert(j.collect().nonEmpty)
    } finally graft.tables.TempDirs.delete(root)
  }

  test("x63_scalar_quant: encode is a narrow map — no join, no shuffle before the output sort") {
    // the codebook is 64 rows of collected corpus metadata baked in as
    // literals, so the encode+error scan must be join-free: one scan,
    // one projection of array transforms, then only the output sort's
    // range exchange. A join or extra exchange here means the codebook
    // got re-derived per row — the shape that breaks at 100 TB
    val p = plan("x63_scalar_quant")
    assert(!p.contains("Join"), s"encode stage joins against the codebook:\n$p")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 1, s"encode stage shuffles beyond the output sort:\n$p")
  }

  test("x72: the (doc,gram) partial agg rides the doc_id exchange — no shuffle between explode and agg") {
    // the per-doc gram-count stage must aggregate on the SAME doc_id
    // partitioning the spread scan established (HashPartitioning on a
    // subset of the grouping keys satisfies the clustering), so the
    // pathological million-repeat doc collapses map-side BEFORE any
    // gram-keyed stage — the guard that bounds the explode's output
    val p = plan("x72_repeated_spans")
    // the r11 shape referenced the (doc,gram) aggregate twice (join
    // probe + gram-frequency side) and Spark recomputed the dominant
    // scan+explode+agg subtree for both — pin the one-pass rewrite:
    // exactly ONE corpus scan, ONE explode, and NO join (doc-frequency
    // is a window COUNT riding the same rows)
    assert(!p.contains("Join"), s"x72 re-grew a join:\n$p")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"x72 scans the corpus $scans times:\n$p")
    val lines = p.linesIterator.toSeq
    assert(lines.count(_.contains("Generate")) == 1,
      s"x72 explodes the corpus more than once:\n$p")
    val gen = lines.indexWhere(_.contains("Generate"))
    assert(gen >= 0, s"no explode in:\n$p")
    // walking UP from the explode, the first aggregation-or-exchange
    // node must be the (doc,gram) HashAggregate, not an Exchange
    val above = lines.take(gen).reverse
      .find(l => l.contains("HashAggregate") || l.contains("Exchange"))
    assert(above.exists(_.contains("HashAggregate")),
      s"exchange slipped between explode and the (doc,gram) agg:\n$p")
  }

  test("x85: ownership is a map-combined aggregate joined back — no per-gram window buffer") {
    // r17: x85/x95 ride cleanedCorpus's skewSafe form (no gram-keyed
    // WindowExec anywhere — the boilerplate-gram skew hazard).
    // r18 (guide §2.3): the ownership CANDIDATE mine is string-free —
    // gram_key_hashes longs explode and aggregate, so the family's
    // dominant exchange carries 8-byte keys instead of gram strings;
    // exactness is restored by a bounded string-recheck aggregate
    // over the duplicate-candidate slice (see SpanDedup.dupGramOwners
    // — bare hashed keys would silently excise on collision, because
    // excision has no verify stage). SkewWindowSpec pins the hashed
    // form row-identical to the window form. Pinned shape bounds:
    // no gram-keyed window; ≤ 3 corpus scans (candidate mine +
    // string recheck + probe side — the third pass is the price of
    // the long-key exchange, deliberate); the candidate mine keys on
    // gram_key_hashes; joins are only the candidate semi-prune and
    // the owners attach.
    val p = plan("x85_span_removal")
    assert(!p.contains("Window [min(doc_id") && !p.contains("windowspecdefinition(gram"),
      s"x85 regrew the per-gram window buffer:\n$p")
    assert("Scan parquet".r.findAllIn(p).length <= 3,
      s"x85 scans the corpus more than three times:\n$p")
    assert(p.linesIterator.count(_.contains("Generate")) <= 3,
      s"x85 explodes more than three times:\n$p")
    assert(p.contains("gram_key_hashes"),
      s"x85 candidate mine lost its string-free gram keys:\n$p")
    assert(p.linesIterator.count(l =>
      l.contains("Join") && !l.contains("LeftSemi")) <= 1,
      s"x85 joins beyond the owners attach + semi prune:\n$p")
  }

  test("x73: mined list is cached metadata — probe is one scan, one explode, no join") {
    // the top-50 boilerplate list is fingerprint-cached corpus
    // metadata baked in as InSet literals (r12; the r11 plan re-mined
    // per invocation: two scans + a broadcast join). The probe plan
    // must show exactly one corpus pass and no join at all.
    val p = plan("x73_boilerplate_filter")
    assert(!p.contains("Join"), s"x73 re-grew the mined-list join:\n$p")
    assert("Scan parquet".r.findAllIn(p).length == 1,
      s"x73 scans the corpus more than once:\n$p")
    assert(p.linesIterator.count(_.contains("Generate")) == 1,
      s"x73 explodes more than once:\n$p")
  }

  test("x87: probe explodes the corpus once and broadcast-joins the stored vocab table") {
    // the unigram model is a STORED O(vocabulary) table — the probe
    // must not re-derive it (one Generate total) and at fixture scale
    // the size guard must hint it broadcast, never shuffling the
    // token-granular probe side for the join
    val p = plan("x87_unigram_lm")
    assert(p.linesIterator.count(_.contains("Generate")) == 1,
      s"x87 re-derives the vocabulary (extra explode):\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"freq table not broadcast at fixture scale:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"token-granular probe side shuffled for the vocab join:\n$p")
  }

  test("x91: drift centroids come from ONE dimension explode (conditional means, no self-join)") {
    // a join of two half-filtered copies of the exploded frame would
    // recompute the corpus-scale explode twice; the conditional-mean
    // aggregate keeps it to exactly one Generate
    val p = plan("x91_embedding_drift")
    assert(p.linesIterator.count(_.contains("Generate")) == 1,
      s"x91 explodes the embedding dimensions more than once:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"degenerate join:\n$p")
  }

  test("x93: bigram probe is one explode + broadcast model joins") {
    val p = plan("x93_bigram_lm")
    assert(p.linesIterator.count(_.contains("Generate")) == 1,
      s"x93 re-derives the bigram model (extra explode):\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"stored model tables not broadcast at fixture scale:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"bigram-granular probe side shuffled for a model join:\n$p")
  }

  test("x94: BM25 filters to the query terms at the explode and derives df without a second pass") {
    // the tf frame is O(matching occurrences): the InSet predicate
    // must sit directly on the exploded tokens, and df comes from a
    // map-side-combined groupBy(term) BROADCAST back (r14 — the
    // window form buffered a stopword-scale posting list in one
    // task). The df branch references tf a second time, but both
    // references hang off tf's own aggregate exchange, so the
    // scan+explode still runs once at execution (ReusedExchange /
    // ReusedQueryStage — pinned with the executed plan in
    // SkewWindowSpec; this static plan can show two Generate nodes
    // pre-dedup). No window, no shuffle join anywhere.
    val p = plan("x94_bm25")
    assert(!p.contains("Window"), s"df still derived via window:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"x94 shuffle-joins where only broadcasts belong:\n$p")
  }

  test("x75: user filter pushed to the scan, one Window pass, no join") {
    val p = plan("x75_range_frame")
    assert(p.matches("(?s).*PushedFilters: \\[[^\\]]*Than\\(user_id,100\\).*"),
      s"user filter not pushed to the scan:\n$p")
    assert(p.linesIterator.count(_.contains("- Window ")) == 1,
      s"range frame did not stay one Window pass:\n$p")
    assert(!p.contains("Join"), s"frame computation grew a join:\n$p")
  }

  test("x76/x77: TPC-H Q5/Q7 — dims broadcast, date filters pushed to the fact scan") {
    for ((name, pushedCol) <- Seq("x76_tpch5" -> "o_orderdate",
        "x77_tpch7" -> "l_shipdate")) {
      val p = plan(name)
      assert(p.contains("BroadcastHashJoin"), s"$name: no broadcast dims:\n$p")
      assert(p.matches(s"(?s).*PushedFilters: \\[[^\\]]*\\($pushedCol.*"),
        s"$name: date filter not pushed to the scan:\n$p")
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$name: join degenerated:\n$p")
    }
  }

  test("x78/x79: Q14/Q19 — part pruned before broadcast, single partial-agg fact pass") {
    for (name <- Seq("x78_tpch14", "x79_tpch19")) {
      val p = plan(name)
      assert(p.contains("BroadcastHashJoin"), s"$name: part not broadcast:\n$p")
      assert(p.contains("partial_"), s"$name: no map-side combine:\n$p")
      // exactly one SHUFFLE: the single-row final aggregation (the
      // part side's BroadcastExchange is not a shuffle)
      assert(p.linesIterator.count(l =>
        l.contains("Exchange") && !l.contains("BroadcastExchange")) <= 1,
        s"$name: more than the one final-agg shuffle:\n$p")
    }
    // Q19's brand disjunction common factor reaches the part scan
    val p19 = plan("x79_tpch19")
    assert(p19.matches("(?s).*PushedFilters: \\[[^\\]]*In\\(p_brand.*"),
      s"x79: brand IN-list not pushed to the part scan:\n$p19")
  }

  test("x80: rank-filter compiles to WindowGroupLimit (map-side top-k, no full sort)") {
    val p = plan("x80_group_sample")
    assert(p.contains("WindowGroupLimit"),
      s"rk <= 5 did not push a group limit below the shuffle:\n$p")
  }

  test("x124: negative cap is a WindowGroupLimit; x123 shares one lang exchange") {
    // the per-anchor k=3 cap must prune map-locally BEFORE the doc_a
    // shuffle — the guard that keeps the saturated band set O(docs·k)
    val p = plan("x124_contrastive_pairs")
    assert(p.contains("WindowGroupLimit"),
      s"rk <= 3 did not push a group limit below the shuffle:\n$p")
    // x123's two windows (ntile staging + seeded rank) partition on
    // the same lang key: exactly one exchange on the corpus path
    val p123 = plan("x123_curriculum_order")
    val nEx = "Exchange hashpartitioning\\(lang".r.findAllIn(p123).size
    assert(nEx === 1, s"x123 shuffled the corpus $nEx times on lang:\n$p123")
  }

  test("x81: blocked ER pairs ride an equi-join, never a cartesian") {
    val p = plan("x81_er_fuzzy")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"blocking degenerated to all-pairs:\n$p")
  }

  test("x82: null-safe equality still plans as a HASH join (nulls are keyable)") {
    val p = plan("x82_nullsafe_join")
    assert(p.contains("HashJoin"), s"<=> fell off the hash-join path:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"null-safe join degenerated:\n$p")
  }

  test("x83: adjacency tables broadcast; no wedge join, no cartesian") {
    val p = plan("x83_triangles")
    assert(p.contains("BroadcastHashJoin"),
      s"adjacency tables not broadcast:\n$p")
    assert(p.contains("sorted_intersect_count"),
      s"triangle closing fell back off the fused intersection:\n$p")
    assert(!p.contains("CartesianProduct"), s"degenerated:\n$p")
  }

  test("whole-stage codegen covers the scan+filter+project pipeline") {
    // AQE only shows codegen spans in the finalized plan → execute first
    val df = SparkEntry.queries("q4_range")(spark, TestSpark.sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // codegen spans render as "*(n) Operator" in plan toString
    assert(p.contains("*(") && p.contains("*(1) ColumnarToRow") ||
      p.matches("(?s).*\\*\\(\\d+\\) (Filter|Project|Sort).*"),
      s"no codegen span:\n$p")
  }
}
