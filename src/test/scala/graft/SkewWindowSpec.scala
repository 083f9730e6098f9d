package graft

import graft.operators.{SpanDedup, TextQueries}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r12-ADVICE window-skew residue, closed properly: the gram-df /
  * gram-ownership windows (x72, SpanDedup, x94) now have a
  * skew-hardened pre-aggregated path. On a fixture where ONE gram
  * appears in half the corpus (the boilerplate pathology), the
  * hardened form must (a) hash-match the window form exactly,
  * (b) plan no gram-keyed WindowExec (whose single task would buffer
  * the hot gram's whole row set), (c) keep the one-derivation
  * property via ReuseExchange (the r11 x72 lesson), and (d) let AQE
  * split the hot join partition across tasks — the bounded-per-task
  * guarantee windows cannot give. */
class SkewWindowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 400 docs, the SAME 5-gram opening 200 of them; every other gram
    * is doc-unique. */
  private lazy val skewed: DataFrame = {
    val hot = (0 until 200).map(i =>
      (i.toLong, "en", s"hot gram alpha beta gamma u${i}a u${i}b u${i}c"))
    val cold = (200 until 400).map(i =>
      (i.toLong, "en", s"z${i}a z${i}b z${i}c z${i}d z${i}e z${i}f z${i}g"))
    (hot ++ cold).toDF("doc_id", "lang", "text")
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("x72: hardened agg+join form hash-equals the window form on the hot-gram fixture") {
    val win = TextQueries.x72Frame(skewed, skewSafe = false)
    val hard = TextQueries.x72Frame(skewed, skewSafe = true)
    assert(sortedRows(win) === sortedRows(hard))
    // sanity: the fixture is genuinely skewed — the hot gram is
    // repeated, so rep_grams counts its 200 carriers
    val row = hard.collect().head
    assert(row.getLong(3) === 200L, "hot gram must dominate rep_grams")
  }

  test("x72 hardened plan: no window, one explode derivation, combine-friendly df") {
    val hard = TextQueries.x72Frame(skewed, skewSafe = true)
    hard.collect()
    val p = hard.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"hardened path still plans a window:\n$p")
    // exactly ONE explode derivation in the FINAL plan (the adaptive
    // plan string repeats nodes in its "Initial Plan" section): the
    // subtraction form never references the gram chain twice (the r11
    // x72 double-scan)
    val finalP = p.split("== Initial Plan ==")(0)
    assert("Generate explode".r.findAllIn(finalP).size === 1,
      s"gram chain derived more than once:\n$p")
    // the gram aggregate is map-side combined: a hot gram reaches its
    // reduce task as O(map tasks) partial rows, not O(containing docs)
    assert(p.contains("partial_count"), s"df aggregate lost its combine:\n$p")
  }

  test("SpanDedup: skewSafe ownership hash-equals the window form, incl. minRun") {
    for (minRun <- Seq(1, 3)) {
      val win = SpanDedup.cleanedCorpus(skewed, 5, minRun, skewSafe = false)
      val hard = SpanDedup.cleanedCorpus(skewed, 5, minRun, skewSafe = true)
      assert(sortedRows(win) === sortedRows(hard), s"minRun=$minRun")
    }
    // and the transform actually fired: doc 0 owns the hot span, every
    // other hot doc lost exactly the 5 covered tokens
    val out = SpanDedup.cleanedCorpus(skewed, 5, 1, skewSafe = true)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(0L) === 0L, "owner keeps its occurrence")
    (1L until 200L).foreach(i => assert(out(i) === 5L, s"doc $i excision"))
    (200L until 400L).foreach(i => assert(out(i) === 0L, s"doc $i untouched"))
  }

  test("SpanDedup skewSafe plan: no gram-keyed window, combine-friendly ownership") {
    val hard = SpanDedup.cleanedCorpus(skewed, 5, 1, skewSafe = true)
    hard.collect()
    val p = hard.queryExecution.executedPlan.toString
    assert(!p.contains("windowspecdefinition(gram"),
      s"gram ownership still buffers in a window:\n$p")
    // ownership folds map-side before the gram shuffle
    assert(p.contains("partial_min") && p.contains("partial_max"),
      s"ownership aggregate lost its combine:\n$p")
    // the doc-ordered windows (gram rebuild, coverage) legitimately
    // remain — their partitions are per-doc, bounded by doc length
    assert(p.contains("windowspecdefinition(doc_id"))
  }

  test("x94: df attach is a broadcast join back, no window, stored-postings probe") {
    val df = SparkEntry.queries("x94_bm25")(spark, TestSpark.sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"x94 still plans the df window:\n$p")
    // r17: tf comes from the stored postings index — a filtered
    // index-table scan (referenced twice, both bare scans), never a
    // corpus tokenize pass; the no-documents-scan pin itself lives in
    // PostingsSpec next to the index
    assert(p.contains("postings"), s"x94 lost its stored-postings probe:\n$p")
  }

  test("SpanDedup hot attach partition is AQE-skew-splittable — the bound windows cannot give") {
    // past broadcast size the ownership attach is an SMJ over two bare
    // shuffle stages — force that shape at fixture scale (broadcast
    // off, skew thresholds down) and check AQE splits the hot gram's
    // partition across tasks: the per-task input bound that motivates
    // the agg+join form
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      // AQE's runtime SMJ→BHJ rewrite reads its OWN threshold — pin
      // both or a session that has it set elsewhere broadcasts the
      // owners side and the skew-split shape never forms
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> util.Try(conf.get(k)).toOption.flatMap(Option(_)))
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // a fixture where the hot gram's partition truly dominates the
      // median (5000 docs carrying ONLY the hot gram vs 100 cold docs)
      val heavySkew = ((0 until 5000).map(i =>
        (i.toLong, "en", "hot gram alpha beta gamma")) ++
        (5000 until 5100).map(i =>
          (i.toLong, "en", s"z${i}a z${i}b z${i}c z${i}d z${i}e z${i}f z${i}g")))
        .toDF("doc_id", "lang", "text")
      // the standing-corpus factorization: owners mined once, PERSISTED,
      // probed per shard — a stored list joins as a bare scan, giving
      // the two-bare-shuffle SMJ shape AQE's skew rule matches (an
      // inline aggregate fuses into the join stage and blocks it)
      val dir = graft.tables.TempDirs.scratch("graft-skew-owners")
      SpanDedup.dupGramOwners(heavySkew, 5).write.parquet(s"$dir/owners")
      val owners = spark.read.parquet(s"$dir/owners")
      val hard = SpanDedup.cleanedCorpusWithOwners(heavySkew, owners, 5, 1)
      hard.collect()
      val p = hard.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"hot partition not split by AQE skew-join:\n$p")
      // and the stored-probe form IS the transform: equal to the
      // single-query form on the same corpus
      assert(sortedRows(hard) ===
        sortedRows(SpanDedup.cleanedCorpus(heavySkew, 5, 1)))
      graft.tables.TempDirs.delete(dir)
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  /** One source carries 80% of corpus mass — the common-crawl
    * pathology x121's skew-hardened form exists for. */
  private lazy val hotSource: DataFrame = {
    val hot = (0 until 800).map(i => (i.toLong, "srcHOT", 100L))
    val cold = (800 until 1000).map(i =>
      (i.toLong, s"src${i % 4}", 100L))
    (hot ++ cold).toDF("doc_id", "source", "n_chars")
  }

  test("x121: two-level skew-safe form hash-equals the per-source window form") {
    val win = TextQueries.sourceCapFrame(hotSource, skewSafe = false)
    val hard = TextQueries.sourceCapFrame(hotSource, skewSafe = true)
    assert(sortedRows(win) === sortedRows(hard))
    // the cap genuinely binds on the hot source: 5% of 100k chars =
    // 5000 = 50 docs of its 800; each 50-doc cold source fits whole
    val kept = hard.collect()
      .map(r => (r.getString(1), r.getBoolean(3)))
      .groupBy(_._1).view.mapValues(_.count(_._2)).toMap
    assert(kept("srcHOT") === 50, s"hot source kept ${kept("srcHOT")}")
    (0 until 4).foreach(i => assert(kept(s"src$i") === 50))
  }

  test("x121 skew-safe plan: no corpus window partitioned by source alone") {
    val hard = TextQueries.sourceCapFrame(hotSource, skewSafe = true)
    hard.collect()
    val p = hard.queryExecution.executedPlan.toString
    // the corpus-sized cumulative window must partition on (source,
    // bucket) — a (source, h-ordered) spec is the unbounded one-task
    // shape this form removes. The ≤256-row bucket-offset window
    // (source partition, b order) legitimately remains.
    assert(!"windowspecdefinition\\(source#\\d+, h#".r.findFirstIn(p).isDefined,
      s"corpus window still partitions on source alone:\n$p")
    assert("windowspecdefinition\\(source#\\d+, b#".r.findFirstIn(p).isDefined
      || "windowspecdefinition\\(source#\\d+, \\w+#\\d+, h#".r
        .findFirstIn(p).isDefined,
      s"two-level window shape missing:\n$p")
    // and the hot source genuinely spreads: >1 bucket in its keep set
    val nBuckets = hotSource
      .select(substring(md5(col("doc_id").cast("string")), 1, 2).as("b"))
      .distinct().count()
    assert(nBuckets > 1, "fixture degenerated to one bucket")
    // the simple form IS the one-task shape (the contrast pin)
    val win = TextQueries.sourceCapFrame(hotSource, skewSafe = false)
    win.collect()
    val pw = win.queryExecution.executedPlan.toString
    assert("windowspecdefinition\\(source#\\d+, h#".r.findFirstIn(pw).isDefined,
      s"contrast: simple form lost its per-source window:\n$pw")
  }
}
