package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge and hand-computed-value contracts for the mix-balancing and
  * familiarity queries (x41/x42) that the sf0.01 oracle gate cannot
  * exercise: the fixture corpus has no null/short texts and no
  * single-doc stratum, and the gate checks one corpus state, not
  * determinism across invocations. */
class MixQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Corpus dir with hand-sized strata: lang "aa" is the min-char-mass
    * stratum (1000 chars), "bb" carries exactly 3× that. */
  private def mixCorpus(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mix").toString
    val docs = Seq(
      (1L, "x " * 250, "aa", 500L),
      (2L, "y " * 250, "aa", 500L),
      (3L, "z " * 500, "bb", 1000L),
      (4L, "w " * 500, "bb", 1000L),
      (5L, "v " * 500, "bb", 1000L))
    docs.toDF("doc_id", "text", "lang", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("x41: min stratum keeps everything, 3x stratum gets floor(10000/3)") {
    val dir = mixCorpus()
    val q = SparkEntry.queries("x41_stratified_sample")
    val rows = q(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    // min stratum: threshold saturates at 10000 and bkt ∈ [0, 10000),
    // so EVERY doc is kept — balancing never drops from the floor
    assert(rows("aa") === ((2L, 1000L, 10000L, 2L)))
    // 3× stratum: thr = floor(10000 * 1000 / 3000) = 3333, kept ≤ n
    val (nB, charsB, thrB, keptB) = rows("bb")
    assert((nB, charsB, thrB) === ((3L, 3000L, 3333L)))
    assert(keptB <= 3L)
    // determinism: a second invocation returns the identical audit
    // (membership is a pure hash — nothing is sampled at random)
    assert(q(spark, dir).collect().toSeq ===
      q(spark, dir).collect().toSeq)
    graft.tables.TempDirs.delete(dir)
  }

  test("x41: growing one stratum never changes another stratum's row") {
    import spark.implicits._
    val dir = mixCorpus()
    val q = SparkEntry.queries("x41_stratified_sample")
    val before = q(spark, dir).collect()
      .map(r => r.getString(0) -> r.toSeq).toMap
    // append to bb only; aa's chars, threshold and kept set are
    // functions of (its own mass, the global min) — the min is still
    // aa's own 1000, so aa's row must be byte-identical
    Seq((6L, "u " * 500, "bb", 1000L)).toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("append").parquet(s"$dir/documents.parquet")
    val after = q(spark, dir).collect()
      .map(r => r.getString(0) -> r.toSeq).toMap
    assert(after("aa") === before("aa"))
    assert(after("bb").head === "bb")
    graft.tables.TempDirs.delete(dir)
  }

  test("x42: hand-computed scores; null and sub-trigram docs score null") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-fam").toString
    // trigram df: abc→3 (docs 1,2,3), bcd→1, bcx→1
    Seq(
      (1L, "abcd", "aa", 4L),   // {abc, bcd}: (3+1)/2 = 2.0
      (2L, "abcx", "aa", 4L),   // {abc, bcx}: (3+1)/2 = 2.0
      (3L, "abc", "aa", 3L),    // {abc}: 3/1 = 3.0
      (4L, "ab", "aa", 2L),     // shorter than a trigram: no grams
      (5L, null.asInstanceOf[String], "aa", 0L))
      .toDF("doc_id", "text", "lang", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("x42_familiarity")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(rows.toSeq === Seq(
      (1L, 2L, 2.0), (2L, 2L, 2.0), (3L, 1L, 3.0),
      (4L, 0L, null), (5L, 0L, null)))
    graft.tables.TempDirs.delete(dir)
  }

  test("x42: saturation fallback (distributed df) returns identical scores") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-fam-fb").toString
    Seq(
      (1L, "abcd", "aa", 4L), (2L, "abcx", "aa", 4L),
      (3L, "abc", "aa", 3L), (4L, "ab", "aa", 2L),
      (5L, null.asInstanceOf[String], "aa", 0L))
      .toDF("doc_id", "text", "lang", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    // poison the per-dir cache with cap=0: every vocabulary exceeds it,
    // so the query invocation below takes the distributed-df branch
    assert(graft.operators.TextQueries.trigramDf(spark, dir, cap = 0).isEmpty)
    val rows = SparkEntry.queries("x42_familiarity")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(rows.toSeq === Seq(
      (1L, 2L, 2.0), (2L, 2L, 2.0), (3L, 1L, 3.0),
      (4L, 0L, null), (5L, 0L, null)),
      "fallback path diverged from the broadcast path's scores")
    graft.tables.TempDirs.delete(dir)
  }

  test("x41: all-NULL char mass emits rows with NULL thresholds, not empty") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mix-null").toString
    Seq((1L, "x", "aa", null.asInstanceOf[java.lang.Long]),
      (2L, "y", "bb", null.asInstanceOf[java.lang.Long]))
      .toDF("doc_id", "text", "lang", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    // MIN over all-NULL masses is NULL → thr NULL → nothing kept; the
    // strata rows themselves must still appear (oracle parity: the SQL
    // emits one row per lang with NULL chars/thr)
    val rows = SparkEntry.queries("x41_stratified_sample")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3), r.getLong(4)))
    assert(rows.toSeq === Seq(("aa", 1L, null, null, 0L),
      ("bb", 1L, null, null, 0L)))
    graft.tables.TempDirs.delete(dir)
  }

  test("x41: empty corpus returns an empty, correctly-typed audit") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mix-empty").toString
    Seq.empty[(Long, String, String, Long)]
      .toDF("doc_id", "text", "lang", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val df = SparkEntry.queries("x41_stratified_sample")(spark, dir)
    assert(df.columns.toSeq ===
      Seq("lang", "n_docs", "chars", "thr", "n_kept"))
    assert(df.collect().isEmpty)
    graft.tables.TempDirs.delete(dir)
  }

  test("x43: packing reconstructs from (shard, doc order); appends never move old docs") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-pack").toString
    val mk = (n: Int) => (1 to n).map(i =>
      (i.toLong, ("tok " * (i * 37 % 400 + 1)).trim, "aa", 0L))
    mk(60).toDF("doc_id", "text", "lang", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val q = SparkEntry.queries("x43_seq_pack")
    val rows = q(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // reconstruct: within each shard in doc_id order, bin/pos must be
    // exactly the running-offset decomposition of the token stream
    rows.groupBy(_._2).foreach { case (shard, docs) =>
      var cum = 0L
      docs.sortBy(_._1).foreach { case (id, _, nTok, bin, pos) =>
        assert(bin === cum / 1024 && pos === cum % 1024,
          s"doc $id in shard $shard: expected offset $cum")
        cum += nTok
      }
    }
    // stream-append stability: new docs with HIGHER doc_ids pack AFTER
    // the existing ones, so no already-exported assignment ever moves
    val before = rows.map(r => r._1 -> r).toMap
    mk(80).drop(60).toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("append").parquet(s"$dir/documents.parquet")
    val after = q(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    before.foreach { case (id, row) =>
      assert(after.find(_._1 == id).contains(row),
        s"append moved doc $id's packed position")
    }
    graft.tables.TempDirs.delete(dir)
  }

  test("x43 plan: one shard hash partition, no global-sort packing") {
    val dir = mixCorpus()
    val df = SparkEntry.queries("x43_seq_pack")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the packing itself shuffles once, on shard; the only other
    // exchange is the output ORDER BY's range partition (the oracle
    // determinism contract, not the operator)
    assert(plan.contains("hashpartitioning(shard"),
      s"x43 lost its per-shard decomposition:\n$plan")
    val exchanges = "Exchange [a-z]+partitioning".r
      .findAllIn(plan).toSeq
    assert(exchanges.count(_.contains("hashpartitioning")) === 1 &&
      exchanges.length <= 2,
      s"x43 shuffles more than shard + output sort: $exchanges\n$plan")
    graft.tables.TempDirs.delete(dir)
  }

  test("x41 plan: the corpus is never shuffled — rate table broadcasts back") {
    val dir = mixCorpus()
    val df = SparkEntry.queries("x41_stratified_sample")(spark, dir)
    df.collect()
    // the adaptive plan string appends the pre-AQE "Initial Plan" —
    // assert on the FINAL plan section only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the only joins are broadcasts (rate table, audit); a sort-merge
    // join would mean the full corpus shuffled on lang
    assert(!plan.contains("SortMergeJoin"),
      s"x41 shuffled the corpus:\n$plan")
    graft.tables.TempDirs.delete(dir)
  }
}
