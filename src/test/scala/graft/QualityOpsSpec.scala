package graft

import graft.operators.QualityOps
import graft.operators.QualityOps.Expectation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Declarative quality audit: known-defect synthetic rows produce
  * exactly the declared violation counts, in one pass. */
class QualityOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("audit counts violations per rule over one scan") {
    import spark.implicits._
    val df = Seq(
      (Some(1), 10, "ok"), (Some(2), -5, "ok"), (None, 3, "bad"),
      (Some(4), 200, null.asInstanceOf[String]), (Some(5), 7, "ok"))
      .toDF("id", "qty", "status")
    val out = QualityOps.audit(df, Seq(
      Expectation("id_not_null", col("id").isNotNull),
      Expectation("qty_in_range", col("qty").between(0, 100)),
      Expectation("status_not_null", col("status").isNotNull)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      ("id_not_null", 1L, 5L),
      ("qty_in_range", 2L, 5L),
      ("status_not_null", 1L, 5L)))
  }

  test("auditPlan equals audit — lazily, with dotted rule names, and on empty input") {
    import spark.implicits._
    val df = Seq(
      (Some(1), 10, "ok"), (Some(2), -5, "ok"), (None, 3, "bad"),
      (Some(4), 200, null.asInstanceOf[String]), (Some(5), 7, "ok"))
      .toDF("id", "qty", "status")
    // dotted + duplicate-predicate rule names: the in-plan form must
    // treat names as opaque strings (index-aliased columns), exactly
    // like audit()'s fieldIndex lookup
    val rules = Seq(
      Expectation("id.not.null", col("id").isNotNull),
      Expectation("qty_in_range", col("qty").between(0, 100)),
      Expectation("qty.in.range.too", col("qty").between(0, 100)))
    def rows(d: org.apache.spark.sql.DataFrame) = d.orderBy("rule")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows(QualityOps.auditPlan(df, rules)) ===
      rows(QualityOps.audit(df, rules)))
    val empty = df.limit(0)
    assert(rows(QualityOps.auditPlan(empty, rules)) ===
      rows(QualityOps.audit(empty, rules)))
  }

  test("null-valued predicates count as violations (three-valued logic pinned)") {
    import spark.implicits._
    // status = null makes (status = 'ok') NULL, not false; a naive
    // when(!holds, 1) folds NULL to PASS and silently admits bad rows.
    // The audit resolves unknown as violation, so the naive rule —
    // no defensive isNotNull conjunct — still counts the null row.
    val df = Seq(("a", "ok"), ("b", null.asInstanceOf[String])).toDF("k", "s")
    val out = QualityOps.audit(df, Seq(
      Expectation("s_ok", col("s") === "ok")))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(("s_ok", 1L)))
  }

  test("refViolations counts dangling keys, ignores nulls") {
    import spark.implicits._
    val fact = Seq(Some(1), Some(2), Some(9), None).toDF("fk")
    val dim = Seq(1, 2, 3).toDF("pk")
    assert(QualityOps.refViolations(fact, col("fk"), dim, col("pk")) === 1L)
  }

  test("audit on an empty relation reports zero violations, zero total") {
    import spark.implicits._
    val df = Seq.empty[(Int, Int)].toDF("a", "b")
    val out = QualityOps.audit(df,
      Seq(Expectation("a_pos", col("a") > 0)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("a_pos", 0L, 0L)))
  }

  test("drift reports per-column before/after stats across table versions") {
    import spark.implicits._
    import graft.tables.TableStore
    val store = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-drift").toString)
    store.init("t", Seq((1L, "en", 10), (2L, "en", 20), (3L, "de", 30))
      .toDF("id", "lang", "n")) // v0
    store.append("t", Seq((4L, "fr", 40), (5L, "fr", 50))
      .toDF("id", "lang", "n")) // v1
    val d = QualityOps.drift(store.loadVersion("t", 0), store.load("t"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.get(2), r.get(3), Option(r.get(4)))).toMap
    assert(d(("_table", "rows")) === ((3L, 5L, Some(0.666667))))
    assert(d(("lang", "distinct")) === ((2L, 3L, Some(0.5))))
    assert(d(("id", "non_null")) === ((3L, 5L, Some(0.666667))))
    // schema evolution is drift: a column on one side only
    val evolved = store.load("t").withColumn("score", lit(1.0))
    val d2 = QualityOps.drift(store.loadVersion("t", 0), evolved)
      .filter(col("col") === "score").collect()
    assert(d2.length === 2 && d2.forall(_.isNullAt(2)),
      "one-sided column must report with null before stats")
  }
}
