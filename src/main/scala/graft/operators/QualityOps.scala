package graft.operators

import graft.Query
import graft.sources.Tables.table
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-quality surface: column profiling and declarative expectation
 * audits — the publish-gate every training-data pipeline runs before
 * a corpus ships (Deequ/Great-Expectations re-expressed Spark-first,
 * and the engine-grade form of the reference's field validations,
 * reservas/main.go:117-131, which reject bad rows one request at a
 * time).
 *
 * Scale shape: both operators are ONE scan. The profile computes
 * every column's aggregates in a single Aggregate node (Spark's
 * multi-count-distinct planning expands, map-side combines, and
 * shares the one pass); the audit folds every rule into SUM(CASE)
 * partials — adding a rule adds a column to the aggregation buffer,
 * never a pass. Referential checks are the one exception (they need
 * the dim side) and ride a broadcast semi/anti join. Output is
 * rule-cardinality rows (a report, not data), so nothing downstream
 * ever shuffles corpus-scale bytes.
 */
object QualityOps {

  /** One declarative constraint over a relation. */
  final case class Expectation(name: String, holds: Column)

  /** Single-pass audit: one row per rule with its violation count.
    * Three-valued logic is resolved the strict way: a rule that
    * evaluates NULL on a row counts as a VIOLATION (when(holds, 0)
    * .otherwise(1) — `unknown` must not slip through a quality gate),
    * so rules need no defensive isNotNull conjuncts.
    * Row order follows rule declaration order via the leading index. */
  def audit(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    require(rules.nonEmpty, "no expectations declared")
    // one action, one scan: every rule folds into the same Aggregate
    // buffer; the report row is O(rules) scalars on the driver (a
    // per-branch live union would re-run the scan per rule instead)
    val one = df.agg(
      count(lit(1)).as("_n"),
      rules.map(r => sum(when(r.holds, 0L).otherwise(1L))
        .as(s"_v_${r.name}")): _*).head
    val n = one.getAs[Long]("_n")
    def v(name: String): Long = {
      val i = one.fieldIndex(s"_v_$name")
      if (one.isNullAt(i)) 0L else one.getLong(i)
    }
    val s = df.sparkSession
    import s.implicits._
    rules.map(r => (r.name, v(r.name), n))
      .toDF("rule", "violations", "total")
  }

  /** [[audit]] as a PURE PLAN: the same one-scan aggregate, but the
    * per-rule report rows are derived in-plan (an explode over the
    * single aggregate row) instead of collected — building the
    * DataFrame runs NO driver-side job, so the REST `/plan` surface
    * stays execution-free and the total never leaves the plan. Same
    * output contract as [[audit]] (row per rule, declaration order
    * recoverable via ORDER BY, NULL rules count as violations). */
  def auditPlan(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    require(rules.nonEmpty, "no expectations declared")
    // violation columns are aliased by rule INDEX, not rule name
    // (col("_v_"+name) would parse a dotted rule name as nested-field
    // access and fail analysis — audit()'s fieldIndex lookup treats
    // names opaquely, and this path must too; the name only ever
    // appears as a string literal in the output rows)
    df.agg(count(lit(1)).as("_n"),
      rules.zipWithIndex.map { case (r, i) =>
        sum(when(r.holds, 0L).otherwise(1L)).as(s"_v_$i")
      }: _*)
      .select(explode(array(rules.zipWithIndex.map { case (r, i) =>
        struct(lit(r.name).as("rule"),
          coalesce(col(s"_v_$i"), lit(0L)).as("violations"),
          col("_n").as("total"))
      }: _*)).as("x"))
      .select(col("x.rule"), col("x.violations"), col("x.total"))
  }

  /** Referential-integrity violation count: fact keys absent from the
    * dim. Null keys are counted separately by a not-null rule, not
    * here. */
  def refViolations(fact: DataFrame, key: Column,
      dim: DataFrame, dimKey: Column): Long =
    fact.select(key.as("_k")).filter(col("_k").isNotNull)
      .join(dim.select(dimKey.as("_k")), Seq("_k"), "left_anti")
      .count()

  /** Per-column profile as a driver-held map: ONE scan computes every
    * column's (non-null count, distinct count, lo, hi) — numeric
    * columns range over their values, strings over their LENGTH (raw
    * min/max over bodies is collation-fragile and useless in a
    * report). The x70 aggregation shape, factored for reuse. */
  private def profileRow(df: DataFrame)
      : (Long, Map[String, (Long, Long, String, String)]) = {
    val profiled = df.schema.fields.map { f =>
      val c = col(f.name)
      val range = f.dataType.typeName match {
        case "string" => length(c)
        case _ => c
      }
      (f.name, c, range)
    }
    val aggs = profiled.flatMap { case (n, c, r) => Seq(
      count(c).as(s"c_$n"), countDistinct(c).as(s"d_$n"),
      min(r).cast("string").as(s"lo_$n"),
      max(r).cast("string").as(s"hi_$n")) }
    val one = df.agg(count(lit(1)).as("_n"), aggs.toIndexedSeq: _*).head
    (one.getAs[Long]("_n"), profiled.map { case (n, _, _) =>
      n -> (one.getAs[Long](s"c_$n"), one.getAs[Long](s"d_$n"),
        one.getAs[String](s"lo_$n"), one.getAs[String](s"hi_$n"))
    }.toMap)
  }

  /** Version-drift report — the data-card DIFF a pipeline publishes
    * when a corpus version ships: per column and statistic, the
    * before/after values and the relative change. Pair it with
    * `TableStore.loadVersion` to compare any two snapshots inside the
    * vacuum horizon. One scan PER SIDE regardless of column count
    * (the same single-Aggregate shape as x70); the report is
    * O(columns) rows, so nothing corpus-scale leaves the executors.
    * Columns present on only one side report with the other side
    * null — schema evolution is drift too. */
  def drift(before: DataFrame, after: DataFrame): DataFrame = {
    val (nb, pb) = profileRow(before)
    val (na, pa) = profileRow(after)
    val s = before.sparkSession
    import s.implicits._
    def relDelta(b: Option[Long], a: Option[Long]): Option[Double] =
      (b, a) match {
        case (Some(x), Some(y)) if x != 0L =>
          Some(math.rint((y - x).toDouble / x * 1e6) / 1e6)
        case _ => None
      }
    val rows = Seq(("_table", "rows", Some(nb), Some(na),
      relDelta(Some(nb), Some(na)))) ++
      (pb.keySet ++ pa.keySet).toSeq.sorted.flatMap { c =>
        val b = pb.get(c); val a = pa.get(c)
        Seq(
          (c, "non_null", b.map(_._1), a.map(_._1),
            relDelta(b.map(_._1), a.map(_._1))),
          (c, "distinct", b.map(_._2), a.map(_._2),
            relDelta(b.map(_._2), a.map(_._2))))
      }
    rows.toDF("col", "stat", "before", "after", "rel_delta")
  }

  val all: Seq[Query] = Seq(

    // Column profile of the documents corpus — the data card's
    // statistical page: per column, row/null/distinct counts and a
    // lo/hi range (text profiles its LENGTH — a raw min/max over
    // bodies is useless and collation-fragile). One scan; the 1-row
    // aggregate fans out to a 5-row report.
    Query("x70_table_profile",
      "WITH a AS (SELECT COUNT(*) AS n, " +
        "COUNT(doc_id) AS c1, COUNT(DISTINCT doc_id) AS d1, " +
        "CAST(MIN(doc_id) AS VARCHAR) AS lo1, CAST(MAX(doc_id) AS VARCHAR) AS hi1, " +
        "COUNT(lang) AS c2, COUNT(DISTINCT lang) AS d2, " +
        "MIN(lang) AS lo2, MAX(lang) AS hi2, " +
        "COUNT(source) AS c3, COUNT(DISTINCT source) AS d3, " +
        "MIN(source) AS lo3, MAX(source) AS hi3, " +
        "COUNT(n_chars) AS c4, COUNT(DISTINCT n_chars) AS d4, " +
        "CAST(MIN(n_chars) AS VARCHAR) AS lo4, CAST(MAX(n_chars) AS VARCHAR) AS hi4, " +
        "COUNT(text) AS c5, COUNT(DISTINCT text) AS d5, " +
        "CAST(MIN(length(text)) AS VARCHAR) AS lo5, " +
        "CAST(MAX(length(text)) AS VARCHAR) AS hi5 FROM documents) " +
        "SELECT 'doc_id' AS col, n - c1 AS n_null, d1 AS n_distinct, lo1 AS lo, hi1 AS hi FROM a " +
        "UNION ALL SELECT 'lang', n - c2, d2, lo2, hi2 FROM a " +
        "UNION ALL SELECT 'n_chars', n - c4, d4, lo4, hi4 FROM a " +
        "UNION ALL SELECT 'source', n - c3, d3, lo3, hi3 FROM a " +
        "UNION ALL SELECT 'text', n - c5, d5, lo5, hi5 FROM a " +
        "ORDER BY col") {
      (s, d) => {
        val docs = table(s, d, "documents")
        def prof(name: String, c: Column, lo: Column, hi: Column) = Seq(
          (count(c), s"c_$name"), (countDistinct(c), s"d_$name"),
          (min(lo).cast("string"), s"lo_$name"),
          (max(hi).cast("string"), s"hi_$name"))
        val cols =
          prof("doc_id", col("doc_id"), col("doc_id"), col("doc_id")) ++
          prof("lang", col("lang"), col("lang"), col("lang")) ++
          prof("source", col("source"), col("source"), col("source")) ++
          prof("n_chars", col("n_chars"), col("n_chars"), col("n_chars")) ++
          prof("text", col("text"), length(col("text")), length(col("text")))
        // ONE action materializes the single bounded report row (the
        // x41 rate-table contract: driver holds O(columns) scalars,
        // never data); fanning the union out as 5 live subplans would
        // instead re-run the aggregate — and the scan — per branch
        // (column pruning makes each branch a distinct subplan, so
        // exchange reuse cannot dedupe them)
        val one = docs.agg(count(lit(1)).as("n"),
          cols.map { case (e, a) => e.as(a) }: _*).head
        val n = one.getAs[Long]("n")
        import s.implicits._
        Seq("doc_id", "lang", "n_chars", "source", "text").map { name =>
          (name, n - one.getAs[Long](s"c_$name"),
            one.getAs[Long](s"d_$name"),
            one.getAs[String](s"lo_$name"), one.getAs[String](s"hi_$name"))
        }.toDF("col", "n_null", "n_distinct", "lo", "hi")
          .orderBy("col")
      }
    },

    // Expectation audit over lineitem — the declarative constraint
    // gate: domain ranges, not-null, cross-field consistency, plus
    // one referential check against orders (the broadcast-anti-join
    // exception to the single-pass rule). Counts are integers; the
    // report is rule-cardinality rows.
    Query("x71_expectations",
      "WITH v AS (SELECT " +
        "SUM(CASE WHEN l_orderkey IS NOT NULL THEN 0 ELSE 1 END) AS r0, " +
        "SUM(CASE WHEN l_quantity >= 1 AND l_quantity <= 50 THEN 0 ELSE 1 END) AS r1, " +
        "SUM(CASE WHEN l_discount >= 0.0 AND l_discount <= 0.5 THEN 0 ELSE 1 END) AS r2, " +
        "SUM(CASE WHEN l_extendedprice > 0.0 THEN 0 ELSE 1 END) AS r3, " +
        "COUNT(*) AS n FROM lineitem), " +
        "ref AS (SELECT COUNT(*) AS r4 FROM lineitem l " +
        "WHERE l_orderkey IS NOT NULL AND NOT EXISTS " +
        "(SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) " +
        "SELECT rule, violations, total FROM (" +
        "SELECT 'orderkey_not_null' AS rule, CAST(r0 AS BIGINT) AS violations, CAST(n AS BIGINT) AS total FROM v " +
        "UNION ALL SELECT 'quantity_in_1_50', CAST(r1 AS BIGINT), CAST(n AS BIGINT) FROM v " +
        "UNION ALL SELECT 'discount_in_0_half', CAST(r2 AS BIGINT), CAST(n AS BIGINT) FROM v " +
        "UNION ALL SELECT 'price_positive', CAST(r3 AS BIGINT), CAST(n AS BIGINT) FROM v " +
        "UNION ALL SELECT 'orderkey_in_orders', CAST(r4 AS BIGINT), CAST(n AS BIGINT) FROM v, ref" +
        ") ORDER BY rule") {
      (s, d) => {
        val li = table(s, d, "lineitem")
        // plan-pure end to end (the r11 form ran TWO driver jobs
        // during construction — audit's .head and the refViolations
        // count — which made a REST /plan request execute them): the
        // rule rows come from auditPlan's in-plan explode, and the
        // referential rule derives violations AND total in one
        // left-join pass so the audit subtree is never referenced
        // twice for its total
        val base = auditPlan(li, Seq(
          Expectation("orderkey_not_null", col("l_orderkey").isNotNull),
          Expectation("quantity_in_1_50",
            col("l_quantity") >= 1 && col("l_quantity") <= 50),
          Expectation("discount_in_0_half",
            col("l_discount") >= 0.0 && col("l_discount") <= 0.5),
          Expectation("price_positive", col("l_extendedprice") > 0.0)))
        val refRow = li.select(col("l_orderkey").as("_k"))
          .join(table(s, d, "orders")
            .select(col("o_orderkey").as("_k")).distinct()
            .withColumn("_hit", lit(1)), Seq("_k"), "left")
          .agg(count(lit(1)).as("total"),
            count(when(col("_k").isNotNull && col("_hit").isNull, 1))
              .as("violations"))
          .select(lit("orderkey_in_orders").as("rule"),
            col("violations"), col("total"))
        base.unionByName(refRow).orderBy("rule")
      }
    })
}
