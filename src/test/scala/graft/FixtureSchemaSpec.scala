package graft

import graft.sources.Tables
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Fixture drift tripwire (VERDICT r9/r10 ask): the driver regenerates
 * /root/testdata per round, and a silent column re-type once cost 10
 * queries (`events.ts` shipped as TIMESTAMP(NANOS) in one vintage and
 * TIMESTAMP(MICROS)/NTZ in another — handled by the branching reader,
 * Tables.scala). This spec pins every analytic fixture's schema AS THE
 * ENGINE SEES IT (post `Tables.table` normalization), so the NEXT
 * drift fails here with one pointed message naming the fixture and
 * column, instead of as dozens of downstream analysis errors.
 */
class FixtureSchemaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Expected (column, type) per fixture — the contract every query in
    * SparkEntry assumes. Types are the POST-normalization Spark types. */
  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      // parquet isAdjustedToUTC=false → Spark reads NTZ; queries compare
      // against timestamp literals under the pinned UTC session, so NTZ
      // vs LTZ here is a REAL semantic pin, not cosmetics
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType),
  )

  test("every analytic fixture matches the schema contract the queries assume") {
    val problems = Tables.analytic.flatMap { name =>
      val actual = Tables.table(spark, TestSpark.sf, name).schema
      val want = expected(name)
      val missing = want.collect {
        case (c, _) if !actual.fieldNames.contains(c) =>
          s"$name.parquet: column `$c` MISSING (fixture drift — " +
            s"has: ${actual.fieldNames.mkString(", ")})"
      }
      val retyped = want.collect {
        case (c, t) if actual.fieldNames.contains(c)
            && !sameType(actual(c).dataType, t) =>
          s"$name.parquet: column `$c` re-typed to ${actual(c).dataType.sql} " +
            s"(queries assume ${t.sql}) — a NEW fixture vintage; if this is " +
            s"events.ts, extend the vintage branch in Tables.table"
      }
      val extra = actual.fieldNames.filterNot(c => want.exists(_._1 == c))
        .map(c => s"$name.parquet: NEW column `$c` " +
          s"(${actual(c).dataType.sql}) — harmless to queries, but update " +
          "FixtureSchemaSpec so the contract stays exhaustive")
      missing ++ retyped ++ extra
    }
    assert(problems.isEmpty, "\n" + problems.mkString("\n"))
  }

  /** Array element nullability varies by writer; ignore it. */
  private def sameType(a: DataType, b: DataType): Boolean = (a, b) match {
    case (ArrayType(ea, _), ArrayType(eb, _)) => sameType(ea, eb)
    case _ => a == b
  }

  test("events.ts raw vintage is one the branching reader handles") {
    val raw = spark.read
      .option("mergeSchema", "false").parquet(s"${TestSpark.sf}/events.parquet")
      .schema("ts").dataType
    assert(Seq(LongType, TimestampNTZType, TimestampType).contains(raw),
      s"events.parquet shipped ts as $raw — a vintage Tables.table does NOT " +
        "branch on; add a case before any query touches events")
  }
}
