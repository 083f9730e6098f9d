package graft

import graft.functions.expressions.{DecimalFns, DecimalSumFns}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[DecimalSumFns.dsum]] must be VALUE- and TYPE-identical to the
  * built-in `sum` over decimals — including nulls (skipped; all-null
  * and empty groups yield null), negatives, the grouped/merge path
  * (multiple input partitions force partial + final aggregation, so
  * the 128-bit carry arithmetic in BOTH update and merge is
  * exercised), and the product shape the wired sites feed it
  * ((37,4)/(38,4)-typed children whose values are compact). The
  * oracle hash gate depends on this equality. */
class DecimalSumSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("dsum equals built-in sum over grouped decimal(18,2) with nulls") {
    import spark.implicits._
    val rnd = new scala.util.Random(55)
    val rows = (0 until 20000).map { i =>
      val d: java.lang.Double =
        if (i % 97 == 0) null
        else math.round(rnd.nextDouble() * 1e9 - 5e8) / 100.0
      (i % 7, d)
    }
    val df = rows.toDF("g", "d").repartition(8)
      .select(col("g"), col("d").cast("decimal(18,2)").as("v"))
    val both = df.groupBy("g").agg(
      DecimalSumFns.dsum(col("v")).as("mine"),
      sum(col("v")).as("builtin"))
    assert(both.schema("mine").dataType === both.schema("builtin").dataType)
    assert(both.schema("mine").nullable === both.schema("builtin").nullable)
    assert(both.filter(!(col("mine") <=> col("builtin"))).count() === 0)
  }

  test("dsum: all-null group and empty frame yield null like the built-in") {
    import spark.implicits._
    val df = Seq((0, null: java.lang.Double), (0, null: java.lang.Double))
      .toDF("g", "d")
      .select(col("g"), col("d").cast("decimal(18,2)").as("v"))
    val r = df.groupBy("g").agg(
      DecimalSumFns.dsum(col("v")).as("mine"),
      sum(col("v")).as("builtin")).head
    assert(r.isNullAt(1) && r.isNullAt(2))
    val empty = df.filter(lit(false)).agg(
      DecimalSumFns.dsum(col("v")).as("mine"),
      sum(col("v")).as("builtin")).head
    assert(empty.isNullAt(0) && empty.isNullAt(1))
  }

  test("dsum over the wired product shape ((18,2)x(19,2) -> (38,4))") {
    import spark.implicits._
    val rnd = new scala.util.Random(56)
    val rows = (0 until 20000).map { _ =>
      (math.round(rnd.nextDouble() * 1e7) / 100.0,
        math.round(rnd.nextDouble() * 100) / 100.0)
    }
    val df = rows.toDF("p", "disc").repartition(8)
    val prod = DecimalFns.dtimes(DecimalFns.dcast(col("p")),
      lit(1).cast("decimal(1,0)") - DecimalFns.dcast(col("disc")))
    val both = df.agg(
      DecimalSumFns.dsum(prod).as("mine"), sum(prod).as("builtin"))
    assert(both.schema("mine").dataType === both.schema("builtin").dataType)
    val r = both.head
    assert(r.getDecimal(0) === r.getDecimal(1))
  }

  test("dsum carry path: sums past one long's unscaled range stay exact") {
    import spark.implicits._
    // 4000 rows x 9e18-ish unscaled values: the lo limb wraps many
    // times, so a wrong carry would be off by 2^64 — compare against
    // the built-in (BigDecimal-buffered) sum and an exact driver-side
    // fold. Also exercises negatives (alternating signs, net positive).
    val rows = (0 until 4000).map { i =>
      val sign = if (i % 3 == 0) -1 else 1
      BigDecimal(sign * (9e16.toLong + i)) / 100
    }
    val df = rows.map(_.toString).toDF("s").repartition(8)
      .select(col("s").cast("decimal(18,2)").as("v"))
    val both = df.agg(
      DecimalSumFns.dsum(col("v")).as("mine"), sum(col("v")).as("builtin"))
    val r = both.head
    val exact = rows.sum
    assert(BigDecimal(r.getDecimal(0)) === exact)
    assert(BigDecimal(r.getDecimal(1)) === exact)
  }

  test("dsum merge path: per-partition partials combine exactly") {
    import spark.implicits._
    // one distinct value per partition, partition-local partials are
    // 128-bit; with 64 partitions the merge path must chain carries
    val df = (0 until 64).flatMap(p => (0 until 500).map(_ => p))
      .toDF("p").repartition(64, col("p"))
      .select((col("p") * 1000000 + lit(999999999999999L)).cast("string")
        .cast("decimal(18,2)").as("v"))
    val both = df.agg(
      DecimalSumFns.dsum(col("v")).as("mine"), sum(col("v")).as("builtin"))
    val r = both.head
    assert(r.getDecimal(0) === r.getDecimal(1))
  }
}
