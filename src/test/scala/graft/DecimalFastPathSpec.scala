package graft

import graft.functions.expressions.DecimalFns
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The decimal fast paths must be VALUE- and TYPE-identical to the
  * built-in cast/multiply for every input — clean 2-dp doubles (the
  * fast arm), dirty many-digit doubles (the round-trip compare must
  * reject them into the slow arm), negatives, zeros, and integral
  * values. The oracle hash gate depends on this equality. */
class DecimalFastPathSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def mkDoubles(): Seq[Double] = {
    val rnd = new scala.util.Random(53)
    val clean = (0 until 4000).map(_ =>
      math.round(rnd.nextDouble() * 1e7 - 5e6) / 100.0)
    val dirty = (0 until 2000).map(_ => rnd.nextDouble() * 1e6 - 5e5)
    val ties = Seq(1.005, -1.005, 0.125, -0.125, 2.675, 1e13 + 0.005)
    val edges = Seq(0.0, -0.0, 1.0, -1.0, 0.01, -0.01, 1e12, -1e12,
      123.455, 123.465, 0.1 + 0.2)
    clean ++ dirty ++ ties ++ edges
  }

  test("dcast equals the built-in double->decimal(18,2) cast on clean AND dirty doubles") {
    import spark.implicits._
    val df = mkDoubles().toDF("d")
    val both = df.select(
      DecimalFns.dcast(col("d")).as("mine"),
      col("d").cast("decimal(18,2)").as("builtin"))
    assert(both.schema("mine").dataType === both.schema("builtin").dataType)
    val bad = both.filter(!(col("mine") <=> col("builtin"))).count()
    assert(bad === 0, s"$bad rows differ from the built-in cast")
  }

  test("dcast at a non-default scale equals the built-in (3,2) cast") {
    import spark.implicits._
    val df = mkDoubles().map(d => d % 5).toDF("d")
    val both = df.select(
      DecimalFns.dcast(col("d"), 3, 2).as("mine"),
      col("d").cast("decimal(3,2)").as("builtin"))
    assert(both.schema("mine").dataType === both.schema("builtin").dataType)
    // (3,2) overflows for |d| >= 10: the built-in nulls (non-ANSI) or
    // throws (ANSI); restrict to the in-range domain where both are
    // defined — the engine queries only use in-range operands
    val inRange = both.filter(abs(col("d")) < 9.99)
    assert(inRange.filter(!(col("mine") <=> col("builtin"))).count() === 0)
  }

  test("dtimes equals the built-in decimal multiply, value and type") {
    import spark.implicits._
    val rnd = new scala.util.Random(54)
    val rows = (0 until 5000).map { _ =>
      (math.round(rnd.nextDouble() * 1e7 - 5e6) / 100.0,
        math.round(rnd.nextDouble() * 200 - 100) / 100.0)
    }
    val df = rows.toDF("a", "b")
      .select(col("a").cast("decimal(18,2)").as("da"),
        col("b").cast("decimal(18,2)").as("db"))
    val both = df.select(
      DecimalFns.dtimes(col("da"), col("db")).as("mine"),
      (col("da") * col("db")).as("builtin"))
    assert(both.schema("mine").dataType === both.schema("builtin").dataType)
    assert(both.filter(!(col("mine") <=> col("builtin"))).count() === 0)
    // the q18/x27 one-minus shape: (1,0)-(18,2) = (19,2) right operand
    val om = rows.toDF("a", "b")
      .select(col("a").cast("decimal(18,2)").as("da"),
        (lit(1).cast("decimal(1,0)") -
          col("b").cast("decimal(18,2)")).as("om"))
    val both2 = om.select(
      DecimalFns.dtimes(col("da"), col("om")).as("mine"),
      (col("da") * col("om")).as("builtin"))
    assert(both2.schema("mine").dataType === both2.schema("builtin").dataType)
    assert(both2.filter(!(col("mine") <=> col("builtin"))).count() === 0)
  }

  test("dtimes refuses the scale-adjusted precision-loss region") {
    import spark.implicits._
    val df = Seq((BigDecimal(1), BigDecimal(1))).toDF("a", "b")
      .select(col("a").cast("decimal(38,10)").as("a"),
        col("b").cast("decimal(38,10)").as("b"))
    val err = intercept[Exception] {
      df.select(DecimalFns.dtimes(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.contains("adjusted") ||
      err.getCause != null && err.getCause.getMessage.contains("adjusted"),
      s"expected the require to fire, got: ${err.getMessage}")
  }
}
