package graft

import java.nio.file.Files
import graft.functions.ZOrder
import graft.operators.ZOrderQueries
import graft.sources.Tables.table
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: the Morton interleave is bit-correct, the layout
  * changes nothing about results, and — the reason it exists — a 2-d
  * box scans FEWER rows over the z-layout than over a 1-d sort,
  * because parquet min/max stats prune files in both dimensions. */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("interleave matches the reference bit-weave, preserves locality") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (1L, 65535L))
    val got = rows.toDF("x", "y")
      .select(ZOrder.interleave(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    val want = rows.map { case (x, y) => ZOrder.interleaveRef(x, y) }
    assert(got.toSeq === want)
    // canonical small cases: (x=1,y=0)->1, (x=0,y=1)->2, full grid -> 2^32-1
    assert(ZOrder.interleaveRef(1, 0) === 1L)
    assert(ZOrder.interleaveRef(0, 1) === 2L)
    assert(ZOrder.interleaveRef(65535, 65535) === (1L << 32) - 1)
  }

  test("scaleTo clamps and spans the grid") {
    import spark.implicits._
    val got = Seq(-5.0, 0.0, 50.0, 100.0, 140.0).toDF("v")
      .select(ZOrder.scaleTo(col("v"), 0, 100, 4).as("c"))
      .collect().map(_.getLong(0))
    assert(got.toSeq === Seq(0L, 0L, 7L, 15L, 15L))
  }

  private def scanRows(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "no file scan in plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  private def box(df: DataFrame): DataFrame =
    df.filter(col("user_id").between(4, 8) &&
      col("ts") >= to_timestamp(lit("2024-01-10")) &&
      col("ts") < to_timestamp(lit("2024-01-17")))

  test("z-layout scans fewer rows than a 1-d sort for a 2-d box") {
    // synthetic 1000×1000 grid, 50k points, 128 files per layout — the
    // tiny fixture (15 users at sf0.001) is too coarse to separate the
    // layouts; x69's oracle covers fixture correctness, this test
    // measures the pruning mechanism at realistic key cardinality
    val n = 50000
    val pts = spark.range(n).select(
      pmod(xxhash64(col("id")), lit(1000)).as("a"),
      pmod(xxhash64(col("id"), lit(1)), lit(1000)).as("b"))
    val z = graft.functions.ZOrder.zvalue(
      col("a"), 0, 999, col("b"), 0, 999)
    val zDir = Files.createTempDirectory("graft-z-grid").toString
    pts.withColumn("_z", z).repartitionByRange(128, col("_z"))
      .sortWithinPartitions("_z").drop("_z")
      .write.mode("overwrite").parquet(zDir)
    val aDir = Files.createTempDirectory("graft-a-grid").toString
    pts.repartitionByRange(128, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(aDir)
    def boxed(df: DataFrame) =
      df.filter(col("a").between(100, 199) && col("b").between(400, 499))
    val boxRows = boxed(pts).count() // ~1% of n
    val zRows = scanRows(boxed(spark.read.parquet(zDir)))
    val aRows = scanRows(boxed(spark.read.parquet(aDir)))
    assert(zRows >= boxRows, "scan cannot produce fewer rows than the box")
    // 1-d sort prunes only its own dimension (~10% of rows); z-order
    // prunes the intersection — demand at least a 2× reduction
    assert(zRows * 2 < aRows,
      s"z-order win too small: z=$zRows 1d-sort=$aRows box=$boxRows")
  }

  test("x69 box query result is layout-independent") {
    val fromZ = SparkEntry.queries("x69_zorder_box")(spark, TestSpark.sf)
    val fromRaw = box(table(spark, TestSpark.sf, "events"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100).cast("bigint")).as("cents"))
      .orderBy("event_type")
    assert(fromZ.collect().toSeq === fromRaw.collect().toSeq)
  }
}
