package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("saltedJoin is row-identical to the plain inner join on a skewed corpus") {
    import spark.implicits._
    // 90% of the fact rows share one hot key
    val fact = (1 to 10000).map { i =>
      val k = if (i % 10 == 0) s"k${i % 50}" else "hot"
      (k, i.toLong)
    }.toDF("k", "v")
    val dim = (Seq("hot") ++ (0 until 50).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, s"d$i") }.toDF("k", "label")

    val plain = fact.join(dim, Seq("k")).select("k", "v", "label")
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = SkewJoin.saltedJoin(fact, dim, Seq("k"), buckets = 8)
      .select("k", "v", "label")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.length === plain.length)
    assert(salted.toSeq === plain.toSeq)
  }

  test("salting spreads a hot key across buckets") {
    import spark.implicits._
    val fact = (1 to 1000).map(i => ("hot", i.toLong)).toDF("k", "v")
    val dim = Seq(("hot", "d")).toDF("k", "label")
    // count distinct salt values actually assigned to the hot key
    val salts = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(col).toIndexedSeq: _*), lit(8)))
      .select("__salt").distinct().count()
    assert(salts > 4) // deterministic hash spreads over most buckets
    // and the join still returns every fact row exactly once
    assert(SkewJoin.saltedJoin(fact, dim, Seq("k"), 8).count() === 1000)
  }

  test("salt is deterministic across evaluations (retry-safe)") {
    import spark.implicits._
    val fact = (1 to 500).map(i => ("hot", i.toLong)).toDF("k", "v")
    val s1 = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(col).toIndexedSeq: _*), lit(8)))
      .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    val s2 = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(col).toIndexedSeq: _*), lit(8)))
      .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    assert(s1 === s2)
  }
}
