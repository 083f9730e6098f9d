package graft

import graft.operators.AsofJoin
import org.scalatest.funsuite.AnyFunSuite

/** Direct semantics of AsofJoin.backward: at-or-before matching,
  * simultaneous-row inclusion, no-match nulls, key isolation. */
class AsofSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val right = Seq( // (key, t, value)
    ("a", 10L, 100L), ("a", 20L, 200L), ("b", 15L, 150L))
    .toDF("k", "t", "v")

  private def join(left: Seq[(String, Long, Long)]) =
    AsofJoin.backward(left.toDF("k", "t", "lid"), right, "k", "t", "v")
      .orderBy("lid").collect()
      .map(r => r.getLong(2) -> Option(r.get(3)).map(_.asInstanceOf[Long]))

  test("matches the latest right row at or before t, per key") {
    val out = join(Seq(
      ("a", 5L, 1L),   // before any right row → null
      ("a", 10L, 2L),  // simultaneous → matched (at-or-before)
      ("a", 15L, 3L),  // between → 100
      ("a", 25L, 4L),  // after both → 200
      ("b", 25L, 5L),  // other key → 150, not a's rows
      ("c", 99L, 6L))) // key with no right rows → null
    assert(out.toSeq === Seq(1L -> None, 2L -> Some(100L), 3L -> Some(100L),
      4L -> Some(200L), 5L -> Some(150L), 6L -> None))
  }

  test("left row multiplicity is preserved") {
    val out = join(Seq(("a", 15L, 1L), ("a", 15L, 2L), ("a", 15L, 3L)))
    assert(out.length === 3)
    assert(out.forall(_._2.contains(100L)))
  }
}
