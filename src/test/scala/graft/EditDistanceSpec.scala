package graft

import graft.functions.expressions.TextExprUtil
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** EditDistanceAtMost == the reference levenshtein wherever the
  * distance is within threshold, −1 beyond it — property-checked
  * against Spark's own implementation over randomized pairs. */
class EditDistanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ref(a: String, b: String): Int =
    UTF8String.fromString(a).levenshteinDistance(UTF8String.fromString(b))

  private def got(a: String, b: String, k: Int): Int =
    TextExprUtil.editAtMost(
      UTF8String.fromString(a), UTF8String.fromString(b), k)

  test("matches the reference distance within threshold, -1 beyond, over 2000 random pairs") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcde" // small alphabet → many near-misses
    def word(n: Int) =
      (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    for (_ <- 0 until 2000) {
      val a = word(rnd.nextInt(12))
      val b =
        if (rnd.nextBoolean()) word(rnd.nextInt(12))
        else { // mutate a: the near-duplicate regime the trim optimizes
          val sb = new StringBuilder(a)
          for (_ <- 0 until rnd.nextInt(4) if sb.nonEmpty)
            rnd.nextInt(3) match {
              case 0 => sb.setCharAt(rnd.nextInt(sb.length),
                alpha(rnd.nextInt(alpha.length)))
              case 1 => sb.deleteCharAt(rnd.nextInt(sb.length))
              case _ => sb.insert(rnd.nextInt(sb.length + 1),
                alpha(rnd.nextInt(alpha.length)))
            }
          sb.toString
        }
      for (k <- 0 to 4) {
        val d = ref(a, b)
        val expected = if (d <= k) d else -1
        assert(got(a, b, k) === expected,
          s"editAtMost('$a','$b',$k): expected $expected (ref dist $d)")
      }
    }
  }

  test("edges: empty strings, identical strings, k=0, huge k") {
    assert(got("", "", 2) === 0)
    assert(got("abc", "", 2) === -1)
    assert(got("ab", "", 2) === 2)
    assert(got("same", "same", 0) === 0)
    assert(got("same", "sama", 0) === -1)
    // k near Int.MaxValue must not wrap inf = k + 1 negative
    assert(got("abc", "xyz", Int.MaxValue) === 3)
    assert(got("kitten", "sitting", Int.MaxValue) === 3)
    // non-ASCII comparands take the decode fallback, CHARACTER
    // distance (not byte distance — é is 2 UTF-8 bytes, 1 edit)
    assert(got("café", "cafe", 2) === 1)
    assert(got("über", "uber", 2) === 1)
    assert(got("naïve", "naïve", 0) === 0)
    assert(got("日本語", "日本誤", 2) === 1)
    // mixed: one ASCII, one not — buffers must not cross-contaminate
    assert(got("resume", "résumé", 3) === 2)
  }

  test("the Column form agrees with the built-in threshold levenshtein in a plan") {
    import spark.implicits._
    val df = Seq(("kitten", "sitting"), ("flaw", "flaws"),
      ("abc", "abc"), ("abc", "xyz")).toDF("a", "b")
    val rows = df.select(
      graft.functions.expressions.TextExpressions
        .edit_at_most(col("a"), col("b"), 2).as("mine"),
      levenshtein(col("a"), col("b"), 2).as("builtin")).collect()
    rows.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }
}
