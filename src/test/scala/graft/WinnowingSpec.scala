package graft

import graft.functions.TextFns
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins winnowing's defining guarantee (Schleimer et al. '03, §3): with
  * k-gram fingerprints winnowed over w-windows, any two documents
  * sharing a token run of length ≥ k + w − 1 MUST share at least one
  * selected fingerprint — that is what makes the fingerprint set a
  * sound substring-overlap detector (no false negatives above the
  * guarantee threshold), unlike sampling 1-in-p hashes. */
class WinnowingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fps(texts: Seq[String]): Seq[Set[Long]] = {
    import spark.implicits._
    texts.toDF("text")
      .select(TextFns.winnowFps(split(col("text"), " ")).as("fps"))
      .collect().map(_.getSeq[Long](0).toSet).toSeq
  }

  test("shared run of k+w-1 = 7 tokens always yields a shared fingerprint") {
    val shared = "omega kappa lambda sigma theta delta phi" // 7 tokens
    // 50 random-context pairs embedding the shared run at varying
    // offsets — the guarantee must hold for EVERY one, not on average
    val rnd = new scala.util.Random(7)
    def noise(n: Int) = Seq.fill(n)("tok" + rnd.nextInt(5000)).mkString(" ")
    val pairs = (1 to 50).map { _ =>
      (s"${noise(rnd.nextInt(20) + 4)} $shared ${noise(rnd.nextInt(20) + 4)}",
        s"${noise(rnd.nextInt(20) + 4)} $shared ${noise(rnd.nextInt(20) + 4)}")
    }
    val all = fps(pairs.flatMap(p => Seq(p._1, p._2)))
    all.grouped(2).zipWithIndex.foreach { case (Seq(a, b), i) =>
      assert(a.intersect(b).nonEmpty,
        s"pair $i shares a 7-token run but no fingerprint — guarantee broken")
    }
  }

  test("density: fingerprints per doc stay near the 2/(w+1) expectation, never above 1 per window") {
    val rnd = new scala.util.Random(11)
    val docs = (1 to 20).map(_ =>
      Seq.fill(200)("w" + rnd.nextInt(100000)).mkString(" "))
    val sets = fps(docs)
    sets.foreach { s =>
      val windows = 200 - 4 + 1 - 3 // tokens -> grams -> windows
      assert(s.size <= windows)
      // expected density 2/(w+1) = 0.4; allow generous slack both ways
      assert(s.size >= windows / 5, s"implausibly sparse: ${s.size}/$windows")
    }
  }

  test("disjoint token streams share no fingerprint (24-bit hash: collisions possible but not at this scale)") {
    val a = (1 to 100).map(i => s"left$i").mkString(" ")
    val b = (1 to 100).map(i => s"right$i").mkString(" ")
    val Seq(fa, fb) = fps(Seq(a, b))
    assert(fa.intersect(fb).isEmpty)
  }
}
