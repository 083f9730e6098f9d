package graft

import org.scalatest.funsuite.AnyFunSuite

/** x118 — cluster-aware split assignment: the transform that fixes
  * what x84 audits. The load-bearing property is the ANTI-STRADDLE
  * invariant: no near-dup pair (the x25 Hamming-ball graph, i.e. the
  * edges x34's clusters are built from) may land on opposite sides of
  * a split boundary. Pinned here from first principles — the per-doc
  * split is re-derived with java MD5, independent of the engine's
  * expression chain. */
class ClusterSplitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def md5pct(s: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    ((((d(0) & 0xff) << 8) | (d(1) & 0xff)) % 100)
  }
  private def splitOf(anchor: Long): String = {
    val b = md5pct(anchor.toString)
    if (b < 80) "train" else if (b < 90) "val" else "test"
  }

  test("no x25 near-dup pair straddles a split; moved counts reconcile with the naive split") {
    // anchors from the hash-checked x34 clustering
    val cluster = SparkEntry.queries("x34_dedup_clusters")(
      spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def anchorOf(id: Long): Long = cluster.getOrElse(id, id)
    // every near-dup EDGE co-locates (stronger than per-cluster: the
    // pairs are the evidence x84 counts as leakage)
    val pairs = SparkEntry.queries("x25_simhash_neardup")(
      spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(splitOf(anchorOf(a)) === splitOf(anchorOf(b)),
        s"near-dup pair ($a,$b) straddles the split boundary")
    }
    // the declared report agrees with the first-principles recompute
    val docs = graft.sources.Tables.table(spark, TestSpark.sf, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val expect = docs.groupBy(id => splitOf(anchorOf(id)))
      .map { case (sp, ids) =>
        sp -> ((ids.length.toLong,
          ids.count(id => splitOf(anchorOf(id)) != splitOf(id)).toLong))
      }
    val got = SparkEntry.queries("x118_cluster_split")(spark, TestSpark.sf)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (sp, (n, moved)) =>
      val (gn, gm, straddle) = got(sp)
      assert(gn === n, s"$sp n_docs")
      assert(gm === moved, s"$sp n_moved")
      assert(straddle === 0L, "straddling clusters must be impossible")
    }
    // and the transform is not vacuous on this fixture: the naive
    // split DID separate at least one clustered doc from its anchor
    assert(expect.values.map(_._2).sum > 0L,
      "fixture has no moved docs — the transform is untested")
  }
}
