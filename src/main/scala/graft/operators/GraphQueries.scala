package graft.operators

import graft.Query
import graft.sources.Tables.table
import org.apache.spark.sql.functions._

/**
 * Iterative graph computation as a DataFrame superstep loop — the
 * general-purpose sibling of the dedup family's connected components
 * (DedupQueries x34/x40): PageRank over the nation-level trade graph
 * (customer nation → supplier nation, weighted by lineitem count).
 * In a training-data pipeline this is the domain/source authority
 *-weighting step (CommonCrawl-style host ranking feeding quality
 * mixes); here the fixture's trade graph stands in for the host graph.
 *
 * Shape: the edge list is ONE pass over the fact table (two broadcast
 * dimension joins + a single shuffle to group by (src,dst)); each
 * PageRank superstep is then an equi-join of the 25-row rank vector
 * with the edge list plus a groupBy — at web scale the rank vector
 * shuffles on dst, partitioned identically across iterations so the
 * join co-locates. Iterations are UNROLLED into one plan here (3 fixed
 * supersteps, matching the oracle's CTE chain — the edge-building
 * subtree dedupes through ReuseExchange); an open-ended convergence
 * loop would materialize each superstep like the CC operator does
 * (DedupQueries), which is the cluster-correct pattern for deep
 * iteration.
 *
 * Oracle parity: edge weights are exact counts, transition
 * probabilities w/Σw and the damping update 0.006 + 0.85·Σ are the
 * same IEEE double ops on both engines; only the Σ association order
 * differs (≤25 addends), which round(…, 6) absorbs.
 */
object GraphQueries {

  /** The customer/supplier key→nation projections grow linearly with
    * the corpus — guard the hint (shared rationale: [[PlanGuards]]). */
  private def broadcastIfSmall(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = PlanGuards.broadcastIfSmall(df)

  val all: Seq[Query] = Seq(

    // Triangle counting over the co-purchase graph (parts sharing an
    // order) — the non-iterative graph-analytics class next to x50's
    // PageRank and x34/x40's connected components: one triple
    // self-join, no supersteps. The scale insight is the ORIENTATION:
    // each undirected edge becomes one directed edge low→high by
    // (degree, id), which (a) counts every triangle exactly once for
    // ANY strict total order and (b) bounds per-node fan-out by
    // O(√m) — the hub that breaks the naive u<v orientation (its
    // wedge count is degree²) has out-degree ≤ √m after orientation.
    // The oracle uses the simpler u<v orientation: the COUNT is
    // provably identical, so the hash check validates the engine's
    // degree-ordered plan against the order-free ground truth.
    Query("x83_triangles",
      "WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
        "e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v " +
        "FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey " +
        "AND a.l_partkey < b.l_partkey) " +
        "SELECT (SELECT COUNT(*) FROM e) AS edges, COUNT(*) AS triangles " +
        "FROM e e1 JOIN e e2 ON e1.v = e2.u " +
        "JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v") {
      (s, d) => {
        val li = table(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        val undirected = li.select(col("l_orderkey"), col("l_partkey").as("u"))
          .join(li.select(col("l_orderkey"), col("l_partkey").as("v")),
            Seq("l_orderkey"))
          .filter(col("u") < col("v"))
          .select("u", "v").distinct()
        // degree per endpoint, then orient each edge low→high by
        // (degree, id); persist the oriented list — it is probed three
        // times by the wedge join
        val deg = undirected.select(col("u").as("n"))
          .unionAll(undirected.select(col("v").as("n")))
          .groupBy("n").agg(count(lit(1)).as("deg"))
        val withDeg = undirected
          .join(deg.select(col("n").as("u"), col("deg").as("du")), Seq("u"))
          .join(deg.select(col("n").as("v"), col("deg").as("dv")), Seq("v"))
        val uFirst = col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v"))
        val e = withDeg.select(
          when(uFirst, col("u")).otherwise(col("v")).as("src"),
          when(uFirst, col("v")).otherwise(col("u")).as("dst"))
        // count via ADJACENCY INTERSECTION, not a wedge join: per
        // oriented edge (a,b), triangles closed by it =
        // |N⁺(a) ∩ N⁺(b)| — a fused merge loop over two sorted long
        // arrays (codegen SortedIntersectCount, ~1-2 ns/step) instead
        // of materializing ~10⁸ wedge rows through join operators
        // (~50 ns each; the relational formulation measured 7-13 s
        // here, this one ~2 s). Total work is identical: Σ per-edge
        // neighbor-list lengths = the wedge count the (degree, id)
        // orientation already bounds by O(m·√m). The adjacency table
        // is node-cardinality and broadcasts; past broadcast size the
        // same plan shuffles e on src and dst — still no wedge blowup,
        // the intersection stays inside the row.
        // the pair-derivation subtree appears once per reference but
        // its exchanges dedupe through ReuseExchange (verified: an
        // explode-the-adjacency restructure that forces single
        // derivation measured SLOWER — the explode pass costs more
        // than the reused recomputes save)
        val adj = e.groupBy(col("src"))
          .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
        val triangles = e
          .join(broadcast(adj.select(col("src"), col("nbrs").as("na"))),
            Seq("src"))
          .join(broadcast(adj.select(col("src").as("dst"),
            col("nbrs").as("nb"))), Seq("dst"))
          // coalesce: a triangle-free graph leaves the probe join
          // empty and sum-over-nothing is NULL, while the oracle's
          // COUNT(*) is 0
          .agg(coalesce(sum(graft.functions.expressions.VectorExpressions
            .sorted_intersect_count(col("na"), col("nb"))), lit(0L))
            .as("triangles"))
        e.agg(count(lit(1)).as("edges")).crossJoin(triangles)
          .select(col("edges"), col("triangles"))
      }
    },

    Query("x50_pagerank",
      "WITH e AS (" +
        "SELECT c_nationkey AS src, s_nationkey AS dst, " +
        "CAST(COUNT(*) AS DOUBLE) AS w " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "JOIN lineitem ON l_orderkey = o_orderkey " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "GROUP BY 1, 2), " +
        "outw AS (SELECT src, SUM(w) AS ow FROM e GROUP BY 1), " +
        "ew AS (SELECT e.src, e.dst, e.w / outw.ow AS p " +
        "FROM e JOIN outw USING (src)), " +
        "n AS (SELECT n_nationkey AS id, n_name FROM nation), " +
        "r0 AS (SELECT id, 0.04 AS r FROM n), " +
        "r1 AS (SELECT n.id, 0.006 + 0.85 * COALESCE(SUM(r0.r * ew.p), 0) AS r " +
        "FROM n LEFT JOIN ew ON ew.dst = n.id LEFT JOIN r0 ON r0.id = ew.src " +
        "GROUP BY n.id), " +
        "r2 AS (SELECT n.id, 0.006 + 0.85 * COALESCE(SUM(r1.r * ew.p), 0) AS r " +
        "FROM n LEFT JOIN ew ON ew.dst = n.id LEFT JOIN r1 ON r1.id = ew.src " +
        "GROUP BY n.id), " +
        "r3 AS (SELECT n.id, 0.006 + 0.85 * COALESCE(SUM(r2.r * ew.p), 0) AS r " +
        "FROM n LEFT JOIN ew ON ew.dst = n.id LEFT JOIN r2 ON r2.id = ew.src " +
        "GROUP BY n.id) " +
        "SELECT n.n_name, round(r3.r, 6) AS rank " +
        "FROM n JOIN r3 ON r3.id = n.id ORDER BY n.n_name") {
      (s, d) =>
        // edge list: one fact pass, dims broadcast, one (src,dst) shuffle.
        // orders rides the broadcastIfSmall guard too (r17): the bench
        // census showed the lineitem⋈orders strategy FLIPPING between
        // SMJ and a runtime BHJ across runs — the guard pins the
        // broadcast locally (the projection is 2 narrow columns) while
        // corpus growth past the threshold falls back to the shuffle
        // join, same as the dim sides
        val e = table(s, d, "lineitem").select("l_orderkey", "l_suppkey")
          .join(broadcastIfSmall(table(s, d, "orders")
            .select("o_orderkey", "o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcastIfSmall(table(s, d, "customer")
            .select("c_custkey", "c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcastIfSmall(table(s, d, "supplier")
            .select("s_suppkey", "s_nationkey")),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
          .agg(count(lit(1)).cast("double").as("w"))
        val outw = e.groupBy("src").agg(sum(col("w")).as("ow"))
        val ew = e.join(outw, "src")
          .select(col("src"), col("dst"), (col("w") / col("ow")).as("p"))
        val n = table(s, d, "nation")
          .select(col("n_nationkey").as("id"), col("n_name"))
        var r = n.select(col("id"), lit(0.04).as("r"))
        for (_ <- 1 to 3) {
          val contrib = ew
            .join(r.select(col("id").as("src_id"), col("r")),
              col("src") === col("src_id"))
            .groupBy(col("dst"))
            .agg(sum(col("r") * col("p")).as("contrib"))
          r = n.select(col("id"))
            .join(contrib, col("id") === col("dst"), "left")
            .select(col("id"),
              (lit(0.006) + lit(0.85) *
                coalesce(col("contrib"), lit(0.0))).as("r"))
        }
        n.join(r, "id")
          .select(col("n_name"), round(col("r"), 6).as("rank"))
          .orderBy("n_name")
    })
}
