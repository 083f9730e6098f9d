package graft.operators

import graft.Query
import graft.functions.VectorFns
import graft.functions.VectorFns.Sql
import graft.sources.Tables.table
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Similarity search over the `embeddings` table (SURVEY.md §2.1 Q23 +
 * extensions): brute-force k-NN under L2 and cosine, all-pairs
 * embedding near-dup detection, and an SRP-LSH bucketed ANN variant as
 * the scale path.
 *
 * Brute force broadcasts the (tiny) query side and scans the corpus
 * once — at 100 TB this is the exact-answer baseline you run per query
 * batch. The LSH variant hashes every vector into a 16-bit
 * random-hyperplane signature, so candidate generation becomes an
 * equi-join on the bucket id (shuffle-free against a broadcast query
 * bucket) — recall is probabilistic, so it is spec-tested against the
 * brute-force answer rather than oracle-hashed.
 */
object VectorQueries {

  private def emb(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")

  val all: Seq[Query] = Seq(

    // survey Q23: top-10 by L2 distance to vec_id 0
    Query("q23_knn",
      "WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) " +
        s"SELECT vec_id, round(${Sql.l2sq("embedding", "qe")}, 4) AS d2 " +
        "FROM embeddings, q ORDER BY d2, vec_id LIMIT 10") {
      (s, d) =>
        val q = emb(s, d).filter(col("vec_id") === 0)
          .select(col("embedding").as("qe"))
        emb(s, d).crossJoin(broadcast(q))
          .select(col("vec_id"),
            round(VectorFns.l2sq(col("embedding"), col("qe")), 4).as("d2"))
          .orderBy("d2", "vec_id")
          .limit(10)
    },

    // cosine top-10 for the same query vector
    Query("x9_knn_cosine",
      "WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) " +
        s"SELECT vec_id, round(${Sql.cosine("embedding", "qe")}, 6) AS cos " +
        "FROM embeddings, q ORDER BY cos DESC, vec_id LIMIT 10") {
      (s, d) =>
        val q = emb(s, d).filter(col("vec_id") === 0)
          .select(col("embedding").as("qe"))
        emb(s, d).crossJoin(broadcast(q))
          .select(col("vec_id"),
            round(VectorFns.cosine(col("embedding"), col("qe")), 6).as("cos"))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(10)
    },

    // embedding near-dup pairs: all-pairs cosine ≥ 0.45 (threshold sits
    // in a verified data gap 0.4494–0.4516 so float noise cannot flip
    // membership). Brute force here; x11 is the bucketed scale path.
    Query("x10_embed_neardup",
      "WITH e AS (SELECT vec_id, embedding FROM embeddings), " +
        "c AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, " +
        s"${Sql.cosine("a.embedding", "b.embedding")} AS cos " +
        "FROM e a JOIN e b ON a.vec_id < b.vec_id) " +
        "SELECT vec_a, vec_b, round(cos, 6) AS cos FROM c " +
        "WHERE cos >= 0.45 ORDER BY vec_a, vec_b") {
      (s, d) =>
        // norms are precomputed per row BEFORE the pair join, so the
        // O(n²) stage does one dot product per pair instead of three
        // folds. (dot/‖a‖)/‖b‖ keeps the IEEE op sequence of
        // VectorFns.cosine, so values stay oracle-identical.
        val base = emb(s, d).select(col("vec_id"), col("embedding"),
          sqrt(VectorFns.normsq(col("embedding"))).as("nrm"))
        val a = base.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
          col("nrm").as("na"))
        val b = base.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
          col("nrm").as("nb"))
        a.join(b, col("vec_a") < col("vec_b"))
          .withColumn("cos",
            VectorFns.dot(col("ea"), col("eb")) / col("na") / col("nb"))
          .filter(col("cos") >= 0.45)
          .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cos"))
          .orderBy("vec_a", "vec_b")
    },

    // SRP-LSH bucketed ANN: L=8 hash tables of k=4 deterministic
    // hyperplane sign bits. Candidates = vectors sharing the query's
    // bucket in ANY table (the standard multi-table LSH recall
    // amplification), then exact cosine re-rank of the candidate set.
    // Probabilistic recall → rows-only driver check; AnnSpec asserts
    // recall vs the brute-force top-10 and that distances are exact.
    Query.unchecked("x11_ann_lsh") {
      (s, d) =>
        val L = 8; val k = 4
        val planes = VectorFns.hyperplanes(L * k, 64)
        def bucketCol(t: Int)(e: Column): Column =
          (0 until k).map { j =>
            val coef = array(planes(t * k + j).map(v => lit(v.toFloat)): _*)
            when(VectorFns.dot(e, coef) > 0, lit(1 << j)).otherwise(lit(0))
          }.reduce(_ + _)
        // (vec_id, table, bucket) inverted index; at scale this is the
        // precomputed partitioned index, not a per-query scan
        val idx = emb(s, d).select(col("vec_id"), col("embedding"),
          explode(array((0 until L).map(t =>
            concat(lit(s"$t|"), bucketCol(t)(col("embedding")))): _*)).as("tb"))
        val q = idx.filter(col("vec_id") === 0)
          .select(col("embedding").as("qe"), col("tb").as("qtb"))
        idx.join(broadcast(q), col("tb") === col("qtb"))
          .select(col("vec_id"), col("embedding"), col("qe"))
          .dropDuplicates("vec_id")
          .select(col("vec_id"),
            round(VectorFns.cosine(col("embedding"), col("qe")), 6).as("cos"))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(10)
    },

    // IVF-style ANN: coarse cells = per-label centroids (the fixture's
    // label column stands in for a k-means assignment); probe the
    // nProbe cells nearest to the query, exact cosine re-rank inside.
    // Scan cost drops from |corpus| to |probed cells| — the standard
    // billion-vector layout, with the corpus PARTITIONED BY cell so a
    // probe prunes whole partitions. Probabilistic recall → rows-only
    // driver check; VectorSpec asserts recall vs brute force.
    Query.unchecked("x20_ann_ivf") {
      (s, d) =>
        val nProbe = 3
        val e = emb(s, d)
        val centroids = e.groupBy(col("label")).agg(
          array((0 until 64).map(i =>
            avg(element_at(col("embedding"), i + 1).cast("double"))
              .cast("float")): _*).as("centroid"))
        val q = e.filter(col("vec_id") === 0)
          .select(col("embedding").as("qe"))
        // rank cells by centroid distance to the query, keep nProbe
        val probed = centroids.crossJoin(broadcast(q))
          .select(col("label"),
            VectorFns.l2sq(col("centroid"), col("qe")).as("cd"))
          .orderBy("cd").limit(nProbe)
          .select(col("label"))
        e.join(broadcast(probed), Seq("label"))
          .crossJoin(broadcast(q))
          .select(col("vec_id"),
            round(VectorFns.cosine(col("embedding"), col("qe")), 6).as("cos"))
          .orderBy(col("cos").desc, col("vec_id"))
          .limit(10)
    })
}
