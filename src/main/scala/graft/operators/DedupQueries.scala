package graft.operators

import graft.Query
import graft.functions.TextFns
import graft.functions.TextFns.Sql
import graft.sources.Tables.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Document deduplication (SURVEY.md §2.1 Q21 + the pipeline
 * extensions): exact hash dedup, exact n-gram-Jaccard near-dup pairs
 * via a shingle inverted index, and MinHash+LSH near-dup detection.
 *
 * The MinHash signature uses the lexicographic minimum of
 * md5(seed || ':' || shingle) per seed — a portable permutation both
 * Spark and DuckDB evaluate identically, so even the LSH candidate set
 * (including its probabilistic false negatives) is bit-reproducible and
 * fully oracle-checked.
 *
 * Scale notes: the inverted-index self-join is the standard distributed
 * near-dup algorithm (shuffle by shingle, then by pair); at 100 TB you
 * would add a document-frequency cutoff on hot shingles to bound skew —
 * here the corpus is synthetic and uniform. MinHash+LSH replaces the
 * O(n²)-candidate shingle join with O(n·bands) bucket joins, which is
 * the scale path.
 */
object DedupQueries {

  private val Threshold = 0.8
  private val Seeds = 0 until 8 // 8 minhash permutations → 4 bands of 2

  // Each builder invocation salts its persisted subtree with a fresh
  // nonce (projected away before output): otherwise Spark's
  // CacheManager plan-matches a later invocation onto an earlier
  // invocation's cache — which made Bench's timed run read the warmup
  // run's cache instead of doing the work it claims to measure.
  private val nonce = new java.util.concurrent.atomic.AtomicLong(0)
  private def salted(df: DataFrame): DataFrame =
    df.withColumn("__nonce", lit(nonce.incrementAndGet()))

  /** doc_id + distinct 3-gram shingle set (docs with ≥3 tokens). */
  private def shingled(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")
      .select(col("doc_id"), TextFns.tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= 3)
      .select(col("doc_id"), TextFns.shingles(col("ts")).as("s"))
      .withColumn("n", size(col("s")))

  private val shingledSql =
    "sh AS (SELECT doc_id, " + Sql.shingles("ts") + " AS s FROM " +
      "(SELECT doc_id, string_split(text, ' ') AS ts FROM documents) " +
      "WHERE len(ts) >= 3)"

  /** Exact-Jaccard verification of candidate pairs (shared by the exact
    * and the MinHash paths): set-intersection sizes over the shingle
    * arrays. */
  private def verified(cand: DataFrame, sh: DataFrame): DataFrame = {
    val a = sh.select(col("doc_id").as("doc_a"), col("s").as("sa"), col("n").as("na"))
    val b = sh.select(col("doc_id").as("doc_b"), col("s").as("sb"), col("n").as("nb"))
    cand.join(a, "doc_a").join(b, "doc_b")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= Threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  val all: Seq[Query] = Seq(

    // exact dedup via content hash (survey Q21)
    Query("q21_dedup_exact",
      "SELECT COUNT(*) AS docs, COUNT(DISTINCT md5(text)) AS uniq FROM documents") {
      (s, d) =>
        table(s, d, "documents")
          .agg(count(lit(1)).as("docs"),
            countDistinct(md5(col("text"))).as("uniq"))
    },

    // exact n-gram-Jaccard near-dup pairs via shingle inverted index:
    // explode shingles → self-join on shingle → per-pair intersection
    // counts → Jaccard ≥ 0.8
    Query("x7_ngram_jaccard",
      s"WITH $shingledSql, " +
        "ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh), " +
        "pair AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS na, b.n AS nb, " +
        "COUNT(*) AS inter FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id " +
        "GROUP BY 1, 2, 3, 4) " +
        "SELECT doc_a, doc_b, round(CAST(inter AS DOUBLE) / (na + nb - inter), 6) AS jaccard " +
        s"FROM pair WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= $Threshold " +
        "ORDER BY doc_a, doc_b") {
      (s, d) =>
        // persisted: both sides of the inverted-index self-join read it
        val ex = salted(shingled(s, d)
          .select(col("doc_id"), col("n"), explode(col("s")).as("g")))
          .persist()
          .drop("__nonce")
        val a = ex.select(col("doc_id").as("doc_a"), col("n").as("na"), col("g"))
        val b = ex.select(col("doc_id").as("doc_b"), col("n").as("nb"), col("g"))
        a.join(b, Seq("g"))
          .filter(col("doc_a") < col("doc_b"))
          .groupBy("doc_a", "doc_b", "na", "nb")
          .agg(count(lit(1)).as("inter"))
          .withColumn("jaccard",
            col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .filter(col("jaccard") >= Threshold)
          .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
          .orderBy("doc_a", "doc_b")
    },

    // MinHash + LSH near-dup: 8 32-bit minhash signatures (two md5s per
    // shingle, chopped into 8-hex-char chunks — one quarter the hash
    // work of one-md5-per-seed), 4 bands of 2, bucket-join candidates,
    // exact-Jaccard verification. The lexicographic minimum of a
    // uniform fixed-width hex chunk IS a minhash; both engines compute
    // the identical bytes, so even LSH's false negatives reproduce.
    Query("x8_minhash_lsh", {
      val sigs = Seeds.map { k =>
        val (src, off) = if (k < 4) ("md5(g)", 8 * k + 1) else ("md5('~' || g)", 8 * (k - 4) + 1)
        s"list_aggregate(list_transform(s, g -> substr($src, $off, 8)), 'min')"
      }
      val bandVals = sigs.grouped(2).zipWithIndex.map { case (Seq(s1, s2), i) =>
        s"'$i|' || $s1 || $s2"
      }.mkString(", ")
      s"WITH $shingledSql, " +
        s"bands AS (SELECT doc_id, unnest([$bandVals]) AS bv FROM sh), " +
        "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bands a " +
        "JOIN bands b ON a.bv = b.bv AND a.doc_id < b.doc_id), " +
        "sz AS (SELECT doc_id, s, len(s) AS n FROM sh), " +
        "j AS (SELECT doc_a, doc_b, len(list_intersect(sa.s, sb.s)) AS inter, " +
        "sa.n AS na, sb.n AS nb FROM cand JOIN sz sa ON sa.doc_id = doc_a " +
        "JOIN sz sb ON sb.doc_id = doc_b) " +
        "SELECT doc_a, doc_b, round(CAST(inter AS DOUBLE) / (na + nb - inter), 6) AS jaccard " +
        s"FROM j WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= $Threshold " +
        "ORDER BY doc_a, doc_b"
    }) {
      (s, d) =>
        // persist: the shingle sets + their md5s feed three plan
        // branches (both sides of the band self-join + the verification
        // join); without it the HOF shingling and hashing re-run per
        // branch. h1/h2 are computed ONCE per shingle — the 8
        // signatures are substring minima over the cached hash arrays.
        val sh = salted(shingled(s, d)
          .withColumn("h1", transform(col("s"), g => md5(g)))
          .withColumn("h2", transform(col("s"), g => md5(concat(lit("~"), g)))))
          .persist()
          .drop("__nonce")
        val sigCols = Seeds.map { k =>
          if (k < 4)
            array_min(transform(col("h1"), h => substring(h, 8 * k + 1, 8)))
          else
            array_min(transform(col("h2"), h => substring(h, 8 * (k - 4) + 1, 8)))
        }
        val bandCols = sigCols.grouped(2).zipWithIndex.map {
          case (Seq(s1, s2), i) => concat(lit(s"$i|"), s1, s2)
        }.toSeq
        val bands = sh.select(col("doc_id"),
          explode(array(bandCols: _*)).as("bv"))
        val cand = bands.as("a")
          .join(bands.as("b"),
            col("a.bv") === col("b.bv") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
        verified(cand, sh)
    })
}
