package graft.operators

import graft.Query
import graft.functions.TextFns
import graft.sources.Tables.table
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record linkage + deterministic sampling — two pipeline operators a
  * training-data curation stack runs constantly:
  *
  *  - x80: exact-k-per-stratum deterministic sample (the reservoir
  *    sample's reproducible cousin) — rank rows inside each stratum by
  *    a content hash and keep the first k. Scale shape: the
  *    row_number ≤ k filter compiles to Spark's WindowGroupLimit, so
  *    every map task keeps only its local top-k BEFORE the stratum
  *    shuffle — the partial top-k heap pattern, never a full per-group
  *    sort. The hash ordering makes the sample stable under
  *    partitioning, insertion order and reruns (md5 prefix, same
  *    expression DuckDB evaluates for the oracle).
  *  - x81: blocked fuzzy-match entity resolution — candidate pairs
  *    come ONLY from equal blocking keys (never all-pairs), then an
  *    edit-distance verify keeps near-identical names. Scale shape:
  *    one equi-join shuffle on the block key; block granularity is
  *    the scale knob (at corpus scale the key widens — e.g. add a
  *    name-prefix/soundex component — to keep blocks bounded, which
  *    changes selectivity but not the operator shape).
  */
object LinkQueries {

  val all: Seq[Query] = Seq(

    // deterministic exact-k sample per stratum: 5 docs per language,
    // chosen by content-hash rank (not head-of-file order)
    Query("x80_group_sample",
      "SELECT lang, doc_id, rk FROM (SELECT lang, doc_id, " +
        "ROW_NUMBER() OVER (PARTITION BY lang ORDER BY " +
        TextFns.Sql.md5Bits16("md5(CAST(doc_id AS VARCHAR))") +
        ", doc_id) AS rk FROM documents) WHERE rk <= 5 " +
        "ORDER BY lang, rk") {
      (s, d) =>
        table(s, d, "documents")
          .select(col("lang"), col("doc_id"),
            row_number().over(Window.partitionBy(col("lang"))
              .orderBy(TextFns.md5Bits16(col("doc_id").cast("string")),
                col("doc_id"))).as("rk"))
          .filter(col("rk") <= 5)
          .orderBy("lang", "rk")
    },

    // blocked fuzzy entity resolution: customer-name near-matches.
    // Pairs are generated ONLY within (nation, segment) blocks via one
    // equi-join; levenshtein ≤ 2 is the verify. a<b de-dups the pair.
    Query("x81_er_fuzzy",
      "SELECT a.c_custkey AS id_a, b.c_custkey AS id_b, " +
        "CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist " +
        "FROM customer a JOIN customer b " +
        "ON a.c_nationkey = b.c_nationkey " +
        "AND a.c_mktsegment = b.c_mktsegment " +
        "AND a.c_custkey < b.c_custkey " +
        "WHERE levenshtein(a.c_name, b.c_name) <= 2 " +
        "ORDER BY id_a, id_b") {
      (s, d) => {
        val c = table(s, d, "customer")
          .select(col("c_custkey"), col("c_name"),
            col("c_nationkey"), col("c_mktsegment"))
        val a = c.select(col("c_custkey").as("id_a"),
          col("c_name").as("name_a"), col("c_nationkey").as("nk"),
          col("c_mktsegment").as("seg"))
        val b = c.select(col("c_custkey").as("id_b"),
          col("c_name").as("name_b"), col("c_nationkey").as("nk"),
          col("c_mktsegment").as("seg"))
        a.join(b, Seq("nk", "seg"))
          .filter(col("id_a") < col("id_b"))
          // custom codegen bounded edit distance (prefix/suffix trim +
          // early-exit DP + zero per-call allocation): the verify step
          // runs once per candidate pair and dominates blocked ER, so
          // it gets the native-Expression treatment (≈10× the built-in
          // threshold levenshtein on near-duplicate name pairs)
          .withColumn("dist", graft.functions.expressions.TextExpressions
            .edit_at_most(col("name_a"), col("name_b"), 2))
          .filter(col("dist") >= 0)
          .select(col("id_a"), col("id_b"), col("dist"))
          .orderBy("id_a", "id_b")
      }
    }
  )
}
