package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Cross-document repeated-span REMOVAL (Lee et al. '22, "Deduplicating
 * Training Data Makes Language Models Better" — ExactSubstr dedup at
 * n-gram granularity): the transform half of x72's audit. Every
 * cross-doc duplicated n-gram span is excised from every document
 * except its first owner (min doc_id, which keeps ALL its
 * occurrences); a token is dropped when ANY removed span covers it.
 *
 * Shape — ONE corpus pass, no join (the x72 lesson: never reference
 * the exploded corpus twice):
 *   1. posexplode tokens once;
 *   2. rebuild each position's n-gram from the token stream itself
 *      with lead() windows (tail positions get a spaceless
 *      per-(doc,pos) sentinel — a real n-gram always carries exactly
 *      n-1 joiner spaces, so sentinels cannot collide with one);
 *   3. ownership (min doc_id) and duplication (min != max doc_id) are
 *      a single window over the gram key;
 *   4. span→token coverage is a ROWS (-(n-1), 0) running max on the
 *      doc-ordered stream (token positions are dense, so the row
 *      frame IS the position frame);
 *   5. one per-doc aggregate rebuilds the cleaned text in token
 *      order.
 *
 * 100 TB: the single-query window form pays one corpus explode plus
 * three keyed exchanges of token-granular rows. The deployment
 * factorization for a standing corpus is to persist the mined
 * dup-gram→owner list as corpus metadata on the x73/x26 build-once
 * lifecycle and probe it per shard (then ingest only pays the probe);
 * head-gram skew in the ownership window is bounded by gram rarity —
 * a 5-gram shared by k documents lands k·occurrences rows in one
 * window partition, and the boilerplate grams that would dominate are
 * exactly what x73's filter removes upstream.
 */
object SpanDedup {

  /** Cleaned corpus view over (doc_id, lang, text) rows: one output
    * row per input doc with non-null text — doc_id, lang, n_tokens,
    * n_removed, clean_text (tokens surviving span excision, joined by
    * single spaces; "" when every token was removed). */
  def cleanedCorpus(docs: DataFrame, n: Int = 5): DataFrame = {
    require(n >= 2, s"span length must be >= 2, got $n")
    // the ingest corpus table carries no lang column; the transform is
    // lang-agnostic, so synthesize a null one rather than requiring it
    val withLang =
      if (docs.columns.contains("lang")) docs
      else docs.withColumn("lang", lit(null).cast("string"))
    val tok = withLang
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
        TextFns.tokens(col("text")).as("ts"))
      .select(col("doc_id"), col("lang"),
        size(col("ts")).cast("long").as("n_tokens"),
        posexplode(col("ts")).as(Seq("tp", "token")))
    val byDoc = Window.partitionBy("doc_id").orderBy("tp")
    val gramKey = when(lead(col("token"), n - 1).over(byDoc).isNotNull,
      concat_ws(" ", col("token") +:
        (1 until n).map(k => lead(col("token"), k).over(byDoc)): _*))
      .otherwise(concat(col("doc_id").cast("string"), lit("#"),
        col("tp").cast("string")))
    val byGram = Window.partitionBy("gram")
    val cover = Window.partitionBy("doc_id").orderBy("tp")
      .rowsBetween(-(n - 1), 0)
    tok.withColumn("gram", gramKey)
      .withColumn("owner", min("doc_id").over(byGram))
      .withColumn("mx", max("doc_id").over(byGram))
      .withColumn("span_rm",
        when(col("owner") =!= col("mx") &&
          col("doc_id") =!= col("owner"), 1).otherwise(0))
      .withColumn("rm", max("span_rm").over(cover))
      .groupBy("doc_id")
      .agg(first("lang").as("lang"),
        first("n_tokens").as("n_tokens"),
        sum(col("rm")).cast("long").as("n_removed"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("rm") === 0,
            struct(col("tp"), col("token"))))),
          x => x("token"))).as("clean_text"))
  }
}
