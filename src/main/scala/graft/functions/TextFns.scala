package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis building blocks for the training-data-pipeline surface:
 * tokenization, shingling, language-ID scoring, rolling-hash
 * fingerprints and hex-digit decoding for hash-derived features.
 *
 * Everything here is a pure Catalyst `Column` expression (no UDFs): the
 * whole pipeline stays inside whole-stage codegen and the same logic is
 * mirrored 1:1 in the DuckDB oracle SQL (ascii/substr/md5 arithmetic is
 * portable across both engines).
 */
object TextFns {

  /** Whitespace tokenization. Fixture docs are single-space separated;
    * a production corpus would normalize with regexp_replace first. */
  def tokens(text: Column): Column = split(text, " ")

  /** Number of tokens, as BIGINT for oracle type parity. */
  def tokenCount(text: Column): Column =
    size(tokens(text)).cast("bigint")

  /** Distinct word n-gram shingles (default 3) over a token array.
    * Empty for arrays shorter than n — matching the DuckDB mirror's
    * `range(len-…) → []`. Codegen expression: the interpreted
    * transform/concat_ws/array_distinct formulation it replaces was the
    * dominant cost of every dedup query. */
  def shingles(ts: Column, n: Int = 3): Column =
    graft.functions.expressions.TextExpressions.shingles_distinct(ts, n)

  /** ALL word n-gram shingles in order, duplicates kept — the
    * multiplicity carrier for repetition scoring and boilerplate
    * mining. Empty for arrays shorter than n, like [[shingles]].
    * Null tokens are skipped inside their grams (concat_ws
    * semantics); [[Sql.allShingles]]'s `||` nulls the whole gram
    * instead — the twins agree only on null-free arrays (which
    * [[tokens]] always produces). */
  def allShingles(ts: Column, n: Int = 3): Column =
    graft.functions.expressions.TextExpressions.shingles_all(ts, n)

  /** Per-token blocklist flag array: 1 where the token is in `lex`,
    * else 0 — the lexicon-based content detector (Dolma/C4's taggers;
    * RefinedWeb §4.1's URL+word blocklists) as one codegen transform.
    * Exact token membership, no substring matches: "class" never
    * flags because it contains a blocked fragment. */
  def flagged(ts: Column, lex: Seq[String]): Column =
    transform(ts, t => when(t.isin(lex: _*), 1).otherwise(0))

  /** Number of flagged tokens in a [[flagged]] array, as BIGINT. */
  def flaggedCount(fl: Column): Column =
    aggregate(fl, lit(0L), (a, x) => a + x)

  /** Number of maximal flagged RUNS (spans) in a [[flagged]] array:
    * count of 0→1 rises — "frak gorram ok frak" is 2 spans, 3 tokens.
    * Array-local arithmetic, no explode. The empty-array guard
    * matters (review-caught): sequence(0, -1) is DESCENDING in Spark,
    * and its i = -1 leg would evaluate element_at(fl, 0) — an error
    * index — so an empty input must short-circuit to 0, not rely on
    * the filter lambda never running. */
  def flaggedSpans(fl: Column): Column =
    when(size(fl) === 0, lit(0L)).otherwise(
      size(filter(sequence(lit(0), size(fl) - 1),
        i => element_at(fl, i + 1) === 1 &&
          (i === 0 || element_at(fl, i) === 0))).cast("bigint"))

  /** Value of the i-th (1-based) hex digit of a lowercase hex string. */
  def hexDigit(hexStr: Column, i: Int): Column = {
    val a = ascii(substring(hexStr, i, 1))
    when(a >= 97, a - 87).otherwise(a - 48)
  }

  /** First 16 bits of md5(s) as an integer in [0, 65536). */
  def md5Bits16(s: Column): Column = {
    val m = md5(s)
    hexDigit(m, 1) * 4096 + hexDigit(m, 2) * 256 +
      hexDigit(m, 3) * 16 + hexDigit(m, 4)
  }

  /** First 24 bits of md5(s) as an integer in [0, 2^24) — enough hash
    * width that winnowing's per-window minima rarely tie, while staying
    * cheap pure-hex arithmetic both engines evaluate identically. */
  def md5Bits24(s: Column): Column = {
    val m = md5(s)
    (1 to 6).map(i => hexDigit(m, i) * (1 << (4 * (6 - i))))
      .reduce(_ + _).cast("long")
  }

  /** Winnowing fingerprint set (Schleimer/Wilkerson/Aiken '03) of a
    * token array: 24-bit md5 hashes of k-token grams, minimum per
    * w-window, distinct. Guarantee: two docs sharing a run of
    * ≥ k+w−1 tokens share ≥ 1 fingerprint. Caller filters to
    * size(ts) ≥ k. Codegen expression — the higher-order-function
    * formulation it replaces (transform/array_min/slice over md5 hex
    * arithmetic) was CodegenFallback: its Project ran interpreted and
    * recomputed each gram's md5 once per hex digit, 19 s at sf0.1
    * (69 s under full-suite memory pressure) vs ~1 s fused. */
  def winnowFps(ts: Column, k: Int = 4, w: Int = 4): Column =
    graft.functions.expressions.TextExpressions.winnow_fps(ts, k, w)

  /** Polynomial rolling-hash fingerprint of the token stream, mod 1e9+7.
    * Token code = 131*len + first-char codepoint; the fold is sequential
    * (order-sensitive), which is the point of a document fingerprint.
    * Codegen expression — the interpreted `aggregate(transform(...))`
    * fold it replaces ran 50–100× slower under memory pressure. */
  val FpMod = 1000000007L
  def fingerprint(ts: Column): Column =
    graft.functions.expressions.TextExpressions.rolling_fp(ts)

  /** Per-language marker tokens (top-frequency tokens per lang in the
    * fixture corpus). A real system would ship n-gram profiles; the
    * operator shape (score per language → argmax) is the same. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("customer", "hash", "join", "row"),
    "en" -> Seq("hash", "order", "table", "window"),
    "es" -> Seq("slow", "agg", "hash", "merge"),
    "fr" -> Seq("scan", "data", "batch", "query"),
    "zh" -> Seq("join", "small", "customer", "row"))

  /** Occurrence count of marker tokens in a token array. */
  def markerScore(ts: Column, markers: Seq[String]): Column =
    size(filter(ts, t => t.isin(markers: _*)))

  /** Predicted language: argmax of marker scores, ties resolved in
    * alphabetical language order (same CASE ordering as the oracle). */
  def langPredict(ts: Column): Column = {
    val scores = langMarkers.map { case (l, ms) => l -> markerScore(ts, ms) }
    val maxScore = greatest(scores.map(_._2): _*)
    scores.tail.foldLeft(when(scores.head._2 === maxScore, scores.head._1)) {
      case (acc, (l, sc)) => acc.when(sc === maxScore, l)
    }
  }

  /** DuckDB SQL fragments mirroring the expressions above (kept next to
    * the Scala so the two stay in lockstep). */
  object Sql {
    def tokenCount(text: String): String =
      s"CAST(len(string_split($text, ' ')) AS BIGINT)"

    def shingles(ts: String, n: Int = 3): String =
      s"list_distinct(${allShingles(ts, n)})"

    def allShingles(ts: String, n: Int = 3): String = {
      val parts = (1 to n).map(k => s"$ts[i+$k]").mkString(" || ' ' || ")
      s"list_transform(range(len($ts) - ${n - 1}), i -> $parts)"
    }

    def hexDigit(m: String, i: Int): String =
      s"(CASE WHEN ascii(substr($m, $i, 1)) >= 97 THEN ascii(substr($m, $i, 1)) - 87 " +
        s"ELSE ascii(substr($m, $i, 1)) - 48 END)"

    def md5Bits16(m: String): String =
      s"(${hexDigit(m, 1)} * 4096 + ${hexDigit(m, 2)} * 256 + " +
        s"${hexDigit(m, 3)} * 16 + ${hexDigit(m, 4)})"

    def md5Bits24(m: String): String =
      "CAST((" + (1 to 6).map(i =>
        s"${hexDigit(m, i)} * ${1 << (4 * (6 - i))}").mkString(" + ") +
        ") AS BIGINT)"

    def fingerprint(ts: String): String =
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform($ts, " +
        s"t -> CAST(length(t) * 131 + ascii(t) AS BIGINT))), " +
        s"(a, b) -> (a * 131 + b) % $FpMod)"

    def markerScore(ts: String, markers: Seq[String]): String =
      s"len(list_filter($ts, t -> t IN (${markers.map("'" + _ + "'").mkString(", ")})))"

    def langPredict(ts: String): String = {
      val scores = langMarkers.map { case (l, ms) => l -> markerScore(ts, ms) }
      val maxS = s"greatest(${scores.map(_._2).mkString(", ")})"
      "CASE " + scores.map { case (l, sc) =>
        s"WHEN $sc = $maxS THEN '$l'"
      }.mkString(" ") + " END"
    }
  }
}
