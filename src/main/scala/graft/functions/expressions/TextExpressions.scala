package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the text-pipeline hot paths:
 * n-gram shingling, the rolling-hash document fingerprint, 16-bit
 * SimHash, and the MinHash/LSH band signatures.
 *
 * The built-in higher-order-function routes (`transform`/`aggregate`)
 * are semantically identical but run interpreted: per token they
 * allocate lambda bindings and box values, which made x5/x6/x7/x8 the
 * slowest queries in the engine by 1–2 orders of magnitude. Each
 * expression here evaluates in one compiled pass over the token
 * `ArrayData`, and `doGenCode` emits a single static call so the
 * surrounding whole-stage codegen span stays intact.
 *
 * Parity contract (the DuckDB oracle hashes results bit-for-bit):
 *  - token "ascii" = code point of the first character — exactly
 *    Spark's `Ascii` (substring(0,1).codePointAt(0)) and DuckDB's
 *    `ascii`;
 *  - token length = numChars, matching `length()` in both engines;
 *  - shingle list = distinct-by-first-occurrence, matching
 *    `array_distinct`/`list_distinct`;
 *  - md5-derived values use the same byte/hex-digit arithmetic as the
 *    `md5()`-string formulations they replace (first 16 bits of the
 *    digest == the 4-hex-digit arithmetic of TextFns.md5Bits16).
 */
object TextExprUtil {

  // per-thread DP + comparand scratch for editAtMost — for ASCII
  // comparands (the ER hot loop's case) a call allocates NOTHING:
  // both strings are read straight out of their UTF8String bytes into
  // reused char buffers. Non-ASCII comparands pay one String decode
  // each (UTF-8 is variable-width; correctness over the rare path).
  // Buffers grow on demand, never shrink.
  private val dpLocal = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](2 * 64)
  }
  private final class CharBuf extends ThreadLocal[Array[Char]] {
    override def initialValue(): Array[Char] = new Array[Char](64)
  }
  private val chALocal = new CharBuf
  private val chBLocal = new CharBuf

  /** Copy `u`'s chars into the thread-local buffer; zero-allocation
    * when the bytes are pure ASCII. Returns the char count. */
  private def fillChars(u: UTF8String, local: CharBuf): Int = {
    val nb = u.numBytes
    var buf = local.get()
    var ascii = true
    var i = 0
    while (ascii && i < nb) {
      if (u.getByte(i) < 0) ascii = false
      i += 1
    }
    if (ascii) {
      if (buf.length < nb) {
        buf = new Array[Char](math.max(nb, buf.length * 2)); local.set(buf)
      }
      i = 0
      while (i < nb) { buf(i) = (u.getByte(i) & 0x7f).toChar; i += 1 }
      nb
    } else {
      val str = u.toString
      val n = str.length
      if (buf.length < n) {
        buf = new Array[Char](math.max(n, buf.length * 2)); local.set(buf)
      }
      str.getChars(0, n, buf, 0)
      n
    }
  }

  /** levenshtein(a, b) if ≤ k, else −1. See [[EditDistanceAtMost]]. */
  def editAtMost(ua: UTF8String, ub: UTF8String, k: Int): Int = {
    val alen = fillChars(ua, chALocal); val a = chALocal.get()
    val blen = fillChars(ub, chBLocal); val b = chBLocal.get()
    var s = 0
    var ae = alen; var be = blen
    // trim common prefix, then common suffix
    while (s < ae && s < be && a(s) == b(s)) s += 1
    while (ae > s && be > s && a(ae - 1) == b(be - 1)) {
      ae -= 1; be -= 1
    }
    val n = ae - s; val m = be - s
    // cap the threshold at the largest possible distance BEFORE
    // deriving inf = k + 1: k = Int.MaxValue would wrap inf negative
    // and clamp every DP cell to garbage
    val kk = math.min(k, math.max(n, m))
    if (math.abs(n - m) > kk) return -1
    if (n == 0) return if (m <= kk) m else -1
    if (m == 0) return if (n <= kk) n else -1
    var buf = dpLocal.get()
    if (buf.length < 2 * (m + 1)) {
      buf = new Array[Int](2 * (m + 1))
      dpLocal.set(buf)
    }
    val inf = kk + 1
    // prev row at offset 0, current at offset m+1; swap by index base
    var pb = 0; var cb = m + 1
    var j = 0
    while (j <= m) { buf(pb + j) = if (j <= kk) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      buf(cb) = if (i <= kk) i else inf
      var rowMin = buf(cb)
      val ci = a(s + i - 1)
      j = 1
      while (j <= m) {
        val cost = if (ci == b(s + j - 1)) 0 else 1
        var v = buf(pb + j - 1) + cost
        val del = buf(pb + j) + 1
        if (del < v) v = del
        val ins = buf(cb + j - 1) + 1
        if (ins < v) v = ins
        if (v > inf) v = inf
        buf(cb + j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin > kk) return -1 // no extension can shrink the distance
      val t = pb; pb = cb; cb = t
      i += 1
    }
    val d = buf(pb + m)
    if (d <= kk) d else -1
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HexChars = "0123456789abcdef".toCharArray
  private val Tilde = Array[Byte]('~')

  /** Distinct n-gram shingles (space-joined), first-occurrence order —
    * bit-identical to array_distinct(transform(sequence(...),
    * concat_ws(" ", ...))). Empty output for arrays shorter than n. */
  def shingles(ts: ArrayData, n: Int): ArrayData = {
    val len = ts.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i <= len - n) {
      val parts = new Array[UTF8String](n)
      var k = 0
      while (k < n) { parts(k) = ts.getUTF8String(i + k); k += 1 }
      // concat_ws skips nulls; split() never yields them, but stay exact
      seen.add(UTF8String.concatWs(sep, parts.filter(_ != null).toIndexedSeq: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  /** ALL n-gram shingles (space-joined) in document order, duplicates
    * kept — bit-identical to list_transform(range(len-n+1), ...) with
    * no list_distinct FOR NULL-FREE ARRAYS (every production call site
    * feeds tokens(), whose split() never yields null). A null token is
    * SKIPPED inside its grams (concat_ws semantics, spec-pinned),
    * where the SQL twin's `||` would null the whole gram — callers
    * joining hand-built null-bearing arrays against the oracle must
    * null-filter first. Empty output for arrays shorter than n. The
    * multiplicity carrier for repetition scoring / boilerplate mining
    * (x38/x39), where the duplicate count IS the signal. */
  def shinglesAll(ts: ArrayData, n: Int): ArrayData = {
    val len = ts.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i <= len - n) {
      val parts = new Array[UTF8String](n)
      var k = 0
      while (k < n) { parts(k) = ts.getUTF8String(i + k); k += 1 }
      // concat_ws skips nulls; split() never yields them, but stay exact
      out(i) = UTF8String.concatWs(sep, parts.filter(_ != null).toIndexedSeq: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Positional n-grams with per-tail sentinels — the
    * [[graft.operators.SpanDedup]] gram stream's per-position key:
    * element i is the space-joined gram of tokens i..i+n−1 when they
    * all exist, else the spaceless `docId#i` sentinel (a real n-gram
    * always carries exactly n−1 joiner spaces, so sentinels cannot
    * collide with one). Bit-identical to the lead()-window rebuild it
    * replaces (concat_ws skips null tokens; split() never yields
    * them). `docStr` is the already-CAST doc-id string so engine cast
    * semantics stay the callers'. */
  def gramsWithSentinel(ts: ArrayData, docStr: UTF8String, n: Int): ArrayData = {
    val len = ts.numElements()
    val out = new Array[Any](len)
    val sep = UTF8String.fromString(" ")
    val hash = UTF8String.fromString("#")
    var i = 0
    while (i < len) {
      if (i <= len - n) {
        val parts = new Array[UTF8String](n)
        var k = 0
        while (k < n) { parts(k) = ts.getUTF8String(i + k); k += 1 }
        out(i) = UTF8String.concatWs(sep, parts.filter(_ != null).toIndexedSeq: _*)
      } else {
        out(i) = UTF8String.concat(docStr, hash,
          UTF8String.fromString(String.valueOf(i)))
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-position 64-bit gram KEYS — the string-free twin of
    * [[gramsWithSentinel]] for [[graft.operators.SpanDedup]]'s
    * candidate-mining pass (guide §2.3: shuffle keys, not payloads).
    * Element i is a structural hash of the gram at position i:
    * xxhash64 of each token's bytes computed ONCE per token, then a
    * 64-bit polynomial mix over the window — never the concatenated
    * gram string, so the pass allocates nothing per position. Tail
    * positions mix the doc hash with the position (the sentinel's
    * uniqueness class). Contract: EQUAL GRAMS ⇒ EQUAL KEYS (tokens
    * carry no spaces — split() output — so the token sequence
    * determines the gram string; null tokens are skipped exactly like
    * concat_ws does). Unequal grams may collide — every consumer must
    * treat matches as CANDIDATES and recheck on the strings
    * (SpanDedup's bounded recheck stage), which is why these keys
    * deliberately do NOT need to equal xxhash64(gram string). */
  def gramKeyHashes(ts: ArrayData, docStr: UTF8String, n: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val len = ts.numElements()
    val tk = new Array[Long](len)
    val tNull = new Array[Boolean](len)
    var i = 0
    while (i < len) {
      val t = ts.getUTF8String(i)
      if (t == null) tNull(i) = true
      else tk(i) = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset,
        t.numBytes, 42L)
      i += 1
    }
    val docH = XXH64.hashUnsafeBytes(docStr.getBaseObject,
      docStr.getBaseOffset, docStr.numBytes, 42L)
    val out = new Array[Long](len)
    val P = -7046029254386353131L // 0x9E3779B185EBCA85, golden-ratio odd
    i = 0
    while (i < len) {
      if (i <= len - n) {
        var h = 2862933555777941757L // seed != any single-token hash class
        var k = 0
        while (k < n) {
          if (!tNull(i + k)) h = h * P + tk(i + k)
          k += 1
        }
        out(i) = h
      } else {
        out(i) = XXH64.hashLong(i.toLong, docH)
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** Distinct character n-grams, first-occurrence order — the set
    * DuckDB's list_distinct(list_transform(range(1, len-n+2), i ->
    * substr(s, i, n))) produces. Returns EMPTY for strings shorter
    * than n (the HOF formulation via sequence(1, len-n+1) cannot be
    * used here: Spark's sequence runs DESCENDING when stop < start,
    * fabricating junk n-grams for short strings where DuckDB's range
    * is empty). */
  def charNgrams(s: UTF8String, n: Int): ArrayData = {
    val len = s.numChars()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    // one forward pass records every char's byte offset, then each
    // n-gram is a zero-copy byte-range view — substringSQL here would
    // re-walk the string from byte 0 per call (UTF-8 is variable
    // width), turning a 300-char document into O(len²) work
    val bytes = s.getBytes
    val offs = new Array[Int](len + 1)
    var i = 0
    var b = 0
    while (i < len) {
      offs(i) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      i += 1
    }
    offs(len) = bytes.length
    val seen = new java.util.LinkedHashSet[UTF8String]()
    i = 0
    while (i <= len - n) {
      seen.add(UTF8String.fromBytes(bytes, offs(i), offs(i + n) - offs(i)))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  /** Code point of the first char, Spark `Ascii` semantics (0 if empty). */
  private def asciiOf(t: UTF8String): Long =
    if (t.numChars() > 0) t.substring(0, 1).toString.codePointAt(0).toLong else 0L

  /** Sequential polynomial rolling hash over the token stream:
    * fold((acc * 131 + (numChars(t) * 131 + ascii(t))) % 1e9+7), the
    * exact fold of TextFns.fingerprint / the DuckDB list_reduce.
    * A null element poisons the fold to null — exactly the
    * three-valued arithmetic of the `transform`+`aggregate`
    * formulation this replaces (length(null)*131+ascii(null) = null,
    * and a null step nulls the accumulator for good). */
  def rollingFp(ts: ArrayData): java.lang.Long = {
    val len = ts.numElements()
    var acc = 0L
    var i = 0
    while (i < len) {
      if (ts.isNullAt(i)) return null
      val t = ts.getUTF8String(i)
      val code = t.numChars().toLong * 131L + asciiOf(t)
      acc = (acc * 131L + code) % 1000000007L
      i += 1
    }
    acc
  }

  /** 16-bit SimHash over md5(token): v16 = first two digest bytes
    * (== the 4-hex-digit arithmetic of md5Bits16); per bit j the sign
    * sum over all token occurrences; result = Σ 2^j where sum > 0.
    * A null token yields a null SimHash (md5(null) = null poisons the
    * per-token hash in the relational formulation). */
  def simhash16(ts: ArrayData): java.lang.Long = {
    val md = md5Local.get()
    val counts = new Array[Int](16)
    val len = ts.numElements()
    var i = 0
    while (i < len) {
      if (ts.isNullAt(i)) return null
      md.reset()
      val d = md.digest(ts.getUTF8String(i).getBytes)
      val v16 = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
      var j = 0
      while (j < 16) {
        counts(j) += (if (((v16 >> j) & 1) == 1) 1 else -1)
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 16) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** 64-bit SimHash over md5(token): v64 = first eight digest bytes
    * big-endian; per bit j the sign sum over all token occurrences;
    * result = Σ 2^j where sum > 0, as a SIGNED long (bit 63 set →
    * negative — callers doing SQL-visible arithmetic split hi/lo, the
    * x116 convention). The 16-bit variant saturates its 2¹⁶ space at
    * ~10⁴ documents (Hamming-≤2 neighborhoods start percolating into
    * one giant component — measured at sf0.1); 64 bits keep near-dup
    * semantics meaningful at corpus scale, which is why the whole
    * text dedup family anchors here. Null-token poisoning matches
    * [[simhash16]]. */
  def simhash64(ts: ArrayData): java.lang.Long = {
    val md = md5Local.get()
    val counts = new Array[Int](64)
    val len = ts.numElements()
    var i = 0
    while (i < len) {
      if (ts.isNullAt(i)) return null
      md.reset()
      val d = md.digest(ts.getUTF8String(i).getBytes)
      var v64 = 0L
      var b = 0
      while (b < 8) { v64 = (v64 << 8) | (d(b) & 0xffL); b += 1 }
      var j = 0
      while (j < 64) {
        counts(j) += (if (((v64 >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Hashed-unigram bucket counts — the DSIR feature vector
    * ([[graft.operators.CurationQueries]] x129 family): element bk is
    * the number of tokens whose md5Bits16 (first two digest bytes,
    * the [[simhash16]] parity arithmetic) ≡ bk (mod b). One compiled
    * pass over the token array replaces the per-token explode +
    * md5-hex arithmetic + (doc, bk) hash aggregate that dominated the
    * graft-dsir-weights build: the row count entering the aggregation
    * drops from Σ n_tokens to b per document. NULL TOKENS ARE
    * UNSUPPORTED: a null element nulls the whole document's vector
    * (the doc disappears from the counts), where the replaced
    * explode+md5 pipeline would have kept the doc and emitted its
    * null tokens under a bk=null row. Unreachable for the only wired
    * producer (split() output is never null-elemented) and pinned
    * only on that domain — any new caller must guarantee
    * null-free token arrays. */
  def hashedBucketCounts(ts: ArrayData, b: Int): GenericArrayData = {
    val md = md5Local.get()
    val counts = new Array[Long](b)
    val len = ts.numElements()
    var i = 0
    while (i < len) {
      if (ts.isNullAt(i)) return null
      md.reset()
      val d = md.digest(ts.getUTF8String(i).getBytes)
      val v16 = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
      counts(v16 % b) += 1L
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** Winnowing fingerprint set (Schleimer/Wilkerson/Aiken '03) over a
    * token array: 24-bit md5 hashes of the k-token grams (first 3
    * digest bytes big-endian — md5Bits24), minimum per w-window (one
    * clamped window when there are fewer grams than w), distinct in
    * first-occurrence order. Value-identical to the Column
    * formulation it replaces (`transform`+`array_min`+`slice` over
    * md5 hex arithmetic) on its filtered domain; for arrays shorter
    * than k this returns EMPTY where the HOF version errored on a
    * descending index sequence — callers filter size ≥ k either way.
    * The HOF version was CodegenFallback (interpreted) and recomputed
    * the md5 once per hex digit — 6× the hashing plus boxed
    * allocation per gram, the dominant cost of x65 at sf0.1. */
  def winnowFps(ts: ArrayData, k: Int, w: Int): ArrayData = {
    val n = ts.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val m = n - k + 1
    val md = md5Local.get()
    val grams = new Array[Long](m)
    var i = 0
    while (i < m) {
      md.reset()
      var j = 0
      var first = true
      while (j < k) {
        // concat_ws semantics: null tokens are skipped entirely
        if (!ts.isNullAt(i + j)) {
          if (!first) md.update(' '.toByte)
          md.update(ts.getUTF8String(i + j).getBytes)
          first = false
        }
        j += 1
      }
      val d = md.digest()
      grams(i) = (((d(0) & 0xffL) << 16) | ((d(1) & 0xffL) << 8) |
        (d(2) & 0xffL))
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val lastStart = if (m < w) 0 else m - w
    var s = 0
    while (s <= lastStart) {
      var min = grams(s)
      var j = s + 1
      val end = math.min(s + w, m)
      while (j < end) {
        if (grams(j) < min) min = grams(j)
        j += 1
      }
      seen.add(min)
      s += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  private def hexDigest(md: java.security.MessageDigest, extra: Array[Byte],
      g: UTF8String, out: Array[Char]): Unit = {
    md.reset()
    if (extra != null) md.update(extra)
    val d = md.digest(g.getBytes)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
  }

  /** LSH band signatures from a shingle set: 8 minhash values (the
    * lexicographic minima of the 8-hex-char chunks of md5(g) and
    * md5('~' || g)), paired into 4 "<band>|<sig2k><sig2k+1>" strings —
    * the exact values of the transform/array_min/concat formulation it
    * replaces (and of the DuckDB oracle SQL). Null bands for an empty
    * shingle set, matching array_min-of-empty = null. */
  def minhashBands(sh: ArrayData): ArrayData = {
    val n = sh.numElements()
    val md = md5Local.get()
    // best(k) = running minimum of hex chunk k (8 from h1, then 8 from h2)
    val best = Array.fill(8)(new Array[Char](8))
    val h1 = new Array[Char](32)
    val h2 = new Array[Char](32)
    var seen = 0
    var i = 0
    while (i < n) {
      // null shingles are skipped — array_min (and DuckDB
      // list_aggregate 'min') ignore null elements
      if (!sh.isNullAt(i)) {
        val g = sh.getUTF8String(i)
        hexDigest(md, null, g, h1)
        hexDigest(md, Tilde, g, h2)
        var k = 0
        while (k < 8) {
          val src = if (k < 4) h1 else h2
          val off = (k % 4) * 8
          val b = best(k)
          var cmp = 0
          if (seen == 0) cmp = -1
          else {
            var j = 0
            while (cmp == 0 && j < 8) {
              cmp = Character.compare(src(off + j), b(j))
              j += 1
            }
          }
          if (cmp < 0) { System.arraycopy(src, off, b, 0, 8) }
          k += 1
        }
        seen += 1
      }
      i += 1
    }
    // empty (or all-null) shingle set: array_min of nothing is null
    if (seen == 0) return new GenericArrayData(Array[Any](null, null, null, null))
    val bands = new Array[Any](4)
    var bi = 0
    while (bi < 4) {
      val sb = new java.lang.StringBuilder(19)
      sb.append(bi).append('|').append(best(2 * bi)).append(best(2 * bi + 1))
      bands(bi) = UTF8String.fromString(sb.toString)
      bi += 1
    }
    new GenericArrayData(bands)
  }
}

/** Unary expression whose codegen is one static call into
  * TextExprUtil — the call sits inside the enclosing whole-stage
  * codegen function, so upstream/downstream operators stay fused.
  * Input must be array<string>; anything else is an analysis-time
  * error, not a codegen ClassCastException. */
abstract class TextUnary extends UnaryExpression {
  /** Fully-qualified static call, given the child variable name. */
  protected def staticCall(c: String): String

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${staticCall(c)};")
}

/** Long-valued variant whose static call returns a BOXED Long: null
  * elements in the input array null the whole result (three-valued
  * fold semantics), so the expression is nullable even over a
  * non-null child. */
abstract class TextUnaryNullableLong extends TextUnary {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("boxed")
      s"""java.lang.Long $boxed = ${staticCall(c)};
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }""".stripMargin
    })
}

case class ShinglesDistinct(child: Expression, n: Int) extends TextUnary {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override protected def nullSafeEval(a: Any): Any =
    TextExprUtil.shingles(a.asInstanceOf[ArrayData], n)
  override protected def staticCall(c: String): String =
    s"graft.functions.expressions.TextExprUtil.shingles($c, $n)"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "shingles_distinct"
}

case class ShinglesAll(child: Expression, n: Int) extends TextUnary {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override protected def nullSafeEval(a: Any): Any =
    TextExprUtil.shinglesAll(a.asInstanceOf[ArrayData], n)
  override protected def staticCall(c: String): String =
    s"graft.functions.expressions.TextExprUtil.shinglesAll($c, $n)"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "shingles_all"
}

/** (array<string> tokens, string docStr) → array<string> positional
  * grams with `doc#pos` tail sentinels ([[TextExprUtil.gramsWithSentinel]]).
  * Codegen is one static call fused into the enclosing stage. */
case class GramsWithSentinel(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, string), got $other")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextExprUtil.gramsWithSentinel(a.asInstanceOf[ArrayData],
      b.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.TextExprUtil.gramsWithSentinel($a, $b, $n);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "grams_with_sentinel"
}

/** (array<string> tokens, string docStr) → array<long> positional
  * gram KEYS ([[TextExprUtil.gramKeyHashes]] — equal grams ⇒ equal
  * keys; collisions possible, consumers must string-recheck). */
case class GramKeyHashes(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, string), got $other")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextExprUtil.gramKeyHashes(a.asInstanceOf[ArrayData],
      b.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.TextExprUtil.gramKeyHashes($a, $b, $n);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "gram_key_hashes"
}

/** array<string> tokens → array<long>(b) of hashed-unigram bucket
  * counts ([[TextExprUtil.hashedBucketCounts]]). Nullable: a null
  * token element poisons the whole result, the md5(null) relational
  * semantics. */
case class HashedBucketCounts(child: Expression, b: Int)
    extends TextUnary {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    TextExprUtil.hashedBucketCounts(a.asInstanceOf[ArrayData], b)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val arr = ctx.freshName("arr")
      s"""org.apache.spark.sql.catalyst.util.GenericArrayData $arr =
         |  graft.functions.expressions.TextExprUtil.hashedBucketCounts($c, $b);
         |if ($arr == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $arr; }""".stripMargin
    })
  override protected def staticCall(c: String): String =
    s"graft.functions.expressions.TextExprUtil.hashedBucketCounts($c, $b)"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "hashed_bucket_counts"
}

case class RollingHashFp(child: Expression) extends TextUnaryNullableLong {
  override protected def nullSafeEval(a: Any): Any =
    TextExprUtil.rollingFp(a.asInstanceOf[ArrayData])
  override protected def staticCall(c: String): String =
    s"graft.functions.expressions.TextExprUtil.rollingFp($c)"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "rolling_fp"
}

case class SimHash16(child: Expression) extends TextUnaryNullableLong {
  override protected def nullSafeEval(a: Any): Any =
    TextExprUtil.simhash16(a.asInstanceOf[ArrayData])
  override protected def staticCall(c: String): String =
    s"graft.functions.expressions.TextExprUtil.simhash16($c)"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "simhash16"
}

case class SimHash64(child: Expression) extends TextUnaryNullableLong {
  override protected def nullSafeEval(a: Any): Any =
    TextExprUtil.simhash64(a.asInstanceOf[ArrayData])
  override protected def staticCall(c: String): String =
    s"graft.functions.expressions.TextExprUtil.simhash64($c)"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "simhash64"
}

case class WinnowFpsExpr(child: Expression, k: Int, w: Int)
    extends TextUnary {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    TextExprUtil.winnowFps(a.asInstanceOf[ArrayData], k, w)
  override protected def staticCall(c: String): String =
    s"graft.functions.expressions.TextExprUtil.winnowFps($c, $k, $w)"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "winnow_fps"
}

case class MinHashBands(child: Expression) extends TextUnary {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override protected def nullSafeEval(a: Any): Any =
    TextExprUtil.minhashBands(a.asInstanceOf[ArrayData])
  override protected def staticCall(c: String): String =
    s"graft.functions.expressions.TextExprUtil.minhashBands($c)"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "minhash_bands"
}

/** STRING → array<string> of distinct character n-grams. */
case class CharNgramsDistinct(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    TextExprUtil.charNgrams(a.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.TextExprUtil.charNgrams($c, $n);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "char_ngrams_distinct"
}

/** Bounded edit distance: levenshtein(a, b) when ≤ `k`, else −1 —
  * semantically `levenshtein(l, r, threshold)` but built for the
  * blocked-ER verify loop where it runs millions of times per task:
  *
  *  1. common prefix AND suffix trim first (near-duplicate pairs
  *     share most of their characters, so the DP usually runs on a
  *     handful of chars instead of the full strings);
  *  2. length-difference gate after trimming (|Δlen| > k → −1 with
  *     zero DP work);
  *  3. two-row DP with early exit the first row whose minimum
  *     exceeds k — adversarial dissimilar pairs stop after ~k+1 rows;
  *  4. the row buffers live in a ThreadLocal scratch, so the hot loop
  *     allocates NOTHING per call (the built-in allocates two arrays
  *     per comparison).
  *
  * Unicode note: distances count UTF-16 units of the decoded string,
  * identical to Spark's and DuckDB's levenshtein for BMP text (the
  * oracle parity domain). doGenCode emits one static call, keeping
  * the surrounding codegen span fused. */
case class EditDistanceAtMost(left: Expression, right: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(k >= 0, "threshold must be non-negative")
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got $other")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextExprUtil.editAtMost(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.TextExprUtil" +
        s".editAtMost($a, $b, $k);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "edit_at_most"
}

object TextExpressions {
  private def expr(c: Column): Expression = Bridge.expression(c)
  def shingles_distinct(ts: Column, n: Int = 3): Column =
    Bridge.column(ShinglesDistinct(expr(ts), n))
  def shingles_all(ts: Column, n: Int = 3): Column =
    Bridge.column(ShinglesAll(expr(ts), n))
  def rolling_fp(ts: Column): Column = Bridge.column(RollingHashFp(expr(ts)))
  def simhash16(ts: Column): Column = Bridge.column(SimHash16(expr(ts)))
  def simhash64(ts: Column): Column = Bridge.column(SimHash64(expr(ts)))
  def minhash_bands(sh: Column): Column = Bridge.column(MinHashBands(expr(sh)))
  def winnow_fps(ts: Column, k: Int = 4, w: Int = 4): Column =
    Bridge.column(WinnowFpsExpr(expr(ts), k, w))
  def char_ngrams(s: Column, n: Int = 3): Column =
    Bridge.column(CharNgramsDistinct(expr(s), n))
  def grams_with_sentinel(ts: Column, docStr: Column, n: Int): Column =
    Bridge.column(GramsWithSentinel(expr(ts), expr(docStr), n))
  def gram_key_hashes(ts: Column, docStr: Column, n: Int): Column =
    Bridge.column(GramKeyHashes(expr(ts), expr(docStr), n))
  def hashed_bucket_counts(ts: Column, b: Int): Column =
    Bridge.column(HashedBucketCounts(expr(ts), b))
  def edit_at_most(a: Column, b: Column, k: Int): Column =
    Bridge.column(EditDistanceAtMost(expr(a), expr(b), k))
}
