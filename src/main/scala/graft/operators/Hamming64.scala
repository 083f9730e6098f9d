package graft.operators

/**
 * The ONE definition of the 64-bit Hamming-≤2 candidate alphabets —
 * shared by the text SimHash engine (DedupQueries/SimhashIndex), the
 * media perceptual engine (MediaQueries), the streaming ingest gates
 * (IngestionFlows), and the DuckDB oracle replays. The text and media
 * engines' spec-pinned equivalence, and x124's oracle identity, all
 * rest on these staying bit-identical — so they live in exactly one
 * place (review-caught: the layout used to exist three times, twice
 * as Scala constants and once as raw numbers inside x124's SQL).
 */
private[graft] object Hamming64 {

  /** All 2081 XOR masks at Hamming ≤ 2 over 64 bits — the quotient
    * neighbor alphabet (identity + 64 one-bit + 2016 two-bit). */
  val masks2: Seq[Long] =
    Seq(0L) ++ (0 until 64).map(1L << _) ++
      (for (i <- 0 until 64; j <- i + 1 until 64)
        yield (1L << i) | (1L << j))

  /** Three-band layout (22+21+21 bits): by pigeonhole any pair within
    * Hamming ≤ 2 leaves at least one band untouched, so band-collision
    * candidates are EXACT-recall for the ≤2 threshold; collisions at
    * larger distances are the LSH-adjacent lookalike set x124 mines. */
  val BandOffs: Seq[Int] = Seq(0, 22, 43)
  val BandMasks: Seq[Long] =
    Seq((1L << 22) - 1, (1L << 21) - 1, (1L << 21) - 1)

  /** DuckDB band-value expression for band `i` over a fingerprint
    * carried as signed-safe (hi, lo) 32-bit halves — DERIVED from
    * [[BandOffs]]/[[BandMasks]] so the SQL replay cannot drift from
    * the engine layout. */
  def bandSql(i: Int): String = {
    val off = BandOffs(i)
    val width = java.lang.Long.bitCount(BandMasks(i))
    val end = off + width
    if (end <= 32) {
      val base = if (off == 0) "lo" else s"(lo // ${1L << off})"
      s"($base % ${1L << width})"
    } else if (off >= 32) {
      val sh = off - 32
      val base = if (sh == 0) "hi" else s"(hi // ${1L << sh})"
      if (end >= 64) base else s"($base % ${1L << (end - 32 - sh)})"
    } else {
      val loBits = 32 - off
      s"((lo // ${1L << off}) + (hi % ${1L << (end - 32)}) * ${1L << loBits})"
    }
  }
}
