package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the LLM-pipeline operators.
  *
  * Everything here is built from codegen'd `functions._` and HOFs
  * (`transform`/`aggregate`/`zip_with`) — no UDFs, so whole-stage
  * codegen stays wide and the expressions run identically at any
  * scale. MinHash/SimHash use fixed, seeded constants so results are
  * reproducible across runs and cluster layouts. Columns are passed
  * by name (SQL-expression form) because the nested-lambda shapes are
  * clearer and ANSI-safe that way.
  */
object TextFunctions {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word k-shingles over a tokens column (by name). Guarded
    * so short documents yield an empty array rather than an ANSI
    * out-of-bounds error. */
  def shinglesOf(tokensCol: String, k: Int = 3): Column = {
    val join = (0 until k).map(j => s"element_at($tokensCol, i + ${j + 1})")
      .mkString("concat_ws(' ', ", ", ", ")")
    when(expr(s"size($tokensCol)") >= k,
      array_distinct(expr(s"transform(sequence(0, size($tokensCol) - $k), i -> $join)")))
      .otherwise(array().cast("array<string>"))
  }

  // ---------------------------------------------------------------- MinHash

  /** Mersenne prime 2^31 - 1: permutation hashes stay < 2^62, safe
    * under ANSI long arithmetic. */
  val MinHashPrime = 2147483647L

  /** Seeded permutation constants (a, b): deterministic across runs. */
  def minhashPerms(numPerm: Int, seed: Long = 42L): (Seq[Long], Seq[Long]) = {
    val rnd = new java.util.Random(seed)
    val a = Seq.fill(numPerm)(1L + math.abs(rnd.nextLong()) % (MinHashPrime - 1))
    val b = Seq.fill(numPerm)(math.abs(rnd.nextLong()) % MinHashPrime)
    (a, b)
  }

  /** Base shingle hashes folded into [0, p): compute this ONCE as its
    * own column — referencing it from the permutation loop below then
    * costs an array read per row, not a per-permutation re-hash of
    * every shingle string (a 64× difference in the hot path). */
  def shingleHashes(shinglesCol: Column): Column =
    transform(shinglesCol, s => pmod(xxhash64(s), lit(MinHashPrime)))

  /** MinHash signature (array of numPerm longs) over pre-computed
    * shingle hashes: sig[i] = min over h of (a_i * h + b_i) mod p.
    * One arithmetic pass per permutation per row; no shuffle, no UDF. */
  def minhashSignature(hashesCol: Column, numPerm: Int = 64): Column = {
    val (a, b) = minhashPerms(numPerm)
    val aLit = array(a.map(lit): _*)
    val bLit = array(b.map(lit): _*)
    when(size(hashesCol) > 0,
      transform(sequence(lit(0), lit(numPerm - 1)), i =>
        array_min(transform(hashesCol, h =>
          pmod(element_at(aLit, (i + 1).cast("int")) * h +
            element_at(bLit, (i + 1).cast("int")), lit(MinHashPrime))))))
      .otherwise(array().cast("array<bigint>"))
  }

  // ---------------------------------------------------------------- SimHash

  /** 62-bit SimHash over a tokens column (by name): per-bit ±1 votes
    * from xxhash64 token hashes, folded to a long fingerprint. 62 bits
    * keeps `shiftleft` clear of the long sign bit under ANSI mode.
    * Pure HOFs — one pass per row, no shuffle, no UDF. */
  def simhashExpr(tokensCol: String): Column = expr(
    s"""aggregate(
       |  transform($tokensCol, t -> xxhash64(t)),
       |  array_repeat(0L, 62),
       |  (acc, h) -> zip_with(acc,
       |    transform(sequence(0, 61), j ->
       |      CASE WHEN (h >> j) & 1 = 1 THEN 1L ELSE -1L END),
       |    (x, y) -> x + y),
       |  acc -> aggregate(sequence(0, 61), 0L, (s, j) ->
       |    s + CASE WHEN element_at(acc, CAST(j + 1 AS INT)) > 0
       |      THEN shiftleft(1L, CAST(j AS INT)) ELSE 0L END))""".stripMargin)

  // ------------------------------------------------------------- Quality

  /** Occurrence count of a literal marker in a text column (by name):
    * the portable length-difference formula (identical semantics in
    * ANSI SQL). NOTE: this copies the full string once per marker —
    * O(markers × bytes) per row — so the query plans now use
    * [[TextStatsExpr]] (one byte walk for N markers, bit-identical,
    * spec-asserted); this formulation is retained as the reference
    * side of that bit-identity spec and as the shape the generated
    * DuckDB twins still run. */
  def occurrences(textCol: String, marker: String): Column = {
    val esc = marker.replace("'", "''")
    (length(col(textCol)) - length(expr(s"replace($textCol, '$esc', '')"))) / marker.length
  }

  /** Winnowing (the MOSS rolling-hash fingerprint scheme), as two
    * composable HOF expressions — no UDF, no shuffle. `gramHashes`
    * hashes every char `k`-gram; `winnowMins` takes the minimum of
    * each sliding window of `w` hashes. Any two documents sharing a
    * sufficiently long substring share a fingerprint, with guaranteed
    * density 2/(w+1). md5 as the gram hash keeps the result portable
    * across engines (the DuckDB oracle replays it string-for-string).
    * Compute `gramHashes` into its own column first — inlining it
    * into `winnowMins` would re-evaluate the hash pass per reference. */
  /** Winnowing giant-doc cap: fingerprints are computed over the
    * first `FingerprintMaxChars` characters of a document. Two
    * reasons, both measured on the zipf stress corpus (10 MB planted
    * giants): (1) per-row eval memory — the portable md5-string gram
    * array costs ~100 B/char, so an uncapped 10 MB doc materializes a
    * ~1 GB array in ONE row evaluation, far past a 128 MB-per-task
    * executor share; (2) UTF8String.substring is O(offset) (it scans
    * for codepoint boundaries), so per-gram cost grows with position
    * and an uncapped giant is quadratic in doc length. At 64 Ki chars
    * the row costs ~6 MB and ~2e9 byte scans, while still yielding
    * ~16k fingerprint windows — a giant is fingerprint-saturated long
    * before the cap (density 2/(w+1)); prefix fingerprinting is the
    * standard winnowing posture for oversized inputs. The DuckDB twin
    * applies the same cap, so oracle parity holds at every length. */
  val FingerprintMaxChars: Int = 65536

  def gramHashes(textCol: String, k: Int = 8): Column =
    expr(s"""CASE WHEN length($textCol) >= $k
      THEN transform(sequence(1, least(length($textCol), $FingerprintMaxChars) - ${k - 1}),
        i -> md5(substring($textCol, i, $k)))
      ELSE cast(array() AS array<string>) END""")

  def winnowMins(hsCol: String, w: Int = 4): Column =
    expr(s"""CASE WHEN size($hsCol) >= $w
      THEN transform(sequence(1, size($hsCol) - ${w - 1}), j -> array_min(slice($hsCol, j, $w)))
      WHEN size($hsCol) > 0 THEN array(array_min($hsCol))
      ELSE cast(array() AS array<string>) END""")
}
