package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native sketch expressions: the hot per-row loops of MinHash and
  * SimHash as codegen'd Catalyst expressions.
  *
  * The HOF formulations (see TextFunctions) are correct but run the
  * lambda interpreter: ~64 × |shingles| boxed ops per row for MinHash.
  * These expressions run the same arithmetic as a tight JIT'd long
  * loop — one pass over the hash array updating all permutation mins
  * — which is what makes sketch-based dedup affordable at 100 TB
  * (it turns the signature stage from compute-bound to scan-bound).
  * Results are bit-identical to the HOF versions.
  */
case class MinHashSigExpr(child: Expression, a: Array[Long], b: Array[Long], prime: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData].toLongArray()
    new GenericArrayData(MinHashSigExpr.compute(hs, a, b, prime))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", a, "long[]")
    val bRef = ctx.addReferenceObj("mhB", b, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val hs = ctx.freshName("hs")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |long[] $hs = $c.toLongArray();
         |long[] $sig = new long[${a.length}];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $hs.length; $i++) {
         |  long $h = $hs[$i];
         |  for (int $j = 0; $j < ${a.length}; $j++) {
         |    long $v = ($aRef[$j] * $h + $bRef[$j]) % ${prime}L;
         |    if ($v < $sig[$j]) $sig[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): MinHashSigExpr = copy(child = c)
}

object MinHashSigExpr {
  private[functions] def compute(hs: Array[Long], a: Array[Long], b: Array[Long],
                                 prime: Long): Array[Long] = {
    val sig = Array.fill(a.length)(Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var j = 0
      while (j < a.length) {
        val v = (a(j) * h + b(j)) % prime
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    sig
  }

  def minhash(hashes: Column, numPerm: Int): Column = {
    val (a, b) = TextFunctions.minhashPerms(numPerm)
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(hashes),
      a.toArray, b.toArray, TextFunctions.MinHashPrime))
  }
}

/** 62-bit SimHash fingerprint over an array of 64-bit hashes, fused
  * into one codegen'd loop (bit votes + sign fold). Bit-identical to
  * `TextFunctions.simhashExpr`. */
case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData].toLongArray()
    SimHashExpr.compute(hs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val hs = ctx.freshName("hs")
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      s"""
         |long[] $hs = $c.toLongArray();
         |int[] $votes = new int[62];
         |for (int $i = 0; $i < $hs.length; $i++) {
         |  long $h = $hs[$i];
         |  for (int $j = 0; $j < 62; $j++) {
         |    $votes[$j] += (($h >> $j) & 1L) == 1L ? 1 : -1;
         |  }
         |}
         |long $fp = 0L;
         |for (int $j = 0; $j < 62; $j++) {
         |  if ($votes[$j] > 0) $fp |= (1L << $j);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SimHashExpr = copy(child = c)
}

/** Distinct word k-shingles over a tokens array, as one codegen'd
  * pass (LinkedHashSet keeps first-occurrence order — bit-identical
  * output to `TextFunctions.shinglesOf`, which re-runs the lambda
  * interpreter over inlined copies of the split and was the round-1
  * hot spot: ~10 ms/doc interpreted vs ~2 µs/doc here). */
case class ShinglesExpr(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShinglesExpr.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
      |  graft.functions.ShinglesExpr$$.MODULE$$.compute($c, $k);
     """.stripMargin)

  override protected def withNewChildInternal(c: Expression): ShinglesExpr = copy(child = c)
}

object ShinglesExpr {
  private val Space = UTF8String.fromString(" ")

  def compute(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](math.max(16, n * 2))
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  def shingles(tokens: Column, k: Int): Column =
    ColumnBridge.column(ShinglesExpr(ColumnBridge.expression(tokens), k))

  def shinglesFromText(text: Column, k: Int): Column =
    ColumnBridge.column(ShinglesFromTextExpr(ColumnBridge.expression(text), k))
}

/** Distinct word k-shingles straight from the TEXT, streaming the
  * tokenizer inside the expression. Bit-identical to
  * `split(text, ' ')` + [[ShinglesExpr]] (spec-asserted, including
  * leading/doubled/trailing-space empty tokens, which Spark's
  * limit=-1 split keeps), but the token array is never materialized:
  * a rolling k-slot ring of zero-copy byte slices feeds the distinct
  * set directly. That is the difference between a ~100 MB transient
  * single-row allocation on a 10 MB zipf giant (1.7M-element token
  * array — OOMs a 128 MB-per-task stress cell before the shingle set
  * is even built) and the row's honest payload, its DISTINCT shingle
  * set (~KBs on repetitive giants). Byte-level splitting on 0x20 is
  * exact: a space byte never occurs inside a multi-byte UTF-8
  * sequence. */
case class ShinglesFromTextExpr(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShinglesFromTextExpr.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
      |  graft.functions.ShinglesFromTextExpr$$.MODULE$$.compute($c, $k);
     """.stripMargin)

  override protected def withNewChildInternal(c: Expression): ShinglesFromTextExpr =
    copy(child = c)
}

/** MOSS winnowing straight from the TEXT: char k-gram md5-hex hashes
  * over the first [[TextFunctions.FingerprintMaxChars]] characters
  * (the giant-doc cap) and their sliding window-`w` minima, in ONE
  * native pass. Bit-identical to
  * `winnowMins(gramHashes(text, k), w)` (spec-asserted, incl.
  * multi-byte text — grams are CHAR-indexed like `substring`), but
  * O(bytes) instead of the interpreted-HOF chain, whose per-gram
  * `substring(text, i, k)` re-scans from byte 0 (O(offset) UTF-8
  * boundary walk): on the zipf corpus (150k docs, power-law lengths)
  * the HOF pass ran ~14 minutes; this runs in seconds. Per-row output
  * memory is the wins array, bounded by the cap. */
case class WinnowExpr(child: Expression, k: Int, w: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // NULL text → EMPTY array, matching the HOF chain it replaces
  // bit-for-bit: `CASE WHEN length(NULL) >= k …` has a null predicate
  // and falls to the ELSE array() branch on both engines, so default
  // null-intolerance here would flip d11's n_fps from 0 to null on
  // any corpus with a null text row (ADVICE r16).
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    WinnowExpr.computeOrEmpty(child.eval(input).asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.functions.WinnowExpr$$.MODULE$$.computeOrEmpty(
          ${c.isNull} ? null : ${c.value}, $k, $w);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): WinnowExpr =
    copy(child = c)
}

object WinnowExpr {
  private val HexChars = "0123456789abcdef".getBytes

  private val Empty = new GenericArrayData(Array.empty[Any])

  def computeOrEmpty(text: UTF8String, k: Int, w: Int): ArrayData =
    if (text == null) Empty else compute(text, k, w)

  private def md5Hex(md: java.security.MessageDigest,
                     bytes: Array[Byte], off: Int, len: Int): UTF8String = {
    md.update(bytes, off, len)
    val dig = md.digest()
    val hex = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      hex(2 * i) = HexChars((dig(i) >> 4) & 0xf)
      hex(2 * i + 1) = HexChars(dig(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(hex)
  }

  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val nChars = text.numChars()
    if (nChars < k) return new GenericArrayData(Array.empty[Any])
    val bytes = text.getBytes
    val capped = math.min(nChars, TextFunctions.FingerprintMaxChars)
    // char -> byte offsets for chars 0..capped (grams are CHAR-indexed
    // to match substring(text, i, k); one forward walk, no rescans)
    val offs = new Array[Int](capped + 1)
    var c = 0
    var b = 0
    while (c < capped) {
      offs(c) = b
      val first = bytes(b) & 0xff
      b += (if (first < 0x80) 1 else if (first < 0xe0) 2 else if (first < 0xf0) 3 else 4)
      c += 1
    }
    offs(capped) = b
    val nGrams = capped - k + 1
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = new Array[UTF8String](nGrams)
    var i = 0
    while (i < nGrams) {
      hs(i) = md5Hex(md, bytes, offs(i), offs(i + k) - offs(i))
      i += 1
    }
    // sliding window-w minima (binary UTF8String compare = array_min's
    // StringType ordering); w is tiny, the rescan per window is cheap
    val wins: Array[AnyRef] =
      if (nGrams >= w) {
        val out = new Array[AnyRef](nGrams - w + 1)
        var j = 0
        while (j <= nGrams - w) {
          var mn = hs(j)
          var t = j + 1
          while (t < j + w) { if (hs(t).compareTo(mn) < 0) mn = hs(t); t += 1 }
          out(j) = mn
          j += 1
        }
        out
      } else {
        var mn = hs(0)
        var t = 1
        while (t < nGrams) { if (hs(t).compareTo(mn) < 0) mn = hs(t); t += 1 }
        Array[AnyRef](mn)
      }
    new GenericArrayData(wins)
  }

  def winnow(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowExpr(ColumnBridge.expression(text), k, w))
}

/** Gopher-style repetition stats in one streaming pass over the TEXT:
  * (n_tokens, n_uniq, n_grams, n_uniq_grams, top_token_cnt) — the
  * five integers d18's quality ratios derive from. Equivalent to the
  * tokens/bigram-array + explode + two-groupBy DataFrame formulation
  * (spec-asserted), but per-row memory is the DISTINCT token/bigram
  * sets and a token count map, never the materialized token and
  * bigram arrays (~300 MB transient on a 10 MB zipf giant — the d18
  * stress-cell OOM), and the corpus-wide explode shuffle disappears:
  * the operator becomes a pure projection. Tokenization is the
  * split-on-space semantics (empties kept) shared with
  * [[ShinglesFromTextExpr]]. */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionStatsExpr.schema

  override def nullSafeEval(input: Any): Any =
    RepetitionStatsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
      |  graft.functions.RepetitionStatsExpr$$.MODULE$$.compute($c);
     """.stripMargin)

  override protected def withNewChildInternal(c: Expression): RepetitionStatsExpr =
    copy(child = c)
}

object RepetitionStatsExpr {
  import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_uniq", IntegerType, nullable = false),
    StructField("n_grams", IntegerType, nullable = false),
    StructField("n_uniq_grams", IntegerType, nullable = false),
    StructField("top_token_cnt", LongType, nullable = false)))

  private val Space = UTF8String.fromString(" ")

  def compute(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = text.getBytes
    val n = bytes.length
    val counts = new java.util.HashMap[UTF8String, Long](64)
    val uniqGrams = new java.util.HashSet[UTF8String](64)
    var nTokens = 0
    var prev: UTF8String = null
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        val tok = UTF8String.fromBytes(bytes, start, i - start)
        counts.merge(tok, 1L, (a, b) => a + b)
        if (prev != null) uniqGrams.add(UTF8String.concatWs(Space, prev, tok))
        prev = tok
        nTokens += 1
        start = i + 1
      }
      i += 1
    }
    var top = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { val v = it.next(); if (v > top) top = v }
    val nGrams = if (nTokens >= 2) nTokens - 1 else 0
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nTokens, counts.size(), nGrams, uniqGrams.size(), top))
  }

  def stats(text: Column): Column =
    ColumnBridge.column(RepetitionStatsExpr(ColumnBridge.expression(text)))
}

object ShinglesFromTextExpr {
  private val Space = UTF8String.fromString(" ")

  def compute(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val seen = new java.util.LinkedHashSet[UTF8String](64)
    val ring = new Array[UTF8String](k)
    val parts = new Array[UTF8String](k)
    var tokCount = 0
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        ring(tokCount % k) = UTF8String.fromBytes(bytes, start, i - start)
        tokCount += 1
        if (tokCount >= k) {
          var j = 0
          while (j < k) { parts(j) = ring((tokCount - k + j) % k); j += 1 }
          seen.add(UTF8String.concatWs(Space, parts: _*))
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}

/** MinHash signature straight from the shingle strings: xxhash64
  * (seed 42, same as the builtin) folded into [0, p), then all
  * permutation mins updated in one JIT'd loop. Fuses the round-1
  * `shingleHashes` HOF (interpreted per-element lambda) with
  * `MinHashSigExpr` — one pass, zero intermediate arrays.
  * Bit-identical to the HOF chain (spec-asserted). */
case class MinHashFromShinglesExpr(child: Expression, a: Array[Long], b: Array[Long],
                                   prime: Long) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(MinHashFromShinglesExpr.compute(
      input.asInstanceOf[ArrayData], a, b, prime))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhsA", a, "long[]")
    val bRef = ctx.addReferenceObj("mhsB", b, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      |  graft.functions.MinHashFromShinglesExpr$$.MODULE$$.compute($c, $aRef, $bRef, ${prime}L));
     """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): MinHashFromShinglesExpr =
    copy(child = c)
}

object MinHashFromShinglesExpr {
  def compute(shingles: ArrayData, a: Array[Long], b: Array[Long], prime: Long): Array[Long] = {
    val sig = Array.fill(a.length)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      var h = XXH64.hashUTF8String(shingles.getUTF8String(i), 42L) % prime
      if (h < 0) h += prime
      var j = 0
      while (j < a.length) {
        val v = (a(j) * h + b(j)) % prime
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    sig
  }

  def minhash(shingles: Column, numPerm: Int): Column = {
    val (a, b) = TextFunctions.minhashPerms(numPerm)
    ColumnBridge.column(MinHashFromShinglesExpr(ColumnBridge.expression(shingles),
      a.toArray, b.toArray, TextFunctions.MinHashPrime))
  }
}

/** Count of position-wise EQUAL slots between two MinHash signatures
  * — the signature-agreement kernel of near-dup verification
  * (`Dedup.nearDedupIncrementalStaged` / `NearStreamDedup`), replacing
  * the interpreted `aggregate(zip_with(a, b, …))` HOF chain that
  * allocated a 64-slot indicator array per CANDIDATE PAIR (r18, guide
  * §4: candidate volume is band-join-bounded but still
  * O(pairs)·numPerm — the verify loop is the per-pair workload).
  * Exactly the HOF's value: zip_with pads the shorter side with
  * nulls, whose equality test is null → counted 0 by the otherwise
  * branch — i.e. equal slots over min(len) — and a null ARRAY yields
  * null overall (BinaryExpression null propagation ≡ the HOF chain's
  * null flow). Bit-identity spec-asserted incl. the padding edge. */
case class SigAgreeExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  // The kernel reads slots with getLong, so anything but array<bigint>
  // (e.g. array<int>) would silently return wrong counts — fail at
  // ANALYSIS time instead (ADVICE r18). Nullability of ELEMENTS is not
  // restricted: a parquet round trip of the signature tables reports
  // containsNull=true even though minhash never emits null slots —
  // null-free elements stay the documented caller contract, exactly as
  // they were for the zip_with chain this replaced.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sig_agree requires array<bigint> on both sides, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) { if (x.getLong(i) == y.getLong(i)) c += 1; i += 1 }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SigAgreeExpr =
    copy(left = l, right = r)
}

object SigAgreeExpr {
  def sigAgree(a: Column, b: Column): Column =
    ColumnBridge.column(
      SigAgreeExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** 60-bit SimHash over md5 digests of the shingles, fused into one
  * loop. md5 (not xxhash64) so a DuckDB oracle can replicate the
  * fingerprint bit-for-bit: H = first 15 hex chars of md5(shingle)
  * parsed base-16 (both engines emit identical md5 hex), votes over
  * bits 0..59 of H, fp bit j set iff vote > 0. */
case class SimHashMd5Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHashMd5Expr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashMd5Expr$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(c: Expression): SimHashMd5Expr = copy(child = c)
}

object SimHashMd5Expr {
  val Bits = 60

  def compute(shingles: ArrayData): Long = {
    val votes = new Array[Int](Bits)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val hex = org.apache.commons.codec.digest.DigestUtils.md5Hex(
        shingles.getUTF8String(i).getBytes)
      val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      var j = 0
      while (j < Bits) {
        votes(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < Bits) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  def simhash(shingles: Column): Column =
    ColumnBridge.column(SimHashMd5Expr(ColumnBridge.expression(shingles)))
}

/** min(md5(shingle)) document fingerprint in one pass (the round-1
  * `array_min(transform(_, md5))` ran the lambda interpreter per
  * element). Hex strings compare like their digest bytes, so the min
  * is taken on the digest and hex-encoded once. Null for an empty
  * shingle set. */
case class MinMd5Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinMd5Expr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = (org.apache.spark.unsafe.types.UTF8String)
      |  graft.functions.MinMd5Expr$$.MODULE$$.compute($c);
      |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)

  override protected def withNewChildInternal(c: Expression): MinMd5Expr = copy(child = c)
}

object MinMd5Expr {
  def compute(shingles: ArrayData): UTF8String = {
    val n = shingles.numElements()
    if (n == 0) return null
    var min: Array[Byte] = null
    var i = 0
    while (i < n) {
      val d = org.apache.commons.codec.digest.DigestUtils.md5(
        shingles.getUTF8String(i).getBytes)
      if (min == null || unsignedLess(d, min)) min = d
      i += 1
    }
    UTF8String.fromString(org.apache.commons.codec.binary.Hex.encodeHexString(min))
  }

  private def unsignedLess(x: Array[Byte], y: Array[Byte]): Boolean = {
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  def minMd5(shingles: Column): Column =
    ColumnBridge.column(MinMd5Expr(ColumnBridge.expression(shingles)))
}

object SimHashExpr {
  private[functions] def compute(hs: Array[Long]): Long = {
    val votes = new Array[Int](62)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var j = 0
      while (j < 62) {
        votes(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 62) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  def simhash(hashes: Column): Column =
    ColumnBridge.column(SimHashExpr(ColumnBridge.expression(hashes)))
}
