package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Streaming token expressions: every way the engine used to write
  * `split(text, ' ')` — count it, distinct-count it, explode it,
  * bigram it — WITHOUT materializing the token array.
  *
  * Why this matters at 100 TB: a corpus with power-law document
  * lengths has giant rows (one 10 MB web document ≈ 1.7M tokens), and
  * `split` materializes a ~100 MB UTF8String array for that ONE row —
  * a transient allocation that OOMs a 128 MB-per-task executor share
  * before the query's real work starts (measured on the zipf stress
  * corpus; the same class of defect was fixed for shingles/winnowing/
  * repetition in [[ShinglesFromTextExpr]]/[[WinnowExpr]]/
  * [[RepetitionStatsExpr]] — this file finishes the family for the
  * remaining token-path operators). Each expression streams the
  * byte-level tokenizer those fixes share (split-on-0x20, empties
  * kept, exact: a space byte never occurs inside a multi-byte UTF-8
  * sequence) and holds only its honest per-row payload: a counter, a
  * distinct set, or one generated row at a time.
  *
  * Bit-identity with the `split` formulations is spec-asserted
  * (GraftFunctionsSpec), including the edge cases where Java's
  * limit=-1 regex split is subtle: empty text → one empty token,
  * leading/doubled/trailing spaces → empty tokens kept, null → null
  * (scalars) / zero rows (generators).
  */

/** `size(split(text, ' '))` (nonEmptyOnly=false) or
  * `size(filter(split(text, ' '), t -> t <> ''))` (true) as one
  * zero-allocation counting pass — not even the text bytes are
  * copied (getByte walks the row buffer in place). */
case class TokenCountExpr(child: Expression, nonEmptyOnly: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any =
    TokenCountExpr.compute(input.asInstanceOf[UTF8String], nonEmptyOnly)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenCountExpr$$.MODULE$$.compute($c, $nonEmptyOnly);")

  override protected def withNewChildInternal(c: Expression): TokenCountExpr =
    copy(child = c)
}

object TokenCountExpr {
  def compute(text: UTF8String, nonEmptyOnly: Boolean): Int = {
    val n = text.numBytes()
    if (nonEmptyOnly) {
      var cnt = 0
      var inTok = false
      var i = 0
      while (i < n) {
        if (text.getByte(i) == ' ') inTok = false
        else { if (!inTok) cnt += 1; inTok = true }
        i += 1
      }
      cnt
    } else {
      var spaces = 0
      var i = 0
      while (i < n) {
        if (text.getByte(i) == ' ') spaces += 1
        i += 1
      }
      spaces + 1
    }
  }

  def tokenCount(text: Column): Column =
    ColumnBridge.column(TokenCountExpr(ColumnBridge.expression(text), nonEmptyOnly = false))

  def nonEmptyTokenCount(text: Column): Column =
    ColumnBridge.column(TokenCountExpr(ColumnBridge.expression(text), nonEmptyOnly = true))
}

/** `(size(split(text,' ')), size(array_distinct(split(text,' '))))`
  * in one pass: a counter plus the distinct-token set of zero-copy
  * slices — the set IS the row's honest payload (bounded by the text
  * bytes), the 100 MB token array is not. */
case class TokenUniqExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TokenUniqExpr.schema

  override def nullSafeEval(input: Any): Any =
    TokenUniqExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
      |  graft.functions.TokenUniqExpr$$.MODULE$$.compute($c);
     """.stripMargin)

  override protected def withNewChildInternal(c: Expression): TokenUniqExpr =
    copy(child = c)
}

object TokenUniqExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_uniq", IntegerType, nullable = false)))

  def compute(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    val n = bytes.length
    val seen = new java.util.HashSet[UTF8String](64)
    var nTokens = 0
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        seen.add(UTF8String.fromBytes(bytes, start, i - start))
        nTokens += 1
        start = i + 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nTokens, seen.size()))
  }

  def stats(text: Column): Column =
    ColumnBridge.column(TokenUniqExpr(ColumnBridge.expression(text)))
}

/** `(size(toks), size(array_distinct(toks)))` for
  * `toks = regexp_extract_all(text, pattern, 0)` — the BPE
  * pre-tokenizer stats — streaming `Matcher.find()` instead of
  * materializing the match array (java.util.regex, the same engine
  * `regexp_extract_all` runs, so matches are identical; the pattern
  * must stay inside the RE2 ∩ java.util.regex subset for the DuckDB
  * twin, unchanged from the array formulation). */
case class RegexTokenStatsExpr(child: Expression, pattern: String)
    extends UnaryExpression {

  override def dataType: DataType = RegexTokenStatsExpr.schema

  @transient private lazy val compiled = java.util.regex.Pattern.compile(pattern)

  override def nullSafeEval(input: Any): Any =
    RegexTokenStatsExpr.compute(input.asInstanceOf[UTF8String], compiled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("regexPat", compiled, "java.util.regex.Pattern")
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
      |  graft.functions.RegexTokenStatsExpr$$.MODULE$$.compute($c, $pRef);
     """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): RegexTokenStatsExpr =
    copy(child = c)
}

object RegexTokenStatsExpr {
  val schema: StructType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("n_uniq", IntegerType, nullable = false)))

  def compute(text: UTF8String, p: java.util.regex.Pattern): InternalRow = {
    val m = p.matcher(text.toString)
    val seen = new java.util.HashSet[String](64)
    var n = 0
    while (m.find()) {
      n += 1
      seen.add(m.group())
    }
    new GenericInternalRow(Array[Any](n, seen.size()))
  }

  def stats(text: Column, pattern: String): Column =
    ColumnBridge.column(RegexTokenStatsExpr(ColumnBridge.expression(text), pattern))
}

/** Span-scrub application in ONE streaming pass (the d31/spanScrub
  * transform): drop every token whose 1-based position is covered by
  * any `[i, i+window-1]` window for a start `i` in the SORTED drop
  * list, rebuild the kept tokens joined by single spaces, and report
  * (n_tokens, n_removed, cleaned). Bit-identical to the
  * zip_with-structs + filter(exists) + array_join HOF chain
  * (spec-asserted) — which materialized a ~300 MB transient struct
  * array for ONE 1.7M-token zipf-giant row (the r17 4g-cell OOM);
  * here the per-row cost is the text bytes plus the output builder,
  * and the sorted drop list advances with a two-pointer sweep instead
  * of an exists() scan per token. */
case class ScrubSpansExpr(text: Expression, drops: Expression, window: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = text
  override def right: Expression = drops

  override def dataType: DataType = ScrubSpansExpr.schema

  override def nullSafeEval(t: Any, d: Any): Any =
    ScrubSpansExpr.compute(t.asInstanceOf[UTF8String],
      d.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, d) => s"""
      |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
      |  graft.functions.ScrubSpansExpr$$.MODULE$$.compute($t, $d, $window);
     """.stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ScrubSpansExpr =
    copy(text = l, drops = r)
}

object ScrubSpansExpr {
  import org.apache.spark.sql.catalyst.util.ArrayData

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_removed", IntegerType, nullable = false),
    StructField("cleaned", StringType, nullable = false)))

  def compute(text: UTF8String, drops: ArrayData, window: Int): InternalRow = {
    val bytes = text.getBytes
    val n = bytes.length
    val nd = drops.numElements()
    val out = new java.io.ByteArrayOutputStream(math.max(16, n))
    var di = 0          // first drop window that could still cover p
    var p = 0           // 1-based token position
    var nTokens = 0
    var nRemoved = 0
    var wroteAny = false
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        p += 1
        nTokens += 1
        while (di < nd && drops.getInt(di) + window - 1 < p) di += 1
        val covered = di < nd && drops.getInt(di) <= p
        if (covered) nRemoved += 1
        else {
          if (wroteAny) out.write(' ')
          out.write(bytes, start, i - start)
          wroteAny = true
        }
        start = i + 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nTokens, nRemoved,
      UTF8String.fromBytes(out.toByteArray)))
  }

  def scrub(text: Column, drops: Column, window: Int): Column =
    ColumnBridge.column(ScrubSpansExpr(ColumnBridge.expression(text),
      ColumnBridge.expression(drops), window))
}

/** `explode(split(text, ' '))` (skipEmpty=false) or
  * `explode(split(text, ' '))` + `filter(token <> '')`
  * (skipEmpty=true) as a LAZY generator: GenerateExec pulls one token
  * row at a time and the downstream projection copies it, so a zipf
  * giant costs one text-bytes copy — never the 100 MB token array the
  * explode-of-split materializes per row. Null text generates zero
  * rows (explode of a null array). CodegenFallback: Generate is a
  * codegen boundary either way; the stages above and below keep their
  * whole-stage spans. */
case class TokensGenerator(child: Expression, skipEmpty: Boolean)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("token", StringType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else new TokensGenerator.TokenRowIterator(
      t.asInstanceOf[UTF8String].getBytes, skipEmpty)
  }

  override protected def withNewChildInternal(c: Expression): TokensGenerator =
    copy(child = c)
}

object TokensGenerator {

  /** Streams split-on-space tokens (empties kept — the split(limit=-1)
    * semantics; `skipEmpty` drops them, fused with the downstream
    * filter). Zero-copy slices of the (private) byte array; the
    * GenerateExec output projection copies each row before the next
    * is produced. */
  private[functions] final class TokenRowIterator(bytes: Array[Byte], skipEmpty: Boolean)
      extends Iterator[InternalRow] {
    private val n = bytes.length
    private var start = 0
    private var done = false
    private var nextTok: UTF8String = null
    private val row = new GenericInternalRow(1)
    advance()

    private def advance(): Unit = {
      nextTok = null
      while (nextTok == null && !done) {
        var i = start
        while (i < n && bytes(i) != ' ') i += 1
        val tok = UTF8String.fromBytes(bytes, start, i - start)
        if (!skipEmpty || tok.numBytes() > 0) nextTok = tok
        if (i >= n) done = true
        start = i + 1
      }
    }

    override def hasNext: Boolean = nextTok != null

    override def next(): InternalRow = {
      row.update(0, nextTok)
      advance()
      row
    }
  }

  def explodeTokens(text: Column, skipEmpty: Boolean): Column =
    ColumnBridge.column(TokensGenerator(ColumnBridge.expression(text), skipEmpty))
}

/** Adjacent-token (bigram) pairs as a lazy generator — the d44/d40
  * shapes, whose `transform`/`zip_with` pair-struct arrays were ~2×
  * the token array per giant row:
  *   - filtered=false: pairs of consecutive RAW tokens (empties kept
  *     in the stream), emitting only pairs with both sides non-empty
  *     — `explode(transform(sequence ...))` + both-non-empty filter;
  *   - filtered=true: empties dropped from the stream FIRST, pairs of
  *     consecutive survivors — `zip_with(slice(a,...), slice(a,...))`
  *     over the pre-filtered array.
  * Null text → zero rows either way. */
case class BigramsGenerator(child: Expression, filtered: Boolean)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("w1", StringType, nullable = false),
    StructField("w2", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else new BigramsGenerator.BigramRowIterator(
      t.asInstanceOf[UTF8String].getBytes, filtered)
  }

  override protected def withNewChildInternal(c: Expression): BigramsGenerator =
    copy(child = c)
}

object BigramsGenerator {

  private[functions] final class BigramRowIterator(bytes: Array[Byte], filtered: Boolean)
      extends Iterator[InternalRow] {
    private val n = bytes.length
    private var start = 0
    private var done = false
    private var prev: UTF8String = null
    private var w1: UTF8String = null
    private var w2: UTF8String = null
    private val row = new GenericInternalRow(2)
    advance()

    private def advance(): Unit = {
      w1 = null
      while (w1 == null && !done) {
        var i = start
        while (i < n && bytes(i) != ' ') i += 1
        val tok = UTF8String.fromBytes(bytes, start, i - start)
        if (filtered) {
          // pair consecutive non-empty survivors
          if (tok.numBytes() > 0) {
            if (prev != null) { w1 = prev; w2 = tok }
            prev = tok
          }
        } else {
          // pair consecutive raw tokens, emit only both-non-empty
          if (prev != null && prev.numBytes() > 0 && tok.numBytes() > 0) {
            w1 = prev; w2 = tok
          }
          prev = tok
        }
        if (i >= n) done = true
        start = i + 1
      }
    }

    override def hasNext: Boolean = w1 != null

    override def next(): InternalRow = {
      row.update(0, w1)
      row.update(1, w2)
      advance()
      row
    }
  }

  def explodeBigrams(text: Column, filtered: Boolean): Column =
    ColumnBridge.column(BigramsGenerator(ColumnBridge.expression(text), filtered))
}
