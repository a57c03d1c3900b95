package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text scoring: char-class counts plus N stopword-marker
  * occurrence counts in ONE byte walk.
  *
  * This replaces the langScore/occurrences formulation that evaluated
  * `length(text) - length(replace(text, ' w ', ''))` per marker — a
  * full-string copy per marker, 150 copies per row for the 10-language
  * profile table (~1.5 GB of transient allocation for one 10 MB zipf
  * giant; measured 103.6 s for d06 / 40.7 s for d05 on the r17 zipf
  * board, ~12-25× the per-byte cost of the sibling streaming
  * expressions in TokenExpressions.scala). Here the text bytes are
  * read once, in place, and the per-row payload is two small int
  * arrays.
  *
  * Bit-identity with the length-diff formulation (spec-asserted in
  * GraftFunctionsSpec; the DuckDB twins keep the generated length-diff
  * SQL, value-identical):
  *
  *   - Each marker is a word `w`, counted as non-overlapping
  *     occurrences of `" w "` in the padded text `' ' || text || ' '`
  *     — `replace` scans greedily left-to-right and a match CONSUMES
  *     its trailing space, so in a run of k consecutive `w` tokens
  *     only ceil(k/2) match. Token-wise that is exactly: token p
  *     matches marker i iff token == w_i and token p-1 did not match
  *     marker i. The walk keeps a last-match position per marker —
  *     no byte-level rescans, no padding copy (the virtual pad spaces
  *     are the token boundaries the walk already sees).
  *   - Char classes count CODEPOINTS (what `length`/`regexp_replace`
  *     count): n_chars = non-continuation bytes; alpha/digit/space
  *     are single-byte ASCII classes, so byte counts equal codepoint
  *     counts; `n_punct = n_chars − n_alpha − n_digit − n_space`
  *     reproduces `length(regexp_replace(text, "[a-zA-Z0-9 ]", ""))`.
  *   - Marker byte-matching is exact for any UTF-8 marker (the Polish
  *     profile has multibyte stopwords): a byte-level occurrence of a
  *     complete-codepoint UTF-8 string is always codepoint-aligned —
  *     lead and continuation bytes are disjoint ranges, so a match
  *     cannot start mid-character.
  *
  * Token lookups hash zero-copy UTF8String slices into a word →
  * marker-indices table (words may appear in several language
  * profiles); the table is built once per executor (transient lazy)
  * and shared read-only. Null text → null (the padded concat was
  * null-propagating too).
  */
case class TextStatsExpr(child: Expression, markers: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = TextStatsExpr.schema

  @transient private lazy val table = TextStatsExpr.buildTable(markers)

  override def nullSafeEval(input: Any): Any =
    TextStatsExpr.compute(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("markerTable", table,
      "graft.functions.MarkerTable")
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
      |  graft.functions.TextStatsExpr$$.MODULE$$.compute($c, $tRef);
     """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): TextStatsExpr =
    copy(child = c)
}

/** word bytes → indices of the markers equal to that word (top-level
  * so the codegen reference carries a plain Java class name). */
final class MarkerTable(val map: java.util.HashMap[UTF8String, Array[Int]],
                        val nMarkers: Int) extends Serializable

object TextStatsExpr {

  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_alpha", IntegerType, nullable = false),
    StructField("n_digit", IntegerType, nullable = false),
    StructField("n_space", IntegerType, nullable = false),
    StructField("marker_counts", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  def buildTable(markers: Seq[String]): MarkerTable = {
    val m = new java.util.HashMap[UTF8String, Array[Int]](markers.size * 2)
    markers.zipWithIndex.foreach { case (w, i) =>
      val key = UTF8String.fromString(w)
      val prev = m.get(key)
      m.put(key, if (prev == null) Array(i) else prev :+ i)
    }
    new MarkerTable(m, markers.size)
  }

  def compute(text: UTF8String, table: MarkerTable): InternalRow = {
    val bytes = text.getBytes
    val n = bytes.length
    val counts = new Array[Int](table.nMarkers)
    // last token position that matched marker i (a match consumes the
    // shared delimiter space, blocking position lastMatch+1)
    val lastMatch = new Array[Int](table.nMarkers)
    java.util.Arrays.fill(lastMatch, -2)
    var nChars = 0
    var nAlpha = 0
    var nDigit = 0
    var nSpace = 0
    var pos = 0     // token position
    var start = 0   // token start byte
    var i = 0
    while (i <= n) {
      val b = if (i < n) bytes(i) else ' '.toByte
      if (i == n || b == ' ') {
        if (i < n) nSpace += 1
        // token [start, i): look it up unless empty (empty tokens can
        // never equal a marker word but still advance the position)
        if (i > start) {
          val idxs = table.map.get(UTF8String.fromBytes(bytes, start, i - start))
          if (idxs != null) {
            var j = 0
            while (j < idxs.length) {
              val k = idxs(j)
              if (lastMatch(k) != pos - 1) { counts(k) += 1; lastMatch(k) = pos }
              j += 1
            }
          }
        }
        pos += 1
        start = i + 1
      } else {
        if ((b & 0xC0) != 0x80) nChars += 1
        if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')) nAlpha += 1
        else if (b >= '0' && b <= '9') nDigit += 1
      }
      i += 1
    }
    nChars += nSpace // spaces are codepoints too
    new GenericInternalRow(Array[Any](nChars, nAlpha, nDigit, nSpace,
      new GenericArrayData(counts)))
  }

  /** Column builder: struct(n_chars, n_alpha, n_digit, n_space,
    * marker_counts). Marker counts are in `markers` order, 1-based via
    * `element_at(stats.marker_counts, i + 1)`. */
  def stats(text: Column, markers: Seq[String]): Column =
    ColumnBridge.column(TextStatsExpr(ColumnBridge.expression(text), markers))
}
