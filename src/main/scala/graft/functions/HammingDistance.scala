package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: hamming distance between two 64-bit
  * fingerprints (`bit_count(a ^ b)` fused into one codegen'd call).
  *
  * Exists as the graft showcase of extension preference (b) from the
  * survey: when composition of built-ins is possible but a fused
  * native expression is tighter in the hot path (SimHash candidate
  * filtering runs once per candidate pair), a `BinaryExpression` with
  * `doGenCode` keeps whole-stage codegen wide — no UDF boundary, no
  * boxing.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long]).toLong

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (long) java.lang.Long.bitCount($a ^ $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

object HammingDistance {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column-level entry point (classic-mode Column↔Expression bridge,
    * the Spark 4 replacement for `new Column(expr)`). */
  def hamming(a: Column, b: Column): Column =
    ColumnBridge.column(
      HammingDistance(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
