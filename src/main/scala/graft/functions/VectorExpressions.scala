package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native vector math over embedding columns (`array<float>` or
  * `array<double>`).
  *
  * The round-1 HOF forms (`zip_with` + `aggregate`) are correct but
  * interpreted: 3 boxed lambda passes per scored pair. At billions of
  * candidate pairs the scoring loop IS the workload, so these run it
  * as one JIT'd fused multiply-add pass. Accumulation order (left to
  * right, double precision) is identical to the sequential HOF fold,
  * so results are bit-identical (spec-asserted).
  */
private[functions] trait VecHelper {
  /** Per-element getter returning a double-cast value. */
  def getter(et: DataType, arr: String, i: String): String = et match {
    case FloatType  => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case t          => throw new IllegalArgumentException(s"unsupported element type $t")
  }

  def elemType(e: Expression): DataType = e.dataType.asInstanceOf[ArrayType].elementType

  def read(et: DataType, arr: ArrayData, i: Int): Double = et match {
    case FloatType  => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case t          => throw new IllegalArgumentException(s"unsupported element type $t")
  }
}

/** Sequential-fold dot product in double precision. */
case class DotExpr(left: Expression, right: Expression)
    extends BinaryExpression with VecHelper {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (lt, rt) = (elemType(left), elemType(right))
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += read(lt, x, i) * read(rt, y, i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (${getter(elemType(left), a, i)}) * (${getter(elemType(right), b, i)});
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotExpr =
    copy(left = l, right = r)
}

/** L2 norm in double precision (sequential fold of squares). */
case class NormExpr(child: Expression) extends UnaryExpression with VecHelper {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val et = elemType(child)
    var acc = 0.0
    var i = 0
    while (i < x.numElements()) { val v = read(et, x, i); acc += v * v; i += 1 }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |double $acc = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $v = ${getter(elemType(child), a, i)};
         |  $acc += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): NormExpr = copy(child = c)
}

/** All sign-sketch hyperplane tests in one pass: bit p of the result
  * is set iff vec · planes(p) ≥ 0. One loop over the vector per
  * plane, replacing `planes` separate interpreted zip_with/aggregate
  * passes. */
case class SignBucketsExpr(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression with VecHelper {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val et = elemType(child)
    var bucket = 0L
    var p = 0
    while (p < planes.length) {
      val w = planes(p)
      val n = math.min(x.numElements(), w.length)
      var d = 0.0
      var i = 0
      while (i < n) { d += read(et, x, i) * w(i); i += 1 }
      if (d >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("sbPlanes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val bucket = ctx.freshName("bucket")
      s"""
         |long $bucket = 0L;
         |for (int $p = 0; $p < $pRef.length; $p++) {
         |  int $n = java.lang.Math.min($a.numElements(), $pRef[$p].length);
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $d += (${getter(elemType(child), a, i)}) * $pRef[$p][$i];
         |  }
         |  if ($d >= 0) $bucket |= (1L << $p);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): SignBucketsExpr = copy(child = c)
}

object VectorExpressions {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def norm(a: Column): Column =
    ColumnBridge.column(NormExpr(ColumnBridge.expression(a)))

  def signBuckets(vec: Column, planes: Array[Array[Double]]): Column =
    ColumnBridge.column(SignBucketsExpr(ColumnBridge.expression(vec), planes))
}
