package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

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
