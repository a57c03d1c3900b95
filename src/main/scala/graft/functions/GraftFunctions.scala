package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.ColumnBridge

/** SQL surface for graft's native expressions: after
  * `GraftFunctions.register(spark)`, the sketch/vector primitives are
  * callable from SQL text (`SELECT graft_minhash(graft_shingles(...),
  * 64) ...`), not only the Column API — the registration path a
  * SQL-first user of the reference expects.
  *
  * Constant arguments (k, numPerm) must be foldable literals: the
  * builders evaluate them at resolution time, so the expressions
  * compile to the same fused codegen as the Column API forms.
  */
object GraftFunctions {

  private def constInt(e: Expression, what: String): Int = e.eval(null) match {
    case i: Int  => i
    case l: Long => l.toInt
    case v => throw new IllegalArgumentException(
      s"$what must be a constant integer literal, got: $v")
  }

  private def wrap1(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
                   (es: Seq[Expression]): Expression =
    ColumnBridge.expression(f(ColumnBridge.column(es.head)))

  def register(spark: SparkSession): Unit = {
    ColumnBridge.registerFunction(spark, "graft_hamming",
      es => HammingDistance(es(0), es(1)))
    ColumnBridge.registerFunction(spark, "graft_dot",
      es => DotExpr(es(0), es(1)))
    ColumnBridge.registerFunction(spark, "graft_norm",
      es => NormExpr(es(0)))
    ColumnBridge.registerFunction(spark, "graft_shingles",
      es => ColumnBridge.expression(ShinglesExpr.shingles(
        ColumnBridge.column(es(0)), constInt(es(1), "graft_shingles(tokens, k): k"))))
    ColumnBridge.registerFunction(spark, "graft_minhash",
      es => ColumnBridge.expression(MinHashFromShinglesExpr.minhash(
        ColumnBridge.column(es(0)), constInt(es(1), "graft_minhash(shingles, numPerm): numPerm"))))
    ColumnBridge.registerFunction(spark, "graft_simhash",
      wrap1(SimHashMd5Expr.simhash))
    ColumnBridge.registerFunction(spark, "graft_minmd5",
      wrap1(MinMd5Expr.minMd5))
    // aggregate: the analyzer wraps a bare AggregateFunction in its
    // AggregateExpression, same as the builtin registry entries
    ColumnBridge.registerFunction(spark, "graft_collect_min_k",
      es => CollectMinK(es(0), constInt(es(1), "graft_collect_min_k(col, k): k")))
  }
}
