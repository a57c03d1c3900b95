package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Classic-mode Column ↔ catalyst Expression bridge. Spark 4 removed
  * the public `new Column(expr)` constructor (Connect refactor); the
  * blessed replacement `classic.ExpressionUtils` is `private[sql]`,
  * so this one-file shim lives under the `org.apache.spark.sql`
  * namespace — the same pattern public Spark extensions use.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a temp SQL function backed by a raw Expression builder —
    * the registry handle is `private[sql]`, hence it lives in this
    * shim. Makes graft's native expressions callable from SQL text,
    * not only the Column API. */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
