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

  /** Release the blocks behind a `localCheckpoint`'d Dataset.
    * `Dataset.unpersist` goes through CacheManager.uncacheQuery,
    * which keys on cached PLANS — checkpoint persistence lives at
    * the RDD level behind a LogicalRDD, so uncacheQuery finds
    * nothing and is a silent no-op (ADVICE r16); the blocks would
    * otherwise only be freed by ContextCleaner once the RDD is
    * GC'd. Only safe once the checkpointed data is dead: a
    * locally-checkpointed RDD cannot be recomputed.
    *
    * The argument must be the checkpoint ROOT — the Dataset
    * `localCheckpoint` returned, whose analyzed plan IS the
    * LogicalRDD — never a dataset merely derived from one. A derived
    * plan can reference LogicalRDDs that sibling datasets still need
    * (walking it and unpersisting every LogicalRDD found would
    * destroy unrecomputable blocks and fail later actions with
    * lost-block errors — ADVICE r17), so anything else is rejected
    * loudly rather than half-honored. */
  def unpersistCheckpointed(df: org.apache.spark.sql.Dataset[_]): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case other => throw new IllegalArgumentException(
        "unpersistCheckpointed requires the checkpoint root (plan root " +
          s"must be a LogicalRDD); got: ${other.nodeName}. Derived plans " +
          "may share checkpoint blocks with sibling datasets — unpersist " +
          "the Dataset localCheckpoint() returned instead.")
    }
}
