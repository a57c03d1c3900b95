package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded "smallest k values" aggregate — the scale-correct shape for
  * per-key top-k (posting-list heads, per-token sample docs, per-user
  * earliest events). `sort_array(collect_list(x))[0:k]` materializes
  * every group member before truncating, which on a Zipf-headed key
  * (the token "a" appears in every document) is an unbounded buffer on
  * the hottest reducer; a window `row_number` ranks the full partition
  * for the same reason. This aggregate's state is the sorted ≤k-array
  * itself: updates fold rows in with an O(k) guard (saturated buffers
  * reject values ≥ the current kth without re-sorting), merges concat
  * + resort two ≤k arrays, so map-side partial aggregation bounds
  * every buffer at k elements regardless of group skew — the hot
  * token costs each mapper at most one k-array, and the reducer
  * merges #partitions of them.
  *
  * DeclarativeAggregate (not TypedImperative): the update/merge are
  * ordinary Catalyst expressions (If/Slice/SortArray/Concat), so the
  * aggregate stays inside whole-stage codegen and needs no
  * serialization — the buffer IS an UnsafeArrayData.
  *
  * Nulls are ignored (SQL aggregate convention). Ordering is the
  * child type's natural Catalyst ordering; duplicates are kept (feed
  * a distinct input when set semantics are wanted, as d34 does).
  */
case class CollectMinK(child: Expression, k: Int)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  require(k > 0, s"CollectMinK: k must be positive, got $k")

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "collect_min_k"

  private lazy val buf = AttributeReference("minK", dataType)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(buf)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(new GenericArrayData(Array.empty[Any]), dataType))

  // Saturated-buffer fast path: once |buf| == k, a value no smaller
  // than the current kth cannot enter — skip the sort entirely. The
  // common case at scale (most rows of a hot group arrive after the
  // buffer saturates) costs one Size + one ElementAt comparison.
  override lazy val updateExpressions: Seq[Expression] = {
    val inserted = new Slice(
      new SortArray(Concat(Seq(buf, CreateArray(Seq(child))))),
      Literal(1), Literal(k))
    Seq(If(IsNull(child), buf,
      If(And(GreaterThanOrEqual(Size(buf), Literal(k)),
             GreaterThanOrEqual(child, ElementAt(buf, Literal(k)))),
        buf, inserted)))
  }

  override lazy val mergeExpressions: Seq[Expression] =
    Seq(new Slice(new SortArray(Concat(Seq(buf.left, buf.right))),
      Literal(1), Literal(k)))

  override lazy val evaluateExpression: Expression = buf

  override protected def withNewChildInternal(c: Expression): CollectMinK =
    copy(child = c)
}

object CollectMinK {
  /** `collect_min_k(c, k)`: the k smallest non-null values of `c` per
    * group, as a sorted array. Fixed O(k) state per group — safe on
    * arbitrarily skewed keys. */
  def collectMinK(c: Column, k: Int): Column =
    ColumnBridge.column(CollectMinK(ColumnBridge.expression(c), k)
      .toAggregateExpression())
}
