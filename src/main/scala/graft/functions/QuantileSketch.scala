package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.catalyst.util.QuantileSummaries.Stats
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Mergeable Greenwald–Khanna quantile-sketch column family — the
  * re-aggregable percentile PARTIAL the cascade vocabulary needs
  * (reference: minerva's aggregation definitions cascade
  * hour→day→month; exact percentiles have no mergeable partial, so
  * monitoring cascades either re-scan raw rows per level or carry a
  * sketch). Three pieces, mirroring the HLL trio Spark ships for
  * distinct counts (hll_sketch_agg / hll_union_agg /
  * hll_sketch_estimate):
  *
  *  - [[QuantileSketch.gkAgg]]     — values → serialized GK summary
  *    (a BINARY column: the finest level's partial);
  *  - [[QuantileSketch.gkMerge]]   — serialized summaries → their
  *    merged summary (the coarser levels' re-aggregation);
  *  - [[QuantileSketch.gkQuantile]] — serialized summary → the
  *    p-quantile estimate (the presentation projection).
  *
  * The sketch is Spark's own `QuantileSummaries` (the engine of
  * `percentile_approx`), serialized as (relativeError, count,
  * sampled triples) — a few KB per group at eps 1e-4, fixed-width,
  * combine-friendly: map-side partials bound every buffer regardless
  * of group skew, and a coarser level merges the finer level's
  * sketches without ever re-touching raw rows. Rank-error contract:
  * a single-level sketch answers within eps·n ranks; merged sketches
  * stay within the GK merge bound (≤ 2·eps·n — spec-asserted against
  * exact ranks). Merge order is partition-dependent, so sketch
  * percentiles belong in rows-only / spec-checked outputs, never
  * hash-compared oracles (t20's posture).
  */
object QuantileSketch {

  /** eps matching percentile_approx's default accuracy (1/10000). */
  val DefaultEps: Double = 1.0e-4

  def gkAgg(c: Column, eps: Double = DefaultEps): Column =
    ColumnBridge.column(GkSketchAgg(
      ColumnBridge.expression(c.cast("double")), eps).toAggregateExpression())

  def gkMerge(c: Column): Column =
    ColumnBridge.column(GkSketchMergeAgg(
      ColumnBridge.expression(c)).toAggregateExpression())

  def gkQuantile(c: Column, p: Double): Column =
    ColumnBridge.column(GkQuantile(ColumnBridge.expression(c), p))

  /** Wire format: eps double, count long, n int, then n (value, g,
    * delta) triples of the COMPRESSED summary. Written once per
    * group per exchange — a compressed eps-1e-4 summary is O(1/eps)
    * triples worst-case, a few KB in practice. */
  private[functions] def toBytes(s0: QuantileSummaries): Array[Byte] = {
    val s = s0.compress()
    val n = s.sampled.length
    val bb = java.nio.ByteBuffer.allocate(8 + 8 + 4 + n * 24)
    bb.putDouble(s.relativeError); bb.putLong(s.count); bb.putInt(n)
    s.sampled.foreach { st => bb.putDouble(st.value); bb.putLong(st.g); bb.putLong(st.delta) }
    bb.array()
  }

  private[functions] def fromBytes(b: Array[Byte]): QuantileSummaries = {
    val bb = java.nio.ByteBuffer.wrap(b)
    val eps = bb.getDouble; val count = bb.getLong; val n = bb.getInt
    val st = Array.fill(n)(Stats(bb.getDouble, bb.getLong, bb.getLong))
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold,
      eps, st, count, true)
  }
}

/** values → serialized GK summary (BinaryType). Nulls skipped. */
case class GkSketchAgg(child: Expression, eps: Double,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSummaries] with UnaryLike[Expression] {

  require(eps > 0 && eps < 1, s"gk_sketch_agg: eps must be in (0, 1), got $eps")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "gk_sketch_agg"

  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, eps)

  override def update(b: QuantileSummaries, row: InternalRow): QuantileSummaries = {
    val v = child.eval(row)
    if (v == null) b else b.insert(v.asInstanceOf[Double])
  }

  override def merge(b: QuantileSummaries, o: QuantileSummaries): QuantileSummaries =
    b.compress().merge(o.compress())

  override def eval(b: QuantileSummaries): Any = QuantileSketch.toBytes(b)

  override def serialize(b: QuantileSummaries): Array[Byte] = QuantileSketch.toBytes(b)
  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    QuantileSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(n: Int): GkSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): GkSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): GkSketchAgg =
    copy(child = c)
}

/** serialized GK summaries → their merged summary (BinaryType) — the
  * coarser cascade level's re-aggregation. Nulls skipped. */
case class GkSketchMergeAgg(child: Expression,
                            mutableAggBufferOffset: Int = 0,
                            inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSummaries] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "gk_sketch_merge"

  // the buffer's eps is replaced by the first merged sketch's (a
  // fresh empty summary merges as the zero element)
  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold,
      QuantileSketch.DefaultEps)

  override def update(b: QuantileSummaries, row: InternalRow): QuantileSummaries = {
    val v = child.eval(row)
    if (v == null) b
    else b.compress().merge(QuantileSketch.fromBytes(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(b: QuantileSummaries, o: QuantileSummaries): QuantileSummaries =
    b.compress().merge(o.compress())

  override def eval(b: QuantileSummaries): Any = QuantileSketch.toBytes(b)

  override def serialize(b: QuantileSummaries): Array[Byte] = QuantileSketch.toBytes(b)
  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    QuantileSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(n: Int): GkSketchMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): GkSketchMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): GkSketchMergeAgg =
    copy(child = c)
}

/** serialized GK summary → p-quantile estimate (DoubleType; NULL for
  * an empty sketch). A presentation-projection scalar over O(groups)
  * rows — CodegenFallback is fine off the hot path. */
case class GkQuantile(child: Expression, p: Double)
    extends UnaryExpression with CodegenFallback {

  require(p >= 0 && p <= 1, s"gk_quantile: p must be in [0, 1], got $p")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "gk_quantile"

  override def nullSafeEval(bytes: Any): Any = {
    val s = QuantileSketch.fromBytes(bytes.asInstanceOf[Array[Byte]])
    if (s.count == 0) null
    else s.query(p).map(Double.box).orNull
  }

  override protected def withNewChildInternal(c: Expression): GkQuantile =
    copy(child = c)
}
