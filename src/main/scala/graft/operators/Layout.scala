package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton-curve) clustering.
  *
  * Parquet skips files and row groups whose footer min/max statistics
  * exclude a predicate — but statistics only prune when the data is
  * CLUSTERED on the filtered column. A day-partitioned trend store
  * sorted by time prunes time predicates for free and nothing else:
  * an entity-filtered read touches every file of every day. Z-order
  * interleaves the bits of several columns into one sort key, so rows
  * close in ANY clustered dimension land in the same files — a range
  * predicate on any single dimension intersects O(n^((d-1)/d)) of the
  * n files instead of all of them (the classic multi-dimensional
  * index trade, reference Minerva gets from PostgreSQL btree indexes
  * per trend part; at 100 TB of parquet, footer stats + layout are
  * the index).
  *
  * Scaling is data-driven: each column is affinely mapped onto
  * [0, 2^bits) from its observed min/max — ONE aggregate, a bounded
  * 2-values-per-column driver collect (the Materialize O(days)
  * discipline). The z-value is a pure codegen'd expression (shifts,
  * masks, ors — no UDF).
  */
object Layout {

  /** Interleave the low `bits` bits of each (already [0, 2^bits))
    * long column: bit i of column j lands at position i*d + j. The
    * first column owns the LOWEST interleaved bit, so earlier columns
    * split finer — order columns by expected query selectivity. */
  def zValue(scaled: Seq[Column], bits: Int): Column = {
    val d = scaled.size
    require(d >= 1, "zValue needs at least one column")
    require(d * bits <= 62, s"$d columns × $bits bits overflow a long")
    val terms = for {
      (c, j) <- scaled.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * d + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Repartition + sort `df` along the Z-curve of `cols` (numeric or
    * timestamp), producing `numFiles` range-partitioned output files
    * when written. Row set is unchanged — layout only. */
  def zorderBy(df: DataFrame, cols: Seq[String], numFiles: Int,
               bits: Int = 16): DataFrame = {
    require(cols.nonEmpty, "zorderBy needs at least one column")
    // observed ranges: one aggregate, 2 scalars per column
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"min_$c"),
      max(col(c).cast("double")).as(s"max_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    if (r.isNullAt(0)) return df // empty input: nothing to lay out
    val scale = (1L << bits) - 1
    val scaled = cols.zipWithIndex.map { case (c, j) =>
      val (lo, hi) = (r.getDouble(2 * j), r.getDouble(2 * j + 1))
      val range = math.max(hi - lo, java.lang.Double.MIN_VALUE)
      least(lit(scale), greatest(lit(0L),
        ((col(c).cast("double") - lit(lo)) / lit(range) * lit(scale.toDouble))
          .cast("long")))
    }
    df.withColumn("__z", zValue(scaled, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
