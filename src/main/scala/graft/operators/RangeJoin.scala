package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-containment joins at scale.
  *
  * Spark plans a bare inequality join (`p.ts BETWEEN i.lo AND i.hi`)
  * as a broadcast-nested-loop or cartesian product — O(N·M)
  * comparisons, the classic hidden scale-killer the moment neither
  * side is broadcast-small. The scale-correct shape buckets both
  * sides onto a fixed time grid: interval rows explode over the grid
  * buckets they cover, point rows key by their single bucket, and the
  * match becomes one hash EQUI-join on the bucket plus an exact range
  * post-filter. (The same trick DuckDB's IEJoin and dedicated range-
  * join optimizers apply internally — expressed here with plain
  * Catalyst operators so it works on any Spark.)
  *
  * Cost: the explode fans each interval out to
  * `⌈length/grid⌉ + 1` rows, so pick `gridSeconds` near the typical
  * interval length — one join shuffle keyed by fixed-width longs,
  * no quadratic anything. Grid misalignment cannot lose matches:
  * `lo ≤ pt ≤ hi` implies `⌊pt⌋grid ∈ [⌊lo⌋grid, ⌊hi⌋grid]`, and a
  * point matches an interval in exactly ONE bucket (its own), so no
  * dedup pass is needed.
  */
object RangeJoin {

  /** Inner-join `points` rows into the `intervals` rows whose
    * `[lo, hi]` contains `pt` (inclusive). Column names must not
    * collide across the two sides (rename before calling — the
    * result carries both sides' columns). */
  def containsJoin(intervals: DataFrame, lo: Column, hi: Column,
                   points: DataFrame, pt: Column,
                   gridSeconds: Long): DataFrame = {
    require(gridSeconds > 0, s"gridSeconds must be positive, got $gridSeconds")
    val g = lit(gridSeconds)
    val iv = intervals.withColumn("__bucket",
      explode(sequence(
        floor(unix_timestamp(lo) / g) * g,
        floor(unix_timestamp(hi) / g) * g,
        g)))
    val pts = points.withColumn("__bucket", floor(unix_timestamp(pt) / g) * g)
    iv.join(pts, "__bucket")
      .filter(pt >= lo && pt <= hi)
      .drop("__bucket")
  }
}
