package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared expression helpers with one unifying goal: **bit-stable
  * results across engines** so the driver's hash-compare against the
  * DuckDB oracle passes without tolerance.
  *
  * - Cross-row double sums are computed in DECIMAL (exact, associative
  *   — order of a distributed partial aggregation can't change the
  *   result) and cast to double once at the end. The same cast chain
  *   in ANSI SQL yields the identical double.
  * - Timestamps are emitted as formatted UTC strings, sidestepping
  *   parquet ns/us unit mismatches between engines.
  */
object Fx {
  /** Money/metric decimal: exact under sum, wide enough for 100 TB
    * per-group partials (38 digits after sum widening). */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Exact sum of a double column → deterministic double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Deterministic double cast for PRODUCT sums (scale-8 decimals):
    * rescale to 4 decimals BEFORE the double cast. A (38,8) sum's
    * unscaled value exceeds 2^53 once group sums pass ~9·10⁷, and
    * there the engines' decimal→double casts disagree in the last
    * ulp (DuckDB divides two separately-rounded doubles; the JVM
    * rounds the decimal correctly). At scale 4 the unscaled value is
    * exactly representable, so both engines produce the identical
    * double (found as a real q01 hash-mismatch at sf0.1). The twin
    * SQL is `CAST(CAST(sum(…) AS DECIMAL(38,4)) AS DOUBLE)`. */
  def prodSumDouble(sumCol: Column): Column =
    sumCol.cast(DecimalType(38, 4)).cast("double")

  /** Deterministic mean: exact decimal sum / count, divided in double. */
  def davg(c: Column): Column = sum(dec(c)).cast("double") / count(lit(1))

  /** Timestamp → canonical UTC string (second precision). */
  def tsStr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Date-ish timestamp → canonical date string. */
  def dateStr(c: Column): Column = date_format(c, "yyyy-MM-dd")
}
