package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Attribute-store operators: Minerva's slowly-changing per-entity
  * attributes (full history, compacted history, current view, as-of
  * lookup), expressed as window functions over `(entity, ts)`.
  *
  * Every operator here is one shuffle on the entity key; the window
  * sort happens inside each partition. All orderings take an explicit
  * unique tie-break column so results are deterministic under
  * distributed execution (same-timestamp attribute writes happen).
  */
object AttributeStore {

  /** Current value per entity: the row with max (ts, tie). */
  def current(attrs: DataFrame, entity: Column, ts: Column, tie: Column): DataFrame =
    attrs.withColumn("__rn",
        row_number().over(Window.partitionBy(entity).orderBy(ts.desc, tie.desc)))
      .filter(col("__rn") === 1).drop("__rn")

  /** SCD2 history: each row valid from its ts until the next row's ts
    * (null = still current). */
  def history(attrs: DataFrame, entity: Column, ts: Column, tie: Column): DataFrame =
    attrs.withColumn("valid_from", ts)
      .withColumn("valid_to",
        lead(ts, 1).over(Window.partitionBy(entity).orderBy(ts.asc, tie.asc)))

  /** Compacted history: drop rows whose value equals the previous row
    * for the same entity (Minerva's attribute compaction). */
  def compact(attrs: DataFrame, entity: Column, ts: Column, tie: Column,
              value: Column): DataFrame =
    attrs.withColumn("__prev",
        lag(value, 1).over(Window.partitionBy(entity).orderBy(ts.asc, tie.asc)))
      .filter(col("__prev").isNull || col("__prev") =!= value)
      .drop("__prev")

  /** Attribute values as of time `at`: latest row with ts <= at.
    * The filter pushes to the scan, so at 100 TB only partitions
    * before `at` are read. */
  def atTime(attrs: DataFrame, entity: Column, ts: Column, tie: Column,
             at: Column): DataFrame =
    current(attrs.filter(ts <= at), entity, ts, tie)
}
