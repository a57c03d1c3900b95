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

  /** Attribute CHANGE report between two as-of times — "what changed
    * between the Jan-10 and Jan-20 configuration snapshots", the
    * audit query a Minerva attribute store answers. Output: one row
    * per entity whose value differs between the snapshots
    * (null-safe), with `value_before`/`value_after` and a change
    * kind (`added` | `removed` | `changed`).
    *
    * Shape: the two as-of lookups are the same entity-keyed window
    * (each over its own pushed-down `ts <= at` scan range), joined
    * full-outer on the entity — two window shuffles + one join, all
    * on the entity key. */
  def diff(attrs: DataFrame, entity: Column, ts: Column, tie: Column,
           value: Column, before: Column, after: Column): DataFrame = {
    // added/removed derive from entity PRESENCE in each as-of set
    // (the marker columns), never from value nullness: an entity
    // whose value expression is NULL at one snapshot is a 'changed'
    // row, not a phantom add/remove.
    val v1 = atTime(attrs, entity, ts, tie, before)
      .select(entity.as("entity_id"), value.as("value_before"), lit(true).as("__in_before"))
    val v2 = atTime(attrs, entity, ts, tie, after)
      .select(entity.as("entity_id"), value.as("value_after"), lit(true).as("__in_after"))
    v1.join(v2, Seq("entity_id"), "full_outer")
      .filter(!(col("value_before") <=> col("value_after")) ||
        col("__in_before").isNull || col("__in_after").isNull)
      .withColumn("change",
        when(col("__in_before").isNull, lit("added"))
          .when(col("__in_after").isNull, lit("removed"))
          .otherwise(lit("changed")))
      .drop("__in_before", "__in_after")
  }

  /** Bulk time-travel: attribute state of every entity at EACH
    * snapshot timestamp in `snaps`, in ONE pass over the history —
    * the reporting question behind [[atTime]] ("weekly configuration
    * snapshots for the whole fleet"), without running |snaps|
    * separate as-of window passes over the store.
    *
    * Each history row is valid from its ts until the entity's next
    * write (the [[history]] interval, same (ts, tie) ordering); the
    * snapshots it serves are selected from a LITERAL timestamp array
    * per row and exploded. So the plan is one entity-keyed lead
    * window plus a join-free grid expansion — nothing builds an
    * (entity × snapshot) table to range-join back, and the history
    * is scanned once however many snapshots are asked for. Snapshots
    * before an entity's first write emit nothing for that entity;
    * same-ts writes resolve to the higher tie, matching [[atTime]].
    * Output: the attrs row serving each (entity, snapshot), plus
    * `snapshot_ts`. */
  def snapshots(attrs: DataFrame, entity: Column, ts: Column, tie: Column,
                snaps: Seq[String]): DataFrame = {
    require(snaps.nonEmpty, "snapshots needs at least one snapshot timestamp")
    val w = Window.partitionBy(entity).orderBy(ts.asc, tie.asc)
    val snapArr = array(snaps.map(s => lit(s).cast("timestamp")): _*)
    attrs
      .withColumn("__from", ts)
      .withColumn("__until", lead(ts, 1).over(w))
      .withColumn("snapshot_ts", explode(filter(snapArr,
        s => s >= col("__from") && (col("__until").isNull || s < col("__until")))))
      .drop("__from", "__until")
  }

  /** Attribute CHURN report: per-bucket counts of real value changes
    * — "how many config changes landed per day, across how many
    * entities" (fleet change-rate monitoring over an attribute
    * store's history). A change is a row [[compact]] keeps EXCLUDING
    * each entity's first row (initial provisioning is not churn);
    * the null-safe inequality counts a value toggling to/from NULL
    * as a change, matching compactHistoryAll's discipline. Shape:
    * the compact window's entity shuffle + one combine-friendly
    * groupBy over O(buckets) keys. */
  def churn(attrs: DataFrame, entity: Column, ts: Column, tie: Column,
            value: Column, granularity: String): DataFrame = {
    // row_number (not lag-is-null) marks first rows, so a NULL-valued
    // previous row is a real predecessor and NULL→X counts as churn.
    val w = Window.partitionBy(col("__e")).orderBy(ts.asc, tie.asc)
    attrs.withColumn("__e", entity)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__prev", lag(value, 1).over(w))
      .filter(col("__rn") > 1 && !(col("__prev") <=> value))
      .groupBy(date_trunc(granularity, ts).as("bucket"))
      .agg(count(lit(1)).as("n_changes"),
        countDistinct(col("__e")).as("n_entities"))
  }

  /** Fleet configuration DISTRIBUTION at an as-of time: how many
    * entities hold each value of an attribute, with the fleet share —
    * the "how is the fleet configured right now" report every
    * attribute-tracked deployment publishes (the reference keeps
    * current values queryable per entity; this is the fleet-level
    * rollup of that view).
    *
    * Shape: [[atTime]]'s one entity-keyed window over the pushed-down
    * `ts <= at` scan, then one combine-friendly groupBy over
    * O(distinct values) keys; the fleet total rides a window over the
    * VALUE table (O(values) rows), never a second scan. The share is
    * one IEEE division of exact longs — bit-identical on any engine. */
  def valueDistribution(attrs: DataFrame, entity: Column, ts: Column,
                        tie: Column, value: Column, at: Column): DataFrame = {
    val cells = atTime(attrs, entity, ts, tie, at)
      .groupBy(value.as("value"))
      .agg(count(lit(1)).as("n_entities"))
    cells
      .withColumn("fleet_total", sum(col("n_entities")).over(Window.partitionBy()))
      .withColumn("share", col("n_entities") / col("fleet_total"))
  }

  /** Per-entity change TIMELINE: the audit trail behind [[churn]]'s
    * fleet rate — every real value change with the previous value and
    * how long the NEW value then held (seconds to the next change;
    * NULL for the still-current value). The first row per entity is
    * the initial provisioning (prev_value NULL, change_kind 'initial').
    *
    * Shape: [[compact]]'s change rows derive from one entity-keyed
    * window; the hold duration is a lead over the SAME partitioning
    * (the compacted rows re-use the entity key), so the whole timeline
    * is two window passes on one shuffle family — nothing joins back
    * to the raw history. */
  /** Dwell-time distribution per attribute VALUE — "how long do
    * entities stay in config X": over [[timeline]]'s holds, per
    * value, the hold count, how many completed (a later change ended
    * them) vs still OPEN (the entity's current value), and the
    * mean/max completed-hold duration. A value with many short holds
    * is a transient state (a retry loop, a flapping config push); a
    * value held long and wide is the fleet's steady state.
    *
    * Shape: timeline's one entity-keyed window family → ONE
    * combine-friendly groupBy over O(values) keys. The mean is an
    * unrounded IEEE division of exact longs (NULL when no hold
    * completed — never a divide-by-zero artifact). */
  def valueDwell(attrs: DataFrame, entity: Column, ts: Column, tie: Column,
                 value: Column): DataFrame =
    timeline(attrs, entity, ts, tie, value)
      .groupBy(col("new_value").as("value"))
      .agg(count(lit(1)).as("n_holds"),
        count(col("held_seconds")).as("n_completed"),
        (count(lit(1)) - count(col("held_seconds"))).as("n_open"),
        (sum(col("held_seconds")) / count(col("held_seconds")))
          .as("mean_held_seconds"),
        max(col("held_seconds")).as("max_held_seconds"))

  /** Value TRANSITION MATRIX — which config moves actually happen:
    * over [[timeline]]'s real changes (the first, provisioning row per
    * entity is excluded), per (from_value → to_value) edge: the
    * transition count, how many distinct entities made the move, the
    * mean seconds the NEW value then held (NULL when no hold has
    * completed), and each edge's share of all transitions. An edge
    * that dominates the matrix is the fleet's standard upgrade path;
    * a heavy symmetric pair (X→Y and Y→X) is a flapping config.
    *
    * Shape: timeline's one entity-keyed window family → ONE
    * combine-friendly groupBy over O(values²) edge keys; the share
    * total rides a window over the EDGE table (O(values²) rows),
    * never a history re-scan. Share and mean are unrounded IEEE
    * divisions of exact longs — bit-identical on any engine. */
  def transitions(attrs: DataFrame, entity: Column, ts: Column, tie: Column,
                  value: Column): DataFrame = {
    val edges = timeline(attrs, entity, ts, tie, value)
      .filter(col("change_kind") === "change")
      .groupBy(col("prev_value").as("from_value"),
        col("new_value").as("to_value"))
      .agg(count(lit(1)).as("n_transitions"),
        countDistinct(col("entity_id")).as("n_entities"),
        (sum(col("held_seconds")) / count(col("held_seconds")))
          .as("mean_held_seconds"))
    edges
      .withColumn("share",
        col("n_transitions") / sum(col("n_transitions")).over(Window.partitionBy()))
  }

  def timeline(attrs: DataFrame, entity: Column, ts: Column, tie: Column,
               value: Column): DataFrame = {
    val w = Window.partitionBy(col("entity_id")).orderBy(ts.asc, tie.asc)
    val changes = attrs.withColumn("entity_id", entity)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__prev", lag(value, 1).over(w))
      .filter(col("__rn") === 1 || !(col("__prev") <=> value))
    val wc = Window.partitionBy(col("entity_id")).orderBy(ts.asc, tie.asc)
    changes
      .withColumn("__next_ts", lead(ts, 1).over(wc))
      .select(col("entity_id"), ts.as("changed_at"),
        col("__prev").as("prev_value"), value.as("new_value"),
        when(col("__rn") === 1, lit("initial")).otherwise(lit("change"))
          .as("change_kind"),
        (unix_timestamp(col("__next_ts")) - unix_timestamp(ts))
          .as("held_seconds"))
  }
}
