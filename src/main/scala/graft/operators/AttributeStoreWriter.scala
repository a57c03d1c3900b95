package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Attribute-store persistence: the reference stores attribute history
  * in per-store tables and materializes a current-value view from it
  * (minerva/storage/attribute). graft keeps the history as
  * time-partitioned parquet (append-only — attribute writes are
  * events) and materializes the current view as its own table.
  *
  * Scale shape: appends touch only the partitions of the days being
  * written; the current-view materialization is one entity-keyed
  * window over the history (the same plan as `AttributeStore.current`)
  * and a full rewrite of the (entity-sized, not history-sized)
  * current table. History is never rewritten.
  */
object AttributeStoreWriter {

  /** Append attribute rows (entity, ts, attributes…) into the
    * history store, day-partitioned on ts. Duplicate redelivery is
    * upserted by (entity, ts, tie) key — Minerva's history table has
    * exactly one row per (entity, timestamp) write. */
  def append(spark: SparkSession, path: String, incoming: DataFrame,
             entityCol: String = "entity_id", tsCol: String = "ts",
             tieCol: String = "event_id"): Unit =
    TrendStoreWriter.upsert(spark, path,
      incoming.withColumn("bucket", col(tsCol)),
      keyCols = Seq(entityCol, "bucket", tieCol))

  /** Read the attribute history back, optionally pruned to a date
    * range. */
  def readHistory(spark: SparkSession, path: String,
                  from: Option[String] = None, to: Option[String] = None): DataFrame =
    TrendStoreWriter.read(spark, path, from, to).drop("bucket")

  /** History retention: drop history partitions older than `keepFrom`.
    * The current-value table is separate state and is NOT touched — a
    * retired history day does not invalidate the latest value per
    * entity (compaction of the reference keeps the same invariant). */
  def retainHistory(spark: SparkSession, historyPath: String,
                    keepFrom: String): Seq[String] =
    TrendStoreWriter.retain(spark, historyPath, keepFrom)

  /** Materialize the current-value view (latest row per entity) from
    * the history store into its own table. Returns the written view. */
  def materializeCurrent(spark: SparkSession, historyPath: String,
                         currentPath: String,
                         entityCol: String = "entity_id", tsCol: String = "ts",
                         tieCol: String = "event_id"): DataFrame = {
    val hist = readHistory(spark, historyPath).drop("p_date")
    val cur = AttributeStore.current(hist, col(entityCol), col(tsCol), col(tieCol))
    val tmp = currentPath + ".tmp"
    cur.write.mode("overwrite").parquet(tmp)
    StoreFs.replace(spark, tmp, currentPath)
    spark.read.parquet(currentPath)
  }
}
