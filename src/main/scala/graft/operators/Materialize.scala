package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental materialization: the reference's modified-log →
  * dirty-set → recompute-only-dirty loop
  * (minerva/storage/trend/materialization, the `minerva materialize`
  * CLI), Spark-first.
  *
  * State is a tiny parquet table `(day, watermark, n_rows)` — one row
  * per materialized day-partition, carrying the max source timestamp
  * that run saw. A run:
  *
  *   1. aggregates the source's modified log per day (one scan of the
  *      source — at 100 TB this is the only full pass, and it is a
  *      partial-agg groupBy, so the shuffle carries day partials);
  *   2. anti-joins it against state to find dirty days (new data or
  *      days never processed);
  *   3. re-aggregates ONLY the dirty days — the source scan is
  *      filtered to those days, so a partitioned source prunes to the
  *      dirty partitions — and partition-upserts them into the target
  *      store (`TrendStoreWriter.write` dynamic overwrite touches only
  *      those day directories);
  *   4. merges the new watermarks into state.
  *
  * The dirty-day list does come to the driver — it is O(days), the
  * same size Minerva keeps in its materialization_state table, and it
  * is what makes the target-store write prune instead of rewriting
  * history.
  */
object Materialize {

  /** Per-day modified log of a trend source: `(day, last_modified,
    * n_rows)`. This is the store-level twin of
    * `TrendStore.modifiedLog` (which is per-entity). */
  def modifiedLogByDay(source: DataFrame, ts: Column): DataFrame =
    source.groupBy(to_date(ts).as("day"))
      .agg(max(ts).as("last_modified"), count(lit(1)).as("n_rows"))

  /** Days needing (re)materialization: no state row yet, source data
    * newer than the recorded watermark, or a row-count change. The
    * count check matters because the watermark is the max EVENT
    * timestamp: a late row landing EARLIER in an already-seen day
    * leaves the max unchanged, and on watermark alone that day would
    * silently never be recomputed. */
  def dirtySet(modLog: DataFrame, state: DataFrame): DataFrame =
    modLog.join(
        state.select(col("day"), col("watermark"), col("n_rows").as("__state_rows")),
        Seq("day"), "left")
      .filter(col("watermark").isNull || col("last_modified") > col("watermark") ||
        col("n_rows") =!= col("__state_rows"))
      .select(col("day"), col("last_modified"), col("n_rows"))

  private def emptyState(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("day", DateType), StructField("watermark", TimestampType),
        StructField("n_rows", LongType))))
  }

  /** Read materialization state, or an empty state if none exists.
    * Hadoop FS existence check: state lives next to the store on
    * whatever filesystem the cluster uses (file://, HDFS, S3A). */
  def readState(spark: SparkSession, statePath: String): DataFrame = {
    StoreFs.recover(spark, statePath) // heal a swap that died mid-replace
    if (StoreFs.exists(spark, statePath)) spark.read.parquet(statePath)
    else emptyState(spark)
  }

  /** One incremental materialization run. Returns the dirty days that
    * were recomputed (empty when the target is already current). */
  def run(source: DataFrame, entity: Column, ts: Column, value: Column,
          granularity: String, statePath: String, storePath: String): Array[java.sql.Date] = {
    val spark = source.sparkSession
    val state = readState(spark, statePath)
    val dirty = dirtySet(modifiedLogByDay(source, ts), state)
    // O(materialized days): the same cardinality Minerva keeps in its
    // materialization_state table — not a data-sized collect.
    val dirtyRows = dirty.collect()
    val dirtyDays = dirtyRows.map(_.getDate(0))
    if (dirtyDays.nonEmpty) {
      val rolled = TrendStore.rollup(
        source.filter(to_date(ts).isin(dirtyDays.toSeq: _*)),
        entity, ts, value, granularity)
      TrendStoreWriter.write(rolled, storePath)
      // The state delta is rebuilt from the ALREADY-COLLECTED dirty
      // rows, not the lazy `dirty` plan: re-evaluating that plan would
      // scan the full source a second time, and — worse — rows arriving
      // between the two scans would advance the recorded watermark past
      // what was actually materialized, permanently skipping them.
      val delta = spark.createDataFrame(
        java.util.Arrays.asList(dirtyRows: _*), dirty.schema)
        .select(col("day"), col("last_modified").as("watermark"), col("n_rows"))
      val newState = state.filter(!col("day").isin(dirtyDays.toSeq: _*))
        .unionByName(delta)
      // State is tiny; rewrite via temp-then-swap on the Hadoop FS,
      // with the rename result checked (a silently failed rename would
      // leave stale state after the store already advanced).
      val tmp = statePath + ".tmp"
      newState.coalesce(1).write.mode("overwrite").parquet(tmp)
      StoreFs.replace(spark, tmp, statePath)
    }
    dirtyDays
  }
}
