package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.TrendStoreWriter

/** Structured-Streaming trend loading: Minerva's continuous harvest →
  * trend-store path, Spark-first. A stream of raw events becomes
  * watermarked windowed rollups — the streaming twin of
  * `TrendStore.rollup`, emitting the same (entity, bucket, partials)
  * shape so downstream re-aggregation code is shared.
  *
  * Watermarking bounds state: buckets older than the allowed lateness
  * are finalized and evicted, so state size is O(entities × open
  * windows), independent of stream length — the property that matters
  * when the stream is 100 TB/day.
  */
object TrendStream {

  /** Windowed rollup with late-data handling.
    *
    * @param events     streaming DataFrame with `entityCol`, `tsCol`, `valueCol`
    * @param windowLen  bucket width, e.g. "1 hour"
    * @param lateness   watermark delay, e.g. "2 hours"
    */
  def windowedRollup(events: DataFrame, entityCol: String, tsCol: String,
                     valueCol: String, windowLen: String, lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(col(entityCol).as("entity_id"),
        window(col(tsCol), windowLen).as("bucket"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col(valueCol).cast("decimal(18,4)")).as("sum_dec"),
        max(col(valueCol)).as("max_value"))
      .select(col("entity_id"), col("bucket.start").as("bucket"),
        col("cnt"), col("sum_dec"), col("max_value"))

  /** Continuous loading: sink a windowed rollup stream into a trend
    * store — the reference's continuous harvest → store loop closed
    * end-to-end. Update output mode re-emits a bucket whenever late
    * data changes it; each micro-batch is row-level upserted by
    * (entity_id, bucket), so the store CONVERGES to what the batch
    * rollup over the same data would produce (idempotent per bucket,
    * exactly the property Minerva's trend upsert gives re-harvests).
    * The upsert reads back only the day-partitions present in the
    * batch, so steady-state cost is O(batch), not O(store). */
  def toStore(rolled: DataFrame, storePath: String, checkpointDir: String): StreamingQuery = {
    val sink = (batch: DataFrame, _: Long) =>
      if (!batch.isEmpty) TrendStoreWriter.upsert(batch.sparkSession, storePath, batch)
    rolled.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(sink)
      .start()
  }
}
