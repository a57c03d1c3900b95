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

  /** Streaming PERCENTILE rollup — the monitoring cascade's p50/p95
    * computed continuously (the streaming twin of the batch g07
    * cascade). The GK sketch partial ([[graft.functions.QuantileSketch]])
    * is mergeable, so the streaming aggregation state carries one
    * few-KB serialized summary per open (entity, window) cell —
    * bounded exactly like cnt/sum_dec partials, NOT a growing value
    * buffer — and each micro-batch's map-side partials merge into it.
    * Update mode re-emits a bucket whenever late data lands, and the
    * emitted row carries BOTH the quantile estimates (one column per
    * requested p) and the serialized sketch itself (`q_sketch`), so a
    * downstream day/month cascade can keep merging sketches without
    * re-touching raw rows. Estimates obey the GK merge bound vs exact
    * ranks (spec-asserted); like every sketch surface they are
    * rows-only, never hash-oracle material (t20's posture).
    *
    * @param ps   quantiles to project, e.g. Seq(0.5, 0.95) → p50, p95
    * @param eps  GK rank-error budget (see MetricAgg.eps)
    */
  def pctlRollup(events: DataFrame, entityCol: String, tsCol: String,
                 valueCol: String, windowLen: String, lateness: String,
                 ps: Seq[Double] = Seq(0.5, 0.95),
                 eps: Double = graft.functions.QuantileSketch.DefaultEps): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p < 1),
      s"pctlRollup: quantiles must lie in (0, 1), got ${ps.mkString(", ")}")
    // Column naming shares the batch PctFn convention: pNN = the
    // NNth PERCENTILE (p50 = 0.50). Per-mille quantiles get a
    // 3-digit zero-padded name (p=0.045 → "p045", p=0.125 → "p125"),
    // never the bare 2-digit form — "p45" from 0.045 would read back
    // as 0.45 under the shared convention and a downstream cascade
    // matching by name would cascade the wrong quantile (ADVICE r14).
    // Every emitted name parses back to exactly one p: 1-2 digits =
    // percent, 3 digits = per-mille (values ≥ 100 can't be percents;
    // values < 100 carry the leading zero).
    def pName(p: Double): String = {
      val m = math.rint(p * 1000).toInt
      if (m % 10 == 0) s"p${m / 10}" else f"p$m%03d"
    }
    require(ps.map(pName).distinct.size == ps.size,
      s"pctlRollup: quantiles collide after naming: ${ps.mkString(", ")}")
    events
      .withWatermark(tsCol, lateness)
      .groupBy(col(entityCol).as("entity_id"),
        window(col(tsCol), windowLen).as("bucket"))
      .agg(count(lit(1)).as("cnt"),
        graft.functions.QuantileSketch.gkAgg(col(valueCol), eps).as("q_sketch"))
      .select(col("entity_id") +: col("bucket.start").as("bucket") +:
        col("cnt") +: col("q_sketch") +:
        ps.map(p => graft.functions.QuantileSketch
          .gkQuantile(col("q_sketch"), p).as(pName(p))): _*)
  }

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
