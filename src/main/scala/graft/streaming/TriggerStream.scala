package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.{Trigger, TrendStoreWriter}

/** Continuous trigger evaluation: the streaming twin of
  * `operators.Trigger` — the reference's trigger daemon evaluates
  * rules each time a granularity period closes; graft expresses that
  * as a watermarked windowed rollup in APPEND mode (a bucket is
  * emitted exactly once, when the watermark passes its end) flowing
  * through the same rule projection, so a rule fires exactly once per
  * closed (entity, bucket) — no flapping on late updates inside the
  * lateness horizon, which an update-mode stream would produce.
  *
  * State is the windowed aggregation's: O(entities × open windows),
  * independent of stream length. Firings are row-level upserted into
  * a notification store keyed by (entity, bucket, rule) — re-firing
  * after a checkpoint recovery replays idempotently.
  */
object TriggerStream {

  /** Firing stream: raw events → append-mode windowed rollup →
    * rule projection. Returns a streaming DataFrame of
    * `(entity_id, bucket, rule, severity, payload)`. */
  def fire(events: DataFrame, entityCol: String, tsCol: String, valueCol: String,
           rules: Seq[Trigger.Rule], windowLen: String, lateness: String): DataFrame =
    Trigger.evaluateRolled(rules, valueCol)(
      TrendStream.windowedRollup(events, entityCol, tsCol, valueCol, windowLen, lateness))

  /** Maintenance muting on the FIRING STREAM — the streaming twin of
    * `Trigger.applyMaintenance`. The window table is DECLARED
    * maintenance (O(windows) rows, static for the stream's life), so
    * it collapses to a literal struct array at stream build and
    * muting becomes a pure codegen'd projection: no stream-static
    * join, no streaming aggregation, append semantics and the
    * exactly-once upsert path untouched. Matches the batch operator
    * bit-for-bit (spec-asserted); re-declare windows by restarting
    * the stream (the daemon cadence the reference's trigger loop
    * assumes). NULL entity windows are refused like the batch side. */
  def withMaintenance(fired: DataFrame, windows: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    // the SHARED validator (Trigger.checkedWindows) casts the window
    // table to the firing stream's entity type and refuses NULL /
    // uncastable / lossy ids — one contract, enforced identically on
    // the batch and streaming twins (the r13 lossy-id fix landed only
    // here until r14)
    val rows = graft.operators.Trigger.checkedWindows(
      fired.schema("entity_id").dataType, windows)
    if (rows.isEmpty) fired.withColumn("muted", lit(0L))
    else {
      val arr = array(rows.map { r =>
        struct(lit(r.get(0)).as("e"),
          lit(r.getTimestamp(1)).as("f"), lit(r.getTimestamp(2)).as("t"))
      }.toIndexedSeq: _*)
      fired.withColumn("muted",
        when(exists(arr, w => w("e") === col("entity_id") &&
          col("bucket") >= w("f") && col("bucket") < w("t")), lit(1L))
          .otherwise(lit(0L)))
    }
  }

  /** Sink the firing stream into a notification store. */
  def toStore(fired: DataFrame, storePath: String, checkpointDir: String): StreamingQuery =
    fired.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          TrendStoreWriter.upsert(batch.sparkSession, storePath, batch,
            keyCols = Seq("entity_id", "bucket", "rule"))
      }
      .start()
}
