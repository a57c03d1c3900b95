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
