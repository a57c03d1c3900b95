package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication: the streaming twin of
  * `Dedup.exact` for a continuous document feed (the harvest-time
  * "have we already ingested this content?" gate, reference:
  * minerva harvest's idempotent re-load behavior — here applied to
  * content rather than files).
  *
  * State is the set of content hashes seen within the watermark
  * horizon, and `dropDuplicatesWithinWatermark` evicts hashes older
  * than the allowed lateness — so state is O(distinct docs per
  * horizon), independent of stream length. That bound is the whole
  * design: an unbounded `dropDuplicates` on a 100 TB/day feed would
  * grow state forever, while a horizon matches the real-world
  * contract ("the same document re-sent within N hours is a retry,
  * after that it's a re-publication").
  */
object StreamDedup {

  /** First occurrence of each content hash within the watermark
    * horizon; later copies inside the horizon are dropped.
    *
    * @param docs     streaming DataFrame with `tsCol` and `textCol`
    * @param lateness watermark delay bounding both late data and the
    *                 dedup memory, e.g. "2 hours"
    */
  def firstSeen(docs: DataFrame, tsCol: String, textCol: String,
                lateness: String): DataFrame =
    docs
      .withColumn("content_hash", md5(col(textCol)))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("content_hash")
}
