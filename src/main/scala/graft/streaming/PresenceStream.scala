package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous DATA-PRESENCE monitoring: alert when an entity STOPS
  * reporting — the check a Minerva deployment runs over its trend
  * stores (an entity that falls silent is an outage, and no windowed
  * aggregation can see it, because absence produces no rows). The
  * batch twin is `TrendStore.gaps` (which buckets are missing in
  * history); this is its forward-looking complement: fire once, as
  * soon as the event-time watermark passes `last_seen + horizon`.
  *
  * Shape: one tiny state record per entity (its last-seen event
  * time) with an EVENT-TIME timeout — no per-bucket state, no
  * windows, so state is O(entities) regardless of stream length or
  * granularity. An absence fires ONCE and clears the state; when the
  * entity resumes, the state re-arms, so a flapping feed produces
  * one absence per silence period, not one per bucket missed.
  */
object PresenceStream {

  case class Absence(entity_id: Long, last_seen: Timestamp)

  /** Absence stream: `(entity_id, last_seen)` rows, one per entity
    * per silence, emitted when the watermark passes
    * `last_seen + horizonSeconds`. `lateness` bounds how late events
    * may arrive (the watermark delay, e.g. "1 hour"). */
  def absences(spark: SparkSession, events: DataFrame,
               entityCol: String, tsCol: String,
               horizonSeconds: Long, lateness: String): Dataset[Absence] = {
    import spark.implicits._
    // watermark AFTER the projection: a cast/rename drops the
    // event-time tag, and event-time timeouts refuse to run untagged
    val src = events
      .select(col(entityCol).cast("long").as("_1"),
        col(tsCol).cast("timestamp").as("_2"))
      .withWatermark("_2", lateness)
      .as[(Long, Timestamp)]

    def fn(entity: Long, rows: Iterator[(Long, Timestamp)],
           state: GroupState[Long]): Iterator[Absence] = {
      if (state.hasTimedOut) {
        val last = state.get
        state.remove() // one-shot: resuming data re-creates the state
        Iterator.single(Absence(entity, new Timestamp(last)))
      } else {
        val newest = rows.map(_._2.getTime).max
        val last = math.max(state.getOption.getOrElse(Long.MinValue), newest)
        state.update(last)
        state.setTimeoutTimestamp(last + horizonSeconds * 1000L)
        Iterator.empty
      }
    }

    src.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
