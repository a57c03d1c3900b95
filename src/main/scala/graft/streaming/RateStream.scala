package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous counter→rate derivation — the streaming twin of
  * `TrendStore.counterRate` (Minerva's counter semantics: rates are
  * deltas between consecutive buckets over the ACTUAL seconds
  * between them; a counter reset — negative delta — yields None).
  *
  * Consumes a stream of CLOSED buckets (e.g. the append-mode,
  * watermark-finalized `TrendStream.windowedRollup`) and keeps ONE
  * small state record per entity: the last closed (bucket, sum).
  * Each newly closed bucket emits its delta against the previous one
  * and a per-second rate; the first bucket per entity emits None
  * (the batch twin's NULL). Buckets inside a micro-batch are folded
  * in bucket order, and a bucket at-or-before the stored one is
  * ignored — replaying a batch after checkpoint recovery re-emits
  * nothing, so the output is append-idempotent. State is
  * O(entities), independent of stream length.
  */
object RateStream {

  case class Bucket(entity_id: Long, bucket: Timestamp, sum_value: Double)
  case class Last(bucketMs: Long, sum: Double)
  case class Rate(entity_id: Long, bucket: Timestamp, sum_value: Double,
                  delta: Option[Double], rate_per_s: Option[Double])

  def rates(spark: SparkSession, closed: Dataset[Bucket]): Dataset[Rate] = {
    import spark.implicits._

    def fn(id: Long, rows: Iterator[Bucket],
           state: GroupState[Last]): Iterator[Rate] = {
      val sorted = rows.toSeq.sortBy(_.bucket.getTime)
      var st = state.getOption.orNull
      val out = scala.collection.mutable.ArrayBuffer.empty[Rate]
      sorted.foreach { b =>
        val t = b.bucket.getTime
        if (st == null) {
          out += Rate(id, b.bucket, b.sum_value, None, None)
          st = Last(t, b.sum_value)
        } else if (t > st.bucketMs) {
          val d = b.sum_value - st.sum
          val gapS = (t - st.bucketMs) / 1000.0
          if (d < 0) // counter reset: true increment unknown
            out += Rate(id, b.bucket, b.sum_value, None, None)
          else
            out += Rate(id, b.bucket, b.sum_value, Some(d), Some(d / gapS))
          st = Last(t, b.sum_value)
        } // t <= stored bucket: replayed or duplicate — emit nothing
      }
      if (st != null) state.update(st)
      out.iterator
    }

    closed.groupByKey(_.entity_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
