package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization: group an event stream into per-entity sessions
  * split by inactivity gaps — the custom-state streaming operator
  * (Minerva has no direct equivalent; this is the LLM-pipeline /
  * clickstream shape Structured Streaming's `flatMapGroupsWithState`
  * exists for).
  *
  * Also provides the batch twin (`sessionsBatch`): one window over
  * `(entity, ts)` with a gap-flag running sum — the scalable way to
  * sessionize historical data (single shuffle, no state store).
  */
object Sessionize {

  case class Ev(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long, sum_value: Double)

  /** Streaming sessionizer: emits a session when the inactivity gap
    * passes `gapMs` (event-time driven within each micro-batch, state
    * carried across batches). State is one small record per active
    * entity. */
  def sessions(spark: SparkSession, events: Dataset[Ev], gapMs: Long): Dataset[Session] = {
    import spark.implicits._

    def fn(userId: Long, evs: Iterator[Ev],
           state: GroupState[SessionState]): Iterator[Session] = {
      val sorted = evs.toSeq.sortBy(_.ts.getTime)
      var st = state.getOption.orNull
      val out = scala.collection.mutable.ArrayBuffer.empty[Session]
      sorted.foreach { e =>
        val t = e.ts.getTime
        if (st == null) st = SessionState(t, t, 1, e.value)
        else if (t - st.last > gapMs) {
          out += Session(userId, new Timestamp(st.start), new Timestamp(st.last), st.n, st.sum)
          st = SessionState(t, t, 1, e.value)
        } else st = st.copy(last = t, n = st.n + 1, sum = st.sum + e.value)
      }
      if (st != null) state.update(st) else state.remove()
      out.iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Batch sessionization: gap-flag + running sum assigns session ids
    * in one pass — the 100 TB shape (single shuffle on the entity
    * key, no driver involvement, no state store). */
  def sessionsBatch(events: Dataset[Ev], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.toDF()
      .withColumn("__gap",
        when(col("ts").cast("double") * 1000 -
          lag(col("ts"), 1).over(w).cast("double") * 1000 > gapMs, 1L)
          .otherwise(lit(0L)))
      .withColumn("__sid", sum(col("__gap")).over(wRun))
      .groupBy(col("user_id"), col("__sid"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("sum_value"))
      .as[Session]
  }
}
