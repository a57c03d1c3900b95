package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.TrendStream

/** Sustained-rate drill for the streaming percentile rollup (VERDICT
  * r14 item #6): StreamingSpec proves pctlRollup's sketch MERGES
  * correctly across a handful of micro-batches; nothing previously
  * drove it at volume. This spec feeds 60 micro-batches (200 entities
  * × ~35 rows each, with late rows landing 90 minutes behind the
  * front inside the 2-hour lateness budget) through a MemoryStream
  * and asserts the two properties a long-running monitoring stream
  * lives or dies by:
  *
  *  1. BOUNDED STATE: the aggregation state carries one GK-sketch row
  *     per OPEN (entity, window) cell, and the watermark must evict
  *     closed cells — so numRowsTotal stays ≤ entities × the few
  *     windows inside the lateness horizon, never O(windows ever
  *     seen). An unbounded state store is the failure mode that kills
  *     a stream in week two, long after any correctness test passes.
  *  2. STABLE BATCH TIME: per-batch processing time on the BACK half
  *     of the run must not have grown superlinearly vs the front half
  *     (growing state or an accidental full-store rescan would show
  *     up here; generous 4× band because wall times on shared CI
  *     hardware are noisy).
  */
class StreamLoadSpec extends SparkSpec {

  test("pctlRollup sustains 60 micro-batches with late data: bounded state, stable batch time") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val entities = 200
    val batches = 60
    val stepMin = 10L // event-time advance per batch
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val rolled = TrendStream.pctlRollup(
      mem.toDF().toDF("user_id", "ts", "value"),
      "user_id", "ts", "value", "1 hour", "2 hours", ps = Seq(0.5, 0.95))
    val q = rolled.writeStream.outputMode("update")
      .format("noop").queryName("graft_pctl_load").start()

    val t0ms = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def rows(batch: Int): Seq[(Long, Timestamp, Double)] = {
      val front = t0ms + batch * stepMin * 60000L
      (0 until entities).flatMap { e =>
        // deterministic values; a third of the entities also send a
        // LATE row 90 minutes behind the front (inside the 2h budget)
        val onTime = Seq((e.toLong, new Timestamp(front), (batch * 37 + e) % 1000.0))
        val late =
          if (e % 3 == 0 && batch > 12)
            Seq((e.toLong, new Timestamp(front - 90 * 60000L), (batch * 17 + e) % 1000.0))
          else Seq.empty
        onTime ++ late
      }
    }

    val stateRows = Array.ofDim[Long](batches)
    val batchMs = Array.ofDim[Long](batches)
    try {
      for (b <- 0 until batches) {
        mem.addData(rows(b))
        q.processAllAvailable()
        val p = q.lastProgress
        stateRows(b) = p.stateOperators.headOption.map(_.numRowsTotal).getOrElse(-1L)
        batchMs(b) = Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(-1L)
      }
    } finally q.stop()

    // 1) bounded state. Lateness 2h + window 1h → at most ~4 hourly
    // windows can still accept data per entity; give slack for the
    // eviction lagging one watermark update behind.
    val bound = entities * 6L
    val maxState = stateRows.max
    info(s"state rows: max=$maxState final=${stateRows.last} bound=$bound")
    assert(maxState > 0, "progress must report state rows")
    assert(maxState <= bound,
      s"state store grew to $maxState rows (> $bound): watermark is not " +
        "evicting closed (entity, window) cells")
    // the run saw 10 hours of event time = 11 distinct windows; an
    // eviction-free store would hold entities × 11+ rows by the end
    assert(stateRows.last < entities * 11L,
      s"final state ${stateRows.last} looks like no eviction ever happened")

    // 2) stable batch time: compare medians of (post-warmup) front
    // half vs back half
    def median(xs: Seq[Long]): Long = {
      val s = xs.sorted; s(s.size / 2)
    }
    val front = median(batchMs.slice(5, 25).toSeq)
    val back = median(batchMs.slice(40, 60).toSeq)
    info(s"batch triggerExecution ms: front median=$front back median=$back")
    assert(back <= math.max(4 * front, front + 2000),
      s"batch time grew from ${front}ms to ${back}ms over 60 batches — " +
        "state or work per batch is growing with stream age")
  }
}
