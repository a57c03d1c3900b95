package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Runtime check for the ONE shuffle budget that rests on an AQE
  * runtime behavior rather than plan shape (VERDICT r14 item #5):
  * n11's plan declares the (entity, bucket, rule) cell rollup 3
  * times — once under the totals agg and once under each self-join
  * side — and its budget of 16 exchanges is only honest if AQE's
  * exchange-reuse cache executes that rollup ONCE and wires the other
  * two declarations to the materialized stage. ShuffleBudgetSpec pins
  * the declared count; this spec pins the MOVEMENT:
  *
  *  - the post-execution adaptive plan must contain ReusedExchange
  *    nodes (AQE only rewrites to ReusedExchange when the stage was
  *    served from the materialization cache, so this is runtime
  *    truth, not static shape);
  *  - the number of shuffle-WRITE stage executions observed by a
  *    SparkListener during the run must be strictly below the
  *    declared exchange count — i.e. some declared exchanges never
  *    ran a map stage of their own.
  */
class StageReuseSpec extends SparkSpec {

  test("n11's declared-3x cell rollup executes once (AQE exchange reuse at runtime)") {
    val shuffleWriteStages = new AtomicInteger(0)
    val allStages = new AtomicInteger(0)
    // Suites run in PARALLEL in one JVM, so a global stage count
    // would absorb other suites' work — scope to this query's jobs
    // via a job group (JobStart events carry the group + stage ids).
    val group = "graft-stage-reuse-drill"
    val myStages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val listener = new SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val g = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
        if (g.contains(group)) js.stageIds.foreach(i => myStages.add(i))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (myStages.contains(sc.stageInfo.stageId)) {
          allStages.incrementAndGet()
          val w = sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten
          if (w > 0) shuffleWriteStages.incrementAndGet()
        }
    }
    spark.sparkContext.addSparkListener(listener)
    // Pin the SMJ self-join path: at spec scale AQE sometimes
    // broadcast-converts the rollup joins instead (runtime stats say
    // the sides are tiny), and then there is no exchange to reuse —
    // but the budget-16 claim lives at 100 TB, where the cell rollup
    // NEVER broadcasts and exchange reuse is the defense. Disable
    // broadcast for this one query so the spec exercises that regime.
    val prevStatic = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // getOption still type-validates an unset bytes conf's fallback,
    // so probe via Try — unset means "inherit the static threshold"
    val prevAqe = scala.util.Try(
        spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold"))
      .toOption.filter(_ != null)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    // Suites share one session AND one cache manager, and run in
    // parallel: TrendSpec caches the events read, and once that
    // InMemoryRelation exists the cache manager rewrites n11's scans
    // too — each branch then pushes different runtime not-null
    // filters into its InMemoryTableScan, the exchange subtrees stop
    // canonicalizing equal, and reuse legitimately disappears. That
    // is a spec-environment artifact, not the deployment shape, so
    // this spec reads a private COPY of events that no cached plan
    // can match.
    val privDir = java.nio.file.Files.createTempDirectory("graft_reuse").toString
    val src = java.nio.file.Paths.get(s"$sf/events.parquet")
    java.nio.file.Files.copy(src,
      java.nio.file.Paths.get(s"$privDir/events.parquet"))
    try {
      // collect() (not count()) so THIS df's adaptive plan is the one
      // that finalizes — count() builds a separate query execution
      val df = SparkEntry.queries("n11_alert_correlation")(spark, privDir)
      spark.sparkContext.setJobGroup(group, "n11 exchange-reuse drill")
      try df.collect() finally spark.sparkContext.clearJobGroup()
      // drain the listener bus: poll until the stage counter is stable
      var last = -1
      var spins = 0
      while (allStages.get() != last && spins < 40) {
        last = allStages.get(); spins += 1; Thread.sleep(250)
      }
      // AdaptiveSparkPlanExec.toString prints BOTH the final and the
      // initial plan — count nodes in the final section only
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val reused = "ReusedExchange".r.findAllIn(plan).size
      // every ReusedExchange node also contains the substring
      // "Exchange", so the executed-exchange count subtracts it
      val executedExchanges = "Exchange".r.findAllIn(plan).size - 2 * reused
      info(s"final adaptive plan: ${executedExchanges + reused} exchange " +
        s"declaration(s), $reused reused; " +
        s"${shuffleWriteStages.get()} shuffle-write stage(s) executed")
      assert(plan.contains("isFinalPlan=true"),
        "the adaptive plan must have finalized before reading reuse off it")
      assert(reused >= 2,
        "the cell rollup is declared 3x — at least its 2nd and 3rd " +
          s"declarations must be ReusedExchange in the final plan:\n$plan")
      assert(shuffleWriteStages.get() <= executedExchanges,
        s"${shuffleWriteStages.get()} shuffle-write stages ran but only " +
          s"$executedExchanges exchanges remain after reuse — a reused " +
          "exchange must not re-execute its map stage")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevStatic)
      prevAqe match {
        case Some(v) =>
          spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None =>
          spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }
}
