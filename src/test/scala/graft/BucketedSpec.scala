package graft

import org.apache.spark.sql.functions._
import graft.operators.{AttributeStore, Bucketed, TrendStore}
import graft.sources.TableCatalog

class BucketedSpec extends SparkSpec {

  private lazy val ev = TableCatalog(spark, sf).events

  private def shufflesIn(df: org.apache.spark.sql.DataFrame): Int = {
    df.count() // materialize AQE stages so the final plan is real
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val here = p match {
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => 1
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
        case _ => 0
      }
      here + p.children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  test("co-bucketed stores join with ZERO exchanges, matching the shuffled join") {
    val base = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    // two BIG sides sharing the entity key: an hourly rollup and the
    // per-entity current attribute snapshot
    val hourly = TrendStore.rollup(ev, col("user_id"), col("ts"), col("value"), "hour")
      .select(col("entity_id"), col("bucket"), col("cnt"),
        col("sum_dec").cast("double").as("s"))
    val attrs = AttributeStore.current(ev, col("user_id"), col("ts"), col("event_id"))
      .select(col("user_id").as("entity_id"), col("event_type").as("current_type"))
    Bucketed.write(hourly, s"$base/hourly", "g_bkt_hourly", "entity_id", 8)
    Bucketed.write(attrs, s"$base/attrs", "g_bkt_attrs", "entity_id", 8)

    // disable auto-broadcast for the plan asserts: at spec scale AQE
    // would broadcast BOTH joins, proving nothing about bucketing —
    // the production case is two sides too big to broadcast.
    val bucketed = Bucketed.table(spark, "g_bkt_hourly")
      .join(Bucketed.table(spark, "g_bkt_attrs"), "entity_id")
    val plain = spark.read.parquet(s"$base/hourly")
      .join(spark.read.parquet(s"$base/attrs"), "entity_id")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      assert(shufflesIn(bucketed) === 0,
        s"expected a shuffle-free co-located join:\n${bucketed.queryExecution.executedPlan}")
      assert(shufflesIn(plain) > 0, "control: the unbucketed join should shuffle")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert(bucketed.exceptAll(plain).isEmpty && plain.exceptAll(bucketed).isEmpty)
  }

  test("register adopts an existing bucketed directory without rewriting it") {
    val base = java.nio.file.Files.createTempDirectory("graft_bucketed_reg").toString
    val hourly = TrendStore.rollup(ev, col("user_id"), col("ts"), col("value"), "hour")
      .select(col("entity_id"), col("cnt"))
    Bucketed.write(hourly, s"$base/h", "g_bkt_orig", "entity_id", 4)
    // a "new session" adopting the directory: metadata-only register
    Bucketed.register(spark, s"$base/h", "g_bkt_adopted", "entity_id", 4,
      "entity_id BIGINT, cnt BIGINT")
    val joined = Bucketed.table(spark, "g_bkt_adopted")
      .join(Bucketed.table(spark, "g_bkt_orig"), "entity_id")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try assert(shufflesIn(joined) === 0,
      s"adopted table lost its bucket layout:\n${joined.queryExecution.executedPlan}")
    finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert(Bucketed.table(spark, "g_bkt_adopted").count() === hourly.count())
  }
}
