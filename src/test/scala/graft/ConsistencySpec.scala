package graft

import org.apache.spark.sql.functions._
import graft.operators.{AttributeStore, Trigger, TrendStore}
import graft.sources.TableCatalog

/** CROSS-OPERATOR invariants on the real sf0.001 tables — a second,
  * independent correctness net beside the DuckDB twins: two operators
  * that answer overlapping questions must AGREE on the overlap, by
  * algebra, not by both happening to match their own oracle. A
  * refactor that breaks one operator's semantics while keeping its
  * oracle in sync (the oracle-drift failure mode generated twins
  * can't catch) trips these.
  */
class ConsistencySpec extends SparkSpec {

  import graft.SparkSpec.spark.implicits._

  private lazy val ev = TableCatalog(spark, sf).events

  test("a12 transitions FROM a value == a11 completed holds OF that value") {
    // every completed hold of value V ends in a change away from V,
    // so a11's n_completed per value must equal a12's transition
    // count grouped by from_value — exactly, not approximately
    val dwell = AttributeStore.valueDwell(ev, col("user_id"), col("ts"),
        col("event_id"), col("event_type"))
      .select(col("value"), col("n_completed"))
    val trans = AttributeStore.transitions(ev, col("user_id"), col("ts"),
        col("event_id"), col("event_type"))
      .groupBy(col("from_value").as("value"))
      .agg(sum(col("n_transitions")).as("n_from"))
    val joined = dwell.join(trans, Seq("value"), "full_outer")
      .filter(!(coalesce(col("n_completed"), lit(0L)) <=>
        coalesce(col("n_from"), lit(0L))))
    assert(joined.isEmpty,
      s"dwell/transition ledgers disagree:\n${joined.collect().mkString("\n")}")
  }

  private val rules = Seq(
    Trigger.Rule("hourly_value_surge", "hour",
      Seq(Trigger.Threshold("value", "sum", ">", 150.0)), "major"),
    Trigger.Rule("daily_value_level", "day",
      Seq(Trigger.Threshold("value", "avg", ">=", 60.0)), "warning"))

  test("n13 escalations filtered at the cutoff == n06 sustained firings") {
    // sustained suppression IS the escalation ladder's tail: the
    // firings with run_pos >= k must be exactly evaluateSustained(k)
    val k = 3
    val esc = Trigger.escalations(rules, Seq(1 -> "a", k -> "b"))(
        ev, col("user_id"), col("ts"))
      .filter(col("run_pos") >= k)
      .select(col("entity_id"), col("bucket"), col("rule"), col("severity"))
    val sus = Trigger.evaluateSustained(rules, minConsecutive = k)(
        ev, col("user_id"), col("ts"))
      .select(col("entity_id"), col("bucket"), col("rule"), col("severity"))
    assert(esc.exceptAll(sus).isEmpty && sus.exceptAll(esc).isEmpty,
      "escalation tail diverged from sustained suppression")
    assert(sus.count() > 0, "degenerate fixture: nothing sustained")
  }

  test("n13 max run position per (rule, entity) == n08 longest run") {
    val esc = Trigger.escalations(rules, Seq(1 -> "a"))(
        ev, col("user_id"), col("ts"))
      .groupBy(col("rule"), col("entity_id"))
      .agg(max(col("run_pos")).as("longest_esc"))
    val flap = Trigger.flapReport(rules)(ev, col("user_id"), col("ts"))
      .select(col("rule"), col("entity_id"), col("longest_run"))
    val joined = esc.join(flap, Seq("rule", "entity_id"), "full_outer")
      .filter(!(col("longest_esc") <=> col("longest_run")))
    assert(joined.isEmpty,
      s"run-length ledgers disagree:\n${joined.collect().mkString("\n")}")
  }

  test("t39 on a planted flat profile: amplitude exactly 0, pmr exactly 1; diurnal spike ranks right") {
    // entity 1: the same value every hour of two days (flat — every
    // hourly mean equals the grand mean, amplitude must be EXACTLY 0
    // in the denominator-cleared decimal arithmetic, not merely
    // small); entity 2: hour 8 carries a 10× spike
    val rows = (for {
      d <- 1 to 2; h <- 0 until 24
      (e, v) <- Seq((1L, 5.0), (2L, if (h == 8) 50.0 else 5.0))
    } yield (e, f"2024-01-0$d $h%02d:30:00", v))
      .toDF("entity_id", "ts_s", "v")
      .withColumn("bucket", date_trunc("hour", col("ts_s").cast("timestamp")))
      .groupBy(col("entity_id"), col("bucket"))
      .agg(sum(col("v").cast("decimal(18,4)")).cast("decimal(18,4)").as("sd"))
    val got = TrendStore.seasonalityStrength(rows)
      .collect().map(r => r.getAs[Long]("entity_id") -> r).toMap
    assert(got(1L).getAs[Double]("amplitude") === 0.0)
    assert(got(1L).getAs[Double]("pmr") === 1.0)
    assert(got(1L).getAs[Long]("peak_hour") === 0L) // tie → earliest hour
    assert(got(2L).getAs[Long]("peak_hour") === 8L)
    assert(got(2L).getAs[Double]("amplitude") > 0.2)
    assert(got(2L).getAs[Double]("pmr") > 5.0)
  }

  test("t40 top movers against a brute-force rank of the same daily series") {
    val daily = TrendStore.rollup(ev, col("user_id"), col("ts"), col("value"), "day")
      .select(col("entity_id"), col("bucket"),
        col("sum_dec").cast("decimal(18,4)").as("sd"))
    val got = TrendStore.topMovers(daily, k = 3)
      .select(col("bucket"), col("rank"), col("entity_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("entity_id")).orderBy(col("bucket"))
    val brute = daily
      .withColumn("prev", lag(col("sd"), 1).over(w))
      .filter(col("prev").isNotNull)
      .withColumn("delta", col("sd") - col("prev"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("bucket"))
          .orderBy(abs(col("delta")).desc, col("entity_id"))).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("bucket"), col("rank"), col("entity_id"))
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty,
      "CollectMinK rank diverged from the window-rank derivation")
  }
}
