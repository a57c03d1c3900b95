package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._
import graft.operators.TrendStore

/** Adaptive-execution evidence — two more 100×-scale mechanisms
  * converted from claim to demonstration (the SkewSpec posture;
  * SkewSpec covers AQE's skew-join split, RuntimeFilterSpec covers
  * DPP + runtime bloom filters — this closes the AQE family):
  *
  *  1. RUNTIME BROADCAST CONVERSION: a registry ⋈ fact join whose dim
  *     side only becomes small AFTER a selective runtime filter.
  *     Static planning cannot see that (file-size stats say "big") and
  *     plans a sort-merge join; AQE measures the finished dim stage
  *     and rewrites the join to a broadcast-hash join at runtime. At
  *     100 TB this is the difference between shuffling the fact table
  *     and shipping a few MB — without hand-tuning a threshold per
  *     query. The conversion is asserted ON (BHJ in the final adaptive
  *     plan) and OFF under the disabled control (SMJ stays), results
  *     bit-equal.
  *
  *  2. SHUFFLE-PARTITION COALESCING: graft pins
  *     spark.sql.shuffle.partitions=32 for the 32-core harness, but a
  *     LATE aggregation stage over a few output keys would leave 31
  *     near-empty reducers running their fixed overhead. AQE coalesces
  *     the post-shuffle partitions to match the actual bytes — the
  *     spec asserts the AQEShuffleRead carries FEWER than the
  *     configured partitions on a rollup's tiny day, and that the
  *     coalesced plan's result is bit-equal to the control.
  *
  * Threshold scaling note (as in SkewSpec/RuntimeFilterSpec): the
  * adaptive broadcast threshold is raised so a ~KB test dim counts as
  * broadcastable after its filter; production keeps the defaults and
  * sees the identical AQE rules — the mechanism, not a size constant,
  * is under test.
  */
class AqeSpec extends SparkSpec {

  import graft.SparkSpec.spark.implicits._

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def finalPlan(df: DataFrame): SparkPlan = df.queryExecution.executedPlan match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case p => p
  }

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: kids.flatMap(allNodes)
  }

  test("AQE converts the filtered-registry join to broadcast at runtime; control keeps SMJ") {
    val dir = java.nio.file.Files.createTempDirectory("graft_aqe").toString
    // a "registry" big enough that static size stats refuse to
    // broadcast it, of which a runtime filter keeps 3 rows
    (0L until 20000L).map(i => (i, s"dn-$i", s"type-${i % 5}"))
      .toDF("entity_id", "dn", "kind")
      .write.parquet(s"$dir/registry")
    (0L until 50000L).map(i => (i % 20000L, i.toDouble))
      .toDF("entity_id", "v")
      .write.parquet(s"$dir/fact")
    val registry = spark.read.parquet(s"$dir/registry")
    val fact = spark.read.parquet(s"$dir/fact")
    def q(): DataFrame = fact
      .join(registry.filter(col("dn").isin("dn-17", "dn-42", "dn-99")), "entity_id")
      .groupBy(col("dn")).agg(sum(col("v")).as("sv"))

    var expected: Array[String] = null
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // static: never
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "4MB") { // runtime: convert
      val df = q()
      expected = df.collect().map(_.toString).sorted
      val nodes = allNodes(finalPlan(df))
      assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
        s"AQE did not convert to broadcast:\n${finalPlan(df)}")
      assert(!nodes.exists(_.isInstanceOf[SortMergeJoinExec]))
    }
    // control: runtime conversion disabled → the static SMJ survives,
    // results bit-equal (the mechanism changes cost, never answers)
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val df = q()
      val got = df.collect().map(_.toString).sorted
      assert(got === expected)
      val nodes = allNodes(finalPlan(df))
      assert(nodes.exists(_.isInstanceOf[SortMergeJoinExec]),
        s"control plan unexpectedly broadcast:\n${finalPlan(df)}")
    }
  }

  test("AQE coalesces a tiny rollup's 32 shuffle partitions down to the data") {
    // one day of one entity: the rollup's shuffle carries a few KB —
    // 32 reducers would be 31 empty ones at the configured
    // spark.sql.shuffle.partitions=32
    val ev = (0 until 24).map(h => (1L, f"2024-03-01 $h%02d:00:00", h.toDouble))
      .toDF("entity_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val rolled = TrendStore.rollup(ev, col("entity_id"), col("ts"), col("value"), "hour")
    val expected = TrendStore.present(rolled).collect().map(_.toString).sorted

    val df = TrendStore.present(
      TrendStore.rollup(ev, col("entity_id"), col("ts"), col("value"), "hour"))
    val got = df.collect().map(_.toString).sorted
    assert(got === expected)
    val reads = allNodes(finalPlan(df)).collect { case r: AQEShuffleReadExec => r }
    assert(reads.nonEmpty, s"no AQEShuffleRead in:\n${finalPlan(df)}")
    val parts = reads.map(_.partitionSpecs.length).min
    val configured = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(parts < configured,
      s"AQE did not coalesce: $parts partitions vs configured $configured")
  }
}
