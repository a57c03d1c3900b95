package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.functions._
import graft.operators.TrendStoreWriter

/** Runtime-filter evidence at the store layout — two more 100×-scale
  * mechanisms converted from claim to demonstration (the SkewSpec
  * posture):
  *
  *  1. DYNAMIC PARTITION PRUNING: graft's trend stores are
  *     day-partitioned parquet (TrendStoreWriter). A join against a
  *     dimension whose FILTER selects few days cannot prune
  *     statically (the days are only known at runtime), but Spark's
  *     DPP injects the dim's day set as a runtime partition filter —
  *     the spec asserts the scan carries a `dynamicpruning`
  *     expression AND that the scan's partitions-read metric equals
  *     the selected days, not the store's. At 100 TB this is the
  *     difference between scanning a year and scanning a weekend.
  *
  *  2. RUNTIME BLOOM-FILTER JOIN REDUCTION: a fact ⋈ filtered-dim
  *     join on a NON-partition key (no DPP possible) with broadcast
  *     disabled (the 100 TB posture — SkewSpec's rationale). Spark's
  *     InjectRuntimeFilter builds a bloom filter from the filtered
  *     dim and semi-reduces the fact scan BEFORE the shuffle — the
  *     spec asserts `might_contain` lands in the fact side of the
  *     plan and that the reduction is plan-only (results bit-equal
  *     to the filter-disabled run).
  *
  * Threshold scaling note (same as SkewSpec): the bloom-filter
  * application-side threshold is lowered so a ~MB test scan counts as
  * "large"; production keeps the 10 GB default and sees the identical
  * injection rule — the mechanism, not a size constant, is under test.
  */
class RuntimeFilterSpec extends SparkSpec {

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

  /** The final physical plan (descending through AQE's wrapper). */
  private def finalPlan(df: DataFrame) = df.queryExecution.executedPlan match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case p => p
  }

  /** Every node, descending through AQE query stages (whose wrapped
    * plans are not `children`) and reused exchanges. */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    p +: kids.flatMap(allNodes)
  }

  private def storeScans(df: DataFrame, path: String): Seq[FileSourceScanExec] =
    allNodes(finalPlan(df)).collect {
      case s: FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains(path)) => s
    }

  test("trend-store day partitions prune DYNAMICALLY through a dim join") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val store = s"$dir/store"
    // 30 days × 50 entities, one file-partition per day
    val rolled = spark.range(0, 30L * 50).select(
      (col("id") % 50).as("entity_id"),
      expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0, 24 * CAST(id / 50 AS INT), 0, 0)")
        .as("bucket"),
      (col("id") % 97).cast("double").as("value"))
    TrendStoreWriter.write(rolled, store)

    // a calendar dim; the released-day filter selects 2 of the 30 days
    val dim = spark.range(0, 30).select(
      expr("date'2024-01-01' + CAST(id AS INT)").as("p_date"),
      when(col("id").isin(6L, 7L), lit("release")).otherwise(lit("normal")).as("day_tag"))

    val q = spark.read.parquet(store)
      .join(dim.filter(col("day_tag") === "release"), "p_date")
      .groupBy(col("p_date")).agg(sum(col("value")).as("v"), count(lit(1)).as("n"))
    val rows = q.collect()

    assert(rows.length === 2 && rows.forall(_.getLong(2) === 50L))
    val scans = storeScans(q, store)
    assert(scans.nonEmpty, s"no store scan found:\n${finalPlan(q)}")
    val scan = scans.head
    assert(scan.partitionFilters.map(_.sql).mkString(",").contains("dynamicpruning"),
      s"scan carries no dynamic pruning filter:\n$scan")
    assert(scan.metrics("numPartitions").value === 2,
      s"DPP read ${scan.metrics("numPartitions").value} partitions, wanted 2")

    // control: DPP off → the same join scans all 30 day-partitions
    withConf("spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "false") {
      val q2 = spark.read.parquet(store)
        .join(dim.filter(col("day_tag") === "release"), "p_date")
        .groupBy(col("p_date")).agg(sum(col("value")).as("v"), count(lit(1)).as("n"))
      val rows2 = q2.collect()
      assert(rows2.map(_.toString).sorted.toSeq === rows.map(_.toString).sorted.toSeq,
        "pruning must be plan-only")
      val s2 = storeScans(q2, store).head
      assert(s2.metrics("numPartitions").value === 30,
        s"control read ${s2.metrics("numPartitions").value} partitions, wanted all 30")
    }
  }

  test("non-partition fact join gets a runtime bloom-filter semi-reduction; reduction is plan-only") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    val (factP, dimP) = (s"$dir/fact", s"$dir/dim")
    // fact keyed by entity (NOT the partition column — DPP can't help)
    spark.range(0, 200000).select(
      (col("id") % 2000).as("entity_id"),
      (col("id") % 1009).cast("double").as("value"))
      .write.parquet(factP)
    spark.range(0, 2000).select(
      col("id").as("entity_id"),
      when(col("id") % 40 === 0, lit("gold")).otherwise(lit("base")).as("tier"))
      .write.parquet(dimP)

    def q(): DataFrame =
      spark.read.parquet(factP)
        .join(spark.read.parquet(dimP).filter(col("tier") === "gold"), "entity_id")
        .groupBy(col("entity_id")).agg(sum(col("value")).as("v"))

    withConf(
      // the 100 TB posture: a vocabulary/registry-sized dim does not
      // broadcast, so the join shuffles — exactly where the bloom
      // filter pays (SkewSpec's same-conf rationale)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // scale the "large scan" rule to test-sized files (see scaladoc)
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val filtered = q()
      val got = filtered.collect().toSet
      val plan = finalPlan(filtered).toString
      assert(plan.contains("might_contain"),
        s"runtime bloom filter was not injected:\n$plan")

      withConf("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        val control = q()
        val expected = control.collect().toSet
        assert(!finalPlan(control).toString.contains("might_contain"))
        assert(got === expected,
          "bloom-filter reduction changed results — must be plan-only")
      }
    }
  }
}
