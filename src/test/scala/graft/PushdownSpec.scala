package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.functions._

/** Scan-hygiene evidence: predicate pushdown and column pruning
  * asserted ON THE SCAN NODE, not assumed — the two cheapest 100×
  * levers there are. At 100 TB a scan that reads every column for a
  * two-column aggregation, or filters AFTER materializing rows
  * instead of inside the parquet reader, multiplies I/O by the table
  * width / the filter selectivity while passing every correctness
  * check. Each assertion inspects `FileSourceScanExec` directly:
  * `pushedDownFilters` (what reaches the parquet row-group/page
  * machinery) and `requiredSchema` (what the columnar reader
  * materializes).
  *
  * Complements the rest of the plan-evidence family: QueriesSpec
  * (no product joins, globally), RuntimeFilterSpec (DPP + bloom,
  * runtime), SkewSpec (AQE skew split), AqeSpec (runtime broadcast +
  * coalesce), LayoutSpec/ClusteredWriteSpec (footer-stat pruning).
  */
class PushdownSpec extends SparkSpec with org.scalatest.BeforeAndAfterEach {

  // Other suites lazily .cache() catalog tables (DedupSpec/TrendSpec);
  // the shared cache manager then substitutes InMemoryRelation into
  // ANY later plan with a matching fragment, replacing the
  // FileSourceScanExec these assertions inspect. Scan hygiene must be
  // judged on the real reader, so drop cached entries first (later
  // suites that still hold the cached DataFrames just recompute).
  override protected def beforeEach(): Unit = {
    spark.sharedState.cacheManager.clearCache()
    super.beforeEach()
  }

  /** The final physical plan (descending through AQE's wrapper). */
  private def finalPlan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    p +: kids.flatMap(allNodes)
  }

  private def scansOf(df: DataFrame, table: String): Seq[FileSourceScanExec] =
    allNodes(finalPlan(df)).collect {
      case s: FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains(table)) => s
    }

  test("q06: selective predicates reach the lineitem parquet reader; only 4 of 11 columns read") {
    val df = SparkEntry.queries("q06_selective_filter")(spark, sf)
    df.collect() // materialize so AQE settles the final plan
    val scans = scansOf(df, "lineitem")
    assert(scans.nonEmpty, s"no lineitem scan:\n${finalPlan(df)}")
    scans.foreach { s =>
      val pushed = s.metadata.getOrElse("PushedFilters", "")
      // every filtered column's predicate lands in the reader — parquet
      // skips whole row groups on their min/max stats
      Seq("l_shipdate", "l_discount", "l_quantity").foreach { c =>
        assert(pushed.contains(c), s"$c predicate not pushed: $pushed")
      }
      // the reader materializes ONLY the aggregation's inputs
      assert(s.requiredSchema.fieldNames.toSet ===
        Set("l_shipdate", "l_discount", "l_quantity", "l_extendedprice"),
        s"scan reads more than it needs: ${s.requiredSchema.fieldNames.mkString(", ")}")
    }
  }

  test("d14: the documents scan reads ONLY doc_id — the fat text column never leaves parquet") {
    val df = SparkEntry.queries("d14_split")(spark, sf)
    df.collect()
    val scans = scansOf(df, "documents")
    assert(scans.nonEmpty, s"no documents scan:\n${finalPlan(df)}")
    scans.foreach { s =>
      assert(s.requiredSchema.fieldNames.toSet === Set("doc_id"),
        s"split reads more than doc_id: ${s.requiredSchema.fieldNames.mkString(", ")}")
    }
  }

  test("t01: the events rollup reads its 3 inputs, never props/event_type, through the schema-adaptive reader") {
    // TableCatalog.events wraps the scan in a normalizing projection
    // (the ts-encoding branch); pruning must still reach THROUGH it
    val df = SparkEntry.queries("t01_rollup_hour")(spark, sf)
    df.collect()
    val scans = scansOf(df, "events")
    assert(scans.nonEmpty, s"no events scan:\n${finalPlan(df)}")
    scans.foreach { s =>
      val read = s.requiredSchema.fieldNames.toSet
      assert(!read.contains("props") && !read.contains("event_type"),
        s"rollup reads unneeded events columns: ${read.mkString(", ")}")
      assert(read.contains("user_id") && read.contains("value"),
        s"rollup inputs missing from the scan: ${read.mkString(", ")}")
    }
  }

  test("a04-style as-of filter pushes its timestamp bound into the events reader") {
    val df = SparkEntry.queries("a04_attr_at_time")(spark, sf)
    df.collect()
    val scans = scansOf(df, "events")
    assert(scans.nonEmpty, s"no events scan:\n${finalPlan(df)}")
    // the `ts <= at` RANGE filter itself must reach the reader — an
    // IsNotNull-only match is vacuous (almost any filter pushes one).
    // The prefix match covers both physical encodings: instant/NTZ
    // images push LessThanOrEqual(ts,…); a nanos-encoded image pushes
    // the bound on the raw long column (ts before the ts_ns rename).
    val pushed = scans.map(_.metadata.getOrElse("PushedFilters", "")).mkString(" ")
    assert(pushed.contains("LessThanOrEqual(ts"),
      s"as-of range bound vanished before the reader: $pushed")
  }
}
