package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Fx

/** Trend-store operators: Minerva's time-series core, Spark-first.
  *
  * Reference semantics (minerva trend stores): metrics keyed by
  * `(entity_id, timestamp)` at a granularity; *time aggregation*
  * rolls a store to a coarser granularity, *entity aggregation* rolls
  * metrics up a relation to parent entities.
  *
  * Scale notes: `rollup` is a single hash aggregation — Spark plans a
  * map-side partial agg, so the shuffle carries (entity, bucket)
  * partials, not raw rows. `reRollup` consumes those partials, so a
  * 15m→1h→1d chain scans the raw data exactly once. Entity rollup
  * broadcasts the relation (entity registries are small next to
  * trend data).
  */
object TrendStore {

  private val DurationGran = "^(\\d+)\\s*(s|m|h|d)?$".r

  /** Fixed step width in seconds for grid granularities — the ones
    * where "consecutive buckets" is a constant epoch stride. Calendar
    * months/quarters/years have no fixed width → None. */
  def stepSeconds(granularity: String): Option[Long] =
    granularity.trim.toLowerCase match {
      case "second" => Some(1L)
      case "minute" => Some(60L)
      case "hour"   => Some(3600L)
      case "day"    => Some(86400L)
      case "week"   => Some(604800L)
      case DurationGran(n, unit) =>
        val mult = Option(unit).getOrElse("s") match {
          case "s" => 1L; case "m" => 60L; case "h" => 3600L; case "d" => 86400L
        }
        Some(n.toLong * mult)
      case _ => None
    }

  /** Bucket expression for any Minerva granularity: calendar units
    * truncate (`date_trunc`), duration forms ("900", "15m", "1h")
    * floor the epoch onto the grid (the reference's native
    * seconds-based granularities), "raw" keeps the timestamp. One
    * codegen'd expression either way. */
  def bucket(ts: Column, granularity: String): Column =
    granularity.trim.toLowerCase match {
      case "" | "raw" => ts
      case g @ ("second" | "minute" | "hour" | "day" | "week" | "month" |
                "quarter" | "year") => date_trunc(g, ts)
      case DurationGran(n, unit) =>
        val mult = Option(unit).getOrElse("s") match {
          case "s" => 1L; case "m" => 60L; case "h" => 3600L; case "d" => 86400L
        }
        val g = n.toLong * mult
        timestamp_seconds(floor(unix_timestamp(ts) / g) * g)
      case g => throw new IllegalArgumentException(s"unknown granularity: $g")
    }

  /** Sum/count/max partials for one value column, bucketed by
    * `granularity` (any `date_trunc` unit). Keeps the exact DECIMAL
    * sum so downstream re-aggregation stays exact. */
  def rollup(trend: DataFrame, entity: Column, ts: Column, value: Column,
             granularity: String): DataFrame =
    trend.groupBy(entity.as("entity_id"),
        date_trunc(granularity, ts).as("bucket"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(Fx.dec(value)).as("sum_dec"),
        max(value).as("max_value"))

  /** Exact interpolated percentile rollup — the monitoring "p95 per
    * entity per day" question (the reference's aggregate surface is
    * sum/avg/max; percentile dashboards sit on top of the same trend
    * stores). `percentile` is a single-pass typed aggregate: each
    * group's values collect into ONE aggregation buffer keyed by
    * (entity, bucket) — the same shuffle as [[rollup]], no window, no
    * global sort. Groups here are entity×bucket-bounded (a day of one
    * entity's samples), so the buffer never scales with the store; an
    * unbounded-group deployment switches to approx_percentile (t20)
    * for fixed memory. Results round to 4 decimals, which is exact
    * for the interpolation of 2-decimal inputs on any IEEE engine. */
  def percentileRollup(trend: DataFrame, entity: Column, ts: Column,
                       value: Column, granularity: String,
                       ps: Seq[Double] = Seq(0.5, 0.95)): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      s"percentiles must lie in [0,1], got: $ps")
    require(ps.map(p => (p * 100).round).distinct.size == ps.size,
      s"percentile labels collide after rounding to integer percent: $ps")
    val aggs = count(lit(1)).as("cnt") +: ps.map(p =>
      round(expr(s"percentile(__pv, $p)"), 4)
        .as(s"p${(p * 100).round.toInt}"))
    trend.withColumn("__pv", value)
      .groupBy(entity.as("entity_id"), date_trunc(granularity, ts).as("bucket"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Grid stride for the gap-fill family: any fixed-width
    * granularity ("900", "15m", hour, week…) steps by its
    * [[stepSeconds]] width — the reference's native seconds-based
    * granularities gap-fill like the calendar ones — and the
    * variable-width calendar units step by their calendar interval
    * (`sequence` handles month arithmetic). Buckets produced by
    * [[bucket]]/[[rollupSeconds]] lie on the grid by construction,
    * so the generated sequence always hits the observed buckets. */
  private def gridStep(granularity: String): Column =
    stepSeconds(granularity) match {
      case Some(g) => expr(s"interval $g second")
      case None => granularity.trim.toLowerCase match {
        case "month"   => expr("interval 1 month")
        case "quarter" => expr("interval 3 month")
        case "year"    => expr("interval 1 year")
        case g => throw new IllegalArgumentException(s"gap-fill granularity: $g")
      }
    }

  /** Counter→rate derivation over a presented rollup (entity_id,
    * bucket, sum_value): delta to the previous bucket and a
    * per-second rate — Minerva's counter semantics, where trend
    * stores hold raw counter samples and rates are derived at query
    * time. One per-entity window: partitions are bucket-count
    * bounded, so nothing serializes globally at scale.
    *
    * Counter edge cases (RRD-style): the first bucket per entity has
    * no predecessor → NULL delta/rate; a NEGATIVE raw delta means the
    * counter reset between samples, so the true increment is unknown
    * → NULL delta/rate (never a huge negative rate); the rate divides
    * by the ACTUAL seconds between this bucket and the previous one,
    * so a gap in the series yields the average rate across the gap
    * instead of overstating it by gap/width. */
  def counterRate(rolledUp: DataFrame): DataFrame =
    counterRate(rolledUp, Seq("sum_value"))
      .withColumnRenamed("sum_value_delta", "delta")
      .withColumnRenamed("sum_value_rate_per_s", "rate_per_s")

  /** Wide variant: derive `<m>_delta` / `<m>_rate_per_s` for EVERY
    * metric column in one pass, so a wide trend-store part (t04 /
    * TrendStoreParts.readWide) feeds counter semantics directly —
    * no per-metric melt. All metrics share the single entity-keyed
    * window (Catalyst collapses the lag()s into one Window node),
    * so the cost is one shuffle regardless of metric-set width. */
  def counterRate(rolledUp: DataFrame, metricCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("entity_id")).orderBy(col("bucket"))
    // all lag()s in ONE projection → one Window node (interleaving
    // them with the derived arithmetic leaves a Project between
    // Window nodes that defeats CollapseWindow — plan-spec-asserted)
    val withLags = rolledUp.select(
      col("*") +:
        (lag(unix_timestamp(col("bucket")), 1).over(w).as("__prev_ts") +:
          metricCols.map(m => lag(col(m), 1).over(w).as(s"__prev_$m"))): _*)
    val gapS = (unix_timestamp(col("bucket")) - col("__prev_ts")).cast("double")
    metricCols.foldLeft(withLags) { (df, m) =>
      val rawDelta = col(m) - col(s"__prev_$m")
      df.withColumn(s"${m}_delta", when(rawDelta < 0, lit(null)).otherwise(rawDelta))
        // no rounding: IEEE double division of identical operands is
        // bit-identical on every engine, while round() implementations
        // differ in half-way handling (found as a real sf0.01 mismatch)
        .withColumn(s"${m}_rate_per_s", col(s"${m}_delta") / gapS)
    }.drop("__prev_ts").drop(metricCols.map(m => s"__prev_$m"): _*)
  }

  /** Gap-fill over a presented rollup (entity_id, bucket, sum_value):
    * expand each entity's observed [min, max] bucket range onto the
    * full granularity grid, then forward-fill missing buckets from
    * the last observed value (Minerva's gap filling for trend reads —
    * the query-side complement of the t05 gap *detector*). `filled`
    * flags synthesized rows.
    *
    * Shape: the grid explode is bounded by each entity's bucket span
    * (not the corpus), the grid⋈observed join and the forward-fill
    * window are both keyed on the entity, so the stages share one
    * partitioning and no global sort exists. last(ignoreNulls) over
    * rows-unbounded-preceding is the standard forward-fill window. */
  def gapFill(rolledUp: DataFrame, granularity: String): DataFrame =
    gapFill(rolledUp, granularity, Seq("sum_value"))

  /** Wide variant: forward-fill EVERY metric column in the same
    * single entity-partitioned window pass, so a wide trend-store
    * part (t04 / TrendStoreParts.readWide) gap-fills directly — no
    * per-metric melt. `filled` marks grid rows with no observed
    * store row; a metric that is NULL on an observed row (that
    * metric had no samples in the bucket) is still forward-filled
    * per metric. The N last() calls share one window spec, so
    * Catalyst collapses them into one Window node — one shuffle
    * regardless of metric-set width. */
  def gapFill(rolledUp: DataFrame, granularity: String,
              metricCols: Seq[String]): DataFrame = {
    val step = gridStep(granularity)
    val grid = rolledUp.groupBy(col("entity_id"))
      .agg(min(col("bucket")).as("__lo"), max(col("bucket")).as("__hi"))
      .select(col("entity_id"),
        explode(sequence(col("__lo"), col("__hi"), step)).as("bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("entity_id")).orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val joined = grid
      .join(rolledUp.withColumn("__obs", lit(true)), Seq("entity_id", "bucket"), "left")
      .withColumn("filled", col("__obs").isNull)
    metricCols.foldLeft(joined) { (df, m) =>
      df.withColumn(m, last(col(m), ignoreNulls = true).over(w))
    }.drop("__obs")
  }

  /** Linearly-INTERPOLATED gap fill — the other Minerva gap-filling
    * mode, complementing [[gapFill]]'s forward-fill: a missing bucket
    * takes `prev + (next − prev) · frac` where frac is the missing
    * bucket's time position between its observed neighbors. Leading
    * and trailing gaps have only one neighbor and stay NULL (no
    * extrapolation). Observed buckets pass through bit-exactly (their
    * frac is 0).
    *
    * Same scale shape as gapFill: per-entity grid explode, one
    * entity-keyed join, two entity-keyed window passes (backward +
    * forward neighbor in ONE Window node), one shared partitioning throughout.
    * Determinism: the interpolation is a fixed-op-order IEEE double
    * expression over identical operands — bit-identical on any
    * engine, no rounding needed; the frac denominator is guarded so
    * observed rows never divide 0/0. */
  def gapFillInterpolate(rolledUp: DataFrame, granularity: String): DataFrame =
    gapFillInterpolate(rolledUp, granularity, Seq("sum_value"))

  /** Wide variant: interpolate EVERY metric column in the same two
    * entity-partitioned window passes. Each metric has its OWN
    * observed-neighbor buckets (a metric NULL on an observed store
    * row is a gap for that metric, and its frac is anchored on the
    * buckets where *it* was observed, not where any metric was), so
    * a wide store interpolates exactly as N independent melts would
    * — at the cost of one plan, not N. All 4·N neighbor columns
    * share the two window specs → two Window nodes total. */
  def gapFillInterpolate(rolledUp: DataFrame, granularity: String,
                         metricCols: Seq[String]): DataFrame = {
    val step = gridStep(granularity)
    val grid = rolledUp.groupBy(col("entity_id"))
      .agg(min(col("bucket")).as("__lo"), max(col("bucket")).as("__hi"))
      .select(col("entity_id"),
        explode(sequence(col("__lo"), col("__hi"), step)).as("bucket"))
    val W = org.apache.spark.sql.expressions.Window
    val back = W.partitionBy(col("entity_id")).orderBy(col("bucket"))
      .rowsBetween(W.unboundedPreceding, 0)
    // The next-observed neighbor is a RUNNING frame over the bucket
    // ordered DESC, not a (current, unboundedFollowing) frame over
    // asc: the shrinking frame has no incremental executor —
    // UnboundedFollowingWindowFunctionFrame rescans the partition
    // remainder for EVERY row, O(rows²) per entity — while the desc
    // running frame is O(rows). last(ignoreNulls) scanning desc down
    // to the current row picks the non-null with the smallest
    // bucket ≥ current, exactly first(ignoreNulls) over the asc
    // forward frame (buckets are unique per entity after the grid
    // join). Costs a second sort order under the SAME entity
    // exchange; shuffle count is unchanged.
    val fwd = W.partitionBy(col("entity_id")).orderBy(col("bucket").desc)
      .rowsBetween(W.unboundedPreceding, 0)
    val joined = grid
      .join(rolledUp.withColumn("__obs", lit(true)), Seq("entity_id", "bucket"), "left")
      .withColumn("filled", col("__obs").isNull)
    // all 4·N neighbor columns in ONE projection → the two frames
    // yield exactly two Window nodes (CollapseWindow can't merge
    // across the Projects a per-metric foldLeft would interleave)
    val nbrCols = metricCols.flatMap { m =>
      val obsBucket = when(col(m).isNotNull, col("bucket"))
      Seq(
        last(col(m), ignoreNulls = true).over(back).as(s"__pv_$m"),
        last(obsBucket, ignoreNulls = true).over(back).as(s"__pb_$m"),
        last(col(m), ignoreNulls = true).over(fwd).as(s"__nv_$m"),
        last(obsBucket, ignoreNulls = true).over(fwd).as(s"__nb_$m"))
    }
    val withNbrs = joined.select(col("*") +: nbrCols: _*)
    metricCols.foldLeft(withNbrs) { (df, m) =>
      val (pv, pb, nv, nb) =
        (col(s"__pv_$m"), col(s"__pb_$m"), col(s"__nv_$m"), col(s"__nb_$m"))
      val frac = when(unix_timestamp(nb) === unix_timestamp(pb), lit(0.0))
        .otherwise(
          (unix_timestamp(col("bucket")) - unix_timestamp(pb)).cast("double") /
            (unix_timestamp(nb) - unix_timestamp(pb)).cast("double"))
      df.withColumn(m, pv + (nv - pv) * frac)
    }.drop("__obs")
      .drop(metricCols.flatMap(m =>
        Seq(s"__pv_$m", s"__pb_$m", s"__nv_$m", s"__nb_$m")): _*)
  }

  /** Z-score anomaly detection over a rollup (entity_id, bucket,
    * sd: decimal(18,4)): buckets whose value deviates ≥ `zMin`
    * standard deviations from the entity's own mean — the monitoring
    * analytic a Minerva deployment runs over its trend stores.
    *
    * Cross-engine determinism: the moments are DECIMAL-exact partial
    * sums (Σv and Σv² never touch float summation order), collapsed
    * to doubles only inside the final per-row formula, whose op
    * order is fixed — so z is bit-identical on any engine and the
    * threshold applies to the 6-decimal-rounded value. One window
    * shuffle on the entity key (no join back); entities with fewer
    * than `minBuckets` buckets or zero variance are skipped (the
    * variance is compared on the same double both engines compute). */
  /** Per-entity least-squares linear trend over a daily series +
    * next-day projection — the capacity-forecast question a
    * monitoring store answers ("at this growth, where is the KPI
    * tomorrow"). Input: (entity_id, bucket, sd) with `sd` a
    * decimal(18,4) daily total (the [[rollup]] sum).
    *
    * Cross-engine determinism (the [[anomalies]] discipline): x is
    * exact epoch-days, Σx/Σx² are exact longs, Σy/Σ(x·y) are DECIMAL
    * partial sums collapsed to doubles only inside the closed-form
    * slope/intercept formulas, whose op order is fixed — slope,
    * intercept and forecast are bit-identical on any engine before
    * the final 6-dp rounding. One shuffle on the entity key; state
    * per entity is five scalars, so the hot entity of SkewSpec's
    * shape costs map-side partials, never a value list. */
  def linearTrend(daily: DataFrame, minDays: Int = 7): DataFrame = {
    val g = daily
      .withColumn("__x", datediff(col("bucket"), lit("1970-01-01").cast("date")).cast("long"))
      .groupBy(col("entity_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).as("sx"),
        sum(col("__x") * col("__x")).as("sxx"),
        sum(col("sd")).cast("double").as("sy"),
        sum(col("__x") * col("sd")).cast("decimal(38,4)").cast("double").as("sxy"),
        max(col("__x")).as("mx"))
      .filter(col("n") >= minDays)
    g.withColumn("__slope",
        (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")))
      .withColumn("__icept", (col("sy") - col("__slope") * col("sx")) / col("n"))
      .select(col("entity_id"), col("n").as("n_days"),
        round(col("__slope"), 6).as("slope"),
        round(col("__icept"), 6).as("intercept"),
        round(col("__icept") + col("__slope") * (col("mx") + lit(1L)), 6)
          .as("forecast_next"))
  }

  /** Capacity horizon — the planning number behind [[linearTrend]]'s
    * projection: at the fitted growth rate, how many days until each
    * entity's daily KPI reaches `factor` × its current next-day
    * projection ("when does this cell hit double today's load").
    * NULL for entities that aren't growing (slope ≤ 0) or whose
    * projection is non-positive (no meaningful doubling time).
    *
    * Determinism: slope and forecast are [[linearTrend]]'s 6-dp-
    * rounded bit-identical values; the horizon is one exact multiply
    * and ONE unrounded IEEE division of them — bit-identical on any
    * engine. Same single entity-keyed moment shuffle as the trend
    * fit. */
  def capacityHorizon(daily: DataFrame, factor: Double = 2.0,
                      minDays: Int = 7): DataFrame = {
    require(factor > 1.0, s"capacityHorizon factor must exceed 1, got $factor")
    linearTrend(daily, minDays)
      .withColumn("days_to_factor",
        when(col("slope") > 0 && col("forecast_next") > 0,
          (lit(factor - 1.0) * col("forecast_next")) / col("slope")))
  }

  /** Contribution-share report: each child group's fraction of its
    * parent's total per bucket — the percent drill-down behind an
    * entity-rollup dashboard ("each nation's share of its region's
    * monthly revenue"; topContributors ranks, this apportions to
    * 100%). `groups` maps fact entities to their (child, parent)
    * groups — registry-sized, broadcast.
    *
    * Shape: broadcast groups ⋈ fact → ONE (parent, child, bucket)
    * DECIMAL partial-agg shuffle; the parent total is a window sum
    * over that cell table (partitions are children-per-parent sized,
    * never fact-sized). Determinism: both the child cell and the
    * parent total stay DECIMAL (order-free) until one double cast
    * each; the share is one IEEE division of those casts. */
  def contributionShare(fact: DataFrame, entityDn: Column, ts: Column,
                        granularity: String, groups: DataFrame,
                        value: Column): DataFrame = {
    // distinct: a doubled (entity, child, parent) row must not double
    // the entity's contribution (genuine multi-group membership keeps
    // its distinct rows and apportions into each group)
    val g = groups.select(col("entity_dn"), col("child"), col("parent")).distinct()
    val cells = fact
      .join(broadcast(g), entityDn === g("entity_dn"))
      .groupBy(col("parent"), col("child"), date_trunc(granularity, ts).as("bucket"))
      .agg(sum(Fx.dec(value)).as("__sum"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("parent"), col("bucket"))
    cells
      .withColumn("__total", sum(col("__sum")).over(w))
      .select(col("parent"), col("child"), col("bucket"),
        col("__sum").cast("double").as("child_value"),
        col("__total").cast("double").as("parent_value"),
        (col("__sum").cast("double") / col("__total").cast("double")).as("share"))
  }

  /** Busy-hour determination over a presented hourly rollup
    * `(entity_id, bucket, sd DECIMAL)`: each entity's hour-of-day
    * profile (average load per hour 0-23 across the whole span) and
    * its peak — the classic telecom dimensioning question Minerva
    * stores exist to answer ("cell X's busy hour is 17:00"). Ties
    * break to the earliest hour; determinism holds because the
    * profile averages are single IEEE divisions of DECIMAL-exact
    * sums (bit-identical cross-engine), so tie DETECTION agrees too.
    *
    * Shape: one (entity, hour-of-day) groupBy — map-side combinable,
    * O(entities × 24) result keys — then a rank window over ≤ 24
    * rows per entity sharing the entity key. Nothing re-reads the
    * hourly store. */
  /** TOP MOVERS — the fleet triage query behind every morning review:
    * for each day, the k entities whose KPI moved MOST (by absolute
    * day-over-day change), with the before/after values and the
    * signed delta. Rank order is (|Δ| desc, entity asc) on EXACT
    * decimals, bit-identical to the oracle's row_number.
    *
    * Shape: the lag rides one entity-keyed window (per-entity day
    * lists are bounded), then graft's CollectMinK bounds the per-day
    * rank at O(k) agg state with map-side partials — no per-day
    * window sorting the whole fleet on one reducer (the e08
    * discipline: a day partition holds EVERY entity, which is
    * exactly the skewed-window shape that dies at 100 TB). */
  def topMovers(daily: DataFrame, k: Int = 3): DataFrame = {
    require(k > 0, s"topMovers: k must be positive, got $k")
    import graft.functions.CollectMinK.collectMinK
    val we = Window.partitionBy(col("entity_id")).orderBy(col("bucket"))
    val d = daily
      .withColumn("__prev", lag(col("sd"), 1).over(we))
      .filter(col("__prev").isNotNull)
      .withColumn("__delta", col("sd") - col("__prev"))
    d.groupBy(col("bucket"))
      .agg(collectMinK(struct((-abs(col("__delta"))).as("nega"),
        col("entity_id").as("e"), col("sd").as("v"),
        col("__prev").as("p"), col("__delta").as("dl")), k).as("arr"))
      .select(col("bucket"), posexplode(col("arr")).as(Seq("pos", "m")))
      .select(col("bucket"), (col("pos") + 1).cast("long").as("rank"),
        col("m.e").as("entity_id"),
        col("m.v").cast("double").as("value"),
        col("m.p").cast("double").as("prev_value"),
        col("m.dl").cast("double").as("delta"))
  }

  /** SEASONALITY STRENGTH per entity — "does this KPI have a daily
    * shape at all, and how deep is it": over the hourly store's
    * hour-of-day profile (the same season table [[busyHour]] ranks),
    * the grand mean, the peak/trough hour-of-day means, the
    * peak-to-mean ratio, and the relative seasonal AMPLITUDE — the
    * bucket-weighted mean absolute deviation of the 24 hourly means
    * around the grand mean, relative to the grand mean. Amplitude 0 =
    * flat profile (gap-fill freely, alert on level); amplitude ≫ 0 =
    * strong diurnal shape (baseline per season, dimension for the
    * peak). Entities with a non-positive value mass report NULL
    * ratios rather than sign-flipped nonsense.
    *
    * Determinism: the amplitude is computed with denominators CLEARED
    * —  Σ_h n_h·|m_h − G|  =  Σ_h |N·s_h − n_h·S1| / N  — so every
    * sum/difference/product stays in exact DECIMAL arithmetic
    * (associative, order-free) and the only floating-point ops are
    * final single IEEE divisions of exact operands, bit-identical on
    * any engine. Per-hour means are single IEEE divisions of exact
    * operands, so peak/trough SELECTION (ties → earliest hour)
    * agrees cross-engine too.
    *
    * Shape: one (entity, hour-of-day) map-side-combinable groupBy →
    * O(entities × 24) season rows; the N/S1 totals ride entity
    * windows over THAT table and the final per-entity fold groups the
    * same ≤ 24 rows — one shuffle family on the entity key, nothing
    * re-reads the hourly store. */
  def seasonalityStrength(rolledUp: DataFrame): DataFrame = {
    val season = rolledUp
      .groupBy(col("entity_id"), hour(col("bucket")).cast("long").as("h"))
      .agg(count(lit(1)).as("n_h"),
        sum(col("sd")).cast("decimal(18,4)").as("s_h"))
    val we = Window.partitionBy(col("entity_id"))
    val w = season
      .withColumn("N", sum(col("n_h")).over(we))
      .withColumn("S1", sum(col("s_h")).over(we).cast("decimal(18,4)"))
      .withColumn("m_h", col("s_h").cast("double") / col("n_h"))
      .withColumn("num_h", abs(col("N").cast("decimal(12,0)") * col("s_h") -
        col("n_h").cast("decimal(12,0)") * col("S1")))
      .withColumn("__rp", row_number().over(
        Window.partitionBy(col("entity_id")).orderBy(col("m_h").desc, col("h"))))
      .withColumn("__rt", row_number().over(
        Window.partitionBy(col("entity_id")).orderBy(col("m_h").asc, col("h"))))
    w.groupBy(col("entity_id"))
      .agg(max(col("N")).as("n_buckets"),
        max(col("S1")).as("__S1"),
        sum(col("num_h")).as("__dev"),
        max(when(col("__rp") === 1, col("h"))).as("peak_hour"),
        max(when(col("__rp") === 1, col("m_h"))).as("peak_mean"),
        max(when(col("__rt") === 1, col("h"))).as("trough_hour"),
        max(when(col("__rt") === 1, col("m_h"))).as("trough_mean"))
      .withColumn("grand_mean", col("__S1").cast("double") / col("n_buckets"))
      .withColumn("pmr",
        when(col("__S1") > 0, col("peak_mean") / col("grand_mean")))
      .withColumn("amplitude",
        when(col("__S1") > 0, col("__dev").cast("double") /
          (col("n_buckets").cast("decimal(12,0)") * col("__S1")).cast("double")))
      .select(col("entity_id"), col("n_buckets"), col("grand_mean"),
        col("peak_hour"), col("peak_mean"), col("trough_hour"),
        col("trough_mean"), col("pmr"), col("amplitude"))
  }

  def busyHour(rolledUp: DataFrame): DataFrame = {
    val profile = rolledUp
      .groupBy(col("entity_id"), hour(col("bucket")).cast("long").as("busy_hour"))
      .agg(count(lit(1)).as("n_obs"), sum(col("sd")).as("__sum"))
      .withColumn("avg_value", col("__sum").cast("double") / col("n_obs"))
    val rank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("entity_id"))
      .orderBy(col("avg_value").desc, col("busy_hour"))
    profile.withColumn("__rn", row_number().over(rank))
      .filter(col("__rn") === 1)
      .select(col("entity_id"), col("busy_hour"), col("n_obs"), col("avg_value"))
  }

  /** Trailing time-window aggregate over a presented rollup
    * `(entity_id, bucket, sd DECIMAL)`: for each bucket, the sum and
    * bucket count over the trailing `widthSeconds` INCLUSIVE of the
    * bucket — the "rolling 24 h total" monitoring series. The frame
    * is a RANGE over the bucket epoch, NOT a ROWS frame: on a gappy
    * series `ROWS N PRECEDING` silently reaches past the window's
    * true start (it counts rows, not time), while the range frame
    * shrinks with the gap. q08's running sum is the rows-unbounded
    * cousin; this is the time-bounded one. One entity-keyed window
    * shuffle; frame state is width/step-bounded per row. Sum stays
    * DECIMAL inside the frame → one exact-operand double cast. */
  def trailingWindow(rolledUp: DataFrame, widthSeconds: Long): DataFrame = {
    require(widthSeconds >= 1, s"trailing window width must be >= 1 s, got $widthSeconds")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("entity_id")).orderBy(col("__epoch"))
      .rangeBetween(-(widthSeconds - 1), 0)
    rolledUp
      .withColumn("__epoch", unix_timestamp(col("bucket")))
      .withColumn("win_sum", sum(col("sd")).over(w).cast("double"))
      .withColumn("win_buckets", count(lit(1)).over(w))
      .drop("__epoch")
  }

  /** Change-point candidates: per-entity SPLIT-WINDOW mean shift over
    * a presented rollup `(entity_id, bucket, sd DECIMAL)`. For each
    * bucket with w buckets strictly before AND w strictly after (both
    * ROWS frames full), the shift is mean(after) − mean(before) —
    * [[anomalies]] flags outlier POINTS; this flags LEVEL SHIFTS
    * ("the KPI stepped down on the 14th and stayed there").
    *
    * Determinism (t17 discipline): frame sums stay DECIMAL (exact,
    * order-free); each mean is ONE IEEE division of exact operands and
    * the shift one IEEE subtraction of those quotients — bit-identical
    * on any engine before the caller's display rounding.
    *
    * Cost: ONE per-entity ordered window hosts both w-bounded ROWS
    * frames → one entity-keyed shuffle, O(w) frame state. */
  def changePoints(rolledUp: DataFrame, w: Int = 7): DataFrame = {
    require(w >= 1, s"changePoints window must be >= 1, got $w")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("entity_id")).orderBy(col("bucket"))
    val before = win.rowsBetween(-w, -1)
    val after = win.rowsBetween(1, w)
    rolledUp
      .withColumn("__nb", count(lit(1)).over(before))
      .withColumn("__sb", sum(col("sd")).over(before).cast("double"))
      .withColumn("__na", count(lit(1)).over(after))
      .withColumn("__sa", sum(col("sd")).over(after).cast("double"))
      .filter(col("__nb") === w && col("__na") === w)
      .withColumn("mean_before", col("__sb") / col("__nb"))
      .withColumn("mean_after", col("__sa") / col("__na"))
      .withColumn("shift", col("mean_after") - col("mean_before"))
      .select(col("entity_id"), col("bucket"),
        col("mean_before"), col("mean_after"), col("shift"))
  }

  /** The single most likely change point per entity: [[changePoints]]
    * ranked by |shift| (ties broken by earliest bucket — at a clean
    * step the last old-level bucket and the first new-level bucket
    * tie, so the reported point is the step's left edge). The rank
    * window shares the candidates' entity partitioning — still one
    * shuffle. Entities with fewer than 2w+1 buckets emit nothing. */
  def topChangePoint(rolledUp: DataFrame, w: Int = 7): DataFrame = {
    val rank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("entity_id")).orderBy(abs(col("shift")).desc, col("bucket"))
    changePoints(rolledUp, w)
      .withColumn("__rn", row_number().over(rank))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  def anomalies(hourly: DataFrame, minBuckets: Int = 24,
                zMin: Double = 2.0): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("entity_id"))
    hourly
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__s1", sum(col("sd")).over(w).cast("double"))
      // Σv² is a scale-8 decimal whose unscaled value can pass 2^53;
      // rescale to 4 before the double cast so both engines' casts
      // agree in the last ulp (see Fx.prodSumDouble).
      .withColumn("__s2", graft.functions.Fx.prodSumDouble(
        sum(col("sd") * col("sd")).over(w)))
      .filter(col("__n") >= minBuckets)
      .withColumn("v", col("sd").cast("double"))
      .withColumn("__mean", col("__s1") / col("__n"))
      .withColumn("__var",
        col("__s2") / col("__n") - col("__mean") * col("__mean"))
      .filter(col("__var") > 0)
      .withColumn("z", round((col("v") - col("__mean")) / sqrt(col("__var")), 6))
      .filter(abs(col("z")) >= zMin)
      .select(col("entity_id"), col("bucket"), col("v"), col("z"))
  }

  /** Wide variant of [[anomalies]]: per-metric z-scores over a wide
    * DECIMAL trend-store part (pivotWide(decimal = true)) in ONE
    * entity-keyed window pass, output MELTED to the monitoring shape
    * — one row per anomalous (entity, bucket, metric). Each metric's
    * moments count only the buckets where THAT metric was observed
    * (a NULL cell is a gap for that metric), so the wide pass is
    * exactly N independent [[anomalies]] melts — in one plan: the
    * 3·N moment aggregates share the single unordered entity window
    * (one Window node, spec-asserted) and the melt is a post-window
    * explode, no extra shuffle. Same decimal-exact moment discipline
    * and fixed-op-order z formula as [[anomalies]]. */
  def anomaliesWide(wide: DataFrame, metricCols: Seq[String],
                    minBuckets: Int = 24, zMin: Double = 2.0): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("entity_id"))
    val momentCols = metricCols.flatMap { m =>
      Seq(count(col(m)).over(w).as(s"__n_$m"),
        sum(col(m)).over(w).cast("double").as(s"__s1_$m"),
        graft.functions.Fx.prodSumDouble(sum(col(m) * col(m)).over(w)).as(s"__s2_$m"))
    }
    val withM = wide.select(col("*") +: momentCols: _*)
    val entries = metricCols.map { m =>
      val n = col(s"__n_$m")
      val mean = col(s"__s1_$m") / n
      val variance = col(s"__s2_$m") / n - mean * mean
      val v = col(m).cast("double")
      struct(lit(m).as("metric"), v.as("v"),
        when(col(m).isNotNull && n >= minBuckets && variance > 0,
          round((v - mean) / sqrt(variance), 6)).as("z"))
    }
    withM.select(col("entity_id"), col("bucket"), explode(array(entries: _*)).as("__e"))
      .select(col("entity_id"), col("bucket"), col("__e.metric").as("metric"),
        col("__e.v").as("v"), col("__e.z").as("z"))
      .filter(abs(col("z")) >= zMin)
  }

  /** Rollup at an arbitrary seconds granularity — the reference's
    * native granularities are seconds-based (300 s / 900 s / 3600 s /
    * 86400 s), not only calendar units. Bucket = floor(epoch / g) · g
    * in UTC, matching Minerva's UTC bucket arithmetic. */
  def rollupSeconds(trend: DataFrame, entity: Column, ts: Column, value: Column,
                    seconds: Long): DataFrame =
    trend.groupBy(entity.as("entity_id"),
        timestamp_seconds(floor(unix_timestamp(ts) / seconds) * seconds).as("bucket"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(Fx.dec(value)).as("sum_dec"),
        max(value).as("max_value"))

  /** Rollup bucketed in a store's LOCAL timezone — Minerva's
    * granularity engine buckets day/week/month boundaries in the
    * store's timezone with correct DST handling, not in UTC: an
    * Amsterdam "day" is 23 hours on the spring-forward date and 25 on
    * fall-back, and a UTC day-rollup is wrong twice a year.
    * `from_utc_timestamp` shifts each instant to local wall-clock
    * time through the JVM tz database (DST-aware), `date_trunc` then
    * cuts on local boundaries; the bucket label is the local
    * wall-clock interval start. Same single partial-agg shuffle as
    * `rollup` — the tz conversion is a per-row codegen'd expression. */
  def rollupLocal(trend: DataFrame, entity: Column, ts: Column, value: Column,
                  granularity: String, tz: String): DataFrame =
    trend.groupBy(entity.as("entity_id"),
        date_trunc(granularity, from_utc_timestamp(ts, tz)).as("bucket"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(Fx.dec(value)).as("sum_dec"),
        max(value).as("max_value"))

  /** Shift bucket labels from interval-start to interval-end —
    * Minerva labels a trend interval by its END timestamp (the 10:15
    * row covers 10:00–10:15); graft's operators bucket by start
    * (Spark's `date_trunc` convention) and relabel at the edge. */
  def labelEnd(rolled: DataFrame, granularity: String): DataFrame = {
    val shifted = granularity.toLowerCase match {
      case "hour"  => col("bucket") + expr("interval 1 hour")
      case "day"   => col("bucket") + expr("interval 1 day")
      case "week"  => col("bucket") + expr("interval 7 day")
      case "month" => add_months(col("bucket"), 1).cast("timestamp")
      case g       => throw new IllegalArgumentException(s"unsupported label granularity: $g")
    }
    rolled.withColumn("bucket", shifted)
  }

  /** Re-aggregate a finer rollup to a coarser granularity without
    * touching raw rows: sum-of-sums (exact decimal), sum-of-counts,
    * max-of-maxes. */
  /** Entity aggregation over PARTIALS: roll an already-aggregated
    * store `(entity_id, bucket, cnt, sum_dec, max_value)` up a
    * child→parent relation, KEEPING the standard partial schema —
    * the output is itself a trend store (further re-aggregable,
    * materializable, readable by every store operator). Exact: sums
    * of exact decimal sums; the raw data is never re-scanned for the
    * hierarchy walk (broadcast relation join + one (parent, bucket)
    * shuffle of partials — at 100 TB the partials are bucket-count
    * sized, not row-count sized). */
  def entityReRollup(partials: DataFrame, relation: DataFrame,
                     childCol: String, parentCol: String): DataFrame =
    partials.join(broadcast(relation),
        partials("entity_id") === relation(childCol), "inner")
      .groupBy(relation(parentCol).as("entity_id"), col("bucket"))
      .agg(
        sum(col("cnt")).as("cnt"),
        sum(col("sum_dec")).as("sum_dec"),
        max(col("max_value")).as("max_value"))

  def reRollup(rolled: DataFrame, granularity: String): DataFrame =
    rolled.groupBy(col("entity_id"),
        date_trunc(granularity, col("bucket")).as("bucket"))
      .agg(
        sum(col("cnt")).as("cnt"),
        sum(col("sum_dec")).as("sum_dec"),
        max(col("max_value")).as("max_value"))

  /** Present a rollup with user-facing columns (double sums, mean). */
  def present(rolled: DataFrame): DataFrame =
    rolled.select(
      col("entity_id"),
      Fx.tsStr(col("bucket")).as("bucket"),
      col("cnt"),
      col("sum_dec").cast("double").as("sum_value"),
      (col("sum_dec").cast("double") / col("cnt")).as("avg_value"),
      col("max_value"))

  /** Entity aggregation: roll metrics up `relation(child → parent)`.
    * The relation is broadcast — entity registries are ~10⁶ rows while
    * trend data is ~10¹² at 100 TB. */
  def entityRollup(trend: DataFrame, entity: Column, value: Column,
                   relation: DataFrame, childCol: String, parentCol: String): DataFrame =
    trend.join(broadcast(relation),
        entity === relation(childCol), "inner")
      .groupBy(relation(parentCol).as("parent"))
      .agg(
        count(lit(1)).as("cnt"),
        Fx.dsum(value).as("sum_value"))

  /** Entity aggregation through a TEMPORAL relation — the directory
    * shape where an entity's parent CHANGES over time (a cell
    * re-homed to another site, a customer migrated to another
    * segment): relation rows carry `[fromCol, toCol)` validity
    * intervals, and each trend bucket rolls up to the parent valid
    * AT THAT BUCKET. The join stays an EQUI-join on the entity key
    * (hash/broadcast — the entity carries all the selectivity; the
    * interval test is a post-join filter, never a range-only nested
    * loop). Buckets covered by no interval drop, matching the
    * reference's directory lookups; overlapping intervals for one
    * entity contribute once per covering row (the caller keeps
    * intervals disjoint, as a directory does). */
  def entityRollupTemporal(rolled: DataFrame, relation: DataFrame,
                           childCol: String, parentCol: String,
                           fromCol: String, toCol: String,
                           value: Column): DataFrame =
    rolled.join(broadcast(relation),
        rolled("entity_id") === relation(childCol) &&
          rolled("bucket") >= relation(fromCol) &&
          rolled("bucket") < relation(toCol), "inner")
      .groupBy(relation(parentCol).as("parent"))
      .agg(count(lit(1)).as("cnt"), Fx.dsum(value).as("sum_value"))

  /** Coverage AUDIT for the temporal rollup — [[entityRollupTemporal]]
    * drops buckets no validity interval covers, silently, like a
    * directory miss; this MEASURES the drop so an operator can see
    * WHAT the rollup is losing before trusting the parent numbers.
    * Output per child entity that loses anything: total buckets,
    * uncovered count + share (IEEE division of exact longs), the
    * uncovered value mass, and the first/last uncovered bucket (where
    * the directory hole is).
    *
    * Shape: the SAME broadcast equi-join as the rollup but LEFT
    * OUTER, so every fact bucket survives with a covered/uncovered
    * flag; one entity-keyed partial agg. The fact side still never
    * shuffles for the hierarchy walk — the audit costs one agg more
    * than the rollup it audits. */
  def entityRollupTemporalAudit(rolled: DataFrame, relation: DataFrame,
                                childCol: String, parentCol: String,
                                fromCol: String, toCol: String,
                                value: Column): DataFrame = {
    val joined = rolled.join(broadcast(relation),
      rolled("entity_id") === relation(childCol) &&
        rolled("bucket") >= relation(fromCol) &&
        rolled("bucket") < relation(toCol), "left_outer")
    val uncovered = relation(parentCol).isNull
    joined
      .groupBy(rolled("entity_id").as("entity_id"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(when(uncovered, 1L).otherwise(0L)).as("n_uncovered"),
        Fx.dsum(when(uncovered, value)).as("uncovered_value"),
        min(when(uncovered, rolled("bucket"))).as("first_uncovered"),
        max(when(uncovered, rolled("bucket"))).as("last_uncovered"))
      .filter(col("n_uncovered") > 0)
      .withColumn("uncovered_share", col("n_uncovered") / col("n_buckets"))
  }

  /** [[entityRollupTemporal]] with a configured metric set — the same
    * MetricAgg vocabulary as the bucketed/plain overloads (incl.
    * `pNN_exact` percentiles, round 11), over the versioned
    * hierarchy. Metric sources name columns of `rolled`. */
  def entityRollupTemporal(rolled: DataFrame, relation: DataFrame,
                           childCol: String, parentCol: String,
                           fromCol: String, toCol: String,
                           metrics: Seq[Aggregation.MetricAgg]): DataFrame = {
    require(metrics.nonEmpty, "entityRollupTemporal: at least one MetricAgg is required")
    rolled.join(broadcast(relation),
        rolled("entity_id") === relation(childCol) &&
          rolled("bucket") >= relation(fromCol) &&
          rolled("bucket") < relation(toCol), "inner")
      .groupBy(relation(parentCol).as("parent"))
      .agg(Aggregation.compileMetric(metrics.head),
        metrics.tail.map(Aggregation.compileMetric): _*)
  }

  /** Entity aggregation with a CONFIGURED metric set — the
    * reference's entity aggregation materializes whatever metric
    * functions its definition declares (sum/avg/min/max/count), the
    * same vocabulary `Aggregation.compile` accepts for time
    * aggregation. Metric sources are columns of `trend`; the plan
    * shape is unchanged (broadcast relation ⋈ fact, one
    * combine-friendly shuffle on the parent key). */
  def entityRollup(trend: DataFrame, entity: Column,
                   relation: DataFrame, childCol: String, parentCol: String,
                   metrics: Seq[Aggregation.MetricAgg]): DataFrame = {
    require(metrics.nonEmpty, "entityRollup: at least one MetricAgg is required")
    trend.join(broadcast(relation),
        entity === relation(childCol), "inner")
      .groupBy(relation(parentCol).as("parent"))
      .agg(Aggregation.compileMetric(metrics.head),
        metrics.tail.map(Aggregation.compileMetric): _*)
  }

  /** Entity aggregation AT A GRANULARITY: roll metrics up
    * `relation(child → parent)` into `(parent, bucket)` cells — the
    * shape Minerva's entity aggregation actually materializes
    * (region-level trend stores derived from cell-level ones).
    * Broadcast relation ⋈ fact, then ONE combine-friendly shuffle on
    * the (parent, bucket) key; the fact side never shuffles for the
    * hierarchy walk. */
  def entityRollupBucketed(trend: DataFrame, entity: Column, ts: Column,
                           value: Column, granularity: String,
                           relation: DataFrame, childCol: String,
                           parentCol: String): DataFrame =
    trend.join(broadcast(relation),
        entity === relation(childCol), "inner")
      .groupBy(relation(parentCol).as("parent"),
        date_trunc(granularity, ts).as("bucket"))
      .agg(
        count(lit(1)).as("cnt"),
        Fx.dsum(value).as("sum_value"))

  /** [[entityRollupBucketed]] with a configured metric set (see the
    * metric-set [[entityRollup]] overload). */
  def entityRollupBucketed(trend: DataFrame, entity: Column, ts: Column,
                           granularity: String,
                           relation: DataFrame, childCol: String, parentCol: String,
                           metrics: Seq[Aggregation.MetricAgg]): DataFrame = {
    require(metrics.nonEmpty, "entityRollupBucketed: at least one MetricAgg is required")
    trend.join(broadcast(relation),
        entity === relation(childCol), "inner")
      .groupBy(relation(parentCol).as("parent"),
        date_trunc(granularity, ts).as("bucket"))
      .agg(Aggregation.compileMetric(metrics.head),
        metrics.tail.map(Aggregation.compileMetric): _*)
  }

  /** Top-k contributing child entities per (parent, bucket) cell —
    * the drill-down behind an entity-aggregation dashboard ("which
    * customers drive this region's monthly revenue"). Two bounded
    * aggregations: the broadcast relation ⋈ fact groupBy produces
    * per-(parent, bucket, child) DECIMAL-exact sums (one
    * combine-friendly shuffle, the e05 shape), then graft's
    * CollectMinK folds them to k rows per cell with O(k) state and
    * map-side partials — a parent with 10⁷ children costs each
    * mapper one k-array, where a `row_number` window would sort the
    * full child list on one reducer. Ranking orders on the NEGATED
    * exact decimal sum (ties broken by child id), so the rank order
    * is bit-identical on any engine or partitioning. */
  def topContributors(trend: DataFrame, entity: Column, ts: Column,
                      value: Column, granularity: String,
                      relation: DataFrame, childCol: String,
                      parentCol: String, k: Int): DataFrame = {
    require(k > 0, s"topContributors: k must be positive, got $k")
    import graft.functions.CollectMinK.collectMinK
    val per = trend.join(broadcast(relation),
        entity === relation(childCol), "inner")
      .groupBy(relation(parentCol).as("parent"),
        date_trunc(granularity, ts).as("bucket"),
        relation(childCol).as("child"))
      .agg(sum(Fx.dec(value)).as("sum_dec"))
    per.groupBy(col("parent"), col("bucket"))
      .agg(collectMinK(
        struct((-col("sum_dec")).as("neg"), col("child").as("child")), k).as("arr"))
      .select(col("parent"), col("bucket"),
        posexplode(col("arr")).as(Seq("pos", "e")))
      .select(col("parent"), col("bucket"),
        col("e.child").as("child"),
        (-col("e.neg")).cast("double").as("sum_value"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Seasonal-baseline anomaly report: each bucket of the evaluation
    * window scored against the entity's SAME-SEASON history — Monday
    * compares to past Mondays, not to the whole series (t17's global
    * z flags every weekend of a weekday-heavy metric). `seasonCol`
    * derives the season key from the bucket (day-of-week here;
    * hour-of-week at denser granularities). Baseline = buckets before
    * `evalFrom`, aggregated per (entity, season) with the t17
    * DECIMAL-exact moment discipline; evaluation buckets join the
    * baseline on (entity, season) — one combine-friendly moment
    * shuffle over O(entities × seasons) keys plus one equi-join whose
    * left side is the evaluation window only. z uses the same
    * fixed-op-order double formula as [[anomalies]], so it is
    * bit-identical on any engine. Buckets whose baseline has fewer
    * than `minObs` observations or zero variance are skipped. */
  def seasonalAnomalies(rolled: DataFrame, season: Column => Column,
                        evalFrom: Column, minObs: Int = 2): DataFrame = {
    val base = rolled.filter(col("bucket") < evalFrom)
      .groupBy(col("entity_id"), season(col("bucket")).as("season"))
      .agg(count(lit(1)).as("n_base"),
        sum(col("sd")).cast("double").as("__s1"),
        Fx.prodSumDouble(sum(col("sd") * col("sd"))).as("__s2"))
      .filter(col("n_base") >= minObs)
    rolled.filter(col("bucket") >= evalFrom)
      .withColumn("season", season(col("bucket")))
      .join(base, Seq("entity_id", "season"))
      .withColumn("v", col("sd").cast("double"))
      .withColumn("__mean", col("__s1") / col("n_base"))
      .withColumn("__var",
        col("__s2") / col("n_base") - col("__mean") * col("__mean"))
      .filter(col("__var") > 0)
      .withColumn("z", round((col("v") - col("__mean")) / sqrt(col("__var")), 6))
      .select(col("entity_id"), col("bucket"), col("season"),
        col("v"), col("n_base"), col("z"))
  }

  /** Wide trend-store part: one column per metric name (Minerva's
    * physical trend table layout). Conditional aggregation — a single
    * shuffle, no per-metric passes. */
  def pivotWide(trend: DataFrame, entity: Column, ts: Column,
                nameCol: Column, value: Column, granularity: String,
                metricNames: Seq[String], decimal: Boolean = false): DataFrame = {
    // decimal = keep the exact DECIMAL sums (for consumers that do
    // further exact moment arithmetic — anomaliesWide); the default
    // double is the presentation shape t04 grades.
    val aggs = metricNames.map { m =>
      val s = sum(when(nameCol === m, Fx.dec(value)).otherwise(lit(null)))
      (if (decimal) s else s.cast("double")).as(s"${m}_sum")
    } :+ count(lit(1)).as("cnt")
    trend.groupBy(entity.as("entity_id"),
        date_trunc(granularity, ts).as("bucket"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Buckets with no data per entity (Minerva's data-presence / gap
    * check): each entity's expected set is its own active range —
    * `sequence(min(bucket), max(bucket))` exploded per entity — anti-
    * joined against its observed buckets. The expected-set volume is
    * Σ per-entity range, not |entities| × |global buckets|: an entity
    * live for a week generates a week of buckets even when the store
    * spans years, so the shape survives a 100× scale-up where the
    * cartesian (entities × all buckets) does not. */
  def gaps(trend: DataFrame, entity: Column, ts: Column,
           granularity: String): DataFrame = {
    val step = granularity.toLowerCase match {
      case "hour"  => expr("interval 1 hour")
      case "day"   => expr("interval 1 day")
      case "week"  => expr("interval 7 day")
      case "month" => expr("interval 1 month")
      case g       => throw new IllegalArgumentException(s"unsupported gap granularity: $g")
    }
    val observed = trend.select(entity.as("entity_id"),
      date_trunc(granularity, ts).as("bucket")).distinct()
    val expected = observed.groupBy(col("entity_id"))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col("entity_id"),
        explode(sequence(col("lo"), col("hi"), step)).as("bucket"))
    expected.join(observed, Seq("entity_id", "bucket"), "left_anti")
  }

  /** Outage intervals: coalesce `gaps`' missing buckets into contiguous
    * [start, end] windows per entity — the gaps-and-islands rollup a
    * monitoring dashboard publishes ("cell X was silent 02:00–07:00"),
    * where `gaps` (t05) lists the raw missing buckets one row each.
    * Island key = bucket epoch / step minus the per-entity row_number:
    * consecutive missing buckets share it, any observed bucket between
    * them breaks it. All-integer arithmetic (hour buckets are exact
    * step multiples), so the grouping is engine-independent.
    *
    * Cost at scale: the `gaps` plan plus ONE per-entity window and one
    * (entity, island) groupBy. The window partitions on the same
    * entity key the gaps anti-join just shuffled on, and each window
    * partition is bounded by that entity's bucket span — nothing
    * serializes globally. Fixed-seconds granularities only (calendar
    * months have no constant epoch stride for the island key). */
  def outageWindows(trend: DataFrame, entity: Column, ts: Column,
                    granularity: String): DataFrame = {
    val step = stepSeconds(granularity).getOrElse(throw new IllegalArgumentException(
      s"outageWindows needs a fixed-seconds granularity, got: $granularity"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("entity_id")).orderBy(col("bucket"))
    gaps(trend, entity, ts, granularity)
      .withColumn("island",
        (unix_timestamp(col("bucket")) / step).cast("long") - row_number().over(w))
      .groupBy(col("entity_id"), col("island"))
      .agg(min(col("bucket")).as("outage_start"),
           max(col("bucket")).as("outage_end"),
           count(lit(1)).as("n_buckets"))
      .drop("island")
  }

  /** Modified log: last-written timestamp + row count per entity —
    * what Minerva's materialization daemon consults to find dirty
    * (store, timestamp) pairs for incremental re-aggregation. */
  def modifiedLog(trend: DataFrame, entity: Column, ts: Column): DataFrame =
    trend.groupBy(entity.as("entity_id"))
      .agg(max(ts).as("last_modified"), count(lit(1)).as("n_rows"))
}
