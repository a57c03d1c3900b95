package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Fx
import graft.operators.{AsOf, AttributeStore, TrendStore}
import graft.sources.TableCatalog

/** Trend-store (t01–t08), attribute-store (a01–a04) and notification
  * (n01) queries — the Minerva core, over the `events` table
  * (user_id = entity, ts = timestamp, event_type/value = counters,
  * props = notification payload).
  */
object Trend {

  type Q = (SparkSession, String) => DataFrame

  private val TS = "yyyy-MM-dd HH:mm:ss"
  private val types = Seq("click", "view", "purchase", "signup", "error")

  val defs: Seq[(String, Q)] = Seq(
    "t01_rollup_hour" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      TrendStore.present(
          TrendStore.rollup(ev, col("user_id"), col("ts"), col("value"), "hour"))
        .orderBy(col("entity_id"), col("bucket"))
    },

    "t02_rollup_day" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val hourly = TrendStore.rollup(ev, col("user_id"), col("ts"), col("value"), "hour")
      TrendStore.present(TrendStore.reRollup(hourly, "day"))
        .orderBy(col("entity_id"), col("bucket"))
    },

    "t03_entity_rollup" -> { (s, dir) =>
      val c = TableCatalog(s, dir)
      val relation = c.customer.select(col("c_custkey"), col("c_mktsegment"))
      TrendStore.entityRollup(c.events, col("user_id"), col("value"),
          relation, "c_custkey", "c_mktsegment")
        .orderBy(col("parent"))
    },

    "t04_trend_wide" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val wide = TrendStore.pivotWide(ev, col("user_id"), col("ts"),
        col("event_type"), col("value"), "day", types)
      wide.select((col("entity_id") +: Fx.tsStr(col("bucket")).as("bucket") +:
          (types.map(t => col(s"${t}_sum")) :+ col("cnt"))): _*)
        .orderBy(col("entity_id"), col("bucket"))
    },

    "t05_gap_detect" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      TrendStore.gaps(ev, col("user_id"), col("ts"), "hour")
        .groupBy(col("entity_id")).agg(count(lit(1)).as("n_missing"))
        .orderBy(col("entity_id"))
    },

    "t06_modified_log" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      TrendStore.modifiedLog(ev, col("user_id"), col("ts"))
        .select(col("entity_id"),
          date_format(col("last_modified"), TS).as("last_modified"),
          col("n_rows"))
        .orderBy(col("entity_id"))
    },

    "t07_asof_join" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("event_id").as("c_event_id"), col("ts").as("c_ts"))
      AsOf.join(purchases, clicks, "user_id", "ts", "ts",
          carry = Seq("c_event_id", "c_ts"))
        .filter(col("asof_c_event_id").isNotNull)
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), TS).as("p_ts"),
          col("asof_c_event_id").as("c_event_id"),
          date_format(col("asof_c_ts"), TS).as("c_ts"))
        .orderBy(col("event_id"))
    },

    "t08_computed_trend" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      ev.groupBy(col("user_id").as("entity_id"),
          date_format(date_trunc("day", col("ts")), TS).as("bucket"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchases"),
          Fx.dsum(col("value")).as("sum_value"))
        .withColumn("error_rate", col("n_errors") / col("cnt"))
        .withColumn("value_per_event", col("sum_value") / col("cnt"))
        .orderBy(col("entity_id"), col("bucket"))
    },

    "a01_attr_current" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      AttributeStore.current(ev, col("user_id"), col("ts"), col("event_id"))
        .select(col("user_id"), date_format(col("ts"), TS).as("ts"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy(col("user_id"))
    },

    "a02_attr_history" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      AttributeStore.history(ev, col("user_id"), col("ts"), col("event_id"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          date_format(col("valid_from"), TS).as("valid_from"),
          coalesce(date_format(col("valid_to"), TS), lit("9999-12-31 00:00:00")).as("valid_to"))
        .orderBy(col("user_id"), col("event_id"))
    },

    "a03_attr_compact" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      AttributeStore.compact(ev, col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .select(col("user_id"), col("event_id"),
          date_format(col("ts"), TS).as("ts"), col("event_type"))
        .orderBy(col("user_id"), col("event_id"))
    },

    "a04_attr_at_time" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      AttributeStore.atTime(ev, col("user_id"), col("ts"), col("event_id"),
          lit("2024-01-15 00:00:00").cast("timestamp"))
        .select(col("user_id"), date_format(col("ts"), TS).as("ts"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy(col("user_id"))
    },

    // Attribute change report between two configuration snapshots —
    // "what changed between Jan-10 and Jan-20" (AttributeStore.diff:
    // two as-of windows + one full-outer join, all entity-keyed).
    "a05_attr_diff" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      AttributeStore.diff(ev, col("user_id"), col("ts"), col("event_id"),
          get_json_object(col("props"), "$.k").cast("long"),
          lit("2024-01-10 00:00:00").cast("timestamp"),
          lit("2024-01-20 00:00:00").cast("timestamp"))
        .orderBy(col("entity_id"))
    },

    "n01_notifications" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      ev.filter(col("event_type") === "error")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .filter(col("k") >= 50)
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), TS).as("ts"), col("k"), col("value"))
        .orderBy(col("event_id"))
    },

    // Batch sessionization (3 h inactivity gap) — the batch twin of
    // streaming.Sessionize, now oracle-checked: gap-flag + running
    // sum assigns session ids in ONE shuffle on the entity key.
    "t13_sessions" -> { (s, dir) =>
      import s.implicits._
      val evs = TableCatalog(s, dir).events
        .select(col("user_id"), col("ts"), col("value"))
        .as[graft.streaming.Sessionize.Ev]
      graft.streaming.Sessionize.sessionsBatch(evs, 3 * 3600 * 1000L).toDF()
        .select(col("user_id"),
          date_format(col("session_start"), TS).as("session_start"),
          date_format(col("session_end"), TS).as("session_end"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_start"))
    },

    // Counter→rate derivation — Minerva's counter semantics: trend
    // stores hold raw counter samples and rates are derived at query
    // time as the delta to the previous bucket over the ACTUAL
    // seconds between buckets; counter resets (negative delta) yield
    // NULL (reference: minerva trend materialization of rate KPIs). One
    // rollup shuffle + one per-entity window: the window partitions
    // on the entity key, so partitions stay bucket-count bounded and
    // nothing serializes globally at 100 TB. delta is a plain double
    // subtraction of two decimal-exact sums — deterministic on both
    // engines; the first bucket per entity is NULL on both.
    "t15_counter_rate" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val hourly = TrendStore.rollup(ev, col("user_id"), col("ts"), col("value"), "hour")
        .select(col("entity_id"), col("bucket"),
          col("sum_dec").cast("double").as("sum_value"))
      TrendStore.counterRate(hourly)
        .select(col("entity_id"), date_format(col("bucket"), TS).as("bucket"),
          col("sum_value"), col("delta"), col("rate_per_s"))
        .orderBy(col("entity_id"), col("bucket"))
    },

    // Gap-filled trend read — forward-fill missing hourly buckets
    // from the last observed value (see TrendStore.gapFill). The
    // aggregate projection keeps the result compact and still
    // hash-verifies the exact fill geometry: how many rows were
    // synthesized and the decimal-exact sum of the filled series.
    "t16_gapfill" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val hourly = TrendStore.rollup(ev, col("user_id"), col("ts"), col("value"), "hour")
        .select(col("entity_id"), col("bucket"),
          col("sum_dec").cast("double").as("sum_value"))
      TrendStore.gapFill(hourly, "hour")
        .groupBy(col("entity_id"))
        .agg(count(lit(1)).as("n_buckets"),
          sum(when(col("filled"), 1L).otherwise(0L)).as("n_filled"),
          Fx.dsum(col("sum_value")).as("sum_filled_series"))
        .orderBy(col("entity_id"))
    },

    // Linearly-interpolated gap fill — the other gap-filling mode
    // (t16 forward-fills): missing buckets take the time-weighted
    // value between their observed neighbors; leading/trailing gaps
    // stay NULL. The interpolation is a fixed-op-order IEEE double
    // expression — bit-identical across engines unrounded.
    "t18_gapfill_interp" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val hourly = TrendStore.rollup(ev, col("user_id"), col("ts"), col("value"), "hour")
        .select(col("entity_id"), col("bucket"),
          col("sum_dec").cast("double").as("sum_value"))
      TrendStore.gapFillInterpolate(hourly, "hour")
        .select(col("entity_id"), date_format(col("bucket"), TS).as("bucket"),
          col("sum_value"), col("filled"))
        .orderBy(col("entity_id"), col("bucket"))
    },

    // Gap fill at a NATIVE seconds granularity (900 s / 15 m) — the
    // reference's granularities are seconds-based, so its gap filling
    // runs on those grids, not only calendar hours/days. Same
    // forward-fill plan as t16, stride = stepSeconds("15m") (the
    // duration-alias parse path), per-entity aggregate projection.
    "t19_gapfill_900s" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val q = TrendStore.rollupSeconds(ev, col("user_id"), col("ts"), col("value"), 900L)
        .select(col("entity_id"), col("bucket"),
          col("sum_dec").cast("double").as("sum_value"))
      TrendStore.gapFill(q, "15m")
        .groupBy(col("entity_id"))
        .agg(count(lit(1)).as("n_buckets"),
          sum(when(col("filled"), 1L).otherwise(0L)).as("n_filled"),
          Fx.dsum(col("sum_value")).as("sum_filled_series"))
        .orderBy(col("entity_id"))
    },

    // WIDE-store gap fill — forward-fill TWO metric columns of a
    // pivoted trend store in ONE entity-keyed window pass (the
    // reference's trend reads are wide-table-native; melting per
    // metric would run the grid join + window N times). Same
    // aggregate projection as t16, once per metric.
    "t22_gapfill_wide" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val wide = TrendStore.pivotWide(ev, col("user_id"), col("ts"),
          col("event_type"), col("value"), "hour", Seq("click", "view"))
        .select(col("entity_id"), col("bucket"), col("click_sum"), col("view_sum"))
      TrendStore.gapFill(wide, "hour", Seq("click_sum", "view_sum"))
        .groupBy(col("entity_id"))
        .agg(count(lit(1)).as("n_buckets"),
          sum(when(col("filled"), 1L).otherwise(0L)).as("n_filled"),
          Fx.dsum(col("click_sum")).as("sum_click_series"),
          Fx.dsum(col("view_sum")).as("sum_view_series"))
        .orderBy(col("entity_id"))
    },

    // WIDE-store counter rates — per-metric delta/rate over a daily
    // two-metric wide store, one shared entity-keyed window (t15's
    // counter semantics, N metrics per pass). A NULL metric on an
    // observed day (no events of that type) yields NULL delta/rate
    // for that metric on both rows it touches — both engines' lag()
    // respects NULLs.
    "t23_rate_wide" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val wide = TrendStore.pivotWide(ev, col("user_id"), col("ts"),
          col("event_type"), col("value"), "day", Seq("click", "view"))
        .select(col("entity_id"), col("bucket"), col("click_sum"), col("view_sum"))
      TrendStore.counterRate(wide, Seq("click_sum", "view_sum"))
        .select(col("entity_id"), date_format(col("bucket"), TS).as("bucket"),
          col("click_sum"), col("click_sum_delta"), col("click_sum_rate_per_s"),
          col("view_sum"), col("view_sum_delta"), col("view_sum_rate_per_s"))
        .orderBy(col("entity_id"), col("bucket"))
    },

    // WIDE-store interpolated gap fill — each metric anchors its
    // interpolation on the buckets where THAT metric was observed
    // (a present bucket with no 'view' events is a view_sum gap), so
    // the wide pass is exactly N independent melts, in one plan.
    "t24_interp_wide" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val wide = TrendStore.pivotWide(ev, col("user_id"), col("ts"),
          col("event_type"), col("value"), "hour", Seq("click", "view"))
        .select(col("entity_id"), col("bucket"), col("click_sum"), col("view_sum"))
      TrendStore.gapFillInterpolate(wide, "hour", Seq("click_sum", "view_sum"))
        .select(col("entity_id"), date_format(col("bucket"), TS).as("bucket"),
          col("click_sum"), col("view_sum"), col("filled"))
        .orderBy(col("entity_id"), col("bucket"))
    },

    // WIDE-store anomaly detection — t17's z-score monitoring over a
    // two-metric wide store, melted to one row per anomalous
    // (entity, bucket, metric). Each metric's moments anchor on the
    // buckets where IT was observed; the decimal(18,4) cast mirrors
    // t17's sd so the moment arithmetic is type-identical.
    "t25_anomaly_wide" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val wide = TrendStore.pivotWide(ev, col("user_id"), col("ts"),
          col("event_type"), col("value"), "hour", Seq("click", "view"),
          decimal = true)
        .select(col("entity_id"), col("bucket"),
          col("click_sum").cast("decimal(18,4)").as("click_sum"),
          col("view_sum").cast("decimal(18,4)").as("view_sum"))
      // minBuckets 12 (t17 uses 24): the per-metric hourly series is
      // ~half as dense as the all-events series, and the small-scale
      // corpora top out near 22 observed buckets per metric.
      TrendStore.anomaliesWide(wide, Seq("click_sum", "view_sum"),
          minBuckets = 12, zMin = 2.0)
        .select(col("entity_id"), date_format(col("bucket"), TS).as("bucket"),
          col("metric"), col("v"), col("z"))
        .orderBy(col("entity_id"), col("bucket"), col("metric"))
    },

    // EXACT per-entity percentile rollup — the monitoring "p95 per
    // entity per day" question, on entity×bucket-bounded groups where
    // the exact single-pass aggregate is affordable (t20 is the
    // sketch path for unbounded groups). Same shuffle shape as t01.
    "t26_percentile_rollup" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      TrendStore.percentileRollup(ev, col("user_id"), col("ts"),
          col("value"), "day", Seq(0.5, 0.95))
        .select(col("entity_id"), date_format(col("bucket"), TS).as("bucket"),
          col("cnt"), col("p50"), col("p95"))
        .orderBy(col("entity_id"), col("bucket"))
    },

    // Period-over-period monitoring — the "how did this week compare
    // to last week" dashboard question over a trend store. Weekly
    // DECIMAL-exact per-entity totals (t01's sum discipline), then one
    // lag window per entity: absolute delta stays exact decimal
    // arithmetic; percent change is a single double division on
    // exactly-representable decimal casts, rounded to 4 dp on both
    // engines. One groupBy shuffle + one window shuffle, both keyed
    // on the entity — at 100 TB this reads a year of weekly partials
    // from the trend store, never the raw events.
    "t27_week_over_week" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val weekly = ev.groupBy(col("user_id").as("entity_id"),
          date_trunc("week", col("ts")).as("bucket"))
        .agg(sum(col("value").cast("decimal(18,4)")).as("sum_dec"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("entity_id")).orderBy(col("bucket"))
      weekly
        .withColumn("prev_dec", lag(col("sum_dec"), 1).over(w))
        .select(col("entity_id"), date_format(col("bucket"), TS).as("bucket"),
          col("sum_dec").cast("double").as("sum_value"),
          col("prev_dec").cast("double").as("prev_value"),
          (col("sum_dec") - col("prev_dec")).cast("double").as("delta"),
          when(col("prev_dec") =!= 0,
            round((col("sum_dec") - col("prev_dec")).cast("double") /
              col("prev_dec").cast("double"), 4)).as("pct_change"))
        .orderBy(col("entity_id"), col("bucket"))
    },

    // Sketch-based percentiles (rows-only — Greenwald-Khanna summary
    // merges are partition-order-dependent, so no cross-engine hash;
    // the rank-error bound vs the exact quantiles is spec-asserted):
    // the 100 TB path for the q15 question. q15's percentile_cont
    // needs the values per group materialized; approx_percentile is
    // a MERGEABLE fixed-memory sketch — one scan, map-side partials,
    // rank error ≤ N/accuracy — which is what a monitoring dashboard
    // runs over a year of trend data.
    "t20_approx_percentiles" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          expr("approx_percentile(value, array(0.5, 0.95, 0.99), 10000)").as("pcts"))
        .select(col("event_type"), col("n"),
          element_at(col("pcts"), 1).as("p50"),
          element_at(col("pcts"), 2).as("p95"),
          element_at(col("pcts"), 3).as("p99"))
        .orderBy(col("event_type"))
    },

    // Sketch-based DISTINCT counts (rows-only — HLL++ register merges
    // carry engine-specific hashing; the relative-error bound vs the
    // exact count is spec-asserted): the 100 TB path for q16's
    // question. Exact multi-distinct expands rows per distinct clause;
    // HLL is a fixed 2^p-register sketch, mergeable map-side — the
    // daily-actives query a year-long store answers in one scan.
    "t21_approx_distinct" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_rows"),
          approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"),
          approx_count_distinct(col("value"), rsd = 0.02).as("approx_values"))
        .orderBy(col("event_type"))
    },

    // Z-score anomalies over each entity's own hourly series (see
    // TrendStore.anomalies for the decimal-exact moment discipline
    // that makes z bit-identical across engines).
    "t17_anomaly" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val hourly = TrendStore.rollup(ev, col("user_id"), col("ts"), col("value"), "hour")
        .select(col("entity_id"), col("bucket"),
          col("sum_dec").cast("decimal(18,4)").as("sd"))
      TrendStore.anomalies(hourly, minBuckets = 24, zMin = 2.0)
        .select(col("entity_id"), date_format(col("bucket"), TS).as("bucket"),
          col("v"), col("z"))
        .orderBy(col("entity_id"), col("bucket"))
    },

    // Seasonal-baseline deviation report: the final week's daily
    // totals scored against each entity's SAME-WEEKDAY history —
    // Monday vs past Mondays (t17's global z flags every weekend of
    // a weekday-shaped metric; a seasonal baseline doesn't). Moments
    // stay DECIMAL-exact per (entity, dow) until the fixed-op-order
    // z; one combine-friendly moment shuffle over O(entities × 7)
    // keys + one equi-join whose left side is only the evaluation
    // week.
    "t28_seasonal_baseline" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val daily = TrendStore.rollup(ev, col("user_id"), col("ts"), col("value"), "day")
        .select(col("entity_id"), col("bucket"),
          col("sum_dec").cast("decimal(18,4)").as("sd"))
      TrendStore.seasonalAnomalies(daily, b => dayofweek(b),
          lit("2024-01-24 00:00:00").cast("timestamp"), minObs = 2)
        .select(col("entity_id"), date_format(col("bucket"), TS).as("bucket"),
          col("season").cast("int").as("dow"), col("v"), col("n_base"), col("z"))
        .orderBy(col("entity_id"), col("bucket"))
    },

    // Capacity forecast: per-entity least-squares linear trend over
    // the daily series + next-day projection (see
    // TrendStore.linearTrend for the decimal-moment determinism and
    // the five-scalar agg state that shrugs off hot entities).
    "t29_trend_forecast" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val daily = TrendStore.rollup(ev, col("user_id"), col("ts"), col("value"), "day")
        .select(col("entity_id"), col("bucket"),
          col("sum_dec").cast("decimal(18,4)").as("sd"))
      TrendStore.linearTrend(daily, minDays = 7)
        .orderBy(col("entity_id"))
    },

    // Capacity horizon — t29's planning number: at the fitted growth
    // rate, days until each entity's daily KPI reaches 2× its current
    // next-day projection; NULL for non-growing entities (the sign of
    // the fitted slope splits the fleet, so the report is non-
    // degenerate at every scale). One exact multiply + one unrounded
    // IEEE division over t29's bit-identical rounded fit.
    "t37_capacity_horizon" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val daily = TrendStore.rollup(ev, col("user_id"), col("ts"), col("value"), "day")
        .select(col("entity_id"), col("bucket"),
          col("sum_dec").cast("decimal(18,4)").as("sd"))
      TrendStore.capacityHorizon(daily, factor = 2.0, minDays = 7)
        .orderBy(col("entity_id"))
    },

    // Data-availability report — the SLA/completeness number a
    // monitoring deployment publishes: per entity per CALENDAR day of
    // the corpus span, how many of the 24 hourly buckets actually
    // carry data (zero-data days INCLUDED — the whole point; t05
    // lists the missing buckets, this rolls coverage up to the
    // dashboard rate). Shape: the hourly distinct + per-day count are
    // entity-keyed shuffles; the day grid is a LITERAL array exploded
    // onto the O(entities) distinct list — no join builds the grid,
    // and the coverage join is (entity, day)-keyed. The span probe is
    // one 2-scalar driver aggregate (the Materialize discipline).
    "t30_availability" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val hourly = ev.select(col("user_id").as("entity_id"),
          date_trunc("hour", col("ts")).as("h")).distinct()
      val perDay = hourly
        .groupBy(col("entity_id"), date_trunc("day", col("h")).as("day"))
        .agg(count(lit(1)).as("n"))
      val span = ev.agg(
        date_format(min(date_trunc("day", col("ts"))), "yyyy-MM-dd HH:mm:ss"),
        date_format(max(date_trunc("day", col("ts"))), "yyyy-MM-dd HH:mm:ss")).head()
      val grid = ev.select(col("user_id").as("entity_id")).distinct()
        .select(col("entity_id"), explode(expr(
          s"sequence(timestamp'${span.getString(0)}', timestamp'${span.getString(1)}', interval 1 day)"))
          .as("day"))
      grid.join(perDay, Seq("entity_id", "day"), "left")
        .select(col("entity_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          coalesce(col("n"), lit(0L)).as("n_hours"),
          (coalesce(col("n"), lit(0L)) / lit(24)).as("availability"))
        .orderBy(col("entity_id"), col("day"))
    },

    // SLO error-budget report — t30's availability rolled to the
    // number an SRE review actually consumes: per entity, the mean
    // availability over the corpus span, days breaching the 95%
    // daily-coverage target, the span's allowed breach budget, and
    // what remains ("is this cell burning its budget"). Breach
    // detection is INTEGER arithmetic (n_hours·100 < 2280 ⇔
    // coverage < 0.95 — no float compare anywhere in the decision);
    // mean availability and the budget arithmetic are single IEEE
    // ops over exact operands. Same plan as t30 + one entity-keyed
    // partial agg.
    "t38_error_budget" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val hourly = ev.select(col("user_id").as("entity_id"),
          date_trunc("hour", col("ts")).as("h")).distinct()
      val perDay = hourly
        .groupBy(col("entity_id"), date_trunc("day", col("h")).as("day"))
        .agg(count(lit(1)).as("n"))
      val span = ev.agg(
        date_format(min(date_trunc("day", col("ts"))), "yyyy-MM-dd HH:mm:ss"),
        date_format(max(date_trunc("day", col("ts"))), "yyyy-MM-dd HH:mm:ss")).head()
      val grid = ev.select(col("user_id").as("entity_id")).distinct()
        .select(col("entity_id"), explode(expr(
          s"sequence(timestamp'${span.getString(0)}', timestamp'${span.getString(1)}', interval 1 day)"))
          .as("day"))
      grid.join(perDay, Seq("entity_id", "day"), "left")
        .select(col("entity_id"), coalesce(col("n"), lit(0L)).as("n_hours"))
        .groupBy(col("entity_id"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("n_hours")).as("__sh"),
          sum(when(col("n_hours") * 100 < 2280, 1L).otherwise(0L))
            .as("n_breach_days"))
        .select(col("entity_id"), col("n_days"),
          (col("__sh") / (lit(24) * col("n_days"))).as("mean_availability"),
          col("n_breach_days"),
          (lit(0.05) * col("n_days")).as("allowed_breach_days"),
          (lit(0.05) * col("n_days") - col("n_breach_days")).as("budget_remaining"),
          when(col("n_breach_days") > lit(0.05) * col("n_days"), lit("exhausted"))
            .otherwise(lit("within_budget")).as("status"))
        .orderBy(col("entity_id"))
    },

    // Seasonality strength per entity — "does this KPI have a daily
    // shape at all, and how deep": grand mean, peak/trough hour
    // means, peak-to-mean ratio, and the relative seasonal amplitude
    // (bucket-weighted MAD of hourly means around the grand mean,
    // over the grand mean). Denominator-cleared exact-DECIMAL
    // arithmetic; only final IEEE divisions touch doubles. One
    // (entity, hour-of-day) combine-friendly groupBy → an entity
    // window family over O(entities × 24) rows.
    "t39_seasonality" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val hourly = TrendStore.rollup(ev, col("user_id"), col("ts"), col("value"), "hour")
        .select(col("entity_id"), col("bucket"),
          col("sum_dec").cast("decimal(18,4)").as("sd"))
      TrendStore.seasonalityStrength(hourly)
        .orderBy(col("entity_id"))
    },

    // Top movers — the fleet triage query behind every morning
    // review: per day, the 3 entities whose KPI moved most (|Δ|
    // day-over-day), with before/after values and the signed delta.
    // One entity-keyed lag window + CollectMinK's O(k) per-day rank
    // state (map-side partials — no fleet-wide window sort on one
    // reducer); rank order on exact decimals.
    "t40_top_movers" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val daily = TrendStore.rollup(ev, col("user_id"), col("ts"), col("value"), "day")
        .select(col("entity_id"), col("bucket"),
          col("sum_dec").cast("decimal(18,4)").as("sd"))
      TrendStore.topMovers(daily, k = 3)
        .select(date_format(col("bucket"), TS).as("bucket"), col("rank"),
          col("entity_id"), col("value"), col("prev_value"), col("delta"))
        .orderBy(col("bucket"), col("rank"))
    },

    // Attribute staleness report — days since each entity's last
    // attribute write, relative to the corpus end (the "which configs
    // has nobody touched" ops question; e09 asks who went silent in
    // the DATA, this asks whose ATTRIBUTES aged out). The as-of
    // anchor is one 1-row driver agg embedded as a literal (t30's
    // span pattern — no scalar cross join reaches the plan).
    "a08_attr_staleness" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val asOf = ev.agg(
        date_format(max(date_trunc("day", col("ts"))), TS)).head.getString(0)
      AttributeStore.current(ev, col("user_id"), col("ts"), col("event_id"))
        .select(col("user_id"), date_format(col("ts"), TS).as("last_write"),
          datediff(lit(asOf).cast("timestamp"), date_trunc("day", col("ts")))
            .cast("long").as("days_stale"))
        .withColumn("status",
          when(col("days_stale") >= 7, lit("stale")).otherwise(lit("fresh")))
        .orderBy(col("user_id"))
    },

    // Outage-window report — t05's missing buckets coalesced into
    // contiguous [start, end] intervals per entity (gaps-and-islands):
    // the number a dashboard publishes is "silent 02:00–07:00", not
    // five bucket rows. One extra per-entity window + one island
    // groupBy on top of the gaps plan.
    "t31_outage_windows" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      TrendStore.outageWindows(ev, col("user_id"), col("ts"), "hour")
        .select(col("entity_id"),
          date_format(col("outage_start"), TS).as("outage_start"),
          date_format(col("outage_end"), TS).as("outage_end"),
          col("n_buckets"))
        .orderBy(col("entity_id"), col("outage_start"))
    },

    // Bounded-staleness as-of join — t07 with a 1-hour tolerance
    // (pandas merge_asof semantics): a click older than an hour must
    // NOT serve as the purchase's "latest" context. Left rows all
    // survive; stale matches null out.
    "t36_asof_tolerance" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("event_id").as("c_event_id"), col("ts").as("c_ts"))
      AsOf.join(purchases, clicks, "user_id", "ts", "ts",
          carry = Seq("c_event_id", "c_ts"), toleranceSeconds = Some(3600L))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), TS).as("p_ts"),
          col("asof_c_event_id").as("c_event_id"),
          date_format(col("asof_c_ts"), TS).as("c_ts"))
        .orderBy(col("event_id"))
    },

    // Active-entities report — DAU + trailing-7-day WAU per observed
    // day, the product/fleet liveness metric. WAU avoids both a
    // self-range-join and a per-day distinct re-scan: each (entity,
    // day) presence row fans out to the 7 window-END days it counts
    // toward (a bounded 7× explode of an O(entities × days) distinct
    // set), then ONE day-keyed distinct agg — at a year of 100 TB
    // data the expansion is 7× a tiny presence table, never 7× the
    // events. The exact path; t21's HLL sketch is the unbounded one.
    "t35_active_entities" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val presence = ev.select(col("user_id").as("entity_id"),
        date_trunc("day", col("ts")).as("day")).distinct()
      val dau = presence.groupBy(col("day"))
        .agg(countDistinct(col("entity_id")).as("dau"))
      val wau = presence
        .select(col("entity_id"), explode(expr("sequence(0, 6)")).as("off"), col("day"))
        .select(col("entity_id"),
          timestamp_seconds(unix_timestamp(col("day")) + col("off") * 86400L).as("day"))
        .groupBy(col("day"))
        .agg(countDistinct(col("entity_id")).as("wau"))
      dau.join(wau, Seq("day"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("dau"), col("wau"))
        .orderBy(col("day"))
    },

    // Busy-hour report — each entity's peak hour-of-day by average
    // load (the telecom dimensioning question; Minerva deployments
    // size capacity on the busy hour). (entity, hod) partial agg +
    // a ≤24-row rank window per entity.
    "t34_busy_hour" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val hourly = TrendStore.rollup(ev, col("user_id"), col("ts"), col("value"), "hour")
        .select(col("entity_id"), col("bucket"),
          col("sum_dec").cast("decimal(18,4)").as("sd"))
      TrendStore.busyHour(hourly)
        .select(col("entity_id"), col("busy_hour"), col("n_obs"),
          round(col("avg_value"), 6).as("avg_value"))
        .orderBy(col("entity_id"))
    },

    // Rolling 24 h series — trailing TIME-window totals per entity
    // over the hourly rollup (q08 runs unbounded; this is the
    // time-bounded monitoring series). RANGE frame on the epoch, so
    // gaps shrink the window instead of letting a ROWS frame reach
    // past its true start.
    "t33_rolling_day" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val hourly = TrendStore.rollup(ev, col("user_id"), col("ts"), col("value"), "hour")
        .select(col("entity_id"), col("bucket"),
          col("sum_dec").cast("decimal(18,4)").as("sd"))
      TrendStore.trailingWindow(hourly, widthSeconds = 86400L)
        .select(col("entity_id"), date_format(col("bucket"), TS).as("bucket"),
          col("win_sum"), col("win_buckets"))
        .orderBy(col("entity_id"), col("bucket"))
    },

    // Bulk time-travel — the whole fleet's attribute state at each
    // weekly snapshot, in ONE history pass (a04 answers one
    // timestamp; reporting wants the series). Lead window + literal
    // snapshot array explode, no (entity × snapshot) join.
    "a07_attr_snapshots" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val snaps = Seq("2024-01-08 00:00:00", "2024-01-15 00:00:00",
        "2024-01-22 00:00:00", "2024-01-29 00:00:00")
      AttributeStore.snapshots(ev, col("user_id"), col("ts"), col("event_id"), snaps)
        .select(col("user_id"), date_format(col("snapshot_ts"), TS).as("snapshot_ts"),
          date_format(col("ts"), TS).as("ts"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy(col("user_id"), col("snapshot_ts"))
    },

    // Change-point report — the single most likely LEVEL SHIFT per
    // entity over its daily series (split-window mean comparison,
    // w=7 days each side). t17 flags outlier points, t28 seasonal
    // deviations; this answers "when did the KPI step and by how
    // much". Candidate + rank windows share one entity partitioning.
    "t32_change_points" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val daily = TrendStore.rollup(ev, col("user_id"), col("ts"), col("value"), "day")
        .select(col("entity_id"), col("bucket"),
          col("sum_dec").cast("decimal(18,4)").as("sd"))
      TrendStore.topChangePoint(daily, w = 7)
        .select(col("entity_id"), date_format(col("bucket"), TS).as("bucket"),
          round(col("mean_before"), 6).as("mean_before"),
          round(col("mean_after"), 6).as("mean_after"),
          round(col("shift"), 6).as("shift"))
        .orderBy(col("entity_id"))
    },

    // Attribute churn report — config-change rate over the attribute
    // history ("how many changes landed per day, across how many
    // entities"). A change is a compact-surviving row excluding each
    // entity's first (provisioning) row; one entity-keyed window
    // shuffle + one O(days) groupBy.
    "a06_attr_churn" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      AttributeStore.churn(ev, col("user_id"), col("ts"), col("event_id"),
          col("event_type"), "day")
        .select(date_format(col("bucket"), TS).as("bucket"),
          col("n_changes"), col("n_entities"))
        .orderBy(col("bucket"))
    },

    // Fleet configuration distribution at an as-of time — "how is the
    // fleet configured right now": entities per attribute value +
    // fleet share (a04 answers one entity; this is the fleet-level
    // rollup a dashboard publishes). One as-of window + one
    // O(values) groupBy; share = IEEE division of exact longs.
    "a09_attr_distribution" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      AttributeStore.valueDistribution(ev, col("user_id"), col("ts"),
          col("event_id"), col("event_type"),
          lit("2024-01-15 00:00:00").cast("timestamp"))
        .orderBy(col("value"))
    },

    // Per-entity change TIMELINE — the audit trail behind a06's fleet
    // churn rate: every real value change with the previous value and
    // how long the new value held. Two window passes on one
    // entity-keyed shuffle family; no join back to the raw history.
    "a10_attr_timeline" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      AttributeStore.timeline(ev, col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .select(col("entity_id"), date_format(col("changed_at"), TS).as("changed_at"),
          col("prev_value"), col("new_value"), col("change_kind"),
          col("held_seconds"))
        .orderBy(col("entity_id"), col("changed_at"))
    },

    // Dwell-time distribution per attribute value — "how long do
    // entities stay in config X": a10's per-entity holds rolled to
    // the fleet answer (hold counts, open vs completed, mean/max
    // completed duration). One O(values) groupBy on top of a10's
    // window family; mean = IEEE division of exact longs.
    "a11_value_dwell" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      AttributeStore.valueDwell(ev, col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .orderBy(col("value"))
    },

    // Value TRANSITION MATRIX — which config moves actually happen
    // (a10 lists per-entity changes; this is the fleet's from→to
    // edge table: the standard upgrade path vs the flapping pair).
    // One groupBy over O(values²) edges on a10's window family;
    // share/mean are IEEE divisions of exact longs.
    "a12_attr_transitions" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      AttributeStore.transitions(ev, col("user_id"), col("ts"),
          col("event_id"), col("event_type"))
        .orderBy(col("from_value"), col("to_value"))
    }
  )

  private val ds = "CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE)"

  val oracles: Seq[(String, String)] = Seq(
    "t01_rollup_hour" ->
      s"""SELECT user_id AS entity_id,
         |  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
         |  count(*) AS cnt, $ds AS sum_value, $ds / count(*) AS avg_value,
         |  max(value) AS max_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "t02_rollup_day" ->
      s"""SELECT user_id AS entity_id,
         |  strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
         |  count(*) AS cnt, $ds AS sum_value, $ds / count(*) AS avg_value,
         |  max(value) AS max_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "t03_entity_rollup" ->
      s"""SELECT c_mktsegment AS parent, count(*) AS cnt, $ds AS sum_value
         |FROM events JOIN customer ON user_id = c_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "t04_trend_wide" -> {
      val cols = types.map(t =>
        s"CAST(sum(CASE WHEN event_type = '$t' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS ${t}_sum")
        .mkString(",\n  ")
      s"""SELECT user_id AS entity_id,
         |  strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
         |  $cols,
         |  count(*) AS cnt
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    "t05_gap_detect" ->
      """WITH obs AS (SELECT DISTINCT user_id, date_trunc('hour', ts) AS bucket FROM events),
        |rng AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi FROM obs GROUP BY 1),
        |ex AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket FROM rng)
        |SELECT ex.user_id AS entity_id, count(*) AS n_missing
        |FROM ex LEFT JOIN obs ON ex.user_id = obs.user_id AND ex.bucket = obs.bucket
        |WHERE obs.user_id IS NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "t06_modified_log" ->
      """SELECT user_id AS entity_id,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_modified,
        |  count(*) AS n_rows
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "t07_asof_join" ->
      """SELECT p.event_id, p.user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS p_ts,
        |  c.c_event_id,
        |  strftime(c.c_ts, '%Y-%m-%d %H:%M:%S') AS c_ts
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN (SELECT user_id, ts, event_id AS c_event_id, ts AS c_ts
        |           FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,

    "t08_computed_trend" ->
      s"""SELECT user_id AS entity_id,
         |  strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
         |  count(*) AS cnt,
         |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
         |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
         |  $ds AS sum_value,
         |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) / count(*) AS error_rate,
         |  $ds / count(*) AS value_per_event
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "a01_attr_current" ->
      """SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
        |  CAST(regexp_replace(props, '[^0-9]', '', 'g') AS BIGINT) AS k
        |FROM (SELECT *, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "a02_attr_history" ->
      """SELECT user_id, event_id, event_type,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
        |  coalesce(strftime(lead(ts) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id), '%Y-%m-%d %H:%M:%S'),
        |    '9999-12-31 00:00:00') AS valid_to
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    "a03_attr_compact" ->
      """SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, event_type
        |FROM (SELECT *, lag(event_type) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events)
        |WHERE prev IS NULL OR prev <> event_type
        |ORDER BY user_id, event_id""".stripMargin,

    "a04_attr_at_time" ->
      """SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
        |  CAST(regexp_replace(props, '[^0-9]', '', 'g') AS BIGINT) AS k
        |FROM (SELECT *, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00')
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "a05_attr_diff" ->
      """WITH v1 AS (SELECT user_id AS entity_id,
        |    CAST(regexp_replace(props, '[^0-9]', '', 'g') AS BIGINT) AS value_before
        |  FROM (SELECT *, row_number() OVER (
        |      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events WHERE ts <= TIMESTAMP '2024-01-10 00:00:00')
        |  WHERE rn = 1),
        |v2 AS (SELECT user_id AS entity_id,
        |    CAST(regexp_replace(props, '[^0-9]', '', 'g') AS BIGINT) AS value_after
        |  FROM (SELECT *, row_number() OVER (
        |      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events WHERE ts <= TIMESTAMP '2024-01-20 00:00:00')
        |  WHERE rn = 1)
        |SELECT COALESCE(v1.entity_id, v2.entity_id) AS entity_id,
        |  value_before, value_after,
        |  CASE WHEN v1.entity_id IS NULL THEN 'added'
        |       WHEN v2.entity_id IS NULL THEN 'removed'
        |       ELSE 'changed' END AS change
        |FROM v1 FULL OUTER JOIN v2 ON v1.entity_id = v2.entity_id
        |WHERE value_before IS DISTINCT FROM value_after
        |   OR v1.entity_id IS NULL OR v2.entity_id IS NULL
        |ORDER BY 1""".stripMargin,

    "n01_notifications" ->
      """SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
        |  CAST(regexp_replace(props, '[^0-9]', '', 'g') AS BIGINT) AS k, value
        |FROM events WHERE event_type = 'error'
        |  AND CAST(regexp_replace(props, '[^0-9]', '', 'g') AS BIGINT) >= 50
        |ORDER BY event_id""".stripMargin,

    "t13_sessions" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
        |        PARTITION BY user_id ORDER BY ts)) > 10800000000 THEN 1 ELSE 0 END AS gap
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts, sum(gap) OVER (
        |    PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "t15_counter_rate" ->
      s"""WITH h AS (SELECT user_id AS entity_id, date_trunc('hour', ts) AS bucket,
         |  $ds AS sum_value FROM events GROUP BY 1, 2),
         |d AS (SELECT entity_id, bucket, sum_value,
         |  sum_value - lag(sum_value) OVER w AS delta0,
         |  CAST(epoch(bucket) - epoch(lag(bucket) OVER w) AS DOUBLE) AS gap_s
         |FROM h WINDOW w AS (PARTITION BY entity_id ORDER BY bucket)),
         |e AS (SELECT entity_id, bucket, sum_value,
         |  CASE WHEN delta0 < 0 THEN NULL ELSE delta0 END AS delta, gap_s FROM d)
         |SELECT entity_id, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
         |  sum_value, delta, delta / gap_s AS rate_per_s
         |FROM e ORDER BY 1, 2""".stripMargin,

    "t16_gapfill" ->
      s"""WITH h AS (SELECT user_id AS entity_id, date_trunc('hour', ts) AS bucket,
         |  $ds AS sum_value FROM events GROUP BY 1, 2),
         |r AS (SELECT entity_id, min(bucket) AS lo, max(bucket) AS hi FROM h GROUP BY 1),
         |g AS (SELECT entity_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket FROM r),
         |j AS (SELECT g.entity_id, g.bucket, h.sum_value,
         |  h.sum_value IS NULL AS filled
         |  FROM g LEFT JOIN h ON g.entity_id = h.entity_id AND g.bucket = h.bucket),
         |f AS (SELECT entity_id, filled,
         |  last_value(sum_value IGNORE NULLS) OVER (PARTITION BY entity_id ORDER BY bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_value FROM j)
         |SELECT entity_id, count(*) AS n_buckets,
         |  CAST(sum(CASE WHEN filled THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
         |  CAST(sum(CAST(sum_value AS DECIMAL(18,4))) AS DOUBLE) AS sum_filled_series
         |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

    "t18_gapfill_interp" ->
      // Window + interpolation shapes mirror the Spark side exactly
      // (same frames, same guarded frac, same op order).
      s"""WITH h AS (SELECT user_id AS entity_id, date_trunc('hour', ts) AS bucket,
         |  $ds AS sum_value FROM events GROUP BY 1, 2),
         |r AS (SELECT entity_id, min(bucket) AS lo, max(bucket) AS hi FROM h GROUP BY 1),
         |g AS (SELECT entity_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket FROM r),
         |j AS (SELECT g.entity_id, g.bucket, h.sum_value, h.sum_value IS NULL AS filled
         |      FROM g LEFT JOIN h ON g.entity_id = h.entity_id AND g.bucket = h.bucket),
         |w AS (SELECT entity_id, bucket, filled,
         |  last_value(sum_value IGNORE NULLS) OVER bk AS pv,
         |  last_value(CASE WHEN sum_value IS NOT NULL THEN bucket END IGNORE NULLS) OVER bk AS pb,
         |  first_value(sum_value IGNORE NULLS) OVER fw AS nv,
         |  first_value(CASE WHEN sum_value IS NOT NULL THEN bucket END IGNORE NULLS) OVER fw AS nb
         |  FROM j WINDOW
         |    bk AS (PARTITION BY entity_id ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |    fw AS (PARTITION BY entity_id ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
         |f AS (SELECT entity_id, bucket, filled,
         |  pv + (nv - pv) * (CASE WHEN epoch(nb) = epoch(pb) THEN CAST(0 AS DOUBLE)
         |    ELSE CAST(epoch(bucket) - epoch(pb) AS DOUBLE) / CAST(epoch(nb) - epoch(pb) AS DOUBLE) END) AS sum_value
         |  FROM w)
         |SELECT entity_id, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket, sum_value, filled
         |FROM f ORDER BY 1, 2""".stripMargin,

    "t26_percentile_rollup" ->
      """SELECT user_id AS entity_id,
        |  strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
        |  count(*) AS cnt,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.95), 4) AS p95
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "t27_week_over_week" ->
      """WITH wk AS (SELECT user_id AS entity_id, date_trunc('week', ts) AS bucket,
        |  sum(CAST(value AS DECIMAL(18,4))) AS sum_dec FROM events GROUP BY 1, 2),
        |l AS (SELECT entity_id, bucket, sum_dec,
        |  lag(sum_dec) OVER (PARTITION BY entity_id ORDER BY bucket) AS prev_dec FROM wk)
        |SELECT entity_id, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
        |  CAST(sum_dec AS DOUBLE) AS sum_value,
        |  CAST(prev_dec AS DOUBLE) AS prev_value,
        |  CAST(sum_dec - prev_dec AS DOUBLE) AS delta,
        |  CASE WHEN prev_dec <> 0 THEN
        |    round(CAST(sum_dec - prev_dec AS DOUBLE) / CAST(prev_dec AS DOUBLE), 4)
        |  END AS pct_change
        |FROM l ORDER BY 1, 2""".stripMargin,

    "t19_gapfill_900s" ->
      s"""WITH h AS (SELECT user_id AS entity_id,
         |  make_timestamp(CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) * 1000000) AS bucket,
         |  $ds AS sum_value FROM events GROUP BY 1, 2),
         |r AS (SELECT entity_id, min(bucket) AS lo, max(bucket) AS hi FROM h GROUP BY 1),
         |g AS (SELECT entity_id, unnest(generate_series(lo, hi, INTERVAL 900 SECOND)) AS bucket FROM r),
         |j AS (SELECT g.entity_id, g.bucket, h.sum_value,
         |  h.sum_value IS NULL AS filled
         |  FROM g LEFT JOIN h ON g.entity_id = h.entity_id AND g.bucket = h.bucket),
         |f AS (SELECT entity_id, filled,
         |  last_value(sum_value IGNORE NULLS) OVER (PARTITION BY entity_id ORDER BY bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_value FROM j)
         |SELECT entity_id, count(*) AS n_buckets,
         |  CAST(sum(CASE WHEN filled THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
         |  CAST(sum(CAST(sum_value AS DECIMAL(18,4))) AS DOUBLE) AS sum_filled_series
         |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

    "t22_gapfill_wide" ->
      s"""WITH h AS (SELECT user_id AS entity_id, date_trunc('hour', ts) AS bucket,
         |  CAST(sum(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS click_sum,
         |  CAST(sum(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS view_sum
         |  FROM events GROUP BY 1, 2),
         |r AS (SELECT entity_id, min(bucket) AS lo, max(bucket) AS hi FROM h GROUP BY 1),
         |g AS (SELECT entity_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket FROM r),
         |j AS (SELECT g.entity_id, g.bucket, h.click_sum, h.view_sum,
         |  h.entity_id IS NULL AS filled
         |  FROM g LEFT JOIN h ON g.entity_id = h.entity_id AND g.bucket = h.bucket),
         |f AS (SELECT entity_id, filled,
         |  last_value(click_sum IGNORE NULLS) OVER w AS click_sum,
         |  last_value(view_sum IGNORE NULLS) OVER w AS view_sum
         |  FROM j WINDOW w AS (PARTITION BY entity_id ORDER BY bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT entity_id, count(*) AS n_buckets,
         |  CAST(sum(CASE WHEN filled THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
         |  CAST(sum(CAST(click_sum AS DECIMAL(18,4))) AS DOUBLE) AS sum_click_series,
         |  CAST(sum(CAST(view_sum AS DECIMAL(18,4))) AS DOUBLE) AS sum_view_series
         |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

    "t23_rate_wide" ->
      s"""WITH h AS (SELECT user_id AS entity_id, date_trunc('day', ts) AS bucket,
         |  CAST(sum(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS click_sum,
         |  CAST(sum(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS view_sum
         |  FROM events GROUP BY 1, 2),
         |d AS (SELECT entity_id, bucket, click_sum, view_sum,
         |  click_sum - lag(click_sum) OVER w AS cd0,
         |  view_sum - lag(view_sum) OVER w AS vd0,
         |  CAST(epoch(bucket) - epoch(lag(bucket) OVER w) AS DOUBLE) AS gap_s
         |FROM h WINDOW w AS (PARTITION BY entity_id ORDER BY bucket)),
         |e AS (SELECT entity_id, bucket, click_sum, view_sum,
         |  CASE WHEN cd0 < 0 THEN NULL ELSE cd0 END AS click_sum_delta,
         |  CASE WHEN vd0 < 0 THEN NULL ELSE vd0 END AS view_sum_delta, gap_s FROM d)
         |SELECT entity_id, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
         |  click_sum, click_sum_delta, click_sum_delta / gap_s AS click_sum_rate_per_s,
         |  view_sum, view_sum_delta, view_sum_delta / gap_s AS view_sum_rate_per_s
         |FROM e ORDER BY 1, 2""".stripMargin,

    "t24_interp_wide" ->
      // Per-metric neighbor anchors (cpb/cnb vs vpb/vnb): a present
      // bucket with no 'view' events interpolates view_sum between
      // the buckets where view WAS observed — mirrors the Spark
      // side's per-metric obsBucket exactly, same frames, same
      // guarded frac, same op order.
      s"""WITH h AS (SELECT user_id AS entity_id, date_trunc('hour', ts) AS bucket,
         |  CAST(sum(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS click_sum,
         |  CAST(sum(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS view_sum
         |  FROM events GROUP BY 1, 2),
         |r AS (SELECT entity_id, min(bucket) AS lo, max(bucket) AS hi FROM h GROUP BY 1),
         |g AS (SELECT entity_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket FROM r),
         |j AS (SELECT g.entity_id, g.bucket, h.click_sum, h.view_sum,
         |  h.entity_id IS NULL AS filled
         |  FROM g LEFT JOIN h ON g.entity_id = h.entity_id AND g.bucket = h.bucket),
         |w AS (SELECT entity_id, bucket, filled,
         |  last_value(click_sum IGNORE NULLS) OVER bk AS cpv,
         |  last_value(CASE WHEN click_sum IS NOT NULL THEN bucket END IGNORE NULLS) OVER bk AS cpb,
         |  first_value(click_sum IGNORE NULLS) OVER fw AS cnv,
         |  first_value(CASE WHEN click_sum IS NOT NULL THEN bucket END IGNORE NULLS) OVER fw AS cnb,
         |  last_value(view_sum IGNORE NULLS) OVER bk AS vpv,
         |  last_value(CASE WHEN view_sum IS NOT NULL THEN bucket END IGNORE NULLS) OVER bk AS vpb,
         |  first_value(view_sum IGNORE NULLS) OVER fw AS vnv,
         |  first_value(CASE WHEN view_sum IS NOT NULL THEN bucket END IGNORE NULLS) OVER fw AS vnb
         |  FROM j WINDOW
         |    bk AS (PARTITION BY entity_id ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |    fw AS (PARTITION BY entity_id ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
         |f AS (SELECT entity_id, bucket, filled,
         |  cpv + (cnv - cpv) * (CASE WHEN epoch(cnb) = epoch(cpb) THEN CAST(0 AS DOUBLE)
         |    ELSE CAST(epoch(bucket) - epoch(cpb) AS DOUBLE) / CAST(epoch(cnb) - epoch(cpb) AS DOUBLE) END) AS click_sum,
         |  vpv + (vnv - vpv) * (CASE WHEN epoch(vnb) = epoch(vpb) THEN CAST(0 AS DOUBLE)
         |    ELSE CAST(epoch(bucket) - epoch(vpb) AS DOUBLE) / CAST(epoch(vnb) - epoch(vpb) AS DOUBLE) END) AS view_sum
         |  FROM w)
         |SELECT entity_id, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket, click_sum, view_sum, filled
         |FROM f ORDER BY 1, 2""".stripMargin,

    "t25_anomaly_wide" ->
      // t17's oracle per metric: melt the wide store to (entity,
      // bucket, metric, sd) rows, drop the per-metric NULL cells
      // (the Spark side's count/sum over a metric column skip them),
      // then the identical DECIMAL-moment → fixed-op-order z recipe.
      """WITH h AS (SELECT user_id AS entity_id, date_trunc('hour', ts) AS bucket,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS click_sum,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS view_sum
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT entity_id, bucket, 'click_sum' AS metric, click_sum AS sd FROM h
        |      UNION ALL
        |      SELECT entity_id, bucket, 'view_sum' AS metric, view_sum AS sd FROM h),
        |o AS (SELECT * FROM m WHERE sd IS NOT NULL),
        |st AS (SELECT entity_id, metric, count(*) AS n,
        |  CAST(sum(sd) AS DOUBLE) AS s1,
        |  CAST(CAST(sum(sd * sd) AS DECIMAL(38,4)) AS DOUBLE) AS s2
        |  FROM o GROUP BY 1, 2),
        |j AS (SELECT o.entity_id, o.bucket, o.metric, CAST(sd AS DOUBLE) AS v, n,
        |  s1 / n AS mean, s2 FROM o JOIN st
        |  ON o.entity_id = st.entity_id AND o.metric = st.metric
        |  WHERE n >= 12),
        |vv AS (SELECT entity_id, bucket, metric, v, mean,
        |  s2 / n - mean * mean AS variance FROM j),
        |z AS (SELECT entity_id, bucket, metric, v,
        |  round((v - mean) / sqrt(variance), 6) AS z
        |  FROM vv WHERE variance > 0)
        |SELECT entity_id, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket, metric, v, z
        |FROM z WHERE abs(z) >= 2.0 ORDER BY 1, 2, 3""".stripMargin,

    "t17_anomaly" ->
      // Moments stay DECIMAL-exact until the final per-row double
      // formula, whose op order mirrors the Spark side exactly.
      """WITH h AS (SELECT user_id AS entity_id, date_trunc('hour', ts) AS bucket,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sd
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT entity_id, count(*) AS n,
        |  CAST(sum(sd) AS DOUBLE) AS s1,
        |  CAST(CAST(sum(sd * sd) AS DECIMAL(38,4)) AS DOUBLE) AS s2 FROM h GROUP BY 1),
        |j AS (SELECT h.entity_id, bucket, CAST(sd AS DOUBLE) AS v, n,
        |  s1 / n AS mean, s2 FROM h JOIN st ON h.entity_id = st.entity_id
        |  WHERE n >= 24),
        |vv AS (SELECT entity_id, bucket, v, mean,
        |  s2 / n - mean * mean AS variance FROM j),
        |z AS (SELECT entity_id, bucket, v,
        |  round((v - mean) / sqrt(variance), 6) AS z
        |  FROM vv WHERE variance > 0)
        |SELECT entity_id, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket, v, z
        |FROM z WHERE abs(z) >= 2.0 ORDER BY 1, 2""".stripMargin,

    "t28_seasonal_baseline" ->
      // DuckDB dayofweek is 0-based (Sunday = 0); Spark's is 1-based
      // — the +1 aligns them. Moment/op-order discipline = t17's.
      """WITH d AS (SELECT user_id AS entity_id, date_trunc('day', ts) AS bucket,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sd
        |  FROM events GROUP BY 1, 2),
        |base AS (SELECT entity_id, dayofweek(bucket) + 1 AS dow,
        |    count(*) AS n_base,
        |    CAST(sum(sd) AS DOUBLE) AS s1,
        |    CAST(CAST(sum(sd * sd) AS DECIMAL(38,4)) AS DOUBLE) AS s2
        |  FROM d WHERE bucket < TIMESTAMP '2024-01-24 00:00:00'
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |ev AS (SELECT entity_id, bucket, dayofweek(bucket) + 1 AS dow,
        |    CAST(sd AS DOUBLE) AS v
        |  FROM d WHERE bucket >= TIMESTAMP '2024-01-24 00:00:00'),
        |j AS (SELECT ev.entity_id, ev.bucket, ev.dow, ev.v, base.n_base,
        |    s1 / n_base AS mean, s2 FROM ev
        |  JOIN base ON ev.entity_id = base.entity_id AND ev.dow = base.dow),
        |vv AS (SELECT *, s2 / n_base - mean * mean AS variance FROM j)
        |SELECT entity_id, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
        |  CAST(dow AS INT) AS dow, v, n_base,
        |  round((v - mean) / sqrt(variance), 6) AS z
        |FROM vv WHERE variance > 0 ORDER BY 1, 2""".stripMargin,

    "t29_trend_forecast" ->
      // x = exact epoch days; Σx/Σx² exact ints, Σy/Σxy decimal →
      // double only inside the fixed-op-order closed forms (t17's
      // discipline, so slope/intercept/forecast are bit-identical).
      """WITH d AS (SELECT user_id AS entity_id, date_trunc('day', ts) AS bucket,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sd
        |  FROM events GROUP BY 1, 2),
        |x AS (SELECT entity_id,
        |    date_diff('day', DATE '1970-01-01', CAST(bucket AS DATE)) AS x, sd FROM d),
        |g AS (SELECT entity_id, count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx,
        |    CAST(sum(sd) AS DOUBLE) AS sy,
        |    CAST(CAST(sum(x * sd) AS DECIMAL(38,4)) AS DOUBLE) AS sxy,
        |    max(x) AS mx
        |  FROM x GROUP BY 1 HAVING count(*) >= 7),
        |f AS (SELECT entity_id, n, sx, sy, mx,
        |    (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope FROM g)
        |SELECT entity_id, n AS n_days, round(slope, 6) AS slope,
        |  round((sy - slope * sx) / n, 6) AS intercept,
        |  round((sy - slope * sx) / n + slope * (mx + 1), 6) AS forecast_next
        |FROM f ORDER BY entity_id""".stripMargin,

    "t37_capacity_horizon" ->
      // t29's fit, then the horizon from the ROUNDED slope/forecast
      // (mirroring the Spark side exactly: rounded operands, one
      // multiply, one unrounded IEEE division).
      """WITH d AS (SELECT user_id AS entity_id, date_trunc('day', ts) AS bucket,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sd
        |  FROM events GROUP BY 1, 2),
        |x AS (SELECT entity_id,
        |    date_diff('day', DATE '1970-01-01', CAST(bucket AS DATE)) AS x, sd FROM d),
        |g AS (SELECT entity_id, count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx,
        |    CAST(sum(sd) AS DOUBLE) AS sy,
        |    CAST(CAST(sum(x * sd) AS DECIMAL(38,4)) AS DOUBLE) AS sxy,
        |    max(x) AS mx
        |  FROM x GROUP BY 1 HAVING count(*) >= 7),
        |f AS (SELECT entity_id, n, sx, sy, mx,
        |    (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope FROM g),
        |o AS (SELECT entity_id, n AS n_days, round(slope, 6) AS slope,
        |    round((sy - slope * sx) / n, 6) AS intercept,
        |    round((sy - slope * sx) / n + slope * (mx + 1), 6) AS forecast_next
        |  FROM f)
        |SELECT entity_id, n_days, slope, intercept, forecast_next,
        |  CASE WHEN slope > 0 AND forecast_next > 0
        |       THEN (1.0 * forecast_next) / slope END AS days_to_factor
        |FROM o ORDER BY entity_id""".stripMargin,

    "t30_availability" ->
      """WITH h AS (SELECT DISTINCT user_id AS entity_id, date_trunc('hour', ts) AS h FROM events),
        |pd AS (SELECT entity_id, date_trunc('day', h) AS day, count(*) AS n FROM h GROUP BY 1, 2),
        |span AS (SELECT min(date_trunc('day', ts)) AS lo, max(date_trunc('day', ts)) AS hi FROM events),
        |days AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM span),
        |e AS (SELECT DISTINCT user_id AS entity_id FROM events),
        |grid AS (SELECT entity_id, day FROM e, days)
        |SELECT grid.entity_id, strftime(grid.day, '%Y-%m-%d') AS day,
        |  coalesce(n, 0) AS n_hours, coalesce(n, 0) / 24 AS availability
        |FROM grid LEFT JOIN pd ON grid.entity_id = pd.entity_id AND grid.day = pd.day
        |ORDER BY 1, 2""".stripMargin,

    "t38_error_budget" ->
      // t30's coverage plan rolled to per-entity budget arithmetic:
      // breach = INTEGER compare (n_hours·100 < 2280), mean/budget =
      // single IEEE ops on exact operands.
      """WITH h AS (SELECT DISTINCT user_id AS entity_id, date_trunc('hour', ts) AS h FROM events),
        |pd AS (SELECT entity_id, date_trunc('day', h) AS day, count(*) AS n FROM h GROUP BY 1, 2),
        |span AS (SELECT min(date_trunc('day', ts)) AS lo, max(date_trunc('day', ts)) AS hi FROM events),
        |days AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM span),
        |e AS (SELECT DISTINCT user_id AS entity_id FROM events),
        |grid AS (SELECT entity_id, day FROM e, days),
        |cov AS (SELECT grid.entity_id, coalesce(n, 0) AS n_hours
        |  FROM grid LEFT JOIN pd ON grid.entity_id = pd.entity_id AND grid.day = pd.day),
        |agg AS (SELECT entity_id, count(*) AS n_days,
        |    CAST(sum(n_hours) AS BIGINT) AS sh,
        |    CAST(sum(CASE WHEN n_hours * 100 < 2280 THEN 1 ELSE 0 END) AS BIGINT) AS n_breach_days
        |  FROM cov GROUP BY 1)
        |SELECT entity_id, n_days, sh / (24 * n_days) AS mean_availability,
        |  n_breach_days, CAST(0.05 AS DOUBLE) * n_days AS allowed_breach_days,
        |  CAST(0.05 AS DOUBLE) * n_days - n_breach_days AS budget_remaining,
        |  CASE WHEN n_breach_days > CAST(0.05 AS DOUBLE) * n_days THEN 'exhausted'
        |       ELSE 'within_budget' END AS status
        |FROM agg ORDER BY entity_id""".stripMargin,

    "t39_seasonality" ->
      // Denominator-cleared discipline: Σ_h n_h·|m_h − G| =
      // Σ_h |N·s_h − n_h·S1| / N, so everything up to the final
      // divisions is exact DECIMAL (order-free); m_h and the ratios
      // are single IEEE divisions of exact operands, bit-identical
      // cross-engine (peak/trough tie-breaks then agree too).
      """WITH d AS (SELECT user_id AS entity_id, date_trunc('hour', ts) AS bucket,
        |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sd
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT entity_id, hour(bucket) AS h, count(*) AS n_h,
        |    CAST(sum(sd) AS DECIMAL(18,4)) AS s_h
        |  FROM d GROUP BY 1, 2),
        |w AS (SELECT *, CAST(sum(n_h) OVER (PARTITION BY entity_id) AS BIGINT) AS N,
        |    CAST(sum(s_h) OVER (PARTITION BY entity_id) AS DECIMAL(18,4)) AS S1
        |  FROM g),
        |m AS (SELECT *, CAST(s_h AS DOUBLE) / n_h AS m_h,
        |    abs(CAST(N AS DECIMAL(12,0)) * s_h - CAST(n_h AS DECIMAL(12,0)) * S1) AS num_h
        |  FROM w),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY entity_id ORDER BY m_h DESC, h) AS rp,
        |    row_number() OVER (PARTITION BY entity_id ORDER BY m_h ASC, h) AS rt
        |  FROM m)
        |SELECT entity_id, max(N) AS n_buckets,
        |  CAST(max(S1) AS DOUBLE) / max(N) AS grand_mean,
        |  max(CASE WHEN rp = 1 THEN h END) AS peak_hour,
        |  max(CASE WHEN rp = 1 THEN m_h END) AS peak_mean,
        |  max(CASE WHEN rt = 1 THEN h END) AS trough_hour,
        |  max(CASE WHEN rt = 1 THEN m_h END) AS trough_mean,
        |  CASE WHEN max(S1) > 0 THEN max(CASE WHEN rp = 1 THEN m_h END)
        |    / (CAST(max(S1) AS DOUBLE) / max(N)) END AS pmr,
        |  CASE WHEN max(S1) > 0 THEN CAST(sum(num_h) AS DOUBLE)
        |    / CAST(CAST(max(N) AS DECIMAL(12,0)) * max(S1) AS DOUBLE) END AS amplitude
        |FROM r GROUP BY entity_id ORDER BY entity_id""".stripMargin,

    "t40_top_movers" ->
      // rank = row_number on (|Δ| desc, entity) over EXACT decimals —
      // agrees bit-identically with CollectMinK's struct ordering
      """WITH d AS (SELECT user_id AS entity_id, date_trunc('day', ts) AS bucket,
        |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sd
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT *, lag(sd) OVER (PARTITION BY entity_id ORDER BY bucket) AS prev
        |  FROM d),
        |x AS (SELECT entity_id, bucket, sd, prev, sd - prev AS delta
        |  FROM l WHERE prev IS NOT NULL),
        |r AS (SELECT *, row_number() OVER (
        |    PARTITION BY bucket ORDER BY abs(delta) DESC, entity_id) AS rank
        |  FROM x)
        |SELECT strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
        |  CAST(rank AS BIGINT) AS rank, entity_id,
        |  CAST(sd AS DOUBLE) AS value, CAST(prev AS DOUBLE) AS prev_value,
        |  CAST(delta AS DOUBLE) AS delta
        |FROM r WHERE rank <= 3 ORDER BY bucket, rank""".stripMargin,

    "a08_attr_staleness" ->
      """WITH mx AS (SELECT max(date_trunc('day', ts)) AS m FROM events),
        |cur AS (SELECT user_id, ts, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_write,
        |  CAST(date_diff('day', date_trunc('day', ts), (SELECT m FROM mx)) AS BIGINT)
        |    AS days_stale,
        |  CASE WHEN date_diff('day', date_trunc('day', ts), (SELECT m FROM mx)) >= 7
        |       THEN 'stale' ELSE 'fresh' END AS status
        |FROM cur WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "t36_asof_tolerance" ->
      """SELECT p.event_id, p.user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS p_ts,
        |  CASE WHEN c.c_ts IS NOT NULL AND p.ts - c.c_ts <= INTERVAL 1 HOUR
        |       THEN c.c_event_id END AS c_event_id,
        |  CASE WHEN c.c_ts IS NOT NULL AND p.ts - c.c_ts <= INTERVAL 1 HOUR
        |       THEN strftime(c.c_ts, '%Y-%m-%d %H:%M:%S') END AS c_ts
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts, event_id AS c_event_id, ts AS c_ts
        |                FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,

    "t35_active_entities" ->
      """WITH pres AS (SELECT DISTINCT user_id AS entity_id, date_trunc('day', ts) AS day
        |  FROM events),
        |dau AS (SELECT day, count(DISTINCT entity_id) AS dau FROM pres GROUP BY 1),
        |fan AS (SELECT entity_id, day + off * INTERVAL 1 DAY AS day
        |  FROM pres, LATERAL unnest(generate_series(0, 6)) AS g(off)),
        |wau AS (SELECT day, count(DISTINCT entity_id) AS wau FROM fan GROUP BY 1)
        |SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau, wau
        |FROM dau JOIN wau ON dau.day = wau.day
        |ORDER BY 1""".stripMargin,

    "t34_busy_hour" ->
      // Profile averages are IEEE divisions of DECIMAL-exact sums, so
      // the desc-avg rank (and its tie detection) agrees cross-engine.
      """WITH h AS (SELECT user_id AS entity_id, date_trunc('hour', ts) AS bucket,
        |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sd
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT entity_id, CAST(hour(bucket) AS BIGINT) AS busy_hour,
        |    count(*) AS n_obs, CAST(sum(sd) AS DOUBLE) / count(*) AS avg_value
        |  FROM h GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY entity_id
        |    ORDER BY avg_value DESC, busy_hour) AS rn FROM p)
        |SELECT entity_id, busy_hour, n_obs, round(avg_value, 6) AS avg_value
        |FROM r WHERE rn = 1 ORDER BY 1""".stripMargin,

    "t33_rolling_day" ->
      """WITH h AS (SELECT user_id AS entity_id, date_trunc('hour', ts) AS bucket,
        |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sd
        |  FROM events GROUP BY 1, 2),
        |e AS (SELECT entity_id, bucket, sd, CAST(epoch(bucket) AS BIGINT) AS ep FROM h)
        |SELECT entity_id, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
        |  CAST(sum(sd) OVER w AS DOUBLE) AS win_sum,
        |  count(*) OVER w AS win_buckets
        |FROM e
        |WINDOW w AS (PARTITION BY entity_id ORDER BY ep
        |             RANGE BETWEEN 86399 PRECEDING AND CURRENT ROW)
        |ORDER BY 1, 2""".stripMargin,

    "a07_attr_snapshots" ->
      """WITH h AS (SELECT user_id, ts, props,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS til
        |  FROM events),
        |s AS (SELECT unnest([TIMESTAMP '2024-01-08 00:00:00',
        |    TIMESTAMP '2024-01-15 00:00:00', TIMESTAMP '2024-01-22 00:00:00',
        |    TIMESTAMP '2024-01-29 00:00:00']) AS snapshot_ts)
        |SELECT user_id, strftime(snapshot_ts, '%Y-%m-%d %H:%M:%S') AS snapshot_ts,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
        |  CAST(regexp_replace(props, '[^0-9]', '', 'g') AS BIGINT) AS k
        |FROM h JOIN s ON s.snapshot_ts >= h.ts
        |  AND (h.til IS NULL OR s.snapshot_ts < h.til)
        |ORDER BY 1, 2""".stripMargin,

    "t32_change_points" ->
      // Frame sums stay DECIMAL-exact; each mean is one IEEE division
      // of exact operands, the shift one IEEE subtraction — op order
      // mirrors TrendStore.changePoints exactly (t17 discipline).
      """WITH d AS (SELECT user_id AS entity_id, date_trunc('day', ts) AS bucket,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sd
        |  FROM events GROUP BY 1, 2),
        |f AS (SELECT entity_id, bucket,
        |    count(*) OVER wb AS nb, CAST(sum(sd) OVER wb AS DOUBLE) AS sb,
        |    count(*) OVER wa AS na, CAST(sum(sd) OVER wa AS DOUBLE) AS sa
        |  FROM d
        |  WINDOW wb AS (PARTITION BY entity_id ORDER BY bucket
        |                ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING),
        |         wa AS (PARTITION BY entity_id ORDER BY bucket
        |                ROWS BETWEEN 1 FOLLOWING AND 7 FOLLOWING)),
        |c AS (SELECT entity_id, bucket, sb / nb AS mean_before,
        |    sa / na AS mean_after, sa / na - sb / nb AS shift
        |  FROM f WHERE nb = 7 AND na = 7),
        |r AS (SELECT *, row_number() OVER (PARTITION BY entity_id
        |    ORDER BY abs(shift) DESC, bucket) AS rn FROM c)
        |SELECT entity_id, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
        |  round(mean_before, 6) AS mean_before,
        |  round(mean_after, 6) AS mean_after, round(shift, 6) AS shift
        |FROM r WHERE rn = 1 ORDER BY 1""".stripMargin,

    "t31_outage_windows" ->
      """WITH obs AS (SELECT DISTINCT user_id, date_trunc('hour', ts) AS bucket FROM events),
        |rng AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi FROM obs GROUP BY 1),
        |ex AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket FROM rng),
        |miss AS (SELECT ex.user_id, ex.bucket
        |  FROM ex LEFT JOIN obs ON ex.user_id = obs.user_id AND ex.bucket = obs.bucket
        |  WHERE obs.user_id IS NULL),
        |isl AS (SELECT user_id, bucket,
        |    CAST(epoch(bucket) / 3600 AS BIGINT)
        |      - row_number() OVER (PARTITION BY user_id ORDER BY bucket) AS island
        |  FROM miss)
        |SELECT user_id AS entity_id,
        |  strftime(min(bucket), '%Y-%m-%d %H:%M:%S') AS outage_start,
        |  strftime(max(bucket), '%Y-%m-%d %H:%M:%S') AS outage_end,
        |  count(*) AS n_buckets
        |FROM isl GROUP BY user_id, island ORDER BY 1, 2""".stripMargin,

    "a06_attr_churn" ->
      """WITH r AS (SELECT *,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events)
        |SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
        |  count(*) AS n_changes, count(DISTINCT user_id) AS n_entities
        |FROM r WHERE rn > 1 AND prev IS DISTINCT FROM event_type
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "a09_attr_distribution" ->
      """WITH cur AS (SELECT event_type FROM (
        |    SELECT event_type, row_number() OVER (
        |      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00') WHERE rn = 1),
        |cells AS (SELECT event_type AS value, count(*) AS n_entities FROM cur GROUP BY 1)
        |SELECT value, n_entities,
        |  CAST(sum(n_entities) OVER () AS BIGINT) AS fleet_total,
        |  n_entities / CAST(sum(n_entities) OVER () AS BIGINT) AS share
        |FROM cells ORDER BY value""".stripMargin,

    "a10_attr_timeline" ->
      """WITH h AS (SELECT user_id, ts, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c AS (SELECT * FROM h WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
        |t AS (SELECT user_id AS entity_id, ts, rn, prev AS prev_value,
        |    event_type AS new_value,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
        |  FROM c)
        |SELECT entity_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS changed_at,
        |  prev_value, new_value,
        |  CASE WHEN rn = 1 THEN 'initial' ELSE 'change' END AS change_kind,
        |  date_diff('second', ts, next_ts) AS held_seconds
        |FROM t ORDER BY entity_id, changed_at""".stripMargin,

    "a11_value_dwell" ->
      // a10's timeline CTEs verbatim, rolled per value; the mean
      // division takes exact BIGINT operands (sum re-cast from
      // DuckDB's HUGEINT — values bounded far below 2^53) so the
      // IEEE quotient is bit-identical unrounded
      """WITH h AS (SELECT user_id, ts, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c AS (SELECT * FROM h WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
        |t AS (SELECT user_id AS entity_id, ts, event_type AS new_value,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
        |  FROM c),
        |tl AS (SELECT new_value, date_diff('second', ts, next_ts) AS held FROM t)
        |SELECT new_value AS value, count(*) AS n_holds,
        |  count(held) AS n_completed,
        |  count(*) - count(held) AS n_open,
        |  CAST(sum(held) AS BIGINT) / count(held) AS mean_held_seconds,
        |  max(held) AS max_held_seconds
        |FROM tl GROUP BY 1 ORDER BY 1""".stripMargin,

    "a12_attr_transitions" ->
      // a10's timeline CTEs verbatim; the matrix keeps only rn > 1
      // rows (real changes — provisioning has no from_value). Share
      // and mean are IEEE divisions of exact BIGINTs, unrounded.
      """WITH h AS (SELECT user_id, ts, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c AS (SELECT * FROM h WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
        |t AS (SELECT user_id AS entity_id, ts, rn, prev, event_type,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
        |  FROM c),
        |tr AS (SELECT entity_id, prev AS from_value, event_type AS to_value,
        |    date_diff('second', ts, next_ts) AS held
        |  FROM t WHERE rn > 1),
        |edges AS (SELECT from_value, to_value, count(*) AS n_transitions,
        |    count(DISTINCT entity_id) AS n_entities,
        |    CAST(sum(held) AS BIGINT) / count(held) AS mean_held_seconds
        |  FROM tr GROUP BY 1, 2)
        |SELECT from_value, to_value, n_transitions, n_entities,
        |  mean_held_seconds,
        |  n_transitions / CAST(sum(n_transitions) OVER () AS BIGINT) AS share
        |FROM edges ORDER BY from_value, to_value""".stripMargin
  )
}
