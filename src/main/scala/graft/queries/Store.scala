package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.operators.{Aggregation, EntityRegistry, Materialize, NotificationStore, Relations, TrendStore, Trigger}
import graft.sources.TableCatalog

/** Store-machinery queries: incremental materialization (t09),
  * granularity engine (t10/t11), entity directory (e01), relation
  * stores (r01), typed notification stores (n02), and the
  * declarative aggregation-definition layer (g01) — the reference
  * subsystems around the core operators
  * (minerva/storage/trend/materialization, minerva/directory,
  * minerva/storage/notification, `minerva aggregation`).
  */
object Store {

  type Q = (SparkSession, String) => DataFrame

  private val TS = "yyyy-MM-dd HH:mm:ss"
  private val Cutoff = "2024-01-20 00:00:00"

  /** The trigger rule set under driver grading. BOTH the Spark plan
    * (Trigger.evaluate) and the DuckDB oracle (triggerOracleSql below)
    * are generated from these values — the two sides cannot drift.
    * Thresholds sit where the sf0.01 distributions actually fire
    * (hourly sums p90≈119/p99≈237; daily avg p50≈42/p90≈93). */
  private val triggerRules = Seq(
    Trigger.Rule("hourly_value_surge", "hour",
      Seq(Trigger.Threshold("value", "sum", ">", 150.0)), "major"),
    Trigger.Rule("hourly_event_burst", "hour",
      Seq(Trigger.Threshold("value", "count", ">", 1.0)), "minor"),
    Trigger.Rule("daily_value_level", "day",
      Seq(Trigger.Threshold("value", "avg", ">=", 60.0),
        Trigger.Threshold("value", "max", "<", 160.0)), "warning"))

  /** n12's declared maintenance windows — entities 1–3 exist at every
    * scale factor, so some firings mute and most don't at any sf.
    * Both the Spark window DataFrame and the oracle's VALUES derive
    * from these tuples (the generated-twin discipline). */
  private val maintenanceWindows = Seq(
    (1L, "2024-01-08 00:00:00", "2024-01-15 00:00:00"),
    (2L, "2024-01-01 00:00:00", "2024-02-01 00:00:00"),
    (3L, "2024-01-10 06:00:00", "2024-01-10 18:00:00"))

  // SLO rules on PERCENTILE thresholds — evaluated by n09 through
  // the same generated-twin machinery as the sum/avg rules.
  private val sloRules = Seq(
    Trigger.Rule("daily_p95_high", "day",
      Seq(Trigger.Threshold("value", "p95", ">=", 110.0)), "major"),
    Trigger.Rule("daily_p50_low", "day",
      Seq(Trigger.Threshold("value", "p50", "<", 40.0)), "minor"))

  /** n06's generated twin: the per-rule firing SQL with the same
    * gaps-and-islands run detection the Spark side applies — both
    * sides derive from one rule table AND one run formula. */
  private def triggerSustainedOracleSql(rules: Seq[Trigger.Rule],
                                        minConsecutive: Int): String = {
    val stepOf = Map("hour" -> 3600L, "day" -> 86400L)
    val fired = rules.map { r =>
      val having = r.thresholds
        .map(t => s"${Trigger.aggSql(t)} ${t.op} ${t.value}").mkString(" AND ")
      s"""SELECT user_id AS entity_id, date_trunc('${r.granularity}', ts) AS bucket,
         |  '${r.name}' AS rule, '${r.severity}' AS severity,
         |  ${stepOf(r.granularity)} AS step
         |FROM events GROUP BY 1, 2 HAVING $having""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH fired AS ($fired),
       |r AS (SELECT entity_id, bucket, rule, severity,
       |  CAST(floor(epoch(bucket) / step) AS BIGINT)
       |    - row_number() OVER (PARTITION BY entity_id, rule ORDER BY bucket) AS runid
       |  FROM fired),
       |p AS (SELECT entity_id, bucket, rule, severity,
       |  row_number() OVER (PARTITION BY entity_id, rule, runid ORDER BY bucket) AS pos
       |  FROM r)
       |SELECT entity_id, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket, rule, severity
       |FROM p WHERE pos >= $minConsecutive
       |ORDER BY rule, entity_id, bucket""".stripMargin
  }

  /** n05's generated twin: the same per-rule firing SQL as n04,
    * collapsed into per-(entity, day) notification sets. Both engines
    * compute the set membership from one rule table — no drift. */
  private def triggerSetsOracleSql(rules: Seq[Trigger.Rule]): String = {
    val fired = rules.map { r =>
      val having = r.thresholds
        .map(t => s"${Trigger.aggSql(t)} ${t.op} ${t.value}").mkString(" AND ")
      s"""SELECT user_id AS entity_id, date_trunc('${r.granularity}', ts) AS bucket,
         |  '${r.name}' AS rule FROM events GROUP BY 1, 2 HAVING $having""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH fired AS ($fired)
       |SELECT entity_id, strftime(date_trunc('day', bucket), '%Y-%m-%d') AS day,
       |  count(*) AS n_notifications, count(DISTINCT rule) AS n_rules,
       |  min(rule) AS first_rule, max(rule) AS last_rule
       |FROM fired GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** n12's generated twin: the same per-rule firing SQL with RAW
    * timestamp buckets (the interval compare needs them), the same
    * window VALUES the Spark side builds its DataFrame from, the same
    * left-join + group-collapse — the sides cannot drift. */
  private def triggerMaintenanceOracleSql(rules: Seq[Trigger.Rule],
                                          windows: Seq[(Long, String, String)]): String = {
    val fired = rules.map { r =>
      val having = r.thresholds
        .map(t => s"${Trigger.aggSql(t)} ${t.op} ${t.value}").mkString(" AND ")
      s"""SELECT user_id AS entity_id, date_trunc('${r.granularity}', ts) AS bucket,
         |  '${r.name}' AS rule, '${r.severity}' AS severity
         |FROM events GROUP BY 1, 2 HAVING $having""".stripMargin
    }.mkString("\nUNION ALL\n")
    val vals = windows.map { case (e, f, t) =>
      s"($e, TIMESTAMP '$f', TIMESTAMP '$t')" }.mkString(", ")
    s"""WITH fired AS ($fired),
       |win(entity_id, from_ts, to_ts) AS (VALUES $vals)
       |SELECT f.entity_id, strftime(f.bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
       |  f.rule, f.severity,
       |  CAST(max(CASE WHEN w.entity_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS muted
       |FROM fired f LEFT JOIN win w
       |  ON f.entity_id = w.entity_id AND f.bucket >= w.from_ts AND f.bucket < w.to_ts
       |GROUP BY 1, 2, 3, 4
       |ORDER BY rule, f.entity_id, bucket""".stripMargin
  }

  /** The per-rule firing UNION both trigger oracles share. */
  private def triggerFiringsUnion(rules: Seq[Trigger.Rule]): String =
    rules.map { r =>
      val having = r.thresholds
        .map(t => s"${Trigger.aggSql(t)} ${t.op} ${t.value}").mkString(" AND ")
      s"""SELECT user_id AS entity_id,
         |  strftime(date_trunc('${r.granularity}', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
         |  '${r.name}' AS rule, '${r.severity}' AS severity
         |FROM events GROUP BY 1, 2 HAVING $having""".stripMargin
    }.mkString("\nUNION ALL\n")

  private def triggerOracleSql(rules: Seq[Trigger.Rule]): String =
    triggerFiringsUnion(rules) + "\nORDER BY rule, entity_id, bucket"

  /** n07: the firing stream rolled to the on-call DIGEST — per (day,
    * rule, severity): firing count, distinct paged entities, first/
    * last firing bucket (the formatted buckets sort lexicographically
    * AS time, so min/max strings are exact on both engines). */
  private def triggerDigestOracleSql(rules: Seq[Trigger.Rule]): String =
    s"""WITH firings AS (${triggerFiringsUnion(rules)})
       |SELECT substr(bucket, 1, 10) AS day, rule, severity,
       |  count(*) AS n_firings, count(DISTINCT entity_id) AS n_entities,
       |  min(bucket) AS first_bucket, max(bucket) AS last_bucket
       |FROM firings GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin

  /** n08's generated twin: same per-rule firing SQL, same runid
    * formula as the sustained oracle, rolled to per-(rule, entity)
    * episode structure. */
  private def triggerFlapOracleSql(rules: Seq[Trigger.Rule]): String = {
    val stepOf = Map("hour" -> 3600L, "day" -> 86400L)
    val fired = rules.map { r =>
      val having = r.thresholds
        .map(t => s"${Trigger.aggSql(t)} ${t.op} ${t.value}").mkString(" AND ")
      s"""SELECT user_id AS entity_id, date_trunc('${r.granularity}', ts) AS bucket,
         |  '${r.name}' AS rule, '${r.severity}' AS severity,
         |  ${stepOf(r.granularity)} AS step
         |FROM events GROUP BY 1, 2 HAVING $having""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH fired AS ($fired),
       |r AS (SELECT entity_id, rule, severity,
       |  CAST(floor(epoch(bucket) / step) AS BIGINT)
       |    - row_number() OVER (PARTITION BY entity_id, rule ORDER BY bucket) AS runid
       |  FROM fired),
       |e AS (SELECT rule, entity_id, severity, runid, count(*) AS len
       |  FROM r GROUP BY 1, 2, 3, 4)
       |SELECT rule, entity_id, severity, CAST(sum(len) AS BIGINT) AS n_firings,
       |  count(*) AS n_episodes, CAST(max(len) AS BIGINT) AS longest_run
       |FROM e GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin
  }

  /** n13's escalation ladder — cutoffs shared by the Spark key and
    * the generated oracle so the two sides cannot drift. */
  private val escalationLevels = Seq(1 -> "notify", 3 -> "elevated", 6 -> "page")

  /** n13's generated twin: the flap oracle's runid derivation, a
    * per-run position, and the same descending CASE ladder. */
  private def triggerEscalationOracleSql(rules: Seq[Trigger.Rule],
      levels: Seq[(Int, String)]): String = {
    val stepOf = Map("hour" -> 3600L, "day" -> 86400L)
    val fired = rules.map { r =>
      val having = r.thresholds
        .map(t => s"${Trigger.aggSql(t)} ${t.op} ${t.value}").mkString(" AND ")
      s"""SELECT user_id AS entity_id, date_trunc('${r.granularity}', ts) AS bucket,
         |  '${r.name}' AS rule, '${r.severity}' AS severity,
         |  ${stepOf(r.granularity)} AS step
         |FROM events GROUP BY 1, 2 HAVING $having""".stripMargin
    }.mkString("\nUNION ALL\n")
    val ladder = levels.sortBy(-_._1)
      .map { case (m, n) => s"WHEN run_pos >= $m THEN '$n'" }.mkString(" ")
    s"""WITH fired AS ($fired),
       |r AS (SELECT *, CAST(floor(epoch(bucket) / step) AS BIGINT)
       |    - row_number() OVER (PARTITION BY entity_id, rule ORDER BY bucket) AS runid
       |  FROM fired),
       |p AS (SELECT entity_id, bucket, rule, severity,
       |    row_number() OVER (PARTITION BY entity_id, rule, runid ORDER BY bucket) AS run_pos
       |  FROM r)
       |SELECT entity_id, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
       |  rule, severity, run_pos, CASE $ladder END AS level
       |FROM p ORDER BY rule, entity_id, bucket""".stripMargin
  }

  /** n10's generated twin: the flap oracle's episode derivation,
    * rolled to rule level with durations (len × the rule's step). */
  private def triggerMttrOracleSql(rules: Seq[Trigger.Rule]): String = {
    val stepOf = Map("hour" -> 3600L, "day" -> 86400L)
    val fired = rules.map { r =>
      val having = r.thresholds
        .map(t => s"${Trigger.aggSql(t)} ${t.op} ${t.value}").mkString(" AND ")
      s"""SELECT user_id AS entity_id, date_trunc('${r.granularity}', ts) AS bucket,
         |  '${r.name}' AS rule, '${r.severity}' AS severity,
         |  ${stepOf(r.granularity)} AS step
         |FROM events GROUP BY 1, 2 HAVING $having""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH fired AS ($fired),
       |r AS (SELECT entity_id, rule, severity, step,
       |  CAST(floor(epoch(bucket) / step) AS BIGINT)
       |    - row_number() OVER (PARTITION BY entity_id, rule ORDER BY bucket) AS runid
       |  FROM fired),
       |e AS (SELECT rule, severity, entity_id, step, runid, count(*) AS len
       |  FROM r GROUP BY 1, 2, 3, 4, 5)
       |SELECT rule, severity, count(*) AS n_episodes,
       |  count(DISTINCT entity_id) AS n_entities,
       |  CAST(sum(len) AS BIGINT) * max(step) / count(*) AS mean_seconds,
       |  CAST(max(len) * max(step) AS BIGINT) AS max_seconds
       |FROM e GROUP BY 1, 2 ORDER BY rule""".stripMargin
  }

  /** n11's generated twin: distinct per-(entity, day, rule) firing
    * cells, self-joined into ordered co-firing pairs. */
  private def triggerCoFiringOracleSql(rules: Seq[Trigger.Rule]): String =
    s"""WITH firings AS (${triggerFiringsUnion(rules)}),
       |cells AS (SELECT DISTINCT entity_id, substr(bucket, 1, 10) AS day, rule
       |  FROM firings),
       |tot AS (SELECT rule, count(*) AS n_cells FROM cells GROUP BY 1),
       |pairs AS (SELECT a.rule AS rule1, b.rule AS rule2, count(*) AS n_cofire
       |  FROM cells a JOIN cells b
       |    ON a.entity_id = b.entity_id AND a.day = b.day AND a.rule < b.rule
       |  GROUP BY 1, 2)
       |SELECT rule1, rule2, n_cofire, t1.n_cells AS n_r1, t2.n_cells AS n_r2,
       |  n_cofire / t1.n_cells AS p2_given_1, n_cofire / t2.n_cells AS p1_given_2
       |FROM pairs
       |JOIN tot t1 ON t1.rule = rule1
       |JOIN tot t2 ON t2.rule = rule2
       |ORDER BY rule1, rule2""".stripMargin

  val defs: Seq[(String, Q)] = Seq(
    // Dirty-set computation exactly as Materialize.run uses it: state
    // is what a run that processed everything before `Cutoff` would
    // have recorded; the dirty set is every day the next run must
    // recompute.
    "t09_dirty_set" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val cutoff = lit(Cutoff).cast("timestamp")
      val state = Materialize.modifiedLogByDay(ev.filter(col("ts") < cutoff), col("ts"))
        .select(col("day"), col("last_modified").as("watermark"), col("n_rows"))
      Materialize.dirtySet(Materialize.modifiedLogByDay(ev, col("ts")), state)
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          date_format(col("last_modified"), TS).as("last_modified"),
          col("n_rows"))
        .orderBy(col("day"))
    },

    // Minerva labels a trend interval by its END timestamp (the
    // February-1st row covers January) — labelEnd applies that
    // convention on top of Spark's interval-start date_trunc buckets.
    "t10_rollup_month" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val hourly = TrendStore.rollup(ev, col("user_id"), col("ts"), col("value"), "hour")
      TrendStore.present(
          TrendStore.labelEnd(TrendStore.reRollup(hourly, "month"), "month"))
        .orderBy(col("entity_id"), col("bucket"))
    },

    "t11_rollup_15m" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      TrendStore.present(
          TrendStore.rollupSeconds(ev, col("user_id"), col("ts"), col("value"), 900L))
        .orderBy(col("entity_id"), col("bucket"))
    },

    "e01_entity_registry" -> { (s, dir) =>
      val c = TableCatalog(s, dir)
      val ents = c.customer.select(
          concat(lit("Customer="), col("c_custkey")).as("dn"),
          lit("customer").as("entity_type"), col("c_name").as("alias"))
        .unionByName(c.nation.select(
          concat(lit("Nation="), col("n_nationkey")).as("dn"),
          lit("nation").as("entity_type"), col("n_name").as("alias")))
        .unionByName(c.region.select(
          concat(lit("Region="), col("r_regionkey")).as("dn"),
          lit("region").as("entity_type"), col("r_name").as("alias")))
      EntityRegistry.register(ents, col("dn"), col("entity_type"), col("alias"))
        .select(col("dn"), col("entity_type"), col("alias"), col("entity_id"))
        .orderBy(col("dn"))
    },

    // Entity tagging (minerva directory: tags/tag groups attached to
    // entities): a tag-link table built from two deterministic
    // sources (market segment + nation, the nation side through a
    // broadcast dim join), collapsed to per-entity sorted tag sets.
    // The graded projection joins the sorted set to one scalar string
    // (the driver's hash harness compares scalar columns only);
    // library callers keep the array form via EntityRegistry.tagSets.
    "e02_entity_tags" -> { (s, dir) =>
      val c = TableCatalog(s, dir)
      val segTags = c.customer.select(col("c_custkey").as("entity_id"),
        concat(lit("segment:"), col("c_mktsegment")).as("tag"))
      val natTags = c.customer
        .join(broadcast(c.nation), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey").as("entity_id"),
          concat(lit("nation:"), col("n_name")).as("tag"))
      EntityRegistry.tagSets(segTags.unionByName(natTags))
        .select(col("entity_id"),
          array_join(col("tag_set"), ",").as("tag_set"), col("n_tags"))
        .orderBy(col("entity_id"))
    },

    // The directory query behind "how many entities carry tag X" —
    // tagStats over the same deterministic tag-link table as e02.
    "e04_tag_stats" -> { (s, dir) =>
      val c = TableCatalog(s, dir)
      val segTags = c.customer.select(col("c_custkey").as("entity_id"),
        concat(lit("segment:"), col("c_mktsegment")).as("tag"))
      val natTags = c.customer
        .join(broadcast(c.nation), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey").as("entity_id"),
          concat(lit("nation:"), col("n_name")).as("tag"))
      EntityRegistry.tagStats(segTags.unionByName(natTags))
        .orderBy(col("tag"))
    },

    // Directory-sync audit (minerva directory drift): registry =
    // customer dns, activity = their orders. TPC-H ships ~1/3 of
    // customers order-less, so the 'silent' class is non-degenerate;
    // 'unregistered' is structurally 0 here (orders reference
    // registered customers) but the full-outer path grades it.
    "e09_directory_audit" -> { (s, dir) =>
      val c = TableCatalog(s, dir)
      val reg = EntityRegistry.register(
        c.customer.select(concat(lit("Customer="), col("c_custkey")).as("dn"),
          lit("customer").as("entity_type"), col("c_name").as("alias")),
        col("dn"), col("entity_type"), col("alias"))
      EntityRegistry.syncStatus(reg, c.orders,
          concat(lit("Customer="), col("o_custkey")), col("o_orderdate"))
        .select(col("dn"), col("status"), col("n_rows"),
          date_format(col("last_active"), TS).as("last_active"))
        .orderBy(col("dn"))
    },

    "r01_relation_store" -> { (s, dir) =>
      val c = TableCatalog(s, dir)
      val custToNation = Relations.of(c.customer,
        concat(lit("Customer="), col("c_custkey")),
        concat(lit("Nation="), col("c_nationkey")), "customer->nation")
      val nationToRegion = Relations.of(c.nation,
        concat(lit("Nation="), col("n_nationkey")),
        concat(lit("Region="), col("n_regionkey")), "nation->region")
      Relations.compose(custToNation, nationToRegion)
        .groupBy(col("relation_type"), col("parent_dn"))
        .agg(count(lit(1)).as("n_children"))
        .orderBy(col("parent_dn"))
    },

    // Entity aggregation AT A GRANULARITY — the derived-store shape
    // Minerva's entity aggregation materializes: per-(region, month)
    // metric cells rolled up the composed two-hop relation
    // (TrendStore.entityRollupBucketed — broadcast relation ⋈ fact,
    // one (parent, bucket) shuffle).
    "e05_entity_rollup_bucketed" -> { (s, dir) =>
      val c = TableCatalog(s, dir)
      val custToNation = Relations.of(c.customer,
        concat(lit("Customer="), col("c_custkey")),
        concat(lit("Nation="), col("c_nationkey")), "customer->nation")
      val nationToRegion = Relations.of(c.nation,
        concat(lit("Nation="), col("n_nationkey")),
        concat(lit("Region="), col("n_regionkey")), "nation->region")
      val rel = Relations.compose(custToNation, nationToRegion)
      TrendStore.entityRollupBucketed(c.orders,
          concat(lit("Customer="), col("o_custkey")), col("o_orderdate"),
          "month", rel, "child_dn", "parent_dn",
          Seq(Aggregation.MetricAgg("o_totalprice", "count", "cnt"),
            Aggregation.MetricAgg("o_totalprice", "sum", "sum_value"),
            Aggregation.MetricAgg("o_totalprice", "avg", "avg_value"),
            Aggregation.MetricAgg("o_totalprice", "min", "min_value"),
            Aggregation.MetricAgg("o_totalprice", "max", "max_value")))
        .select(col("parent"), date_format(col("bucket"), TS).as("bucket"),
          col("cnt"), col("sum_value"), col("avg_value"),
          col("min_value"), col("max_value"))
        .orderBy(col("parent"), col("bucket"))
    },

    // Contribution-share drill-down — each nation's fraction of its
    // region's monthly revenue (e08 ranks the top children; this
    // apportions every cell to 100%). Broadcast groups ⋈ fact → one
    // cell shuffle; parent totals are a children-per-parent-sized
    // window, never a fact re-scan.
    "e10_contribution_share" -> { (s, dir) =>
      val c = TableCatalog(s, dir)
      val groups = c.customer
        .join(broadcast(c.nation), col("c_nationkey") === col("n_nationkey"))
        .select(concat(lit("Customer="), col("c_custkey")).as("entity_dn"),
          concat(lit("Nation="), col("n_nationkey")).as("child"),
          concat(lit("Region="), col("n_regionkey")).as("parent"))
      TrendStore.contributionShare(c.orders,
          concat(lit("Customer="), col("o_custkey")), col("o_orderdate"),
          "month", groups, col("o_totalprice"))
        .select(col("parent"), col("child"),
          date_format(col("bucket"), TS).as("bucket"),
          col("child_value"), col("parent_value"),
          round(col("share"), 6).as("share"))
        .orderBy(col("parent"), col("child"), col("bucket"))
    },

    // Entity aggregation with EXACT percentile cells — p50/p95 per
    // (region, month) rolled up the composed relation through the
    // same MetricAgg vocabulary (`pNN_exact`, round 11): a monitoring
    // deployment declares percentiles in the SAME definition as its
    // count/sum cells instead of composing t26 + entityRollup by
    // hand. Exact single-pass `percentile` on the group-bounded cells
    // (a month of one region's orders), so unlike the pNN sketch
    // metrics this key hash-matches a DuckDB quantile_cont twin.
    "e07_entity_rollup_pct" -> { (s, dir) =>
      val c = TableCatalog(s, dir)
      val custToNation = Relations.of(c.customer,
        concat(lit("Customer="), col("c_custkey")),
        concat(lit("Nation="), col("c_nationkey")), "customer->nation")
      val nationToRegion = Relations.of(c.nation,
        concat(lit("Nation="), col("n_nationkey")),
        concat(lit("Region="), col("n_regionkey")), "nation->region")
      val rel = Relations.compose(custToNation, nationToRegion)
      TrendStore.entityRollupBucketed(c.orders,
          concat(lit("Customer="), col("o_custkey")), col("o_orderdate"),
          "month", rel, "child_dn", "parent_dn",
          Seq(Aggregation.MetricAgg("o_totalprice", "count", "cnt"),
            Aggregation.MetricAgg("o_totalprice", "p50_exact", "p50_value"),
            Aggregation.MetricAgg("o_totalprice", "p95_exact", "p95_value")))
        .select(col("parent"), date_format(col("bucket"), TS).as("bucket"),
          col("cnt"), col("p50_value"), col("p95_value"))
        .orderBy(col("parent"), col("bucket"))
    },

    // Top-3 contributing customers per (region, month) — the
    // drill-down behind e05's cells ("which children drive this
    // parent's number"). Per-(parent, bucket, child) DECIMAL-exact
    // sums (broadcast relation ⋈ fact, one shuffle), then graft's
    // CollectMinK bounds the rank step at O(k) state per cell with
    // map-side partials — no per-parent row_number window sorting
    // the full child list on one reducer. Rank order = (-sum_dec,
    // child) on exact decimals, bit-identical to the oracle's
    // row_number.
    "e08_top_contributors" -> { (s, dir) =>
      val c = TableCatalog(s, dir)
      val custToNation = Relations.of(c.customer,
        concat(lit("Customer="), col("c_custkey")),
        concat(lit("Nation="), col("c_nationkey")), "customer->nation")
      val nationToRegion = Relations.of(c.nation,
        concat(lit("Nation="), col("n_nationkey")),
        concat(lit("Region="), col("n_regionkey")), "nation->region")
      val rel = Relations.compose(custToNation, nationToRegion)
      TrendStore.topContributors(c.orders,
          concat(lit("Customer="), col("o_custkey")), col("o_orderdate"),
          col("o_totalprice"), "month", rel, "child_dn", "parent_dn", 3)
        .select(col("parent"), date_format(col("bucket"), TS).as("bucket"),
          col("child"), col("sum_value"), col("rank"))
        .orderBy(col("parent"), col("bucket"), col("rank"))
    },

    // Directory CYCLE audit — the DAG check behind every rollup: a
    // cycle makes closure-based entity aggregation double-count, and
    // usually means a re-parenting script wrote an edge backwards.
    // The healthy answer is empty, so the key PLANTS one reversed
    // edge (Region←Nation=1) and must surface exactly that 2-node
    // strongly connected component. closure's log-round broadcast
    // joins + ONE intersect with its own reverse; registry-sized.
    "e13_cycle_audit" -> { (s, dir) =>
      val c = TableCatalog(s, dir)
      val custNation = Relations.of(c.customer,
        concat(lit("Customer="), col("c_custkey")),
        concat(lit("Nation="), col("c_nationkey")), "customer->nation")
      val nationRegion = Relations.of(c.nation,
        concat(lit("Nation="), col("n_nationkey")),
        concat(lit("Region="), col("n_regionkey")), "nation->region")
      val planted = nationRegion.filter(col("child_dn") === "Nation=1")
        .select(col("parent_dn").as("child_dn"), col("child_dn").as("parent_dn"),
          lit("planted-back-edge").as("relation_type"))
      Relations.cycles(
          custNation.unionByName(nationRegion).unionByName(planted))
        .orderBy(col("dn"))
    },

    // Directory fan-out health — the relation-shape audit an operator
    // reads before trusting an entity rollup: per relation type, edge
    // count, distinct parents, max/mean children-per-parent (a parent
    // with a million children is a skew hazard and usually a modeling
    // bug). Two stacked combine-friendly aggs; O(types) output.
    "e12_fanout_stats" -> { (s, dir) =>
      val c = TableCatalog(s, dir)
      val custNation = Relations.of(c.customer,
        concat(lit("Customer="), col("c_custkey")),
        concat(lit("Nation="), col("c_nationkey")), "customer->nation")
      val nationRegion = Relations.of(c.nation,
        concat(lit("Nation="), col("n_nationkey")),
        concat(lit("Region="), col("n_regionkey")), "nation->region")
      val composed = Relations.compose(custNation, nationRegion)
      Relations.fanout(custNation.unionByName(nationRegion).unionByName(composed))
        .orderBy(col("relation_type"))
    },

    // Coverage AUDIT of the temporal rollup — e06 drops buckets no
    // validity interval covers, silently (a directory miss); this
    // measures the loss per child entity BEFORE anyone trusts the
    // parent numbers. The directory here has a planted coverage hole
    // (validity Jan-05..Jan-25 over a full-January corpus), so the
    // audit is non-degenerate: every entity's early/late buckets
    // surface with their value mass and the hole's extent.
    "e11_rollup_audit" -> { (s, dir) =>
      val c = TableCatalog(s, dir)
      val daily = TrendStore.rollup(c.events, col("user_id"), col("ts"),
        col("value"), "day")
      val lo = lit("2024-01-05 00:00:00").cast("timestamp")
      val hi = lit("2024-01-25 00:00:00").cast("timestamp")
      val rel = c.customer.select(col("c_custkey").as("child"),
        col("c_mktsegment").as("parent"), lo.as("vfrom"), hi.as("vto"))
      TrendStore.entityRollupTemporalAudit(daily, rel,
          "child", "parent", "vfrom", "vto", col("sum_dec"))
        .select(col("entity_id"), col("n_buckets"), col("n_uncovered"),
          col("uncovered_value"),
          date_format(col("first_uncovered"), TS).as("first_uncovered"),
          date_format(col("last_uncovered"), TS).as("last_uncovered"),
          col("uncovered_share"))
        .orderBy(col("entity_id"))
    },

    // Entity aggregation through a TEMPORAL relation — entities
    // migrate parents mid-month (even customers move to 'MIGRATED'
    // at the Jan-15 cutover) and each daily bucket rolls up to the
    // parent valid AT that bucket. Equi-join on the entity + interval
    // post-filter — the directory-versioned rollup the reference's
    // attribute-tracked hierarchies imply.
    "e06_entity_rollup_temporal" -> { (s, dir) =>
      val c = TableCatalog(s, dir)
      val daily = TrendStore.rollup(c.events, col("user_id"), col("ts"),
        col("value"), "day")
      val lo = lit("2024-01-01 00:00:00").cast("timestamp")
      val cut = lit("2024-01-15 00:00:00").cast("timestamp")
      val hi = lit("2024-12-31 00:00:00").cast("timestamp")
      val rel = c.customer.select(col("c_custkey").as("child"),
          col("c_mktsegment").as("parent"), lo.as("vfrom"), cut.as("vto"))
        .unionByName(c.customer.select(col("c_custkey").as("child"),
          when(col("c_custkey") % 2 === 0, lit("MIGRATED"))
            .otherwise(col("c_mktsegment")).as("parent"),
          cut.as("vfrom"), hi.as("vto")))
      TrendStore.entityRollupTemporal(daily, rel,
          "child", "parent", "vfrom", "vto", col("sum_dec"))
        .orderBy(col("parent"))
    },

    // TWO-hop TEMPORAL rollup — e03's materialized walk where BOTH
    // hops carry [from, to) validity and each re-parents on its own
    // schedule: customers migrate segment at Jan-15 (hop 1, e06's
    // cutover) and the BUILDING segment re-homes from group G1 to G2
    // at Jan-20 (hop 2) — the mid-month double re-parent a versioned
    // telecom directory actually produces. Relations.composeTemporal
    // interval-intersects the two registry-sized hops on the dn
    // equi-key (broadcast; the interval is a post-filter, never a
    // range-only nested loop), then the standard temporal rollup
    // carries each daily bucket to the grandparent valid AT it.
    "e14_temporal_2hop" -> { (s, dir) =>
      val c = TableCatalog(s, dir)
      val daily = TrendStore.rollup(c.events, col("user_id"), col("ts"),
        col("value"), "day")
      val lo = lit("2024-01-01 00:00:00").cast("timestamp")
      val cut1 = lit("2024-01-15 00:00:00").cast("timestamp")
      val cut2 = lit("2024-01-20 00:00:00").cast("timestamp")
      val hi = lit("2024-12-31 00:00:00").cast("timestamp")
      val hop1 = c.customer.select(col("c_custkey").as("child_dn"),
          col("c_mktsegment").as("parent_dn"),
          lo.as("from_ts"), cut1.as("to_ts"), lit("cust->seg").as("relation_type"))
        .unionByName(c.customer.select(col("c_custkey").as("child_dn"),
          when(col("c_custkey") % 2 === 0, lit("MIGRATED"))
            .otherwise(col("c_mktsegment")).as("parent_dn"),
          cut1.as("from_ts"), hi.as("to_ts"), lit("cust->seg").as("relation_type")))
      val segs = c.customer.select(col("c_mktsegment").as("seg")).distinct()
        .unionByName(s.range(1).select(lit("MIGRATED").as("seg")))
      def grp(rehomed: Boolean) =
        when(col("seg") === "MIGRATED", lit("GM"))
          .when(col("seg") === "AUTOMOBILE" ||
            (if (rehomed) lit(false) else col("seg") === "BUILDING"), lit("G1"))
          .otherwise(lit("G2"))
      val hop2 = segs.select(col("seg").as("child_dn"), grp(rehomed = false).as("parent_dn"),
          lo.as("from_ts"), cut2.as("to_ts"), lit("seg->grp").as("relation_type"))
        .unionByName(segs.select(col("seg").as("child_dn"), grp(rehomed = true).as("parent_dn"),
          cut2.as("from_ts"), hi.as("to_ts"), lit("seg->grp").as("relation_type")))
      val rel = Relations.composeTemporal(hop1, hop2)
      TrendStore.entityRollupTemporal(daily, rel,
          "child_dn", "parent_dn", "from_ts", "to_ts", col("sum_dec"))
        .orderBy(col("parent"))
    },

    // Multi-hop entity aggregation — the reference's signature rollup
    // up a materialized transitive relation (cell→site→region): a
    // METRIC (order totals) carried from the leaf entity through
    // compose(cust→nation, nation→region) to the top level in ONE
    // aggregation. The composed relation is registry-sized and
    // broadcast (TrendStore.entityRollup), so the fact table never
    // shuffles for the hierarchy walk — one agg shuffle on the
    // (few-valued) parent key.
    "e03_entity_rollup_2hop" -> { (s, dir) =>
      val c = TableCatalog(s, dir)
      val custToNation = Relations.of(c.customer,
        concat(lit("Customer="), col("c_custkey")),
        concat(lit("Nation="), col("c_nationkey")), "customer->nation")
      val nationToRegion = Relations.of(c.nation,
        concat(lit("Nation="), col("n_nationkey")),
        concat(lit("Region="), col("n_regionkey")), "nation->region")
      val rel = Relations.compose(custToNation, nationToRegion)
      TrendStore.entityRollup(c.orders,
          concat(lit("Customer="), col("o_custkey")), col("o_totalprice"),
          rel, "child_dn", "parent_dn")
        .orderBy(col("parent"))
    },

    "n02_notification_store" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val typed = NotificationStore.typed(
        ev.filter(col("event_type") === "error"), col("props"),
        StructType(Seq(StructField("k", LongType))))
      typed.groupBy(col("user_id").as("entity_id"),
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n_notifications"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("entity_id"), col("day"))
    },

    // Local-time granularity: day buckets cut on Europe/Amsterdam
    // wall-clock boundaries (UTC+1 in the test window, DST-aware in
    // general — the spring/fall transitions are spec-covered with
    // planted data in TrendSpec).
    "t12_rollup_localday" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      TrendStore.present(
          TrendStore.rollupLocal(ev, col("user_id"), col("ts"), col("value"),
            "day", "Europe/Amsterdam"))
        .orderBy(col("entity_id"), col("bucket"))
    },

    // Notification sets: Minerva links related notifications into
    // per-(entity, bucket) sets; the collected-id list is exercised
    // via its size/distinct/first/last projections (scalar columns so
    // the DuckDB hash-compare applies).
    "n03_notification_sets" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val typed = NotificationStore.typed(
        ev.filter(col("event_type") === "error"), col("props"),
        StructType(Seq(StructField("k", LongType))))
      NotificationStore.sets(typed, col("user_id"), col("ts"), col("k"), "day")
        .select(col("entity_id"),
          date_format(col("bucket"), "yyyy-MM-dd").as("day"),
          col("n_notifications"),
          size(array_distinct(col("notification_ids"))).cast("long").as("n_distinct"),
          element_at(col("notification_ids"), 1).as("first_id"),
          element_at(col("notification_ids"), -1).as("last_id"))
        .orderBy(col("entity_id"), col("day"))
    },

    // Local-calendar WEEK granularity with Minerva's end-of-interval
    // labels: rollupLocal emits local wall-clock interval starts, and
    // labelEnd's +7d is wall-clock arithmetic — which IS local
    // calendar arithmetic, so the composition stays correct across
    // DST transitions (the 23h/25h weeks are spec-covered with
    // planted data in StoreSpec; the sf window is CET throughout).
    "t14_rollup_localweek" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      TrendStore.present(
          TrendStore.labelEnd(
            TrendStore.rollupLocal(ev, col("user_id"), col("ts"), col("value"),
              "week", "Europe/Amsterdam"),
            "week"))
        .orderBy(col("entity_id"), col("bucket"))
    },

    // Trigger loop: declarative threshold rules over trend rollups →
    // typed notifications (the payload column carries the triggering
    // values as JSON; its round-trip through NotificationStore.typed
    // is spec-covered — the graded projection keeps the scalar firing
    // identity, which both engines compute bit-identically).
    "n04_triggers" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      Trigger.evaluate(triggerRules)(ev, col("user_id"), col("ts"))
        .select(col("entity_id"), date_format(col("bucket"), TS).as("bucket"),
          col("rule"), col("severity"))
        .orderBy(col("rule"), col("entity_id"), col("bucket"))
    },

    // Alert digest — the on-call summary over the firing stream: per
    // (day, rule, severity) the firing count, distinct paged entities
    // and first/last firing time. One more combine-friendly rollup on
    // top of n04's plan; O(days × rules) output keys.
    "n07_alert_digest" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      Trigger.evaluate(triggerRules)(ev, col("user_id"), col("ts"))
        .select(col("entity_id"), date_format(col("bucket"), TS).as("bucket"),
          col("rule"), col("severity"))
        .groupBy(substring(col("bucket"), 1, 10).as("day"),
          col("rule"), col("severity"))
        .agg(count(lit(1)).as("n_firings"),
          countDistinct(col("entity_id")).as("n_entities"),
          min(col("bucket")).as("first_bucket"),
          max(col("bucket")).as("last_bucket"))
        .orderBy(col("day"), col("rule"))
    },

    // SLO triggers — percentile thresholds ("daily p95 >= 110", the
    // standard latency-SLO alert) through the SAME declarative rule
    // vocabulary and one-rollup-per-granularity plan as n04. Exact
    // single-pass percentile on the group-bounded daily cells,
    // rounded to 4 decimals on BOTH engines before the comparison so
    // a firing cannot flap on a last-ulp interpolation difference.
    "n09_slo_triggers" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      Trigger.evaluate(sloRules)(ev, col("user_id"), col("ts"))
        .select(col("entity_id"), date_format(col("bucket"), TS).as("bucket"),
          col("rule"), col("severity"))
        .orderBy(col("rule"), col("entity_id"), col("bucket"))
    },

    // Flap measurement — n06's diagnostic sibling: per (rule,
    // entity) episode structure of the firing stream (episode = a
    // maximal consecutive-bucket run). Many short episodes = a
    // flapping threshold the rule owner should fix; one long episode
    // = a genuine incident.
    "n08_flap_report" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      Trigger.flapReport(triggerRules)(ev, col("user_id"), col("ts"))
        .orderBy(col("rule"), col("entity_id"))
    },

    // MTTR report — per (rule, severity): episode count, mean/max
    // episode DURATION (episode = maximal consecutive-bucket run ×
    // the rule's grid step) and distinct paged entities. n08 profiles
    // per-entity flap structure; this is the rule-level resolution-
    // time summary on-call management reads. Mean = unrounded IEEE
    // division of exact longs.
    "n10_time_to_clear" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      Trigger.mttrReport(triggerRules)(ev, col("user_id"), col("ts"))
        .orderBy(col("rule"))
    },

    // Alert-correlation report — which rules fire TOGETHER: per
    // ordered rule pair, co-firing (entity, day) cells, each rule's
    // own cell count, and both conditional firing rates. Pairs that
    // always co-fire are one alert to merge. Distinct cells first
    // (one shuffle), then a (entity, day)-equi self-join whose
    // fan-out is bounded by rules-per-cell; O(rules²) output.
    "n11_alert_correlation" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      Trigger.coFiringReport(triggerRules)(ev, col("user_id"), col("ts"))
        .orderBy(col("rule1"), col("rule2"))
    },

    // Maintenance-window muting: firings inside a declared per-entity
    // [from, to) window flag muted=1 — skipped by the pager, still
    // VISIBLE for audit (silently dropping firings hides coverage
    // gaps). Broadcast equi-join on the entity key with the interval
    // as a post-filter (e06's pattern — never a range-only nested
    // loop) + one groupBy on the firing key to collapse
    // multi-window matches.
    "n12_maintenance_mute" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      import s.implicits._
      val win = maintenanceWindows.toDF("entity_id", "from_ts", "to_ts")
        .select(col("entity_id"),
          col("from_ts").cast("timestamp").as("from_ts"),
          col("to_ts").cast("timestamp").as("to_ts"))
      Trigger.applyMaintenance(
          Trigger.evaluate(triggerRules)(ev, col("user_id"), col("ts")), win)
        .select(col("entity_id"), date_format(col("bucket"), TS).as("bucket"),
          col("rule"), col("severity"), col("muted"))
        .orderBy(col("rule"), col("entity_id"), col("bucket"))
    },

    // Escalation ladder — severity steps UP as a breach run
    // lengthens (first breach notifies, the 3rd consecutive one
    // elevates, the 6th pages): each firing carries its run position
    // and the level reached. n06 suppresses early buckets; this
    // keeps them visible but ranked — what an alert console renders.
    // Same all-integer runid/position windows as n06, one (entity,
    // rule) shuffle family + a codegen'd CASE ladder.
    "n13_escalations" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      Trigger.escalations(triggerRules, escalationLevels)(
          ev, col("user_id"), col("ts"))
        .select(col("entity_id"), date_format(col("bucket"), TS).as("bucket"),
          col("rule"), col("severity"), col("run_pos"), col("level"))
        .orderBy(col("rule"), col("entity_id"), col("bucket"))
    },

    // Flap suppression: rules page only after holding for 3
    // CONSECUTIVE buckets of their grid (Trigger.evaluateSustained) —
    // the sustained-threshold semantics that keep an oscillating KPI
    // from firing on every crossing.
    "n06_sustained_triggers" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      Trigger.evaluateSustained(triggerRules, minConsecutive = 3)(
          ev, col("user_id"), col("ts"))
        .select(col("entity_id"), date_format(col("bucket"), TS).as("bucket"),
          col("rule"), col("severity"))
        .orderBy(col("rule"), col("entity_id"), col("bucket"))
    },

    // The full monitoring loop composed: trigger firings land in a
    // notification store and are linked into per-(entity, day) sets —
    // the reference's trigger → notification store → notification-set
    // chain as one plan (rule rollups → firing projection → one sets
    // groupBy). Scalar set projections so the hash-compare applies.
    "n05_trigger_sets" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val fired = Trigger.evaluate(triggerRules)(ev, col("user_id"), col("ts"))
      NotificationStore.sets(fired, col("entity_id"), col("bucket"), col("rule"), "day")
        .select(col("entity_id"),
          date_format(col("bucket"), "yyyy-MM-dd").as("day"),
          col("n_notifications"),
          size(array_distinct(col("notification_ids"))).cast("long").as("n_rules"),
          element_at(col("notification_ids"), 1).as("first_rule"),
          element_at(col("notification_ids"), -1).as("last_rule"))
        .orderBy(col("entity_id"), col("day"))
    },

    "g01_agg_def" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val defn = Aggregation.AggregationDef("day", Seq(
        Aggregation.MetricAgg("value", "count", "cnt"),
        Aggregation.MetricAgg("value", "sum", "sum_value"),
        Aggregation.MetricAgg("value", "avg", "avg_value"),
        Aggregation.MetricAgg("value", "min", "min_value"),
        Aggregation.MetricAgg("value", "max", "max_value"),
        Aggregation.MetricAgg("value", "stddev", "sd_value")))
      Aggregation.compile(defn)(ev, col("user_id"), col("ts"))
        .select(col("entity_id"),
          date_format(col("bucket"), TS).as("bucket"),
          col("cnt"), col("sum_value"), col("avg_value"),
          col("min_value"), col("max_value"), col("sd_value"))
        .orderBy(col("entity_id"), col("bucket"))
    },

    // FILTERED metrics in the aggregation vocabulary — the
    // conditional-KPI form monitoring definitions declare constantly
    // ("count of errors only", "avg purchase value"): each MetricAgg
    // carries an optional row predicate, compiled to fn(CASE WHEN)
    // inside the SAME single groupBy — one shuffle regardless of how
    // many differently-filtered metrics the definition declares,
    // never one scan per filter. Empty filtered groups yield NULL
    // sums/avgs and 0 counts identically on both engines.
    "g03_agg_filtered" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val defn = Aggregation.AggregationDef("day", Seq(
        Aggregation.MetricAgg("value", "count", "n_all"),
        Aggregation.MetricAgg("value", "count", "n_errors",
          Some("event_type = 'error'")),
        Aggregation.MetricAgg("value", "sum", "error_value",
          Some("event_type = 'error'")),
        Aggregation.MetricAgg("value", "avg", "purchase_avg",
          Some("event_type = 'purchase'")),
        Aggregation.MetricAgg("value", "max", "purchase_max",
          Some("event_type = 'purchase'"))))
      Aggregation.compile(defn)(ev, col("user_id"), col("ts"))
        .select(col("entity_id"), date_format(col("bucket"), TS).as("bucket"),
          col("n_all"), col("n_errors"), col("error_value"),
          col("purchase_avg"), col("purchase_max"))
        .orderBy(col("entity_id"), col("bucket"))
    },

    // DERIVED metrics in the aggregation vocabulary — the ratio /
    // formula-KPI layer monitoring definitions stack on their base
    // aggregates ("error_rate = n_errors / n_all"): post-agg SQL
    // formulas over the metric ALIASES, chained in declaration order
    // (error_pct references error_rate). The whole chain is one
    // codegen'd Project over g03's single-shuffle aggregate — a
    // definition with ten formulas costs the same scan and shuffle as
    // one with none. Every division is an unrounded IEEE op over
    // exact (count/decimal-sum) operands — bit-identical cross-engine.
    "g04_agg_derived" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val defn = Aggregation.AggregationDef("day", Seq(
        Aggregation.MetricAgg("value", "count", "n_all"),
        Aggregation.MetricAgg("value", "count", "n_errors",
          Some("event_type = 'error'")),
        Aggregation.MetricAgg("value", "sum", "sum_all"),
        Aggregation.MetricAgg("value", "sum", "purchase_value",
          Some("event_type = 'purchase'"))),
        Seq(Aggregation.DerivedMetric("error_rate", "n_errors / n_all"),
          Aggregation.DerivedMetric("purchase_share", "purchase_value / sum_all"),
          Aggregation.DerivedMetric("error_pct", "error_rate * 100")))
      Aggregation.compile(defn)(ev, col("user_id"), col("ts"))
        .select(col("entity_id"), date_format(col("bucket"), TS).as("bucket"),
          col("n_all"), col("n_errors"), col("sum_all"), col("purchase_value"),
          col("error_rate"), col("purchase_share"), col("error_pct"))
        .orderBy(col("entity_id"), col("bucket"))
    },

    // DISTINCT-count metrics in the aggregation vocabulary — the
    // cardinality KPI monitoring definitions declare next to their
    // counts ("distinct event types per user-day", "distinct error
    // codes"): exact count_distinct, with the same optional row
    // filter every other metric takes. Plans through Spark's Expand +
    // two-level agg, so the map-side dedup bounds the shuffle by
    // per-group CARDINALITY (≤5 types here), never raw row count;
    // unbounded cardinalities take the approx_distinct (HLL) fn,
    // which is rows-only by design (sketches don't cross-engine
    // hash-match) and — unlike exact distinct — CASCADES via
    // hll_union_agg sketch partials.
    "g05_agg_distinct" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val defn = Aggregation.AggregationDef("day", Seq(
        Aggregation.MetricAgg("event_type", "count_distinct", "n_types"),
        Aggregation.MetricAgg("event_type", "count_distinct", "n_hi_types",
          Some("value > 50")),
        Aggregation.MetricAgg("value", "count", "n_all")))
      Aggregation.compile(defn)(ev, col("user_id"), col("ts"))
        .select(col("entity_id"), date_format(col("bucket"), TS).as("bucket"),
          col("n_types"), col("n_hi_types"), col("n_all"))
        .orderBy(col("entity_id"), col("bucket"))
    },

    // One metric set at a granularity cascade (hour → day → month):
    // the raw scan shuffles once, coarser levels re-aggregate the
    // finer level's exact partials (see Aggregation.cascade). The
    // DuckDB twin recomputes each level from raw rows — equal because
    // the decimal partials are associative.
    "g02_agg_cascade" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      Aggregation.cascade(
          Seq(Aggregation.MetricAgg("value", "count", "cnt"),
            Aggregation.MetricAgg("value", "sum", "sum_value"),
            Aggregation.MetricAgg("value", "avg", "avg_value"),
            Aggregation.MetricAgg("value", "max", "max_value")),
          Seq("hour", "day", "month"))(ev, col("user_id"), col("ts"))
        .select(col("granularity"), col("entity_id"),
          date_format(col("bucket"), TS).as("bucket"),
          col("cnt"), col("sum_value"), col("avg_value"), col("max_value"))
        .orderBy(col("granularity"), col("entity_id"), col("bucket"))
    },

    // PERCENTILE metrics in the cascade (rows-only — GK sketch merges
    // are partition-order-dependent, t20's posture; the rank-error
    // bound of merged-hourly vs direct-daily and the exact/sketch
    // refusal split are spec-asserted in QuantileSketchSpec): the
    // monitoring cascade's p50/p95 at hour→day→month from ONE raw
    // scan — the finest level sketches each (entity, hour) cell
    // (gk_sketch_agg, a few-KB mergeable partial), coarser levels
    // merge sketches (gk_sketch_merge) without re-touching raw rows,
    // exactly like g02's decimal partials and g05's HLL registers.
    "g07_agg_pctl_cascade" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      Aggregation.cascade(
          Seq(Aggregation.MetricAgg("value", "count", "cnt"),
            Aggregation.MetricAgg("value", "p50", "p50_value"),
            Aggregation.MetricAgg("value", "p95", "p95_value")),
          Seq("hour", "day", "month"))(ev, col("user_id"), col("ts"))
        .select(col("granularity"), col("entity_id"),
          date_format(col("bucket"), TS).as("bucket"),
          col("cnt"), col("p50_value"), col("p95_value"))
        .orderBy(col("granularity"), col("entity_id"), col("bucket"))
    },

    // WEIGHTED-mean metrics in the aggregation vocabulary — the
    // traffic-weighted KPI form ("avg price weighted by quantity",
    // "drop rate weighted by attempts"): a plain avg lets a 1-unit
    // line count as much as a 50-unit one. Each wavg names a weight
    // column next to its source and composes with the row filter;
    // rows with a NULL source OR weight drop from BOTH sums. Exact
    // decimal Σ(x·w)/Σ(w) partials (they cascade, too) + ONE IEEE
    // division — same single-shuffle groupBy as every other metric.
    "g06_agg_weighted" -> { (s, dir) =>
      val li = TableCatalog(s, dir).lineitem
      val defn = Aggregation.AggregationDef("month", Seq(
        Aggregation.MetricAgg("l_extendedprice", "count", "cnt"),
        Aggregation.MetricAgg("l_extendedprice", "avg", "avg_price"),
        Aggregation.MetricAgg("l_extendedprice", "wavg", "wavg_price",
          None, Some("l_quantity")),
        Aggregation.MetricAgg("l_extendedprice", "wavg", "wavg_price_ret",
          Some("l_returnflag = 'R'"), Some("l_quantity"))))
      Aggregation.compile(defn)(li, col("l_suppkey"), col("l_shipdate"))
        .select(col("entity_id"), date_format(col("bucket"), TS).as("bucket"),
          col("cnt"), col("avg_price"), col("wavg_price"), col("wavg_price_ret"))
        .orderBy(col("entity_id"), col("bucket"))
    }
  )

  private val ds = "CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE)"

  val oracles: Seq[(String, String)] = Seq(
    "t09_dirty_set" ->
      s"""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_modified,
         |  count(*) AS n_rows
         |FROM events GROUP BY date_trunc('day', ts)
         |HAVING max(ts) >= TIMESTAMP '$Cutoff'
         |ORDER BY day""".stripMargin,

    "t10_rollup_month" ->
      s"""SELECT user_id AS entity_id,
         |  strftime(date_trunc('month', ts) + INTERVAL 1 MONTH, '%Y-%m-%d %H:%M:%S') AS bucket,
         |  count(*) AS cnt, $ds AS sum_value, $ds / count(*) AS avg_value,
         |  max(value) AS max_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "t11_rollup_15m" ->
      s"""SELECT user_id AS entity_id,
         |  strftime(make_timestamp(CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) * 1000000),
         |    '%Y-%m-%d %H:%M:%S') AS bucket,
         |  count(*) AS cnt, $ds AS sum_value, $ds / count(*) AS avg_value,
         |  max(value) AS max_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "e01_entity_registry" ->
      """WITH e AS (
        |  SELECT 'Customer=' || c_custkey AS dn, 'customer' AS entity_type, c_name AS alias FROM customer
        |  UNION ALL
        |  SELECT 'Nation=' || n_nationkey, 'nation', n_name FROM nation
        |  UNION ALL
        |  SELECT 'Region=' || r_regionkey, 'region', r_name FROM region),
        |d AS (SELECT DISTINCT dn, entity_type, alias FROM e),
        |x AS (SELECT dn, entity_type, alias, md5(dn) AS hh FROM d),
        |ids AS (SELECT dn,
        |    CAST(sum(CAST(strpos('0123456789abcdef', substr(hh, i, 1)) - 1 AS BIGINT)
        |      << ((15 - i) * 4)) AS BIGINT) AS entity_id
        |  FROM (SELECT dn, hh, unnest(generate_series(1, 15)) AS i FROM x)
        |  GROUP BY dn)
        |SELECT x.dn, entity_type, alias, entity_id
        |FROM x JOIN ids ON x.dn = ids.dn ORDER BY x.dn""".stripMargin,

    "e02_entity_tags" ->
      """WITH links AS (
        |  SELECT c_custkey AS entity_id, 'segment:' || c_mktsegment AS tag FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 'nation:' || n_name
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
        |SELECT entity_id, array_to_string(list_sort(list(DISTINCT tag)), ',') AS tag_set,
        |  count(DISTINCT tag) AS n_tags
        |FROM links GROUP BY entity_id ORDER BY entity_id""".stripMargin,

    "e09_directory_audit" ->
      """WITH reg AS (SELECT DISTINCT 'Customer=' || c_custkey AS dn FROM customer),
        |act AS (SELECT 'Customer=' || o_custkey AS dn, count(*) AS n_rows,
        |    max(o_orderdate) AS last_active
        |  FROM orders GROUP BY 1)
        |SELECT coalesce(reg.dn, act.dn) AS dn,
        |  CASE WHEN reg.dn IS NULL THEN 'unregistered'
        |       WHEN act.dn IS NULL THEN 'silent' ELSE 'active' END AS status,
        |  coalesce(n_rows, 0) AS n_rows,
        |  strftime(last_active, '%Y-%m-%d %H:%M:%S') AS last_active
        |FROM reg FULL OUTER JOIN act ON reg.dn = act.dn
        |ORDER BY 1""".stripMargin,

    "r01_relation_store" ->
      """SELECT 'customer->nation|nation->region' AS relation_type,
        |  'Region=' || n_regionkey AS parent_dn, count(*) AS n_children
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 2 ORDER BY 2""".stripMargin,

    "e04_tag_stats" ->
      """WITH links AS (
        |  SELECT c_custkey AS entity_id, 'segment:' || c_mktsegment AS tag FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 'nation:' || n_name
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
        |SELECT tag, count(DISTINCT entity_id) AS n_entities
        |FROM links GROUP BY tag ORDER BY tag""".stripMargin,

    "e05_entity_rollup_bucketed" ->
      """SELECT 'Region=' || n_regionkey AS parent,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d %H:%M:%S') AS bucket,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_value,
        |  min(o_totalprice) AS min_value,
        |  max(o_totalprice) AS max_value
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "e10_contribution_share" ->
      """WITH cells AS (SELECT 'Region=' || n_regionkey AS parent,
        |    'Nation=' || n_nationkey AS child,
        |    date_trunc('month', o_orderdate) AS bucket,
        |    sum(CAST(o_totalprice AS DECIMAL(18,4))) AS s
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2, 3)
        |SELECT parent, child, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
        |  CAST(s AS DOUBLE) AS child_value,
        |  CAST(sum(s) OVER (PARTITION BY parent, bucket) AS DOUBLE) AS parent_value,
        |  round(CAST(s AS DOUBLE)
        |    / CAST(sum(s) OVER (PARTITION BY parent, bucket) AS DOUBLE), 6) AS share
        |FROM cells ORDER BY 1, 2, 3""".stripMargin,

    "e07_entity_rollup_pct" ->
      """SELECT 'Region=' || n_regionkey AS parent,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d %H:%M:%S') AS bucket,
        |  count(*) AS cnt,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50_value,
        |  round(quantile_cont(o_totalprice, 0.95), 4) AS p95_value
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "e08_top_contributors" ->
      """WITH per AS (SELECT 'Region=' || n_regionkey AS parent,
        |    date_trunc('month', o_orderdate) AS bucket,
        |    'Customer=' || c_custkey AS child,
        |    sum(CAST(o_totalprice AS DECIMAL(18,4))) AS sum_dec
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2, 3),
        |r AS (SELECT *, row_number() OVER (
        |    PARTITION BY parent, bucket ORDER BY sum_dec DESC, child) AS rank
        |  FROM per)
        |SELECT parent, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket, child,
        |  CAST(sum_dec AS DOUBLE) AS sum_value, CAST(rank AS INT) AS rank
        |FROM r WHERE rank <= 3 ORDER BY parent, bucket, rank""".stripMargin,

    "e12_fanout_stats" ->
      """WITH rel AS (
        |  SELECT DISTINCT 'Customer=' || c_custkey AS child_dn,
        |    'Nation=' || c_nationkey AS parent_dn,
        |    'customer->nation' AS relation_type FROM customer
        |  UNION ALL
        |  SELECT DISTINCT 'Nation=' || n_nationkey, 'Region=' || n_regionkey,
        |    'nation->region' FROM nation
        |  UNION ALL
        |  SELECT DISTINCT 'Customer=' || c_custkey, 'Region=' || n_regionkey,
        |    'customer->nation|nation->region'
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |pp AS (SELECT relation_type, parent_dn, count(DISTINCT child_dn) AS c
        |  FROM rel GROUP BY 1, 2)
        |SELECT relation_type, CAST(sum(c) AS BIGINT) AS n_links,
        |  count(*) AS n_parents, CAST(max(c) AS BIGINT) AS max_fanout,
        |  CAST(sum(c) AS BIGINT) / count(*) AS avg_fanout
        |FROM pp GROUP BY 1 ORDER BY 1""".stripMargin,

    "e13_cycle_audit" ->
      // recursive-CTE reachability (UNION dedup terminates on the
      // planted cycle); mutual pairs = nodes on a common cycle
      """WITH RECURSIVE edges(child, parent) AS (
        |  SELECT 'Customer=' || c_custkey, 'Nation=' || c_nationkey FROM customer
        |  UNION ALL
        |  SELECT 'Nation=' || n_nationkey, 'Region=' || n_regionkey FROM nation
        |  UNION ALL
        |  SELECT 'Region=' || n_regionkey, 'Nation=' || n_nationkey
        |  FROM nation WHERE n_nationkey = 1),
        |walk(start, node) AS (
        |  SELECT child, parent FROM edges WHERE child <> parent
        |  UNION
        |  SELECT w.start, e.parent FROM walk w JOIN edges e ON w.node = e.child),
        |m AS (SELECT a.start AS dn, a.node AS peer
        |  FROM walk a JOIN walk b ON a.start = b.node AND a.node = b.start
        |  WHERE a.start <> a.node)
        |SELECT dn, count(DISTINCT peer) AS n_peers
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

    "e11_rollup_audit" ->
      """WITH d AS (SELECT user_id AS entity_id, date_trunc('day', ts) AS bucket,
        |    sum(CAST(value AS DECIMAL(18,4))) AS sum_dec
        |  FROM events GROUP BY 1, 2),
        |j AS (SELECT d.entity_id, d.bucket, d.sum_dec,
        |    CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END AS unc
        |  FROM d LEFT JOIN customer c ON d.entity_id = c.c_custkey
        |    AND d.bucket >= TIMESTAMP '2024-01-05 00:00:00'
        |    AND d.bucket <  TIMESTAMP '2024-01-25 00:00:00')
        |SELECT entity_id, count(*) AS n_buckets,
        |  CAST(sum(unc) AS BIGINT) AS n_uncovered,
        |  CAST(sum(CASE WHEN unc = 1 THEN sum_dec END) AS DOUBLE) AS uncovered_value,
        |  strftime(min(CASE WHEN unc = 1 THEN bucket END), '%Y-%m-%d %H:%M:%S') AS first_uncovered,
        |  strftime(max(CASE WHEN unc = 1 THEN bucket END), '%Y-%m-%d %H:%M:%S') AS last_uncovered,
        |  CAST(sum(unc) AS BIGINT) / count(*) AS uncovered_share
        |FROM j GROUP BY 1 HAVING sum(unc) > 0 ORDER BY 1""".stripMargin,

    "e06_entity_rollup_temporal" ->
      """WITH d AS (SELECT user_id AS entity_id, date_trunc('day', ts) AS bucket,
        |  sum(CAST(value AS DECIMAL(18,4))) AS sum_dec
        |  FROM events GROUP BY 1, 2),
        |rel AS (
        |  SELECT c_custkey AS child, c_mktsegment AS parent,
        |    TIMESTAMP '2024-01-01 00:00:00' AS vfrom,
        |    TIMESTAMP '2024-01-15 00:00:00' AS vto FROM customer
        |  UNION ALL
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 2 = 0 THEN 'MIGRATED' ELSE c_mktsegment END,
        |    TIMESTAMP '2024-01-15 00:00:00',
        |    TIMESTAMP '2024-12-31 00:00:00' FROM customer)
        |SELECT parent, count(*) AS cnt,
        |  CAST(sum(CAST(sum_dec AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM d JOIN rel ON d.entity_id = rel.child
        |  AND d.bucket >= rel.vfrom AND d.bucket < rel.vto
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "e14_temporal_2hop" ->
      // e06's hop-1 cutover composed with a Jan-20 re-home at hop 2:
      // the interval-intersect join is composeTemporal's twin.
      """WITH d AS (SELECT user_id AS entity_id, date_trunc('day', ts) AS bucket,
        |  sum(CAST(value AS DECIMAL(18,4))) AS sum_dec
        |  FROM events GROUP BY 1, 2),
        |h1 AS (
        |  SELECT c_custkey AS child, c_mktsegment AS parent,
        |    TIMESTAMP '2024-01-01 00:00:00' AS vfrom,
        |    TIMESTAMP '2024-01-15 00:00:00' AS vto FROM customer
        |  UNION ALL
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 2 = 0 THEN 'MIGRATED' ELSE c_mktsegment END,
        |    TIMESTAMP '2024-01-15 00:00:00',
        |    TIMESTAMP '2024-12-31 00:00:00' FROM customer),
        |segs AS (SELECT DISTINCT c_mktsegment AS seg FROM customer
        |         UNION SELECT 'MIGRATED'),
        |h2 AS (
        |  SELECT seg AS child,
        |    CASE WHEN seg = 'MIGRATED' THEN 'GM'
        |         WHEN seg IN ('AUTOMOBILE', 'BUILDING') THEN 'G1'
        |         ELSE 'G2' END AS parent,
        |    TIMESTAMP '2024-01-01 00:00:00' AS vfrom,
        |    TIMESTAMP '2024-01-20 00:00:00' AS vto FROM segs
        |  UNION ALL
        |  SELECT seg,
        |    CASE WHEN seg = 'MIGRATED' THEN 'GM'
        |         WHEN seg = 'AUTOMOBILE' THEN 'G1'
        |         ELSE 'G2' END,
        |    TIMESTAMP '2024-01-20 00:00:00',
        |    TIMESTAMP '2024-12-31 00:00:00' FROM segs),
        |rel AS (
        |  SELECT h1.child AS child, h2.parent AS parent,
        |    greatest(h1.vfrom, h2.vfrom) AS vfrom, least(h1.vto, h2.vto) AS vto
        |  FROM h1 JOIN h2 ON h1.parent = h2.child
        |    AND h1.vfrom < h2.vto AND h2.vfrom < h1.vto)
        |SELECT parent, count(*) AS cnt,
        |  CAST(sum(CAST(sum_dec AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM d JOIN rel ON d.entity_id = rel.child
        |  AND d.bucket >= rel.vfrom AND d.bucket < rel.vto
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "e03_entity_rollup_2hop" ->
      """SELECT 'Region=' || n_regionkey AS parent, count(*) AS cnt,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "n02_notification_store" ->
      """SELECT user_id AS entity_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |  count(*) AS n_notifications,
        |  min(CAST(regexp_replace(props, '[^0-9]', '', 'g') AS BIGINT)) AS min_k,
        |  max(CAST(regexp_replace(props, '[^0-9]', '', 'g') AS BIGINT)) AS max_k
        |FROM events WHERE event_type = 'error'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "t12_rollup_localday" ->
      s"""SELECT user_id AS entity_id,
         |  strftime(date_trunc('day', timezone('Europe/Amsterdam', timezone('UTC', ts))),
         |    '%Y-%m-%d %H:%M:%S') AS bucket,
         |  count(*) AS cnt, $ds AS sum_value, $ds / count(*) AS avg_value,
         |  max(value) AS max_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "n03_notification_sets" ->
      """SELECT user_id AS entity_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |  count(*) AS n_notifications,
        |  count(DISTINCT CAST(regexp_replace(props, '[^0-9]', '', 'g') AS BIGINT)) AS n_distinct,
        |  min(CAST(regexp_replace(props, '[^0-9]', '', 'g') AS BIGINT)) AS first_id,
        |  max(CAST(regexp_replace(props, '[^0-9]', '', 'g') AS BIGINT)) AS last_id
        |FROM events WHERE event_type = 'error'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "t14_rollup_localweek" ->
      s"""SELECT user_id AS entity_id,
         |  strftime(date_trunc('week', timezone('Europe/Amsterdam', timezone('UTC', ts)))
         |    + INTERVAL 7 DAY, '%Y-%m-%d %H:%M:%S') AS bucket,
         |  count(*) AS cnt, $ds AS sum_value, $ds / count(*) AS avg_value,
         |  max(value) AS max_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "n04_triggers" -> triggerOracleSql(triggerRules),

    "n07_alert_digest" -> triggerDigestOracleSql(triggerRules),
    "n08_flap_report" -> triggerFlapOracleSql(triggerRules),
    "n10_time_to_clear" -> triggerMttrOracleSql(triggerRules),
    "n11_alert_correlation" -> triggerCoFiringOracleSql(triggerRules),
    "n12_maintenance_mute" ->
      triggerMaintenanceOracleSql(triggerRules, maintenanceWindows),
    "n09_slo_triggers" -> triggerOracleSql(sloRules),

    "n05_trigger_sets" -> triggerSetsOracleSql(triggerRules),

    "n06_sustained_triggers" -> triggerSustainedOracleSql(triggerRules, 3),
    "n13_escalations" ->
      triggerEscalationOracleSql(triggerRules, escalationLevels),

    "g01_agg_def" ->
      // sd_value mirrors the Spark side's fixed-op-order moment
      // formula exactly (NOT stddev_samp — Welford is order-dependent)
      s"""SELECT user_id AS entity_id,
         |  strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
         |  count(*) AS cnt, $ds AS sum_value, $ds / count(*) AS avg_value,
         |  min(value) AS min_value, max(value) AS max_value,
         |  CASE WHEN count(*) < 2 THEN NULL ELSE
         |    sqrt((CAST(CAST(sum(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4)))
         |              AS DECIMAL(38,4)) AS DOUBLE)
         |          - $ds * $ds / count(*)) / (count(*) - 1))
         |  END AS sd_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "g03_agg_filtered" ->
      """SELECT user_id AS entity_id,
        |  strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
        |  count(*) AS n_all,
        |  CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS n_errors,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS error_value,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE)
        |    / count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase_avg,
        |  max(CASE WHEN event_type = 'purchase' THEN value END) AS purchase_max
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "g04_agg_derived" ->
      // base aggregates exactly as g03's twins; the derived layer is
      // the same formulas over the aliased columns (one projection) —
      // every division an unrounded IEEE op over exact operands
      """WITH base AS (SELECT user_id AS entity_id,
        |    strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
        |    count(*) AS n_all,
        |    CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS n_errors,
        |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_all,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS purchase_value
        |  FROM events GROUP BY 1, 2)
        |SELECT entity_id, bucket, n_all, n_errors, sum_all, purchase_value,
        |  n_errors / n_all AS error_rate,
        |  purchase_value / sum_all AS purchase_share,
        |  (n_errors / n_all) * 100 AS error_pct
        |FROM base ORDER BY 1, 2""".stripMargin,

    "g05_agg_distinct" ->
      // ANSI COUNT(DISTINCT) on both engines; the filtered variant
      // gates through a CASE whose NULLs never count — identical
      // exclusion semantics
      """SELECT user_id AS entity_id,
        |  strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
        |  count(DISTINCT event_type) AS n_types,
        |  count(DISTINCT CASE WHEN value > 50 THEN event_type END) AS n_hi_types,
        |  count(*) AS n_all
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "g02_agg_cascade" -> {
      def level(g: String) =
        s"""SELECT '$g' AS granularity, user_id AS entity_id,
           |  strftime(date_trunc('$g', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
           |  count(*) AS cnt, $ds AS sum_value, $ds / count(*) AS avg_value,
           |  max(value) AS max_value
           |FROM events GROUP BY 1, 2, 3""".stripMargin
      Seq("hour", "day", "month").map(level).mkString("", "\nUNION ALL\n",
        "\nORDER BY granularity, entity_id, bucket")
    },

    "g06_agg_weighted" ->
      // wavg twin: exact decimal Σ(x·w) rescaled to (38,4) before the
      // double cast (Fx.prodSumDouble's discipline), Σ(w) decimal →
      // double, ONE IEEE division; the filtered variant gates BOTH
      // sums with the same CASE.
      """SELECT l_suppkey AS entity_id,
        |  strftime(date_trunc('month', l_shipdate), '%Y-%m-%d %H:%M:%S') AS bucket,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_price,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE)
        |    / CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS wavg_price,
        |  CAST(CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4)) END) AS DECIMAL(38,4)) AS DOUBLE)
        |    / CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS wavg_price_ret
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
