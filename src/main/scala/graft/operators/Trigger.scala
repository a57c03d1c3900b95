package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Fx

/** Trigger rules: the reference's `minerva trigger` loop — declarative
  * threshold rules evaluated over trend rollups, emitting typed
  * notification rows (reference: the minerva trigger CLI /
  * minerva/trigger rule definitions: a rule names a KPI expression
  * over a granularity plus a threshold predicate and a severity; the
  * trigger daemon evaluates rules per granularity period and inserts
  * the firings into a notification store).
  *
  * graft compiles the same declarative shape into one Catalyst plan
  * per distinct granularity:
  *
  *   1. ONE rollup computes the union of every rule's aggregates at
  *      that granularity (partial-agg groupBy — a single shuffle of
  *      (entity, bucket) partials, shared by all rules on that grid);
  *   2. ALL rules are evaluated in a single projection over the
  *      rolled rows — each rule becomes a `when(predicate, struct)`
  *      element of an array that is exploded and null-filtered — so
  *      adding a rule adds a codegen'd expression, not a plan branch
  *      that would rescan the rollup;
  *   3. firings carry their triggering values as a JSON payload,
  *      which is exactly what `NotificationStore.typed` projects back
  *      into typed attribute columns.
  *
  * Thresholded sums/averages go through exact DECIMAL partials (Fx)
  * so a firing decision is deterministic under any partitioning — a
  * rule must not flap when the cluster re-partitions.
  */
object Trigger {

  /** One aggregate predicate: `fn(metric) op value`. */
  final case class Threshold(metric: String, fn: String, op: String, value: Double)

  /** A trigger rule: all `thresholds` must hold (AND) on the rule's
    * granularity grid for a notification to fire. */
  final case class Rule(name: String, granularity: String,
                        thresholds: Seq[Threshold], severity: String)

  /** Stable alias for an aggregate, shared across rules so the rollup
    * computes each (fn, metric) exactly once. */
  private def alias(t: Threshold): String = s"${t.fn}_${t.metric}"

  // pNN / pNNN percentile threshold fns ("p95 latency >= X" — the
  // standard SLO alert). Exact single-pass `percentile` on the
  // group-bounded rollup cells (t26's argument), ROUNDED TO 4
  // DECIMALS before the comparison on BOTH engines — the t26-proven
  // parity surface — so a firing decision cannot flap on a last-ulp
  // interpolation difference between engines or partitionings.
  private val PctFn = "^p(\\d{2,3})$".r

  private[graft] def pctOf(fn: String): Option[Double] = fn.toLowerCase match {
    case PctFn(d) =>
      val p = d.toDouble / math.pow(10, d.length)
      if (p < 1.0) Some(p) else None
    case _ => None
  }

  private def compileAgg(t: Threshold): Column = (t.fn.toLowerCase match {
    case "sum"   => Fx.dsum(col(t.metric))
    case "avg"   => Fx.davg(col(t.metric))
    case "max"   => max(col(t.metric))
    case "min"   => min(col(t.metric))
    case "count" => count(lit(1))
    case f => pctOf(f) match {
      case Some(p) => round(expr(s"percentile(${t.metric}, $p)"), 4)
      case None => throw new IllegalArgumentException(s"unknown trigger fn: $f")
    }
  }).as(alias(t))

  private def compare(c: Column, op: String, v: Double): Column = op match {
    case ">"  => c > v
    case ">=" => c >= v
    case "<"  => c < v
    case "<=" => c <= v
    case o    => throw new IllegalArgumentException(s"unknown trigger op: $o")
  }

  /** Evaluate `rules` over a trend source. Output: one row per firing
    * — `(entity_id, bucket, rule, severity, payload)` where payload is
    * the rule's triggering aggregate values as JSON (the notification
    * attribute document; `NotificationStore.typed` restores the typed
    * columns). */
  def evaluate(rules: Seq[Rule])(trend: DataFrame, entity: Column, ts: Column): DataFrame = {
    require(rules.nonEmpty, "Trigger.evaluate: no rules")
    val parts = rules.groupBy(_.granularity).toSeq.sortBy(_._1).map { case (gran, rs) =>
      val aggs = rs.flatMap(_.thresholds).map(t => alias(t) -> t).toMap
        .values.toSeq.sortBy(alias)
      // TrendStore.bucket: calendar units AND the reference's native
      // seconds-based granularities ("900" / "15m") both work as rule
      // grids.
      val rolled = trend.groupBy(entity.as("entity_id"),
          TrendStore.bucket(ts, gran).as("bucket"))
        .agg(compileAgg(aggs.head), aggs.tail.map(compileAgg): _*)
      val ruleCols = rs.map { r =>
        val fired = r.thresholds.map(t => compare(col(alias(t)), t.op, t.value))
          .reduce(_ && _)
        val payload = to_json(struct(
          r.thresholds.map(t => col(alias(t)).as(alias(t))): _*))
        when(fired, struct(lit(r.name).as("rule"),
          lit(r.severity).as("severity"), payload.as("payload")))
      }
      rolled.select(col("entity_id"), col("bucket"),
          explode(array(ruleCols: _*)).as("__n"))
        .filter(col("__n").isNotNull)
        .select(col("entity_id"), col("bucket"),
          col("__n.rule").as("rule"), col("__n.severity").as("severity"),
          col("__n.payload").as("payload"))
    }
    parts.reduce(_ unionByName _)
  }

  /** Evaluate rules against ALREADY-ROLLED rows — `(entity_id,
    * bucket, cnt, sum_dec, max_value)`, the shape both
    * `TrendStore.rollup` and `TrendStream.windowedRollup` emit. This
    * is the streaming trigger path: the rollup comes from a
    * watermarked windowed aggregation whose buckets arrive exactly
    * once (finalized), so rules fire once per closed period — the
    * reference's trigger daemon cadence. Aggregate references resolve
    * to the rolled partials (`sum`/`count`/`max`/`avg`; `min` is not
    * carried by the partial shape), and every rule must target the
    * single `metric` the rolled stream carries. Granularity is fixed
    * by the window that produced the rollup, so the rules' declared
    * granularities are ignored here.
    *
    * Same single-projection shape as [[evaluate]]: all rules become
    * `when(fired, struct)` elements of one exploded array — per
    * micro-batch this is a codegen'd map over the (already tiny)
    * finalized buckets, no extra shuffle. */
  def evaluateRolled(rules: Seq[Rule], metric: String)(rolled: DataFrame): DataFrame = {
    require(rules.nonEmpty, "Trigger.evaluateRolled: no rules")
    rules.flatMap(_.thresholds).find(_.metric != metric).foreach { t =>
      throw new IllegalArgumentException(
        s"rolled trigger stream carries metric '$metric', rule references '${t.metric}'")
    }
    def agg(t: Threshold): Column = t.fn.toLowerCase match {
      case "sum"   => col("sum_dec").cast("double")
      case "count" => col("cnt")
      case "max"   => col("max_value")
      case "avg"   => col("sum_dec").cast("double") / col("cnt")
      case f => throw new IllegalArgumentException(
        s"fn not available over rolled partials: $f (sum/count/max/avg only)")
    }
    val ruleCols = rules.map { r =>
      val fired = r.thresholds.map(t => compare(agg(t), t.op, t.value)).reduce(_ && _)
      val payload = to_json(struct(r.thresholds.map(t => agg(t).as(alias(t))): _*))
      when(fired, struct(lit(r.name).as("rule"),
        lit(r.severity).as("severity"), payload.as("payload")))
    }
    rolled.select(col("entity_id"), col("bucket"),
        explode(array(ruleCols: _*)).as("__n"))
      .filter(col("__n").isNotNull)
      .select(col("entity_id"), col("bucket"),
        col("__n.rule").as("rule"), col("__n.severity").as("severity"),
        col("__n.payload").as("payload"))
  }

  /** Flap suppression — the reference's sustained-threshold trigger
    * semantics: a rule pages only once its condition has held for
    * `minConsecutive` CONSECUTIVE buckets of its granularity grid,
    * so a KPI oscillating around the threshold doesn't fire on every
    * crossing. Firings emit from the `minConsecutive`-th breach of a
    * run onward (the run's earlier buckets are the evidence, not
    * notifications).
    *
    * Shape: [[evaluate]]'s firing stream (unchanged plans), then the
    * classic gaps-and-islands run detection per (entity, rule):
    * runid = grid index − row_number, position = row_number within
    * the run — two windows sharing the (entity, rule) partitioning,
    * nothing new shuffles by data volume. Fixed-width grid
    * granularities only (a calendar month has no constant stride);
    * [[TrendStore.stepSeconds]] decides. */
  /** Per granularity group of `rules`: the firing stream with its
    * all-integer consecutive-run id (`__runid` = grid index −
    * row_number over (entity, rule)) — the SHARED core of sustained
    * suppression, escalation ladders, flap and MTTR reporting, so
    * the runid formula and its grid-offset subtlety live in exactly
    * one place. floor(epoch/step) is an integer grid index even when
    * the grid has a constant non-zero offset (the week grid starts
    * Monday, epoch 0 was a Thursday) — adjacent buckets always
    * differ by exactly 1. Fixed-width grids only (a calendar month
    * has no constant stride); [[TrendStore.stepSeconds]] decides and
    * `what` names the caller in the refusal. Returns (stepSeconds,
    * firings + __runid) per granularity group. */
  private def firingRuns(rules: Seq[Rule], what: String)(
      trend: DataFrame, entity: Column, ts: Column): Seq[(Long, DataFrame)] =
    rules.groupBy(_.granularity).toSeq.sortBy(_._1).map { case (gran, rs) =>
      val step = TrendStore.stepSeconds(gran).getOrElse(throw new IllegalArgumentException(
        s"$what: a fixed-width granularity grid is required, got: $gran"))
      val byRule = org.apache.spark.sql.expressions.Window
        .partitionBy(col("entity_id"), col("rule")).orderBy(col("bucket"))
      (step, evaluate(rs)(trend, entity, ts)
        .withColumn("__runid",
          floor(unix_timestamp(col("bucket")) / lit(step)) - row_number().over(byRule)))
    }

  /** Position of each firing within its consecutive run — the second
    * window of the run family, on the same (entity, rule) shuffle. */
  private def withRunPos(fired: DataFrame): DataFrame = {
    val byRun = org.apache.spark.sql.expressions.Window
      .partitionBy(col("entity_id"), col("rule"), col("__runid"))
      .orderBy(col("bucket"))
    fired.withColumn("__pos", row_number().over(byRun))
  }

  def evaluateSustained(rules: Seq[Rule], minConsecutive: Int)(
      trend: DataFrame, entity: Column, ts: Column): DataFrame = {
    require(minConsecutive >= 1, s"minConsecutive must be >= 1, got $minConsecutive")
    firingRuns(rules, "sustained triggers")(trend, entity, ts).map {
      case (_, fired) =>
        withRunPos(fired)
          .filter(col("__pos") >= minConsecutive)
          .drop("__runid", "__pos")
    }.reduce(_ unionByName _)
  }

  /** ESCALATION policy over the firing stream — severity steps UP as
    * a breach run lengthens (the paging ladder every on-call rotation
    * runs: first breach notifies, a third consecutive one elevates, a
    * sixth pages): each firing carries its position within its
    * consecutive-bucket run and the escalation LEVEL that position
    * has reached. `levels` maps run-length cutoffs to level names,
    * ascending and starting at 1 so every firing has a level;
    * [[evaluateSustained]] suppresses the early buckets entirely —
    * this keeps them visible but ranked, which is what an alert
    * console actually renders.
    *
    * Shape: [[evaluate]]'s firing stream → the same all-integer
    * runid/position windows as sustained detection (two windows on
    * one (entity, rule) shuffle family) → a codegen'd CASE ladder;
    * nothing new shuffles by data volume. */
  def escalations(rules: Seq[Rule], levels: Seq[(Int, String)])(
      trend: DataFrame, entity: Column, ts: Column): DataFrame = {
    require(levels.nonEmpty && levels.head._1 == 1,
      "escalation levels must start at run length 1 so every firing has a level")
    require(levels.map(_._1) == levels.map(_._1).sorted &&
      levels.map(_._1).distinct.size == levels.size,
      s"escalation cutoffs must be strictly ascending, got: ${levels.map(_._1)}")
    val desc = levels.sortBy(-_._1)
    val level = desc.tail.foldLeft(
      when(col("run_pos") >= desc.head._1, lit(desc.head._2))) {
        case (acc, (m, n)) => acc.when(col("run_pos") >= m, lit(n))
      }
    firingRuns(rules, "escalations")(trend, entity, ts).map {
      case (_, fired) =>
        withRunPos(fired)
          .withColumn("run_pos", col("__pos").cast("long"))
          .withColumn("level", level)
          .drop("__runid", "__pos")
    }.reduce(_ unionByName _)
  }

  /** Flap report: per (rule, entity) EPISODE structure of the firing
    * stream — [[evaluateSustained]] suppresses flapping pages; this
    * MEASURES flapping so the rule owner can fix the threshold. An
    * episode is a maximal run of consecutive fired buckets on the
    * rule's grid (the same runid formula as sustained detection);
    * an alert with many short episodes is flapping, one long episode
    * is a genuine incident. Output per (rule, entity, severity):
    * n_firings, n_episodes, longest_run.
    *
    * Shape: [[evaluate]]'s firing stream, one (entity, rule) window
    * for the runid, then two STACKED partial aggs (per-episode, then
    * per-entity) — every step keyed on the same (entity, rule)
    * family, output O(entities × rules). */
  def flapReport(rules: Seq[Rule])(
      trend: DataFrame, entity: Column, ts: Column): DataFrame =
    firingRuns(rules, "flap report")(trend, entity, ts).map {
      case (_, fired) =>
        fired
          .groupBy(col("rule"), col("entity_id"), col("severity"), col("__runid"))
          .agg(count(lit(1)).as("__len"))
          .groupBy(col("rule"), col("entity_id"), col("severity"))
          .agg(sum(col("__len")).as("n_firings"),
            count(lit(1)).as("n_episodes"),
            max(col("__len")).as("longest_run"))
    }.reduce(_ unionByName _)

  /** MTTR report — the rule-level resolution-time summary on-call
    * management reads: per (rule, severity), the episode count, mean
    * and max episode DURATION (an episode = a maximal consecutive-
    * bucket firing run, [[flapReport]]'s unit; its duration = run
    * length × the rule's grid step), and the distinct entities paged.
    * Many short episodes with a low mean = flapping; a high max =
    * the incident to post-mortem.
    *
    * Shape: [[evaluate]]'s firing stream → the same (entity, rule)
    * runid window as sustained detection → per-episode count → ONE
    * rule-level agg over O(entities × rules) episode rows. The mean
    * is an unrounded IEEE division of exact longs (total buckets ×
    * step / episodes) — bit-identical on any engine. */
  def mttrReport(rules: Seq[Rule])(
      trend: DataFrame, entity: Column, ts: Column): DataFrame = {
    val parts = firingRuns(rules, "MTTR report")(trend, entity, ts).map {
      case (step, fired) =>
      fired
        .groupBy(col("rule"), col("severity"), col("entity_id"), col("__runid"))
        .agg(count(lit(1)).as("__len"))
        .groupBy(col("rule"), col("severity"))
        .agg(count(lit(1)).as("n_episodes"),
          countDistinct(col("entity_id")).as("n_entities"),
          sum(col("__len")).as("__total"),
          max(col("__len")).as("__max"))
        .select(col("rule"), col("severity"), col("n_episodes"), col("n_entities"),
          (col("__total") * lit(step) / col("n_episodes")).as("mean_seconds"),
          (col("__max") * lit(step)).as("max_seconds"))
    }
    parts.reduce(_ unionByName _)
  }

  /** Alert-correlation report: which rules fire TOGETHER — per
    * ordered rule pair (r1 < r2), the number of (entity, day) cells
    * where both fired, each rule's own cell count, and the
    * conditional firing rates P(r2|r1), P(r1|r2). Pairs that always
    * co-fire are one alert to merge; the reverse tells the on-call
    * which page predicts which.
    *
    * Shape: the firing stream collapses to DISTINCT (entity, day,
    * rule) cells FIRST (one shuffle — days absorb the mixed rule
    * granularities), then self-joins on the (entity, day) equi-key
    * with r1 < r2 — fan-out is bounded by rules-per-cell, never by
    * data volume — and aggregates to O(rules²) output keys. The
    * per-rule totals are an O(rules)-row broadcast join; rates are
    * IEEE divisions of exact longs. */
  def coFiringReport(rules: Seq[Rule])(
      trend: DataFrame, entity: Column, ts: Column): DataFrame = {
    // the cells base feeds THREE consumers (totals + both sides of
    // the pair self-join) and so appears 3× in the DAG — deliberately
    // WITHOUT a localCheckpoint: the three instantiations canonicalize
    // identically, so AQE's runtime stage cache reuses one executed
    // rollup for all three (measured r14: 1.7 s lazy vs 2.6 s with a
    // forced checkpoint at sf0.1 — the materialization costs more
    // than the reuse already saves, at any scale the reused stage is
    // computed once either way). The DECLARED exchange count (16 in
    // ShuffleBudgetSpec) is therefore the canonical-plan shape, not
    // the executed data movement.
    val cells = evaluate(rules)(trend, entity, ts)
      .select(col("entity_id"), date_trunc("day", col("bucket")).as("day"),
        col("rule"))
      .distinct()
    val totals = cells.groupBy(col("rule")).agg(count(lit(1)).as("n_cells"))
    val pairs = cells.as("a")
      .join(cells.as("b"),
        col("a.entity_id") === col("b.entity_id") && col("a.day") === col("b.day")
          && col("a.rule") < col("b.rule"))
      .groupBy(col("a.rule").as("rule1"), col("b.rule").as("rule2"))
      .agg(count(lit(1)).as("n_cofire"))
    pairs
      .join(broadcast(totals.withColumnRenamed("rule", "rule1")
        .withColumnRenamed("n_cells", "n_r1")), "rule1")
      .join(broadcast(totals.withColumnRenamed("rule", "rule2")
        .withColumnRenamed("n_cells", "n_r2")), "rule2")
      .select(col("rule1"), col("rule2"), col("n_cofire"), col("n_r1"), col("n_r2"),
        (col("n_cofire") / col("n_r1")).as("p2_given_1"),
        (col("n_cofire") / col("n_r2")).as("p1_given_2"))
  }

  /** Maintenance-window muting — the alerting-hygiene surface every
    * monitoring deployment needs: firings for an entity inside a
    * DECLARED maintenance window `[from_ts, to_ts)` are flagged
    * `muted = 1` so the pager skips them, while staying VISIBLE in
    * the stream (an auditor must see what would have paged; silently
    * dropping firings hides coverage gaps). A firing covered by ANY
    * of its entity's windows mutes; overlapping windows mute once.
    *
    * `windows`: `(entity_id, from_ts, to_ts)` — per-entity intervals,
    * O(declared windows) rows. A fleet-wide window is declared by
    * exploding it onto the entity list (keeps this join an EQUI join;
    * a nullable-entity wildcard would force a nested-loop plan). A
    * NULL entity_id is refused loudly (raise_error on the O(windows)
    * broadcast side), never silently ignored.
    *
    * Shape: the firing stream equi-joins the BROADCAST window table
    * on the entity key with the interval predicate as a post-filter
    * (e06's temporal-join pattern — never a range-only nested loop),
    * then one groupBy on the firing's own key collapses multi-window
    * matches. Firings are O(entities × buckets) at worst; nothing
    * data-sized shuffles beyond them. */
  /** Validate a DECLARED maintenance-window table against the firing
    * side's entity type and return its rows with `entity_id` cast to
    * that type. Shared by the batch join ([[applyMaintenance]]) and
    * the streaming literal-array twin
    * (`TriggerStream.withMaintenance`) so the two sides refuse the
    * SAME inputs: NULL ids (fleet-wide mutes must be exploded onto
    * the entity list), uncastable ids (named as the type mismatch
    * they are), and lossy-but-castable ids ('07' against a long key
    * would silently mute entity 7 — ADVICE r13, previously fixed only
    * on the stream side). try_cast instead of ANSI cast: an
    * uncastable id must fail with THIS message, not an opaque
    * NumberFormatException mid-collect. Binary keys round-trip by
    * VALUE (deepEquals — Row.get hands back arrays, whose == is
    * reference identity). Windows are declared metadata, O(windows)
    * rows by contract — both consumers already materialize them
    * driver-side (literal array) or broadcast them (batch join). */
  def checkedWindows(entityType: org.apache.spark.sql.types.DataType,
                     windows: DataFrame): Array[org.apache.spark.sql.Row] = {
    val windowType = windows.schema("entity_id").dataType
    val checked = windows.select(col("entity_id").as("__orig"),
        expr(s"try_cast(entity_id AS ${entityType.sql})").as("entity_id"),
        expr(s"try_cast(try_cast(entity_id AS ${entityType.sql}) " +
          s"AS ${windowType.sql})").as("__rt"),
        col("from_ts").cast("timestamp"), col("to_ts").cast("timestamp"))
      .collect()
    checked.foreach { r =>
      require(!r.isNullAt(0),
        "maintenance window with NULL entity_id: declare fleet-wide " +
          "maintenance by exploding the window onto the entity list")
      require(!r.isNullAt(1),
        s"maintenance window entity_id '${r.get(0)}' ($windowType) is not " +
          s"castable to the firing side's entity type ($entityType) — " +
          "declare windows in the firing key type")
      require(java.util.Objects.deepEquals(r.get(0), r.get(2)),
        s"maintenance window entity_id '${r.get(0)}' ($windowType) does not " +
          s"round-trip through the firing side's entity type ($entityType) " +
          s"(becomes '${r.get(1)}') — the match would be lossy")
    }
    checked.map(r => org.apache.spark.sql.Row(r.get(1), r.get(3), r.get(4)))
  }

  def applyMaintenance(firings: DataFrame, windows: DataFrame): DataFrame = {
    import scala.jdk.CollectionConverters._
    val entityType = firings.schema("entity_id").dataType
    val spark = firings.sparkSession
    // validated + pre-cast to the firing key type, so the join key
    // compares same-typed values — an implicit join cast would let a
    // lossy window id ('07' vs a long key) silently match entity 7,
    // the exact hole the stream twin closed in r13
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__we", entityType),
      org.apache.spark.sql.types.StructField("__wf",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("__wt",
        org.apache.spark.sql.types.TimestampType)))
    val w = spark.createDataFrame(
      checkedWindows(entityType, windows).toSeq.asJava, schema)
    val keyCols = firings.columns.map(firings(_))
    firings.join(broadcast(w),
        firings("entity_id") === col("__we") &&
          firings("bucket") >= col("__wf") && firings("bucket") < col("__wt"),
        "left")
      .groupBy(keyCols: _*)
      .agg(max(when(col("__we").isNotNull, lit(1L)).otherwise(lit(0L))).as("muted"))
  }

  /** The SQL twin of one rule's aggregate — used by callers that
    * generate a two-sided oracle from the same Rule values (the Spark
    * plan and the SQL text CANNOT drift when both derive from the rule
    * table; same construction as the d05 language profiles). */
  def aggSql(t: Threshold): String = t.fn.toLowerCase match {
    case "sum"   => s"CAST(sum(CAST(${t.metric} AS DECIMAL(18,4))) AS DOUBLE)"
    case "avg"   => s"CAST(sum(CAST(${t.metric} AS DECIMAL(18,4))) AS DOUBLE) / count(*)"
    case "max"   => s"max(${t.metric})"
    case "min"   => s"min(${t.metric})"
    case "count" => "count(*)"
    case f => pctOf(f) match {
      case Some(p) => s"round(quantile_cont(${t.metric}, $p), 4)"
      case None => throw new IllegalArgumentException(s"unknown trigger fn: $f")
    }
  }
}
