package graft

import org.json4s.{DefaultFormats, Formats, JValue}
import org.json4s.jackson.JsonMethods
import graft.operators.{Aggregation, Materialize, Trigger}
import graft.sources.HarvestJob

/** Declarative config files for the CLI — the reference defines
  * aggregations and triggers in config files its CLIs consume
  * (`minerva aggregation` / `minerva trigger` definition files);
  * graft parses the same shape from JSON into the existing
  * `AggregationDef` / `Trigger.Rule` / `Materialize.MatDef` values.
  * Pure parsing — no plan code lives here, and the parser is json4s,
  * which ships with Spark (no new dependency).
  *
  * Schemas (all paths/columns are strings):
  * {{{
  * aggregate:   {"source": P, "entity": C, "ts": C, "out": P,
  *               "granularities": ["hour", ...],
  *               "metrics": [{"source": C, "fn": "sum", "as": C,
  *                 "where": SQL?, "weight": C?, "eps": 0.001?}, ...],
  *               "derived": [{"as": C, "sql": "n_errors / n_all"}, ...]?}
  * trigger:     {"source": P, "entity": C, "ts": C, "out": P,
  *               "rules": [{"name": N, "granularity": G, "severity": S,
  *                 "thresholds": [{"metric": C, "fn": F, "op": ">", "value": 1.5}, ...]}, ...],
  *               "maintenance": P?}
  * materialize: {"defs": [{"name": N, "source": P, "store": P, "state": P,
  *                 "granularity": G, "entity": C?, "ts": C?, "value": C?,
  *                 "relation": P?, "relationChild": C?, "relationParent": C?}, ...]}
  * }}}
  * A materialize def WITHOUT `value` is a derived step re-aggregating
  * another def's store (see `Materialize.runAll`); with `relation` it
  * is an ENTITY-AGGREGATION step rolling the partials up the relation
  * table (parent-keyed derived store). Config rules may carry
  * multiple thresholds per rule (ANDed) — richer than the
  * single-threshold `--rule` flag form.
  */
object Config {

  private implicit val formats: Formats = DefaultFormats

  // `derived` is Option-wrapped rather than defaulted: json4s only
  // applies constructor defaults when compiled with -Yrangepos-style
  // param info it can see, and an Option round-trips a missing field
  // unambiguously on every json4s version Spark ships.
  final case class AggregateConfig(source: String, entity: String, ts: String,
                                   out: String, granularities: Seq[String],
                                   metrics: Seq[Aggregation.MetricAgg],
                                   derived: Option[Seq[Aggregation.DerivedMetric]] = None) {
    def derivedMetrics: Seq[Aggregation.DerivedMetric] = derived.getOrElse(Nil)
  }

  // `maintenance`: optional path to a declared-windows parquet
  // (entity_id, from_ts, to_ts) — covered firings flag muted=1
  // (Trigger.applyMaintenance); Option for the same json4s
  // missing-field reason as AggregateConfig.derived.
  final case class TriggerConfig(source: String, entity: String, ts: String,
                                 out: String, rules: Seq[Trigger.Rule],
                                 maintenance: Option[String] = None)

  private case class MatDefJson(name: String, source: String, store: String,
                                state: String, granularity: String,
                                entity: Option[String], ts: Option[String],
                                value: Option[String],
                                relation: Option[String],
                                relationChild: Option[String],
                                relationParent: Option[String]) {
    def toDef: Materialize.MatDef = Materialize.MatDef(name, source, store, state,
      granularity, entity.getOrElse("entity_id"), ts.getOrElse("ts"), value,
      relation, relationChild.getOrElse("child_dn"),
      relationParent.getOrElse("parent_dn"))
  }

  private def parse(text: String, what: String): JValue =
    try JsonMethods.parse(text)
    catch { case e: Exception =>
      throw new IllegalArgumentException(s"unparseable $what config: ${e.getMessage}")
    }

  private def extract[T](j: JValue, what: String)(implicit m: Manifest[T]): T =
    try j.extract[T]
    catch { case e: Exception =>
      throw new IllegalArgumentException(s"invalid $what config: ${e.getMessage}")
    }

  def parseAggregate(text: String): AggregateConfig = {
    val c = extract[AggregateConfig](parse(text, "aggregate"), "aggregate")
    require(c.metrics.nonEmpty, "aggregate config: at least one metric required")
    require(c.granularities.nonEmpty, "aggregate config: at least one granularity required")
    c
  }

  def parseTrigger(text: String): TriggerConfig = {
    val c = extract[TriggerConfig](parse(text, "trigger"), "trigger")
    require(c.rules.nonEmpty, "trigger config: at least one rule required")
    require(c.rules.forall(_.thresholds.nonEmpty),
      "trigger config: every rule needs at least one threshold")
    c
  }

  def parseMaterialize(text: String): Seq[Materialize.MatDef] = {
    val defs = extract[Seq[MatDefJson]](
      parse(text, "materialize") \ "defs", "materialize").map(_.toDef)
    require(defs.nonEmpty, "materialize config: at least one def required")
    defs
  }

  private case class HarvestJobJson(source: String, format: String,
                                    dnCol: String, entityComponent: String,
                                    tsCol: String, tsFormat: String,
                                    granularity: String, store: String, state: String,
                                    pattern: Option[String], rowTag: Option[String],
                                    registry: Option[String], target: Option[String],
                                    tie: Option[String], current: Option[String],
                                    reject: Option[String]) {
    def toJob: HarvestJob.Job = HarvestJob.Job(source, format, dnCol, entityComponent,
      tsCol, tsFormat, granularity, store, state,
      pattern.getOrElse(".*"), rowTag.getOrElse("row"), registry,
      target.getOrElse("trend"), tie, current, reject)
  }

  /** Harvest config: `{"jobs": [{...}, ...]}` — one file describing
    * every source-directory → store mapping a deployment runs, the
    * reference's harvest job definition files. */
  def parseHarvest(text: String): Seq[HarvestJob.Job] = {
    val jobs = extract[Seq[HarvestJobJson]](
      parse(text, "harvest") \ "jobs", "harvest").map(_.toJob)
    require(jobs.nonEmpty, "harvest config: at least one job required")
    jobs
  }
}
