package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Fx

/** Declarative aggregation definitions: the reference compiles
  * aggregation definitions (the `minerva aggregation` CLI's YAML-ish
  * specs: source metrics × aggregation functions × target
  * granularity) into SQL. graft compiles the same shape into a
  * Catalyst plan.
  *
  * Sums/averages go through exact DECIMAL partials (Fx) so results
  * are deterministic under any partitioning — definition-compiled
  * plans are run by schedulers, and a re-run on a re-partitioned
  * cluster must produce bit-identical output.
  */
object Aggregation {

  /** One output metric: `fn(source)` aliased `as`. */
  final case class MetricAgg(source: String, fn: String, as: String)

  /** A materializable aggregation: bucket by `granularity`, emit
    * `metrics`. */
  final case class AggregationDef(granularity: String, metrics: Seq[MetricAgg])

  private def compileMetric(m: MetricAgg): Column = (m.fn.toLowerCase match {
    case "sum"   => Fx.dsum(col(m.source))
    case "avg"   => Fx.davg(col(m.source))
    case "max"   => max(col(m.source))
    case "min"   => min(col(m.source))
    case "count" => count(col(m.source))
    case f       => throw new IllegalArgumentException(s"unknown aggregation fn: $f")
  }).as(m.as)

  /** Compile a definition against a trend source → one groupBy plan
    * (partial aggregation map-side; a single shuffle of partials). */
  def compile(defn: AggregationDef)(trend: DataFrame, entity: Column, ts: Column): DataFrame = {
    require(defn.metrics.nonEmpty,
      s"AggregationDef(granularity=${defn.granularity}) declares no metrics; " +
        "at least one MetricAgg is required")
    trend.groupBy(entity.as("entity_id"),
        date_trunc(defn.granularity, ts).as("bucket"))
      .agg(compileMetric(defn.metrics.head), defn.metrics.tail.map(compileMetric): _*)
  }
}
