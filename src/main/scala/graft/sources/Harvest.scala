package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Harvesting: Minerva's source-file → data-package path.
  *
  * The reference's harvest plugins parse vendor files (CSV, XML) into
  * data packages — batches of `(entity dn, timestamp, values…)` rows
  * that load into trend stores. graft keeps the same contract with
  * Spark readers: a `DataPackage` is a DataFrame with a canonical
  * `entity_id`/`ts` plus the metric columns, ready for
  * `TrendStore.rollup` or `TrendStoreWriter.write`.
  */
object Harvest {

  /** A parsed batch: canonical entity/ts columns + metric columns. */
  final case class DataPackage(granularity: String, df: DataFrame) {
    def metricColumns: Seq[String] =
      df.columns.filterNot(Set("entity_id", "entity_dn", "entity_name", "ts").contains).toSeq
  }

  /** Extract one component value from a Minerva distinguished name,
    * e.g. dnPart("Network=NL,Site=A01,Cell=25", "Cell") == "25".
    * Pure regexp — codegen'd, no UDF. */
  def dnPart(dn: Column, component: String): Column =
    regexp_extract(dn, s"(?:^|,)${java.util.regex.Pattern.quote(component)}=([^,]*)", 1)

  /** CSV harvester: header CSV with a dn column, a timestamp column,
    * and metric columns. The dn's `entityComponent` becomes
    * `entity_id`; `tsFormat` parses the timestamp. */
  def csv(spark: SparkSession, path: String, dnCol: String, entityComponent: String,
          tsCol: String, tsFormat: String, granularity: String): DataPackage = {
    val raw = spark.read.option("header", "true").csv(path)
    DataPackage(granularity, canonicalize(raw, dnCol, entityComponent, tsCol, tsFormat))
  }

  /** JSON-lines harvester: same contract as `csv`. */
  def jsonLines(spark: SparkSession, path: String, dnCol: String, entityComponent: String,
                tsCol: String, tsFormat: String, granularity: String): DataPackage = {
    val raw = spark.read.json(path)
    DataPackage(granularity, canonicalize(raw, dnCol, entityComponent, tsCol, tsFormat))
  }

  /** XML harvester (the reference's vendor-XML harvest plugins):
    * Spark 4's built-in XML source, one row per `rowTag` element.
    * Same canonical contract as `csv`/`jsonLines`. */
  def xml(spark: SparkSession, path: String, rowTag: String, dnCol: String,
          entityComponent: String, tsCol: String, tsFormat: String,
          granularity: String): DataPackage = {
    val raw = spark.read.option("rowTag", rowTag).xml(path)
    DataPackage(granularity, canonicalize(raw, dnCol, entityComponent, tsCol, tsFormat))
  }

  /** Parquet harvester — lake-native ingest: upstream systems that
    * already land typed parquet (CDC dumps, other Spark jobs) feed
    * the same DataPackage contract. A typed timestamp column passes
    * through untouched (`tsFormat` only applies to string columns —
    * see canonicalize), typed metrics keep their types. */
  def parquetFiles(spark: SparkSession, path: String, dnCol: String,
                   entityComponent: String, tsCol: String, tsFormat: String,
                   granularity: String): DataPackage = {
    val raw = spark.read.parquet(path)
    DataPackage(granularity, canonicalize(raw, dnCol, entityComponent, tsCol, tsFormat))
  }

  private[sources] def canonicalize(raw: DataFrame, dnCol: String, entityComponent: String,
                           tsCol: String, tsFormat: String,
                           castMetrics: Boolean = true): DataFrame = {
    val metrics = raw.columns.filterNot(c => c == dnCol || c == tsCol)
    // try_to_timestamp: a malformed vendor row yields null (callers
    // filter/quarantine) instead of failing a whole 100 TB load under
    // ANSI semantics. entity_id is the registry's stable hash of the
    // full dn (graft.operators.EntityRegistry) — identical across
    // re-harvests and executors; entity_name keeps the human-readable
    // component for display/rollup-by-name. castMetrics=false keeps
    // the parsed value types (attribute/notification packages carry
    // strings and ids, not only numeric metrics).
    // a source that already carries a TYPED timestamp (parquet, typed
    // JSON) skips string parsing — tsFormat is a string-column affair
    val tsExpr = raw.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampType => col(tsCol)
      case _ => try_to_timestamp(col(tsCol), lit(tsFormat))
    }
    raw.select((graft.operators.EntityRegistry.entityId(col(dnCol)).as("entity_id") +:
      col(dnCol).as("entity_dn") +:
      dnPart(col(dnCol), entityComponent).as("entity_name") +:
      tsExpr.as("ts") +:
      metrics.map(m => if (castMetrics) col(m).cast("double").as(m) else col(m))): _*)
  }
}
