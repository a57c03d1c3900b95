package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-part trend stores: the reference splits one logical trend
  * store into several "parts" — column groups that share the
  * (entity, timestamp) key — so very wide stores (hundreds of
  * counters from different harvest plugins) don't live in one
  * monolithic table (minerva/storage/trend: trend_store_part).
  *
  * Spark-first translation: each part is its own time-partitioned
  * parquet store under `basePath/<part>/`, written/upserted
  * independently (a harvest run touching one vendor's counters
  * rewrites only that part), and joined back on the shared key for
  * wide reads.
  *
  * Scale notes: parts share the identical day-partition layout, so a
  * wide read prunes every part to the same days; the reassembly join
  * is keyed (entity_id, bucket) on every side — equi-joins Spark
  * executes with one shuffle per part (or zero when bucketed layouts
  * line up under storage-partitioned join). Column pruning works at
  * the part level for free: a query touching two parts never opens
  * the others' files at all — the point of the layout at 100 TB.
  */
object TrendStoreParts {

  /** Split a wide trend DataFrame into named column-group parts and
    * write (or partition-upsert) each under `basePath/<name>`. Every
    * part carries the shared key columns. */
  def write(wide: DataFrame, basePath: String,
            parts: Map[String, Seq[String]],
            keyCols: Seq[String] = Seq("entity_id", "bucket")): Unit =
    parts.foreach { case (name, cols) =>
      TrendStoreWriter.write(
        wide.select((keyCols ++ cols).map(col): _*), s"$basePath/$name")
    }

  /** Row-level upsert into ONE part — other parts are untouched. */
  def upsertPart(spark: SparkSession, basePath: String, name: String,
                 incoming: DataFrame,
                 keyCols: Seq[String] = Seq("entity_id", "bucket")): Unit =
    TrendStoreWriter.upsert(spark, s"$basePath/$name", incoming, keyCols)

  /** Read a set of parts and reassemble the wide view on the shared
    * key. Missing rows in a part yield nulls for its columns (parts
    * can be loaded by independent harvest jobs at different times),
    * so the join is full_outer across parts. One shuffle per part —
    * fine at the part counts Minerva uses (≤ dozens); see
    * [[readWide]] for the one-shuffle shape. */
  def read(spark: SparkSession, basePath: String, parts: Seq[String],
           keyCols: Seq[String] = Seq("entity_id", "bucket"),
           from: Option[String] = None, to: Option[String] = None): DataFrame = {
    require(parts.nonEmpty, "at least one part is required")
    parts.map(p => TrendStoreWriter.read(spark, s"$basePath/$p", from, to).drop("p_date"))
      .reduce((a, b) => a.join(b, keyCols, "full_outer"))
  }

  /** Single-shuffle wide read: pad each part's scan to the union
    * schema with typed nulls, union them (no shuffle), and collapse
    * per key with `first(…, ignoreNulls)` — ONE exchange total,
    * independent of part count, where the [[read]] join chain pays
    * one per part. Equivalent to the full_outer reassembly under the
    * store invariant (at most one row per key per part, which is what
    * the keyed upsert maintains). */
  def readWide(spark: SparkSession, basePath: String, parts: Seq[String],
               keyCols: Seq[String] = Seq("entity_id", "bucket"),
               from: Option[String] = None, to: Option[String] = None): DataFrame = {
    require(parts.nonEmpty, "at least one part is required")
    val dfs = parts.map(p =>
      TrendStoreWriter.read(spark, s"$basePath/$p", from, to).drop("p_date"))
    val fieldType = dfs.flatMap(_.schema.fields).map(f => f.name -> f.dataType).toMap
    val valueCols = dfs.flatMap(_.columns).distinct.filterNot(keyCols.contains)
    val padded = dfs.map { df =>
      val have = df.columns.toSet
      df.select(keyCols.map(col) ++ valueCols.map { c =>
        if (have(c)) col(c) else lit(null).cast(fieldType(c)).as(c)
      }: _*)
    }
    padded.reduce(_ unionByName _)
      .groupBy(keyCols.map(col): _*)
      .agg(first(col(valueCols.head), ignoreNulls = true).as(valueCols.head),
        valueCols.tail.map(c => first(col(c), ignoreNulls = true).as(c)): _*)
  }
}
