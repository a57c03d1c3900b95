package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-shuffled) store layout — the co-location lever
  * SURVEY §6 leans on at 100 TB: a fact-to-fact join (trend store ⋈
  * attribute snapshot, part ⋈ part outside the column-group writer,
  * store ⋈ dedup survivors) normally shuffles BOTH sides on the join
  * key every query. Writing the stores bucketed by that key into the
  * same bucket count moves the shuffle to WRITE time, once: each
  * bucket file pair is joinable in place, so every later join runs
  * with zero exchanges (spec-asserted on the plan), and with
  * `sortBy` the sort-merge join's sort is satisfied from the file
  * layout too.
  *
  * Spark only consumes bucket layouts through the catalog, so these
  * are saveAsTable writes with an explicit `path` (external tables:
  * the parquet stays a plain directory, the catalog entry is just
  * the bucketing metadata — droppable and re-registrable without
  * touching data). Registries/dims keep broadcasting; bucketing is
  * for the join of two BIG sides, where neither fits in memory and
  * a 100 TB shuffle pair is the single largest avoidable cost. */
object Bucketed {

  /** Write `df` bucketed (and in-bucket sorted) by `bucketKey` into
    * `nBuckets` files at `path`, registered as external table
    * `table`. Bucket counts must MATCH across stores that will join
    * (use one count per deployment; 2× executor count is a sane
    * default at scale). */
  def write(df: DataFrame, path: String, table: String,
            bucketKey: String, nBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketKey).sortBy(bucketKey)
      .option("path", path)
      .saveAsTable(table)
  }

  /** Re-register an existing bucketed directory written by [[write]]
    * under a (new) table name — the catalog entry is metadata only,
    * so a fresh session (or cluster) can adopt a bucketed store
    * without rewriting it. The declared schema/bucketing must match
    * what was written. */
  def register(spark: SparkSession, path: String, table: String,
               bucketKey: String, nBuckets: Int, schemaDdl: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    spark.sql(
      s"""CREATE TABLE `$table` ($schemaDdl) USING parquet
         |CLUSTERED BY (`$bucketKey`) SORTED BY (`$bucketKey`) INTO $nBuckets BUCKETS
         |LOCATION '$path'""".stripMargin)
  }

  /** The bucketed table as a DataFrame (scans carry the bucket
    * layout into join planning). */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
