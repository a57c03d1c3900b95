package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trend-store persistence: time-partitioned parquet with
  * partition-level upsert — the Spark analogue of Minerva's
  * timestamp-partitioned trend tables and its "store" upsert.
  *
  * Layout: one directory partition per day of the bucket column.
  * Re-loading a day (late data, re-harvest) rewrites only that
  * partition (`partitionOverwriteMode=dynamic`), which is what makes
  * incremental materialization cheap at 100 TB: the modified-log
  * names dirty days, and only those partitions are rewritten and
  * re-aggregated. Readers prune on `p_date`, so a time-range query
  * touches only its days.
  */
object TrendStoreWriter {

  /** Write (or partition-upsert) a rollup keyed by `bucket`. */
  def write(rolled: DataFrame, path: String): Unit =
    rolled.withColumn("p_date", to_date(col("bucket")))
      .write
      .partitionBy("p_date")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(path)

  /** Read back, pruning to an optional inclusive date range. */
  def read(spark: org.apache.spark.sql.SparkSession, path: String,
           from: Option[String] = None, to: Option[String] = None): DataFrame = {
    val df = spark.read.parquet(path)
    val lo = from.map(d => col("p_date") >= lit(d)).getOrElse(lit(true))
    val hi = to.map(d => col("p_date") <= lit(d)).getOrElse(lit(true))
    df.filter(lo && hi)
  }
}
