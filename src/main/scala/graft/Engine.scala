package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the settings every graft job wants.
  *
  * Mirrors the session posture the reference assumes from its
  * PostgreSQL backend (UTC timestamps, deterministic results) while
  * enabling the Spark-side scale features: AQE (runtime re-plan,
  * skew-join splitting, partition coalescing) and a shuffle
  * parallelism matched to the machine instead of the 200 default.
  */
object Engine {
  def session(appName: String = "graft", cores: String = "*"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
