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
      // Shuffle parallelism is a DEPLOYMENT number: 32 matches this
      // machine; a 1000-executor cluster sets it to O(cluster cores)
      // (and a memory-tight executor raises it further so per-task
      // shuffle shares fit — the memory-bounded sf10 rehearsal drives
      // exactly that via this env knob; raising it globally here was
      // measured at +0.4-4.5 s/key on the sf0.1 board from 8x map-side
      // shuffle buckets, so the default stays machine-sized).
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
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
