package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over a scale-factor directory of parquet files.
  *
  * The reference keeps its stores in PostgreSQL schemas (`trend`,
  * `attribute`, `directory`); graft's stores are parquet tables in a
  * directory. Reads are plain `spark.read.parquet`, so Catalyst
  * pushes filters and prunes columns at the scan.
  */
final case class TableCatalog(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses by
    * default. Read it as a ns-epoch long (keeps full precision for
    * ordering/as-of ties), and expose a derived micro-precision
    * `ts` TimestampType column for bucketing and formatting. */
  private def eventsRaw: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
  }

  def region: DataFrame    = table("region")
  def nation: DataFrame    = table("nation")
  def customer: DataFrame  = table("customer")
  def supplier: DataFrame  = table("supplier")
  def part: DataFrame      = table("part")
  def orders: DataFrame    = table("orders")
  def lineitem: DataFrame  = table("lineitem")
  def events: DataFrame = {
    import org.apache.spark.sql.functions._
    eventsRaw
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
  }
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")
}
