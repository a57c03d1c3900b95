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

  /** `events.ts` has shipped under several physical parquet encodings
    * across data images: TIMESTAMP(NANOS) (loads as BIGINT under
    * `nanosAsLong`), TIMESTAMP(MICROS, isAdjustedToUTC=false) (loads as
    * TIMESTAMP_NTZ), and plain instant TIMESTAMP. A reader hard-coded to
    * one physical type zeroes every events-family query when the image
    * regenerates, so branch on the *loaded* schema instead and normalise
    * to the same logical pair on every path:
    *   - `ts`    TimestampType (UTC instant; session TZ is UTC, so an
    *             NTZ wall-clock cast is identity w.r.t. the oracle)
    *   - `ts_ns` BIGINT ns-epoch (full precision for ordering/as-of ties)
    *
    * `nanosAsLong` must be set BEFORE the read for a NANOS-encoded file
    * to load at all; it is a no-op for every other encoding, so setting
    * it unconditionally here is safe (and session builders set it too).
    *
    * The NTZ branch's `cast(TimestampType)` interprets the wall-clock in
    * the SESSION time zone — correct only under UTC. Engine/Bench/Verify
    * all set UTC, but an external caller's session may not; the same
    * data must never yield shifted `ts`/`ts_ns` depending on session
    * config, so pin the TZ here with the same defensive-set discipline
    * as `nanosAsLong`.
    */
  private def eventsRaw: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
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
    import org.apache.spark.sql.types._
    val raw = eventsRaw
    raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) read as ns-epoch long
        raw
          .withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
      case TimestampNTZType => // TIMESTAMP(MICROS/MILLIS, utc=false)
        raw
          .withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", expr("unix_micros(ts) * 1000L"))
      case TimestampType => // instant micros/millis
        raw.withColumn("ts_ns", expr("unix_micros(ts) * 1000L"))
      case other =>
        throw new IllegalStateException(
          s"events.ts loaded as unsupported type $other; expected BIGINT (nanos), TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }
  def documents: DataFrame = table("documents")

  /** `embeddings.embedding` has shipped as `list<float>`; the whole
    * similarity family types against `Array[Float]`. Guard against the
    * same physical-type drift that hit `events.ts` in round 9: if a
    * future image regenerates the column as `list<double>` (pandas'
    * default float64), cast it back to the canonical float32 — today's
    * operators already compute at float precision, so behavior is
    * unchanged on the current image and merely survives the next one. */
  def embeddings: DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val raw = table("embeddings")
    raw.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => raw
      case ArrayType(_: NumericType, _) =>
        raw.withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))
      case other =>
        throw new IllegalStateException(
          s"embeddings.embedding loaded as unsupported type $other; expected array<numeric>")
    }
  }
}
