package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import graft.sources.TableCatalog

/** The round-9 data image silently changed `events.ts` from parquet
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS, isAdjustedToUTC=false), and a
  * reader hard-coded to the nanos physical type zeroed all 41
  * events-family keys. This spec writes the SAME logical events data
  * under each physical encoding the catalog claims to support and reads
  * every one back through `TableCatalog.events`, so the next image
  * regeneration cannot zero the board again.
  */
class TableCatalogSpec extends SparkSpec {

  private def normalized(dir: String): Array[(Long, java.sql.Timestamp, Long)] = {
    val ev = TableCatalog(spark, dir).events
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.schema("ts_ns").dataType === LongType)
    ev.select("event_id", "ts", "ts_ns")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
      .sortBy(t => (t._1, t._3))
  }

  test("events reader adapts to ns-long, TIMESTAMP_NTZ, and instant TIMESTAMP encodings") {
    val base = TableCatalog(spark, sf).events
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        col("ts"), col("ts_ns"))
      .limit(2000)
      .cache()

    val root = Files.createTempDirectory("graft_cat").toString

    // 1. ns-epoch BIGINT named `ts` — how a TIMESTAMP(NANOS) file loads
    //    under spark.sql.legacy.parquet.nanosAsLong.
    base.select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        col("ts_ns").as("ts"))
      .write.parquet(s"$root/ns/events.parquet")

    // 2. TIMESTAMP_NTZ micros — the round-9+ image encoding
    //    (TIMESTAMP(MICROS, isAdjustedToUTC=false)).
    base.select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        col("ts").cast("timestamp_ntz").as("ts"))
      .write.parquet(s"$root/ntz/events.parquet")

    // 3. instant TIMESTAMP micros (isAdjustedToUTC=true).
    base.select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        col("ts"))
      .write.parquet(s"$root/utc/events.parquet")

    val fromNs  = normalized(s"$root/ns")
    val fromNtz = normalized(s"$root/ntz")
    val fromUtc = normalized(s"$root/utc")

    val n = base.count()
    assert(n > 0 && fromNs.length === n)
    assert(fromNs.toSeq === fromNtz.toSeq)
    assert(fromNs.toSeq === fromUtc.toSeq)
    base.unpersist()
  }

  test("trend-store reader tolerates mixed parquet timestamp encodings (INT96/MILLIS/MICROS)") {
    import graft.operators.TrendStoreWriter
    import graft.SparkSpec.spark.implicits._
    val path = Files.createTempDirectory("graft_enc").toString + "/store"
    def mk(day: Int, v: Double) =
      Seq((1L, f"2024-01-0$day%d 10:00:00", v)).toDF("entity_id", "bucket", "value")
        .withColumn("bucket", col("bucket").cast("timestamp"))
    val key = "spark.sql.parquet.outputTimestampType"
    val saved = spark.conf.get(key)
    try {
      // three day-partitions, each written under a different legal
      // physical timestamp encoding — the drift class that broke the
      // round-9 events reader must not break graft's own store readers
      spark.conf.set(key, "INT96")
      TrendStoreWriter.write(mk(1, 1.0), path)
      spark.conf.set(key, "TIMESTAMP_MILLIS")
      TrendStoreWriter.upsert(spark, path, mk(2, 2.0))
      spark.conf.set(key, "TIMESTAMP_MICROS")
      TrendStoreWriter.upsert(spark, path, mk(3, 3.0))
    } finally spark.conf.set(key, saved)
    val back = TrendStoreWriter.read(spark, path)
      .select(date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss").as("b"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).sorted
    assert(back.toSeq === Seq(
      ("2024-01-01 10:00:00", 1.0),
      ("2024-01-02 10:00:00", 2.0),
      ("2024-01-03 10:00:00", 3.0)))
  }

  test("embeddings reader conforms a double[] regeneration back to float[]") {
    import org.apache.spark.sql.types._
    val base = TableCatalog(spark, sf).embeddings.limit(100).cache()
    val root = Files.createTempDirectory("graft_emb").toString
    base.withColumn("embedding", col("embedding").cast(ArrayType(DoubleType)))
      .write.parquet(s"$root/embeddings.parquet")
    val back = TableCatalog(spark, root).embeddings
    assert(back.schema("embedding").dataType === ArrayType(FloatType, containsNull = true))
    // float→double→float is exact, so the round trip is lossless
    val a = base.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    val b = back.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    base.unpersist()
  }

  test("events reader normalizes the driver image to (ts TIMESTAMP, ts_ns BIGINT)") {
    val ev = TableCatalog(spark, sf).events
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.schema("ts_ns").dataType === LongType)
    // ts and ts_ns agree at micro precision on every row
    val mismatched = ev
      .filter(expr("unix_micros(ts) != ts_ns div 1000"))
      .count()
    assert(mismatched === 0L)
  }
}
