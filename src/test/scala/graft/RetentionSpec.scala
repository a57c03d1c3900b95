package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{AttributeStoreWriter, StoreFs, TrendStore, TrendStoreWriter}

/** Partition retention + state-swap recovery specs. */
class RetentionSpec extends SparkSpec {

  import graft.SparkSpec.spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft_retain").toString

  private def tenDays(entity: Long) =
    (1 to 10).map(d => (entity, f"2024-01-$d%02d 06:00:00", d.toDouble))
      .toDF("entity_id", "bucket", "v")
      .withColumn("bucket", col("bucket").cast("timestamp"))

  test("retain drops expired day partitions, keeps the horizon") {
    val store = tmpDir() + "/store"
    TrendStoreWriter.write(tenDays(1L), store)
    val dropped = TrendStoreWriter.retain(spark, store, "2024-01-06")
    assert(dropped === (1 to 5).map(d => f"2024-01-$d%02d"))
    val dirs = StoreFs.list(spark, store).map(_.getName)
      .filter(_.startsWith("p_date=")).sorted
    assert(dirs === (6 to 10).map(d => f"p_date=2024-01-$d%02d"))
    val back = TrendStoreWriter.read(spark, store)
    assert(back.count() === 5)
    assert(back.agg(min(col("bucket")).cast("string")).head.getString(0)
      === "2024-01-06 06:00:00")
    // A second retain at the same horizon is a no-op.
    assert(TrendStoreWriter.retain(spark, store, "2024-01-06").isEmpty)
  }

  test("tieredRetain downsamples expired days into the coarse tier before dropping them") {
    val base = tmpDir()
    val (fine, coarse) = (s"$base/fine", s"$base/coarse")
    // hourly partials: 3 days × 2 hours × 2 entities
    val raw = (for (d <- 1 to 3; h <- Seq(6, 18); e <- Seq(1L, 2L))
      yield (e, f"2024-01-0$d $h%02d:00:00", (d * 10 + h).toDouble))
      .toDF("entity_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val hourly = TrendStore.rollup(raw, col("entity_id"), col("ts"), col("value"), "hour")
    TrendStoreWriter.write(hourly, fine)
    // expected coarse tier: the direct daily rollup of days 1-2
    val expect = TrendStore.present(TrendStore.reRollup(
        hourly.filter(col("bucket") < lit("2024-01-03").cast("timestamp")), "day"))
      .collect().map(_.toString).sorted
    val dropped = TrendStoreWriter.tieredRetain(spark, fine, coarse, "2024-01-03", "day")
    assert(dropped === Seq("2024-01-01", "2024-01-02"))
    val got = TrendStore.present(TrendStoreWriter.read(spark, coarse).drop("p_date"))
      .collect().map(_.toString).sorted
    assert(got === expect, "coarse tier != direct daily rollup of the expired days")
    // the fine store keeps only the horizon day
    assert(StoreFs.list(spark, fine).map(_.getName).filter(_.startsWith("p_date=")) ===
      Seq("p_date=2024-01-03"))
    // re-run at the same horizon: nothing expired, both tiers unchanged
    assert(TrendStoreWriter.tieredRetain(spark, fine, coarse, "2024-01-03", "day").isEmpty)
    assert(TrendStore.present(TrendStoreWriter.read(spark, coarse).drop("p_date"))
      .collect().map(_.toString).sorted === expect)
    // crash-window replay: coarse already holds the downsampled days
    // (upsert landed, drop didn't). Restore the dropped fine partitions
    // and re-run — the absorbed_dates provenance makes the replay a
    // bit-identical rewrite instead of a double count.
    TrendStoreWriter.write(hourly, fine)
    assert(TrendStoreWriter.tieredRetain(spark, fine, coarse, "2024-01-03", "day")
      === Seq("2024-01-01", "2024-01-02"))
    assert(TrendStore.present(TrendStoreWriter.read(spark, coarse).drop("p_date"))
      .collect().map(_.toString).sorted === expect)
  }

  test("tieredRetain merges a coarse bucket that fills across successive runs") {
    val base = tmpDir()
    val (fine, coarse) = (s"$base/fine", s"$base/coarse")
    // one ISO week: Mon 2024-01-01 .. Sun 2024-01-07, daily partials
    val raw = (for (d <- 1 to 8; e <- Seq(1L, 2L))
      yield (e, f"2024-01-0$d 06:00:00", (e * 100 + d).toDouble))
      .toDF("entity_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val daily = TrendStore.rollup(raw, col("entity_id"), col("ts"), col("value"), "day")
    TrendStoreWriter.write(daily, fine)
    // run 1 expires Mon-Wed; run 2 expires Thu-Sun + the next Monday.
    // The week bucket must end up as the DIRECT weekly rollup of all
    // seven days — run 2 merging into run 1's partial week, never
    // replacing it.
    assert(TrendStoreWriter.tieredRetain(spark, fine, coarse, "2024-01-04", "week")
      === Seq("2024-01-01", "2024-01-02", "2024-01-03"))
    assert(TrendStoreWriter.tieredRetain(spark, fine, coarse, "2024-01-09", "week")
      === (4 to 8).map(d => f"2024-01-0$d"))
    val expect = TrendStore.present(TrendStore.reRollup(daily, "week"))
      .collect().map(_.toString).sorted
    val got = TrendStore.present(TrendStoreWriter.read(spark, coarse).drop("p_date"))
      .collect().map(_.toString).sorted
    assert(got === expect, "coarse week != direct weekly rollup across two runs")
    // replay drill across the multi-day bucket: restore run 2's days
    // (upsert landed, drop didn't) and re-run — absorbed_dates already
    // holds them, so the coarse tier is bit-identical afterwards
    TrendStoreWriter.write(daily.filter(to_date(col("bucket")) >= lit("2024-01-04")), fine)
    assert(TrendStoreWriter.tieredRetain(spark, fine, coarse, "2024-01-09", "week")
      === (4 to 8).map(d => f"2024-01-0$d"))
    assert(TrendStore.present(TrendStoreWriter.read(spark, coarse).drop("p_date"))
      .collect().map(_.toString).sorted === expect)
  }

  test("tieredRetain rejects an unknown granularity before dropping anything") {
    val base = tmpDir()
    val (fine, coarse) = (s"$base/fine", s"$base/coarse")
    TrendStoreWriter.write(
      TrendStore.rollup(tenDays(1L).withColumnRenamed("bucket", "ts"),
        col("entity_id"), col("ts"), col("v"), "day"), fine)
    val before = StoreFs.list(spark, fine).map(_.getName).sorted
    intercept[IllegalArgumentException] {
      TrendStoreWriter.tieredRetain(spark, fine, coarse, "2024-01-06", "dya")
    }
    intercept[IllegalArgumentException] {
      TrendStoreWriter.tieredRetain(spark, fine, coarse, "2024-01-06", "raw")
    }
    // the typo'd run dropped nothing and wrote no coarse store
    assert(StoreFs.list(spark, fine).map(_.getName).sorted === before)
    assert(StoreFs.list(spark, coarse).isEmpty)
  }

  test("deleteBucket removes one timestamp's rows, touching only its day partition") {
    val store = tmpDir() + "/store"
    TrendStoreWriter.write(tenDays(1L).unionByName(tenDays(2L)), store)
    val day3Before = StoreFs.list(spark, store + "/p_date=2024-01-03")
      .map(_.toString).sorted
    // delete the Jan-05 06:00 bucket (both entities carry it)
    val removed = TrendStoreWriter.deleteBucket(spark, store, "2024-01-05 06:00:00")
    assert(removed === 2L)
    val back = TrendStoreWriter.read(spark, store)
    assert(back.count() === 18)
    assert(back.filter(col("bucket") === lit("2024-01-05 06:00:00").cast("timestamp"))
      .count() === 0)
    // untouched days were not rewritten
    assert(StoreFs.list(spark, store + "/p_date=2024-01-03")
      .map(_.toString).sorted === day3Before)
    // the emptied Jan-05 partition is gone entirely (one bucket per day here)
    assert(!StoreFs.exists(spark, store + "/p_date=2024-01-05"))
    // idempotent: deleting an absent bucket removes nothing
    assert(TrendStoreWriter.deleteBucket(spark, store, "2024-01-05 06:00:00") === 0L)
    assert(TrendStoreWriter.deleteBucket(spark, store, "2024-01-04 23:59:59") === 0L)
    assert(TrendStoreWriter.read(spark, store).count() === 18)
    // malformed timestamp refused before touching anything
    intercept[IllegalArgumentException] {
      TrendStoreWriter.deleteBucket(spark, store, "Jan 5")
    }
  }

  test("deleteBucket rewrites a day that keeps other buckets") {
    val store = tmpDir() + "/store"
    // two buckets on the same day
    val rows = Seq(
      (1L, "2024-02-01 06:00:00", 1.0), (1L, "2024-02-01 18:00:00", 2.0),
      (2L, "2024-02-01 18:00:00", 3.0))
      .toDF("entity_id", "bucket", "v")
      .withColumn("bucket", col("bucket").cast("timestamp"))
    TrendStoreWriter.write(rows, store)
    assert(TrendStoreWriter.deleteBucket(spark, store, "2024-02-01 18:00:00") === 2L)
    val back = TrendStoreWriter.read(spark, store)
    assert(back.count() === 1)
    assert(back.select(col("v")).head.getDouble(0) === 1.0)
  }

  test("retain validates the horizon format") {
    intercept[IllegalArgumentException] {
      TrendStoreWriter.retain(spark, tmpDir(), "Jan 6 2024")
    }
  }

  test("history retention leaves the current view untouched") {
    val dir = tmpDir()
    val hist = dir + "/history"; val cur = dir + "/current"
    val rows = (1 to 10).map(d => (1L, f"2024-01-$d%02d 06:00:00", d.toLong, s"v$d"))
      .toDF("entity_id", "ts", "event_id", "attr")
      .withColumn("ts", col("ts").cast("timestamp"))
    AttributeStoreWriter.append(spark, hist, rows)
    AttributeStoreWriter.materializeCurrent(spark, hist, cur)
    val dropped = AttributeStoreWriter.retainHistory(spark, hist, "2024-01-08")
    assert(dropped.size === 7)
    assert(AttributeStoreWriter.readHistory(spark, hist).count() === 3)
    // Current still answers from pre-retention state: latest value v10.
    val current = spark.read.parquet(cur)
    assert(current.select(col("attr")).head.getString(0) === "v10")
  }

  test("history compaction drops repeats, rewrites only dirty days") {
    val dir = tmpDir()
    val hist = dir + "/history"
    val rows = Seq(
      (1L, "2024-01-01 08:00:00", 1L, "A"), // keep (first)
      (1L, "2024-01-02 08:00:00", 2L, "A"), // repeat → drop
      (1L, "2024-01-03 08:00:00", 3L, "B"), // change → keep
      (2L, "2024-01-01 09:00:00", 4L, "X"), // keep
      (2L, "2024-01-02 09:00:00", 5L, "Y"), // change → keep
      (2L, "2024-01-03 09:00:00", 6L, "Y"), // repeat → drop
      (3L, "2024-01-01 07:00:00", 7L, "Z"), // keep
      (3L, "2024-01-04 07:00:00", 8L, "Z")  // repeat → drop; day 04 empties
    ).toDF("entity_id", "ts", "event_id", "attr")
      .withColumn("ts", col("ts").cast("timestamp"))
    AttributeStoreWriter.append(spark, hist, rows)
    val day1Files = StoreFs.list(spark, hist + "/p_date=2024-01-01")
      .map(_.toString).sorted
    val (dropped, dirtyDays) =
      AttributeStoreWriter.compactHistory(spark, hist, "attr")
    assert(dropped === 3)
    assert(dirtyDays.map(_.toString).sorted ===
      Seq("2024-01-02", "2024-01-03", "2024-01-04"))
    val back = AttributeStoreWriter.readHistory(spark, hist)
    assert(back.count() === 5)
    assert(back.select(col("entity_id"), col("attr")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ===
      Set((1L, "A"), (1L, "B"), (2L, "X"), (2L, "Y"), (3L, "Z")))
    // untouched day-1 partition was not rewritten
    assert(StoreFs.list(spark, hist + "/p_date=2024-01-01")
      .map(_.toString).sorted === day1Files)
    // the emptied day-4 partition is gone entirely
    assert(!StoreFs.exists(spark, hist + "/p_date=2024-01-04"))
    // a second compaction is a no-op
    assert(AttributeStoreWriter.compactHistory(spark, hist, "attr")._1 === 0)
  }

  test("attribute schema evolution: new attribute column mid-history survives compact + current") {
    val dir = tmpDir()
    val hist = dir + "/history"; val cur = dir + "/current"
    val v1 = Seq(
      (1L, "2024-01-01 08:00:00", 1L, "A"),
      (1L, "2024-01-02 08:00:00", 2L, "A"), // repeat → compaction drop
      (2L, "2024-01-01 09:00:00", 3L, "X"))
      .toDF("entity_id", "ts", "event_id", "attr")
      .withColumn("ts", col("ts").cast("timestamp"))
    AttributeStoreWriter.append(spark, hist, v1)
    // evolution: a second attribute appears in a later delivery
    val v2 = Seq((1L, "2024-01-03 08:00:00", 4L, "B", "gold"))
      .toDF("entity_id", "ts", "event_id", "attr", "tier")
      .withColumn("ts", col("ts").cast("timestamp"))
    AttributeStoreWriter.append(spark, hist, v2)

    val back = AttributeStoreWriter.readHistory(spark, hist)
    assert(back.columns.contains("tier"))
    val old = back.filter(col("event_id") === 1L).head
    assert(old.isNullAt(old.fieldIndex("tier")))

    // compaction on the original attribute must keep the new column
    // on the days it rewrites (mergeSchema in the compactor's read)
    val (dropped, _) = AttributeStoreWriter.compactHistory(spark, hist, "attr")
    assert(dropped === 1)
    val after = AttributeStoreWriter.readHistory(spark, hist)
    assert(after.columns.contains("tier"))
    val evolved = after.filter(col("event_id") === 4L).head
    assert(evolved.getAs[String]("tier") === "gold")

    // current view carries the union schema: latest row per entity
    val current = AttributeStoreWriter.materializeCurrent(spark, hist, cur)
    val e1 = current.filter(col("entity_id") === 1L).head
    assert(e1.getAs[String]("attr") === "B" && e1.getAs[String]("tier") === "gold")
    val e2 = current.filter(col("entity_id") === 2L).head
    assert(e2.getAs[String]("attr") === "X" && e2.isNullAt(e2.fieldIndex("tier")))
  }

  test("replace survives a crash between the two renames (recover)") {
    val dir = tmpDir()
    val dest = dir + "/state"
    Seq(("a", 1L)).toDF("k", "v").write.parquet(dest)
    // Simulate the torn window: old state moved aside, new state never
    // landed (crash after rename #1 of replace()).
    val (f, d) = StoreFs.fs(spark, dest)
    assert(f.rename(d, new org.apache.hadoop.fs.Path(dest + ".bak")))
    assert(!StoreFs.exists(spark, dest))
    assert(StoreFs.recover(spark, dest))
    assert(spark.read.parquet(dest).as[(String, Long)].collect().toSeq === Seq(("a", 1L)))
    // recover is a no-op when dest is healthy.
    assert(!StoreFs.recover(spark, dest))
  }

  test("replace swaps atomically-enough: new state lands, backup cleaned") {
    val dir = tmpDir()
    val dest = dir + "/state"
    Seq(("old", 1L)).toDF("k", "v").write.parquet(dest)
    Seq(("new", 2L)).toDF("k", "v").write.parquet(dest + ".tmp")
    StoreFs.replace(spark, dest + ".tmp", dest)
    assert(spark.read.parquet(dest).as[(String, Long)].collect().toSeq === Seq(("new", 2L)))
    assert(!StoreFs.exists(spark, dest + ".bak"))
    assert(!StoreFs.exists(spark, dest + ".tmp"))
  }
}
