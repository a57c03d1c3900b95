package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Z-order layout: interleave correctness against a hand-rolled
  * reference, and the CLUSTERING effect that is the point — after
  * zorderBy on (entity, time), an entity-range predicate intersects
  * the footer min/max of a small fraction of the files, where the
  * time-sorted layout intersects ALL of them. Per-file min/max is
  * exactly what parquet footer statistics expose, so "files whose
  * [min,max] overlaps the predicate" IS the file count a stats-pruning
  * reader scans at 100 TB. */
class LayoutSpec extends SparkSpec {

  private def refInterleave(vals: Seq[Long], bits: Int): Long = {
    var z = 0L
    val d = vals.size
    for (j <- vals.indices; i <- 0 until bits)
      z |= ((vals(j) >> i) & 1L) << (i * d + j)
    z
  }

  test("zValue matches the reference bit interleave") {
    val df = spark.range(0, 256).select(
      (col("id") % 16).as("x"), (col("id") / 16).cast("long").as("y"))
    val got = df.select(col("x"), col("y"),
        Layout.zValue(Seq(col("x"), col("y")), 4).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (x <- 0L until 16L; y <- 0L until 16L)
      assert(got((x, y)) === refInterleave(Seq(x, y), 4),
        s"interleave mismatch at ($x, $y)")
  }

  test("zorderBy on an empty dataset is a no-op, not a crash") {
    val empty = spark.range(0, 0).select(col("id").as("a"), col("id").as("b"))
    assert(Layout.zorderBy(empty, Seq("a", "b"), 4).count() === 0)
  }

  test("zorderBy clusters both dimensions: entity predicates skip most files; row set unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val n = 200000L
    val rows = spark.range(0, n).select(
      // decorrelate entity from time: consecutive rows alternate
      // entities while time advances — the worst case for a
      // time-sorted layout's entity stats
      ((col("id") * 7919) % 1000).as("entity_id"),
      expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0, CAST(id / 8 AS INT))").as("ts"),
      (col("id") % 97).cast("double").as("value"))

    val zPath = s"$dir/zorder"
    val tPath = s"$dir/bytime"
    Layout.zorderBy(rows, Seq("entity_id", "ts"), numFiles = 16)
      .write.parquet(zPath)
    rows.repartitionByRange(16, col("ts")).sortWithinPartitions(col("ts"))
      .write.parquet(tPath)

    // layout is row-preserving
    val back = spark.read.parquet(zPath)
    assert(back.count() === n)
    assert(back.agg(sum(col("entity_id")), sum(col("value"))).head() ===
      rows.agg(sum(col("entity_id")), sum(col("value"))).head())

    // per-file entity stats = what parquet footers expose to pruning
    def overlapping(path: String, lo: Long, hi: Long): (Long, Long) = {
      val stats = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("entity_id")).as("mn"), max(col("entity_id")).as("mx"))
        .collect()
      (stats.count(r => r.getLong(1) <= hi && r.getLong(2) >= lo).toLong,
        stats.length.toLong)
    }
    val (zHit, zTotal) = overlapping(zPath, 100, 149)
    val (tHit, tTotal) = overlapping(tPath, 100, 149)
    assert(zTotal === 16 && tTotal === 16)
    // time-sorted layout: every file spans ~all entities — no pruning
    assert(tHit === tTotal, s"expected the time layout unprunable, got $tHit/$tTotal")
    // z-order: a 5% entity slice intersects a minority of files
    assert(zHit <= zTotal / 2,
      s"z-order layout should prune most files, hit $zHit of $zTotal")

    // and time predicates STILL prune on the z layout (both dims
    // cluster — that is the whole point of interleaving)
    val zT = spark.read.parquet(zPath)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("ts")).as("mn"), max(col("ts")).as("mx"))
      .collect()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 01:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 01:59:59")
    val zTimeHit = zT.count(r => !r.getTimestamp(1).after(t1) && !r.getTimestamp(2).before(t0))
    assert(zTimeHit <= 8, s"time predicate should also prune the z layout, hit $zTimeHit of 16")
  }
}
