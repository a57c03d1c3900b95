package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{Materialize, TrendStoreWriter}

class MaterializeSpec extends SparkSpec {

  import graft.SparkSpec.spark.implicits._

  private def mk(rows: Seq[(Long, String, Double)]) =
    rows.toDF("entity_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp"))

  test("incremental materialization recomputes only dirty days") {
    val statePath = Files.createTempDirectory("graft_mat_state").toString + "/state"
    val storePath = Files.createTempDirectory("graft_mat_store").toString

    val batch1 = Seq(
      (1L, "2024-01-01 10:05:00", 1.0), (1L, "2024-01-01 11:05:00", 2.0),
      (2L, "2024-01-01 10:10:00", 5.0), (1L, "2024-01-02 09:00:00", 7.0))

    // run 1: everything is dirty (no state yet)
    val dirty1 = Materialize.run(mk(batch1), col("entity_id"), col("ts"),
      col("value"), "hour", statePath, storePath)
    assert(dirty1.map(_.toString).sorted === Array("2024-01-01", "2024-01-02"))
    assert(TrendStoreWriter.read(spark, storePath).count() === 4) // 4 (entity,hour) buckets

    // run 2 on identical source: nothing dirty, store untouched
    val files1 = new java.io.File(storePath).listFiles().map(_.getName).toSet
    val dirty2 = Materialize.run(mk(batch1), col("entity_id"), col("ts"),
      col("value"), "hour", statePath, storePath)
    assert(dirty2.isEmpty)

    // run 3: late data lands on Jan 1 only → only Jan 1 recomputed
    val batch2 = batch1 :+ ((2L, "2024-01-01 12:59:00", 100.0))
    val dirty3 = Materialize.run(mk(batch2), col("entity_id"), col("ts"),
      col("value"), "hour", statePath, storePath)
    assert(dirty3.map(_.toString).toSeq === Seq("2024-01-01"))
    val back = TrendStoreWriter.read(spark, storePath)
    assert(back.count() === 5)
    assert(back.filter(col("sum_dec") === 100.0).count() === 1)
    // Jan 2 rows survived the partial rewrite
    assert(TrendStoreWriter.read(spark, storePath, from = Some("2024-01-02")).count() === 1)
    assert(files1.nonEmpty)
  }

  test("a torn state swap self-heals: next run recovers the backup, no re-materialization") {
    val statePath = Files.createTempDirectory("graft_mat_rec").toString + "/state"
    val storePath = Files.createTempDirectory("graft_mat_rec_store").toString
    val src = mk(Seq((1L, "2024-01-01 10:05:00", 1.0), (2L, "2024-01-02 09:00:00", 2.0)))
    Materialize.run(src, col("entity_id"), col("ts"), col("value"),
      "hour", statePath, storePath)
    // Simulate a replace() that died between its two renames: state
    // moved aside to .bak, new state never landed.
    val (f, d) = graft.operators.StoreFs.fs(spark, statePath)
    assert(f.rename(d, new org.apache.hadoop.fs.Path(statePath + ".bak")))
    // The next run's readState recovers the backup, so NOTHING is
    // dirty — without recovery the empty state would re-materialize
    // every day.
    val dirty = Materialize.run(src, col("entity_id"), col("ts"), col("value"),
      "hour", statePath, storePath)
    assert(dirty.isEmpty, s"expected recovered state, re-materialized: ${dirty.toSeq}")
  }

  test("materialization chain propagates late arrivals through derived stores") {
    import graft.operators.TrendStore
    val base = Files.createTempDirectory("graft_mat_dag").toString
    val rawPath = s"$base/raw"
    val defs = Seq(
      Materialize.MatDef("hourly", rawPath, s"$base/hourly", s"$base/hourly_state",
        "hour", valueCol = Some("value")),
      Materialize.MatDef("daily", s"$base/hourly", s"$base/daily", s"$base/daily_state", "day"),
      Materialize.MatDef("monthly", s"$base/daily", s"$base/monthly", s"$base/monthly_state", "month"))
    // deliberately out of dependency order: runAll must topo-sort
    val shuffled = Seq(defs(2), defs(0), defs(1))

    def norm(path: String) = spark.read.parquet(path)
      .select(col("entity_id"), col("bucket"), col("cnt").cast("long").as("cnt"),
        col("sum_dec").cast("double").as("s"), col("max_value"))
    def assertChainEqualsFullRecompute(raw: Seq[(Long, String, Double)]): Unit = {
      val hourly = TrendStore.rollup(mk(raw), col("entity_id"), col("ts"), col("value"), "hour")
      val daily = TrendStore.reRollup(hourly, "day")
      val monthly = TrendStore.reRollup(daily, "month")
      for ((want, path) <- Seq(hourly -> s"$base/hourly", daily -> s"$base/daily",
          monthly -> s"$base/monthly")) {
        val w = want.select(col("entity_id"), col("bucket"), col("cnt").cast("long").as("cnt"),
          col("sum_dec").cast("double").as("s"), col("max_value"))
        val g = norm(path)
        assert(g.exceptAll(w).isEmpty && w.exceptAll(g).isEmpty, s"mismatch at $path")
      }
    }

    val batch1 = Seq(
      (1L, "2024-01-01 10:05:00", 1.0), (1L, "2024-01-15 11:05:00", 2.0),
      (2L, "2024-02-01 10:10:00", 5.0))
    mk(batch1).write.mode("overwrite").parquet(rawPath)
    val r1 = Materialize.runAll(spark, shuffled).toMap
    assert(r1("hourly").map(_.toString).sorted ===
      Array("2024-01-01", "2024-01-15", "2024-02-01"))
    assert(r1("monthly").map(_.toString).sorted === Array("2024-01-01", "2024-02-01"))
    assertChainEqualsFullRecompute(batch1)

    // unchanged source: every step is a no-op, nothing scans or writes
    val r2 = Materialize.runAll(spark, shuffled)
    assert(r2.forall(_._2.isEmpty))

    // LATE ARRIVAL on Jan 1 only: the raw step recomputes that day and
    // the chain refreshes exactly its hourly day, daily day and
    // monthly bucket — February is never touched
    val batch2 = batch1 :+ ((2L, "2024-01-01 12:59:00", 100.0))
    mk(batch2).write.mode("overwrite").parquet(rawPath)
    val febFiles = new java.io.File(s"$base/monthly/p_date=2024-02-01")
      .listFiles().map(_.getName).toSet
    val r3 = Materialize.runAll(spark, shuffled).toMap
    assert(r3("hourly").map(_.toString).toSeq === Seq("2024-01-01"))
    assert(r3("daily").map(_.toString).toSeq === Seq("2024-01-01"))
    assert(r3("monthly").map(_.toString).toSeq === Seq("2024-01-01"))
    assert(new java.io.File(s"$base/monthly/p_date=2024-02-01")
      .listFiles().map(_.getName).toSet === febFiles)
    assertChainEqualsFullRecompute(batch2)
  }

  test("entity-aggregation chain step materializes a parent-keyed derived store") {
    import graft.operators.TrendStore
    import graft.SparkSpec.spark.implicits._
    val base = Files.createTempDirectory("graft_mat_ent").toString
    val rawPath = s"$base/raw"
    // relation: cells 1,2 → site A; cell 3 → site B
    Seq(("1", "A"), ("2", "A"), ("3", "B")).toDF("child_dn", "parent_dn")
      .write.mode("overwrite").parquet(s"$base/rel")
    val defs = Seq(
      Materialize.MatDef("hourly", rawPath, s"$base/hourly", s"$base/s1",
        "hour", valueCol = Some("value")),
      Materialize.MatDef("site_daily", s"$base/hourly", s"$base/site_daily",
        s"$base/s2", "day", relationPath = Some(s"$base/rel")))
    def assertSiteStoreMatches(raw: Seq[(Long, String, Double)]): Unit = {
      // full recompute twin: day rollup per cell, rolled up the relation
      val daily = TrendStore.rollup(mk(raw), col("entity_id"), col("ts"), col("value"), "day")
        .withColumn("entity_id", col("entity_id").cast("string"))
      val rel = spark.read.parquet(s"$base/rel")
      val want = TrendStore.entityReRollup(daily, rel, "child_dn", "parent_dn")
        .select(col("entity_id"), col("bucket"), col("cnt").cast("long"),
          col("sum_dec").cast("double"), col("max_value"))
      val got = spark.read.parquet(s"$base/site_daily")
        .select(col("entity_id"), col("bucket"), col("cnt").cast("long"),
          col("sum_dec").cast("double"), col("max_value"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        "site store diverged from full recompute")
    }
    val batch1 = Seq(
      (1L, "2024-01-01 10:05:00", 1.0), (2L, "2024-01-01 11:05:00", 2.0),
      (3L, "2024-01-02 09:00:00", 5.0))
    mk(batch1).withColumn("entity_id", col("entity_id").cast("string"))
      .write.mode("overwrite").parquet(rawPath)
    val r1 = Materialize.runAll(spark, defs).toMap
    assert(r1("site_daily").map(_.toString).sorted === Array("2024-01-01", "2024-01-02"))
    // parent-keyed: sites A and B, never cells
    assert(spark.read.parquet(s"$base/site_daily")
      .select("entity_id").distinct().collect().map(_.getString(0)).toSet === Set("A", "B"))
    assertSiteStoreMatches(batch1)
    // late arrival on Jan 1 (cell 2 → site A): only Jan 1 refreshes
    val batch2 = batch1 :+ ((2L, "2024-01-01 23:59:00", 100.0))
    mk(batch2).withColumn("entity_id", col("entity_id").cast("string"))
      .write.mode("overwrite").parquet(rawPath)
    val r2 = Materialize.runAll(spark, defs).toMap
    assert(r2("site_daily").map(_.toString).toSeq === Seq("2024-01-01"))
    assertSiteStoreMatches(batch2)
    // roots cannot be entity-aggregation steps
    intercept[IllegalArgumentException] {
      Materialize.runAll(spark, Seq(defs.head.copy(relationPath = Some(s"$base/rel"))))
    }
  }

  test("coarse-granularity ROOT: a late day re-reads the whole bucket, never shrinking it") {
    // Regression: run() used to scan only the dirty source DAYS while
    // the write dynamic-overwrites the whole coarse p_date partition —
    // a late Jan-17 rewrote the January monthly bucket with one day's
    // data. The recompute must re-read every source day of each
    // affected coarse bucket.
    val statePath = Files.createTempDirectory("graft_mat_coarse").toString + "/state"
    val storePath = Files.createTempDirectory("graft_mat_coarse_store").toString
    val batch1 = Seq(
      (1L, "2024-01-01 10:05:00", 1.0), (1L, "2024-01-15 11:05:00", 2.0),
      (2L, "2024-01-03 10:10:00", 5.0), (2L, "2024-02-01 09:00:00", 7.0))
    Materialize.run(mk(batch1), col("entity_id"), col("ts"), col("value"),
      "month", statePath, storePath)
    // late arrival lands on Jan 17 ONLY
    val batch2 = batch1 :+ ((1L, "2024-01-17 12:59:00", 100.0))
    val dirty = Materialize.run(mk(batch2), col("entity_id"), col("ts"), col("value"),
      "month", statePath, storePath)
    assert(dirty.map(_.toString).toSeq === Seq("2024-01-17"))
    val got = TrendStoreWriter.read(spark, storePath)
      .select(col("entity_id"), col("bucket"),
        col("cnt").cast("long").as("cnt"), col("sum_dec").cast("double").as("s"))
    val want = graft.operators.TrendStore.rollup(
        mk(batch2), col("entity_id"), col("ts"), col("value"), "month")
      .select(col("entity_id"), col("bucket"),
        col("cnt").cast("long").as("cnt"), col("sum_dec").cast("double").as("s"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "monthly store diverged from a full recompute after a late-day run")
    // entity 1's January bucket must aggregate ALL its January rows
    assert(got.filter(col("entity_id") === 1 && col("s") === 103.0).count() === 1)
  }

  test("runAll rejects cyclic and duplicate definitions") {
    val base = Files.createTempDirectory("graft_mat_cycle").toString
    val a = Materialize.MatDef("a", s"$base/b", s"$base/a", s"$base/sa", "day")
    val b = Materialize.MatDef("b", s"$base/a", s"$base/b", s"$base/sb", "month")
    val e = intercept[IllegalArgumentException](Materialize.runAll(spark, Seq(a, b)))
    assert(e.getMessage.contains("cycle"))
    val dup = intercept[IllegalArgumentException](
      Materialize.runAll(spark, Seq(a, a.copy(sourcePath = s"$base/c"))))
    assert(dup.getMessage.contains("duplicate"))
  }

  test("dirty set is empty when state matches the modified log") {
    val src = mk(Seq((1L, "2024-01-01 10:00:00", 1.0)))
    val log = Materialize.modifiedLogByDay(src, col("ts"))
    val state = log.select(col("day"), col("last_modified").as("watermark"), col("n_rows"))
    assert(Materialize.dirtySet(log, state).isEmpty)
  }

  test("concurrent runs of one target are refused by the lease; a stale lease is taken over") {
    import graft.operators.StoreFs
    val statePath = Files.createTempDirectory("graft_mat_lease").toString + "/state"
    val storePath = Files.createTempDirectory("graft_mat_lease_store").toString
    val src = mk(Seq((1L, "2024-01-01 10:05:00", 1.0)))
    val lease = statePath + ".lease"

    // another run "holds" the target: a second run refuses loudly
    // instead of racing the state swap
    assert(StoreFs.acquireLease(spark, lease, "other-run", ttlMs = 3600000))
    val e = intercept[Materialize.ConcurrentRunException](
      Materialize.run(src, col("entity_id"), col("ts"), col("value"),
        "hour", statePath, storePath))
    assert(e.getMessage.contains("other-run"))
    // the refused run must not have advanced state or store
    assert(!StoreFs.exists(spark, statePath))

    // holder finishes → lease released → next run proceeds and
    // releases its own lease on completion
    StoreFs.releaseLease(spark, lease)
    val dirty = Materialize.run(src, col("entity_id"), col("ts"), col("value"),
      "hour", statePath, storePath)
    assert(dirty.nonEmpty && !StoreFs.exists(spark, lease))

    // a lease whose holder crashed (kill -9 — never released) ages
    // out: backdate its mtime past the TTL and the next run takes over
    assert(StoreFs.acquireLease(spark, lease, "crashed-run", ttlMs = 3600000))
    val (f, p) = StoreFs.fs(spark, lease)
    f.setTimes(p, System.currentTimeMillis() - 7200000, -1)
    val dirty2 = Materialize.run(mk(Seq((1L, "2024-01-01 10:05:00", 1.0),
      (1L, "2024-01-02 09:00:00", 2.0))), col("entity_id"), col("ts"), col("value"),
      "hour", statePath, storePath, leaseTtlMs = 3600000)
    assert(dirty2.map(_.toString).toSeq === Seq("2024-01-02"))
    assert(!StoreFs.exists(spark, lease))

    // a FRESH foreign lease inside its TTL is NOT taken over
    assert(StoreFs.acquireLease(spark, lease, "live-run", ttlMs = 3600000))
    assert(!StoreFs.acquireLease(spark, lease, "poacher", ttlMs = 3600000))
    StoreFs.releaseLease(spark, lease)
  }
}
