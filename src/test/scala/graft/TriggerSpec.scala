package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
import graft.operators.{NotificationStore, Trigger}
import graft.streaming.TriggerStream

/** Trigger-rule specs: firing semantics, the shared-rollup plan shape,
  * and the payload round-trip into the typed notification store. */
class TriggerSpec extends SparkSpec {

  import graft.SparkSpec.spark.implicits._

  private def events(rows: Seq[(Long, String, Double)]) =
    rows.toDF("entity", "ts", "v").withColumn("ts", col("ts").cast("timestamp"))

  private val rules = Seq(
    Trigger.Rule("surge", "hour", Seq(Trigger.Threshold("v", "sum", ">", 10.0)), "major"),
    Trigger.Rule("burst", "hour", Seq(Trigger.Threshold("v", "count", ">", 2.0)), "minor"),
    Trigger.Rule("level", "day",
      Seq(Trigger.Threshold("v", "avg", ">=", 3.0),
        Trigger.Threshold("v", "max", "<", 100.0)), "warning"))

  private val data = events(Seq(
    (1L, "2024-01-01 10:05:00", 6.0),  // hour 10: sum 12 > 10 → surge
    (1L, "2024-01-01 10:25:00", 6.0),  //          count 2, no burst
    (2L, "2024-01-01 11:01:00", 1.0),  // hour 11: count 3 > 2 → burst
    (2L, "2024-01-01 11:02:00", 1.0),  //          sum 3, no surge
    (2L, "2024-01-01 11:03:00", 1.0),
    (3L, "2024-01-02 09:00:00", 200.0) // avg≥3 but max≥100 → level must NOT fire
  ))

  test("rules fire exactly where all thresholds hold") {
    val got = Trigger.evaluate(rules)(data, col("entity"), col("ts"))
      .select(col("rule"), col("entity_id"),
        date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss").as("b"), col("severity"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
    assert(got === Set(
      ("surge", 1L, "2024-01-01 10:00:00", "major"),
      ("surge", 3L, "2024-01-02 09:00:00", "major"),
      ("burst", 2L, "2024-01-01 11:00:00", "minor"),
      // day-level rule: entity 1 avg=6 max=6, entity 2 avg=1 (no fire),
      // entity 3 avg=200 but max=200 blocks the AND.
      ("level", 1L, "2024-01-01 00:00:00", "warning")))
  }

  test("sustained triggers fire only after N consecutive breach buckets") {
    val surge = Seq(Trigger.Rule("surge", "hour",
      Seq(Trigger.Threshold("v", "sum", ">", 10.0)), "major"))
    val d = events(Seq(
      (1L, "2024-01-01 10:00:00", 20.0), // breach (run 1, pos 1)
      (1L, "2024-01-01 11:00:00", 20.0), // breach (pos 2)
      (1L, "2024-01-01 12:00:00", 20.0), // breach (pos 3) → FIRES
      (1L, "2024-01-01 13:00:00", 20.0), // breach (pos 4) → FIRES
      (1L, "2024-01-01 14:00:00", 1.0),  // flap down — run broken
      (1L, "2024-01-01 15:00:00", 20.0), // breach (run 2, pos 1)
      (1L, "2024-01-01 16:00:00", 20.0), // breach (pos 2): run too short
      (2L, "2024-01-01 10:00:00", 20.0), // entity 2: isolated breach
      (2L, "2024-01-01 12:00:00", 20.0)  // NOT consecutive with 10:00
    ))
    val fired = Trigger.evaluateSustained(surge, minConsecutive = 3)(
        d, col("entity"), col("ts"))
      .select(col("entity_id"), col("bucket").cast("string")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(fired === Set(
      (1L, "2024-01-01 12:00:00"), (1L, "2024-01-01 13:00:00")))
    // minConsecutive = 1 degenerates to plain evaluate
    val plain = Trigger.evaluate(surge)(d, col("entity"), col("ts"))
    val one = Trigger.evaluateSustained(surge, 1)(d, col("entity"), col("ts"))
    assert(one.select("entity_id", "bucket").exceptAll(
      plain.select("entity_id", "bucket")).isEmpty)
    // calendar-month grids have no fixed stride → rejected
    val e = intercept[IllegalArgumentException] {
      Trigger.evaluateSustained(Seq(Trigger.Rule("m", "month",
        Seq(Trigger.Threshold("v", "sum", ">", 0.0)), "x")), 2)(
        d, col("entity"), col("ts")).collect()
    }
    assert(e.getMessage.contains("fixed-width"))
  }

  test("percentile thresholds fire on the exact interpolated (4-dec rounded) value") {
    // values 1..100 on one day: quantile_cont p95 = 95.05 exactly
    val data = events((1 to 100).map(v => (1L, f"2024-01-01 ${v % 24}%02d:00:00", v.toDouble)))
    def fires(op: String, x: Double): Long =
      Trigger.evaluate(Seq(Trigger.Rule("slo", "day",
        Seq(Trigger.Threshold("v", "p95", op, x)), "major")))(
        data, col("entity"), col("ts")).count()
    assert(fires(">=", 95.05) === 1L)
    assert(fires(">=", 95.0501) === 0L)
    assert(fires("<", 95.06) === 1L)
    // p999-style three-digit percentiles parse; out-of-range refused
    assert(Trigger.pctOf("p999") === Some(0.999))
    assert(Trigger.pctOf("p50") === Some(0.5))
    assert(Trigger.pctOf("nope") === None)
    intercept[IllegalArgumentException](
      Trigger.evaluate(Seq(Trigger.Rule("bad", "day",
        Seq(Trigger.Threshold("v", "pxx", ">", 1.0)), "major")))(
        data, col("entity"), col("ts")).count())
  }

  test("flapReport counts episodes: three separated runs = flapping, one run = incident") {
    val surge = Seq(Trigger.Rule("surge", "hour",
      Seq(Trigger.Threshold("v", "sum", ">", 10.0)), "major"))
    // entity 1 fires hours 01,02 | 04 | 06,07,08 → 3 episodes,
    // 6 firings, longest 3. entity 2 fires 01..03 in one run.
    val flappy = events(
      Seq(1, 2, 4, 6, 7, 8).map(h => (1L, f"2024-01-01 $h%02d:00:00", 12.0)) ++
      Seq(1, 2, 3).map(h => (2L, f"2024-01-01 $h%02d:00:00", 12.0)))
    val got = Trigger.flapReport(surge)(flappy, col("entity"), col("ts"))
      .select(col("entity_id"), col("n_firings"), col("n_episodes"), col("longest_run"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 6L, 3L, 3L), (2L, 3L, 1L, 3L)))
    // firings conservation against the raw firing stream
    val nFired = Trigger.evaluate(surge)(flappy, col("entity"), col("ts")).count()
    assert(nFired === 9L)
  }

  test("mttrReport rolls episode durations to rule level") {
    val surge = Seq(Trigger.Rule("surge", "hour",
      Seq(Trigger.Threshold("v", "sum", ">", 10.0)), "major"))
    // episodes: e1 = {01-02}, {04}, {06-08}; e2 = {01-03}
    // → 4 episodes, 2 entities, 9 firing buckets total, longest 3
    val flappy = events(
      Seq(1, 2, 4, 6, 7, 8).map(h => (1L, f"2024-01-01 $h%02d:00:00", 12.0)) ++
      Seq(1, 2, 3).map(h => (2L, f"2024-01-01 $h%02d:00:00", 12.0)))
    val got = Trigger.mttrReport(surge)(flappy, col("entity"), col("ts"))
      .select(col("rule"), col("severity"), col("n_episodes"), col("n_entities"),
        col("mean_seconds"), col("max_seconds"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      ("surge", "major", 4L, 2L, 9.0 * 3600 / 4, 3L * 3600)))
  }

  test("coFiringReport: co-firing cells, totals and conditional rates") {
    val pairRules = Seq(
      Trigger.Rule("surge", "hour",
        Seq(Trigger.Threshold("v", "sum", ">", 10.0)), "major"),
      Trigger.Rule("burst", "hour",
        Seq(Trigger.Threshold("v", "count", ">", 1.0)), "minor"))
    val data = events(Seq(
      // e1 day1 h01: two rows of 6 → sum 12 AND count 2 → both fire
      (1L, "2024-01-01 01:00:00", 6.0), (1L, "2024-01-01 01:30:00", 6.0),
      // e1 day2 h01: one row of 12 → surge only
      (1L, "2024-01-02 01:00:00", 12.0),
      // e2 day1 h02: two rows of 2 → burst only (sum 4)
      (2L, "2024-01-01 02:00:00", 2.0), (2L, "2024-01-01 02:30:00", 2.0)))
    val got = Trigger.coFiringReport(pairRules)(data, col("entity"), col("ts"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
    // cells: surge {(1,d1),(1,d2)}, burst {(1,d1),(2,d1)}; co-fire {(1,d1)}
    assert(got.toSeq === Seq(("burst", "surge", 1L, 2L, 2L, 0.5, 0.5)))
  }

  test("payload round-trips through NotificationStore.typed") {
    val fired = Trigger.evaluate(rules)(data, col("entity"), col("ts"))
      .filter(col("rule") === "surge")
    val typed = NotificationStore.typed(fired, col("payload"),
      StructType(Seq(StructField("sum_v", DoubleType))))
    val row = typed.select(col("entity_id"), col("sum_v")).collect()
    assert(row.map(r => (r.getLong(0), r.getDouble(1))).toSet === Set((1L, 12.0), (3L, 200.0)))
  }

  test("firings group into notification sets") {
    val fired = Trigger.evaluate(rules)(data, col("entity"), col("ts"))
    val sets = NotificationStore.sets(fired, col("entity_id"), col("bucket"),
        col("rule"), "day")
      .select(col("entity_id"), col("n_notifications"), col("notification_ids"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[String](2))).toSet
    assert(sets === Set(
      (1L, 2L, Seq("level", "surge")),
      (2L, 1L, Seq("burst")),
      (3L, 1L, Seq("surge"))))
  }

  test("rules sharing a granularity share ONE rollup (no per-rule rescan)") {
    val plan = Trigger.evaluate(rules)(data, col("entity"), col("ts"))
      .queryExecution.optimizedPlan
    // 3 rules over 2 granularities → exactly 2 Aggregates in the plan.
    val nAgg = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.size
    assert(nAgg === 2, s"expected one rollup per granularity, plan:\n$plan")
  }

  test("streaming triggers fire once per closed window, matching the batch rules") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft_trig_src").toString
    val base = java.nio.file.Files.createTempDirectory("graft_trig").toString
    val streamRules = Seq(
      Trigger.Rule("surge", "hour", Seq(Trigger.Threshold("v", "sum", ">", 10.0)), "major"),
      Trigger.Rule("burst", "hour", Seq(Trigger.Threshold("v", "count", ">", 2.0)), "minor"))
    def writeBatch(rows: Seq[(Long, String, Double)]): Unit =
      events(rows).write.mode("append").parquet(srcDir)
    // batch 1: hour 10 gets a surge (12 > 10), hour 11 a burst (3 > 2)
    writeBatch(Seq(
      (1L, "2024-01-01 10:05:00", 6.0), (1L, "2024-01-01 10:25:00", 6.0),
      (2L, "2024-01-01 11:01:00", 1.0), (2L, "2024-01-01 11:02:00", 1.0),
      (2L, "2024-01-01 11:03:00", 1.0)))
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val fired = TriggerStream.fire(stream, "entity", "ts", "v",
      streamRules, "1 hour", "1 hour")
    val q = TriggerStream.toStore(fired, s"$base/store", s"$base/ckpt")
    try {
      q.processAllAvailable()
      // nothing finalized yet: watermark sits at 11:03 − 1h
      assert(!graft.operators.StoreFs.exists(spark, s"$base/store") ||
        spark.read.parquet(s"$base/store").isEmpty)
      // batch 2 advances the watermark past hour 11's end → both fire
      writeBatch(Seq((3L, "2024-01-01 14:00:00", 1.0)))
      q.processAllAvailable()
      val got = spark.read.parquet(s"$base/store")
        .select(col("rule"), col("entity_id"),
          date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss").as("b"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
      assert(got === Set(
        ("surge", 1L, "2024-01-01 10:00:00"),
        ("burst", 2L, "2024-01-01 11:00:00")))
      // the stream fired exactly what the batch rules fire on the
      // same closed-window rows
      val batchFired = Trigger.evaluate(streamRules.map(_.copy(granularity = "hour")))(
          events(Seq(
            (1L, "2024-01-01 10:05:00", 6.0), (1L, "2024-01-01 10:25:00", 6.0),
            (2L, "2024-01-01 11:01:00", 1.0), (2L, "2024-01-01 11:02:00", 1.0),
            (2L, "2024-01-01 11:03:00", 1.0))), col("entity"), col("ts"))
        .select(col("rule"), col("entity_id"),
          date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss").as("b"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
      assert(got === batchFired)
    } finally q.stop()
  }

  test("streaming notification sets converge to the batch sets and replay idempotently") {
    import graft.streaming.SetStream
    import graft.operators.NotificationStore
    val srcDir = java.nio.file.Files.createTempDirectory("graft_sets_src").toString
    val base = java.nio.file.Files.createTempDirectory("graft_sets").toString
    val streamRules = Seq(
      Trigger.Rule("surge", "hour", Seq(Trigger.Threshold("v", "sum", ">", 10.0)), "major"),
      Trigger.Rule("burst", "hour", Seq(Trigger.Threshold("v", "count", ">", 2.0)), "minor"))
    // batch 1: all Jan-1 activity (watermark must not pass a row's
    // window before it arrives); batch 2: Jan-2 + a pusher that
    // closes every window.
    val batch1 = Seq(
      // entity 1: surge fires in hours 10 AND 11 of Jan 1
      (1L, "2024-01-01 10:05:00", 12.0), (1L, "2024-01-01 11:05:00", 12.0),
      // entity 2: burst in hour 10 (3 rows), surge in hour 10 too (12 > 10)
      (2L, "2024-01-01 10:01:00", 4.0), (2L, "2024-01-01 10:02:00", 4.0),
      (2L, "2024-01-01 10:03:00", 4.0))
    val batch2 = Seq((1L, "2024-01-02 09:05:00", 12.0))
    val allRows = batch1 ++ batch2
    events(batch1).write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val fired = TriggerStream.fire(stream, "entity", "ts", "v",
      streamRules, "1 hour", "1 hour")
    val q = SetStream.toStore(fired, "rule", s"$base/store", s"$base/ckpt")
    try {
      q.processAllAvailable()
      events(batch2 :+ ((9L, "2024-01-03 00:00:00", 0.0)))
        .write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      val got = SetStream.present(spark.read.parquet(s"$base/store").drop("p_date"))
        .select(col("entity_id"), date_format(col("bucket"), "yyyy-MM-dd").as("day"),
          col("n_notifications"), col("notification_ids"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getSeq[String](3))).toSet
      // batch twin over the same rows
      val batchFired = Trigger.evaluate(streamRules)(
        events(allRows), col("entity"), col("ts"))
      val want = NotificationStore.sets(batchFired, col("entity_id"),
          col("bucket"), col("rule"), "day")
        .select(col("entity_id"), date_format(col("bucket"), "yyyy-MM-dd").as("day"),
          col("n_notifications"), sort_array(col("notification_ids")).as("ids"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getSeq[String](3))).toSet
      assert(got === want, s"stream sets $got != batch sets $want")
      assert(got.contains((1L, "2024-01-01", 2L, Seq("surge", "surge"))),
        "same rule firing twice in a day must appear twice in the set")
      // replaying a whole micro-batch is a no-op (set-union merge);
      // materialize `before` — the merge overwrites its files
      val before = spark.read.parquet(s"$base/store").drop("p_date").localCheckpoint()
      SetStream.mergeBatch(
        Trigger.evaluate(streamRules)(events(allRows), col("entity"), col("ts")),
        "rule", s"$base/store")
      val after = spark.read.parquet(s"$base/store").drop("p_date")
      assert(after.exceptAll(before).isEmpty && before.exceptAll(after).isEmpty,
        "replaying already-merged firings changed the store")
    } finally q.stop()
  }

  test("evaluateRolled rejects foreign metrics and unavailable fns") {
    val rolled = graft.operators.TrendStore.rollup(
      data, col("entity"), col("ts"), col("v"), "hour")
    intercept[IllegalArgumentException] {
      Trigger.evaluateRolled(Seq(Trigger.Rule("x", "hour",
        Seq(Trigger.Threshold("other", "sum", ">", 1.0)), "s")), "v")(rolled)
    }
    intercept[IllegalArgumentException] {
      Trigger.evaluateRolled(Seq(Trigger.Rule("x", "hour",
        Seq(Trigger.Threshold("v", "min", ">", 1.0)), "s")), "v")(rolled)
    }
  }

  test("rules run on native seconds granularities (15m grid)") {
    val got = Trigger.evaluate(Seq(
        Trigger.Rule("q_surge", "15m",
          Seq(Trigger.Threshold("v", "sum", ">", 5.0)), "major")))(
        data, col("entity"), col("ts"))
      .select(col("entity_id"), date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss").as("b"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // entity 1: 10:05 (6.0) and 10:25 (6.0) land in DIFFERENT 15m
    // buckets, each > 5; entity 3's 200.0 fires its quarter too.
    assert(got === Set(
      (1L, "2024-01-01 10:00:00"),
      (1L, "2024-01-01 10:15:00"),
      (3L, "2024-01-02 09:00:00")))
  }

  test("unknown fn/op are rejected") {
    intercept[IllegalArgumentException] {
      Trigger.evaluate(Seq(Trigger.Rule("x", "hour",
        Seq(Trigger.Threshold("v", "median", ">", 1.0)), "s")))(data, col("entity"), col("ts"))
    }
    intercept[IllegalArgumentException] {
      Trigger.evaluate(Seq(Trigger.Rule("x", "hour",
        Seq(Trigger.Threshold("v", "sum", "!=", 1.0)), "s")))(data, col("entity"), col("ts"))
    }
  }

  test("maintenance windows mute covered firings, stay visible, and collapse overlaps") {
    val fired = Trigger.evaluate(rules)(data, col("entity"), col("ts"))
    // entity 1: two OVERLAPPING windows cover hour 10 (must mute ONCE);
    // entity 2's window ends exactly at 11:00 — [from, to) excludes the
    // 11:00 bucket, so entity 2's burst stays live; entity 3 uncovered
    val win = Seq(
      (1L, "2024-01-01 09:00:00", "2024-01-01 12:00:00"),
      (1L, "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
      (2L, "2024-01-01 08:00:00", "2024-01-01 11:00:00"))
      .toDF("entity_id", "from_ts", "to_ts")
      .select(col("entity_id"), col("from_ts").cast("timestamp").as("from_ts"),
        col("to_ts").cast("timestamp").as("to_ts"))
    val got = Trigger.applyMaintenance(fired, win)
    // every firing survives with a flag — same row count as the stream
    assert(got.count() === fired.count())
    val byKey = got.collect()
      .map(r => (r.getAs[String]("rule"), r.getAs[Long]("entity_id")) ->
        r.getAs[Long]("muted")).toMap
    assert(byKey(("surge", 1L)) === 1L)   // covered (twice) → muted once
    assert(byKey(("burst", 2L)) === 0L)   // 11:00 bucket ≥ to_ts → live
    assert(byKey(("surge", 3L)) === 0L)   // no window at all
    // a NULL entity window is refused loudly, never silently ignored
    val badWin = Seq((Some(1L), "2024-01-01 00:00:00", "2024-01-02 00:00:00"),
        (None: Option[Long], "2024-01-01 00:00:00", "2024-01-02 00:00:00"))
      .toDF("entity_id", "from_ts", "to_ts")
      .select(col("entity_id"), col("from_ts").cast("timestamp").as("from_ts"),
        col("to_ts").cast("timestamp").as("to_ts"))
    assertThrows[Exception] {
      Trigger.applyMaintenance(fired, badWin).collect()
    }

    // the streaming twin (literal-array projection — no join, no
    // aggregation, append-safe) matches the batch operator bit-for-bit
    val streamed = TriggerStream.withMaintenance(fired, win)
    val batch = Trigger.applyMaintenance(fired, win)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "stream muting diverges from the batch operator")
    assertThrows[Exception] {
      TriggerStream.withMaintenance(fired, badWin)
    }
    // empty window table: everything live, schema unchanged
    assert(TriggerStream.withMaintenance(fired, win.limit(0))
      .filter(col("muted") =!= 0L).isEmpty)
  }

  test("stream maintenance muting is type-generic over the entity key") {
    // a dn-keyed (string) firing stream and an INT-typed window table
    // against a LONG-keyed stream both must work — the literal-array
    // build casts windows to the firing stream's entity type instead
    // of assuming getLong (which threw ClassCastException)
    val firedStr = Seq(("cell-1", "2024-01-01 10:00:00", "surge"),
        ("cell-2", "2024-01-01 10:00:00", "surge"))
      .toDF("entity_id", "bucket", "rule")
      .select(col("entity_id"), col("bucket").cast("timestamp").as("bucket"),
        col("rule"))
    val winStr = Seq(("cell-1", "2024-01-01 09:00:00", "2024-01-01 12:00:00"))
      .toDF("entity_id", "from_ts", "to_ts")
      .select(col("entity_id"), col("from_ts").cast("timestamp").as("from_ts"),
        col("to_ts").cast("timestamp").as("to_ts"))
    val gotStr = TriggerStream.withMaintenance(firedStr, winStr).collect()
      .map(r => r.getAs[String]("entity_id") -> r.getAs[Long]("muted")).toMap
    assert(gotStr("cell-1") === 1L && gotStr("cell-2") === 0L)
    // matches the (already type-generic) batch twin on the same input
    assert(TriggerStream.withMaintenance(firedStr, winStr)
      .exceptAll(Trigger.applyMaintenance(firedStr, winStr)).isEmpty)

    // int-typed window table against a long-keyed stream: the window
    // side casts to the stream's key type before the literal build
    val firedLong = firedStr.select(
      when(col("entity_id") === "cell-1", lit(1L)).otherwise(lit(2L)).as("entity_id"),
      col("bucket"), col("rule"))
    val winInt = Seq((1, "2024-01-01 09:00:00", "2024-01-01 12:00:00"))
      .toDF("entity_id", "from_ts", "to_ts")
      .select(col("entity_id"), col("from_ts").cast("timestamp").as("from_ts"),
        col("to_ts").cast("timestamp").as("to_ts"))
    val gotLong = TriggerStream.withMaintenance(firedLong, winInt).collect()
      .map(r => r.getAs[Long]("entity_id") -> r.getAs[Long]("muted")).toMap
    assert(gotLong(1L) === 1L && gotLong(2L) === 0L)

    // an UNCASTABLE window id (string 'cell-1' vs a long-keyed stream)
    // fails as the type mismatch it is — naming both types — not as
    // the unrelated NULL-entity error its cast-produced null used to
    // trip (ADVICE r13); a lossy-but-castable id ('07' → 7) is also
    // refused instead of silently matching entity 7
    val eUncast = intercept[IllegalArgumentException] {
      TriggerStream.withMaintenance(firedLong, winStr)
    }
    assert(eUncast.getMessage.contains("not castable") &&
      eUncast.getMessage.contains("cell-1"))
    val winLossy = Seq(("07", "2024-01-01 09:00:00", "2024-01-01 12:00:00"))
      .toDF("entity_id", "from_ts", "to_ts")
      .select(col("entity_id"), col("from_ts").cast("timestamp").as("from_ts"),
        col("to_ts").cast("timestamp").as("to_ts"))
    val eLossy = intercept[IllegalArgumentException] {
      TriggerStream.withMaintenance(firedLong, winLossy)
    }
    assert(eLossy.getMessage.contains("round-trip") &&
      eLossy.getMessage.contains("07"))

    // the BATCH twin refuses the same inputs through the same shared
    // validator (until r14 the lossy id slipped through the batch
    // join's implicit cast and silently muted entity 7 — exactly the
    // hole the stream side had closed)
    val eBatchLossy = intercept[IllegalArgumentException] {
      Trigger.applyMaintenance(firedLong, winLossy)
    }
    assert(eBatchLossy.getMessage.contains("round-trip") &&
      eBatchLossy.getMessage.contains("07"))
    val eBatchUncast = intercept[IllegalArgumentException] {
      Trigger.applyMaintenance(firedLong, winStr)
    }
    assert(eBatchUncast.getMessage.contains("not castable") &&
      eBatchUncast.getMessage.contains("cell-1"))
    // and the castable int-keyed window table still mutes batch-side
    assert(Trigger.applyMaintenance(firedLong, winInt)
      .exceptAll(TriggerStream.withMaintenance(firedLong, winInt)).isEmpty)
  }
}
