package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOf, AttributeStore, TrendStore}
import graft.sources.TableCatalog

class TrendSpec extends SparkSpec {

  private lazy val ev = TableCatalog(spark, sf).events.cache()

  test("reRollup(day) over hourly equals direct daily rollup") {
    val hourly = TrendStore.rollup(ev, col("user_id"), col("ts"), col("value"), "hour")
    val viaChain = TrendStore.present(TrendStore.reRollup(hourly, "day"))
    val direct = TrendStore.present(
      TrendStore.rollup(ev, col("user_id"), col("ts"), col("value"), "day"))
    assert(viaChain.exceptAll(direct).isEmpty && direct.exceptAll(viaChain).isEmpty)
  }

  test("rollup conserves row count") {
    val hourly = TrendStore.rollup(ev, col("user_id"), col("ts"), col("value"), "hour")
    assert(hourly.agg(sum("cnt")).head.getLong(0) === ev.count())
  }

  test("percentileRollup refuses percentile labels that collide after rounding") {
    // 0.95 and 0.954 would both name their column p95 — the second
    // silently shadows the first in the agg list; refuse loudly.
    intercept[IllegalArgumentException](
      TrendStore.percentileRollup(ev, col("user_id"), col("ts"), col("value"),
        "day", ps = Seq(0.95, 0.954)))
    intercept[IllegalArgumentException](
      TrendStore.percentileRollup(ev, col("user_id"), col("ts"), col("value"),
        "day", ps = Seq(0.995, 1.0)))
    // distinct integer-percent labels pass validation
    TrendStore.percentileRollup(ev, col("user_id"), col("ts"), col("value"),
      "day", ps = Seq(0.5, 0.95, 0.99))
  }

  test("gap fill works on any stepSeconds grid (900 s sweep + planted month case)") {
    import graft.SparkSpec.spark.implicits._
    // 900 s grid: a planted series with one interior hole per mode.
    val rows = Seq(
      (1L, "2024-01-01 00:00:00", 10.0), (1L, "2024-01-01 00:30:00", 40.0),
      (2L, "2024-01-01 00:00:00", 8.0), (2L, "2024-01-01 00:45:00", 2.0))
      .toDF("entity_id", "ts", "v")
      .select(col("entity_id"), col("ts").cast("timestamp").as("bucket"),
        col("v").as("sum_value"))
    for (g <- Seq("900", "15m")) {
      val ff = TrendStore.gapFill(rows, g)
        .select(col("entity_id"), col("bucket").cast("string"), col("sum_value"), col("filled"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getBoolean(3))).toSet
      assert(ff.contains((1L, "2024-01-01 00:15:00", 10.0, true)), s"forward-fill at $g")
      assert(ff.contains((2L, "2024-01-01 00:30:00", 8.0, true)), s"forward-fill at $g")
      assert(ff.count(_._1 == 1L) === 3 && ff.count(_._1 == 2L) === 4, s"grid size at $g")
      val in = TrendStore.gapFillInterpolate(rows, g)
        .select(col("entity_id"), col("bucket").cast("string"), col("sum_value"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      // entity 1: hole at 00:15 halfway between 10 (00:00) and 40 (00:30) → 25
      assert(in.contains((1L, "2024-01-01 00:15:00", 25.0)), s"interpolation at $g")
      // entity 2: holes at 1/3 and 2/3 of [8 → 2]
      assert(in.contains((2L, "2024-01-01 00:15:00", 6.0)), s"interpolation at $g")
      assert(in.contains((2L, "2024-01-01 00:30:00", 4.0)), s"interpolation at $g")
    }
    // calendar month stride: variable-width steps stay on the grid
    val monthly = Seq((1L, "2024-01-01 00:00:00", 3.0), (1L, "2024-04-01 00:00:00", 9.0))
      .toDF("entity_id", "ts", "v")
      .select(col("entity_id"), col("ts").cast("timestamp").as("bucket"),
        col("v").as("sum_value"))
    val fm = TrendStore.gapFill(monthly, "month")
      .select(col("bucket").cast("string"), col("sum_value"), col("filled"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2))).toSet
    assert(fm === Set(
      ("2024-01-01 00:00:00", 3.0, false), ("2024-02-01 00:00:00", 3.0, true),
      ("2024-03-01 00:00:00", 3.0, true), ("2024-04-01 00:00:00", 9.0, false)))
    intercept[IllegalArgumentException](TrendStore.gapFill(rows, "raw"))
  }

  test("approx percentiles stay within the sketch's rank-error bound of the exact quantiles") {
    // GK guarantee at accuracy a: the returned value's rank is within
    // N/a of the target rank. Verify per event_type at sf0.001.
    val acc = 10000
    val rows = ev.groupBy(col("event_type"))
      .agg(expr(s"approx_percentile(value, array(0.5, 0.95, 0.99), $acc)").as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    rows.foreach { case (et, ps) =>
      val vals = ev.filter(col("event_type") === et)
        .select(col("value")).collect().map(_.getDouble(0)).sorted
      val n = vals.length
      Seq(0.5, 0.95, 0.99).zip(ps).foreach { case (q, approx) =>
        val rank = vals.count(_ <= approx)
        val target = q * n
        assert(math.abs(rank - target) <= n.toDouble / acc + 1,
          s"$et q=$q: rank $rank vs target $target (n=$n)")
      }
    }
  }

  test("approx distinct counts stay within the HLL relative-error bound") {
    // rsd 0.02 → assert a generous 3σ ≈ 6% band vs the exact counts
    val got = ev.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("a"),
        countDistinct(col("user_id")).as("x"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (a, x) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - x) <= math.max(0.06 * x, 2.0),
        s"${r.getString(0)}: approx $a vs exact $x")
    }
  }

  test("percentile metric fns in aggregation definitions hit known quantiles") {
    import graft.SparkSpec.spark.implicits._
    import graft.operators.Aggregation
    // one entity, one day, values 0..999: quantiles are known exactly
    val rows = (0 until 1000).map(i => (1L, "2024-01-01 10:00:00", i.toDouble))
      .toDF("e", "ts", "v").withColumn("ts", col("ts").cast("timestamp"))
    val got = Aggregation.compile(Aggregation.AggregationDef("day", Seq(
        Aggregation.MetricAgg("v", "count", "cnt"),
        Aggregation.MetricAgg("v", "p50", "p50"),
        Aggregation.MetricAgg("v", "p95", "p95"),
        Aggregation.MetricAgg("v", "p999", "p999"))))(rows, col("e"), col("ts"))
      .collect().head
    assert(got.getAs[Long]("cnt") === 1000L)
    assert(math.abs(got.getAs[Double]("p50") - 500.0) <= 2.0)
    assert(math.abs(got.getAs[Double]("p95") - 950.0) <= 2.0)
    assert(math.abs(got.getAs[Double]("p999") - 999.0) <= 2.0)
    // the EXACT variants interpolate precisely: p50 of 0..999 is
    // 499.5, p95 is 949.05 — no sketch tolerance
    val exact = Aggregation.compile(Aggregation.AggregationDef("day", Seq(
        Aggregation.MetricAgg("v", "p50_exact", "p50x"),
        Aggregation.MetricAgg("v", "p95_exact", "p95x"))))(rows, col("e"), col("ts"))
      .collect().head
    assert(exact.getAs[Double]("p50x") === 499.5)
    assert(exact.getAs[Double]("p95x") === 949.05)
    intercept[IllegalArgumentException] {
      Aggregation.compile(Aggregation.AggregationDef("day",
        Seq(Aggregation.MetricAgg("v", "p5x", "bad"))))(rows, col("e"), col("ts"))
    }
  }

  test("filtered metrics aggregate only their rows; empty filtered groups are NULL/0") {
    import graft.SparkSpec.spark.implicits._
    import graft.operators.Aggregation
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", "error", 10.0),
      (1L, "2024-01-01 11:00:00", "error", 30.0),
      (1L, "2024-01-01 12:00:00", "click", 100.0),
      (2L, "2024-01-01 10:00:00", "click", 7.0)) // entity 2: zero errors
      .toDF("e", "ts", "kind", "v").withColumn("ts", col("ts").cast("timestamp"))
    val got = Aggregation.compile(Aggregation.AggregationDef("day", Seq(
        Aggregation.MetricAgg("v", "count", "n_all"),
        Aggregation.MetricAgg("v", "count", "n_err", Some("kind = 'error'")),
        Aggregation.MetricAgg("v", "sum", "err_sum", Some("kind = 'error'")),
        Aggregation.MetricAgg("v", "avg", "err_avg", Some("kind = 'error'")),
        Aggregation.MetricAgg("v", "max", "err_max", Some("kind = 'error'")),
        Aggregation.MetricAgg("v", "stddev", "err_sd", Some("kind = 'error'")),
        Aggregation.MetricAgg("v", "p50_exact", "err_p50", Some("kind = 'error'")))))(
        rows, col("e"), col("ts"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val e1 = got(1L)
    assert(e1.getAs[Long]("n_all") === 3L && e1.getAs[Long]("n_err") === 2L)
    assert(e1.getAs[Double]("err_sum") === 40.0)
    assert(e1.getAs[Double]("err_avg") === 20.0) // click's 100 excluded
    assert(e1.getAs[Double]("err_max") === 30.0)
    assert(math.abs(e1.getAs[Double]("err_sd") - math.sqrt(200.0)) < 1e-9)
    assert(e1.getAs[Double]("err_p50") === 20.0)
    val e2 = got(2L)
    assert(e2.getAs[Long]("n_all") === 1L && e2.getAs[Long]("n_err") === 0L)
    assert(e2.isNullAt(e2.fieldIndex("err_sum")))
    assert(e2.isNullAt(e2.fieldIndex("err_avg")))
    assert(e2.isNullAt(e2.fieldIndex("err_max")))
    assert(e2.isNullAt(e2.fieldIndex("err_sd")))
    assert(e2.isNullAt(e2.fieldIndex("err_p50")))
  }

  test("distinct metric fns: exact + filtered count_distinct, approx_distinct parity") {
    import graft.SparkSpec.spark.implicits._
    import graft.operators.Aggregation
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", "error", 10.0),
      (1L, "2024-01-01 11:00:00", "error", 90.0),
      (1L, "2024-01-01 12:00:00", "click", 100.0),
      (2L, "2024-01-01 10:00:00", "click", 7.0))
      .toDF("e", "ts", "kind", "v").withColumn("ts", col("ts").cast("timestamp"))
    val got = Aggregation.compile(Aggregation.AggregationDef("day", Seq(
        Aggregation.MetricAgg("kind", "count_distinct", "n_kinds"),
        Aggregation.MetricAgg("kind", "count_distinct", "n_hi_kinds", Some("v > 50")),
        Aggregation.MetricAgg("kind", "approx_distinct", "a_kinds"))))(
        rows, col("e"), col("ts"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Long]("n_kinds") === 2L)
    assert(got(1L).getAs[Long]("n_hi_kinds") === 2L) // error@90 + click@100
    assert(got(2L).getAs[Long]("n_kinds") === 1L)
    assert(got(2L).getAs[Long]("n_hi_kinds") === 0L) // filtered-empty → 0, not NULL
    // HLL is exact at tiny cardinalities — parity with count_distinct
    assert(got(1L).getAs[Long]("a_kinds") === 2L)
    assert(got(2L).getAs[Long]("a_kinds") === 1L)
  }

  test("cascade honors metric filters, stddev moments, and HLL sketch partials") {
    import graft.operators.Aggregation
    import graft.operators.Aggregation.MetricAgg
    val metrics = Seq(
      MetricAgg("value", "count", "n_all"),
      MetricAgg("value", "count", "n_err", Some("event_type = 'error'")),
      MetricAgg("value", "sum", "err_sum", Some("event_type = 'error'")),
      MetricAgg("value", "avg", "err_avg", Some("event_type = 'error'")),
      MetricAgg("value", "stddev", "sd_v"),
      MetricAgg("event_type", "approx_distinct", "a_types"))
    val casc = Aggregation.cascade(metrics, Seq("hour", "day"))(
      ev, col("user_id"), col("ts"))
    // every cascade level must BIT-match the direct single-granularity
    // definition at that granularity — filters gate at the finest
    // level and the partials (counts, decimal sums, moments, HLL
    // registers) re-aggregate exactly
    for (g <- Seq("hour", "day")) {
      val level = casc.filter(col("granularity") === g).drop("granularity")
      val direct = Aggregation.compile(Aggregation.AggregationDef(g, metrics))(
        ev, col("user_id"), col("ts"))
      assert(level.exceptAll(direct).isEmpty && direct.exceptAll(level).isEmpty,
        s"cascade level $g diverges from the direct definition")
    }
    // exact distinct and EXACT percentiles have no mergeable partial —
    // refused (sketch pNN cascades since r13; see QuantileSketchSpec)
    intercept[IllegalArgumentException] {
      Aggregation.cascade(Seq(MetricAgg("event_type", "count_distinct", "n")),
        Seq("hour", "day"))(ev, col("user_id"), col("ts"))
    }
    intercept[IllegalArgumentException] {
      Aggregation.cascade(Seq(MetricAgg("value", "p95_exact", "p")),
        Seq("hour", "day"))(ev, col("user_id"), col("ts"))
    }
  }

  test("wavg: weighted mean semantics, null/filter gating, cascade parity") {
    import graft.SparkSpec.spark.implicits._
    import graft.operators.Aggregation
    import graft.operators.Aggregation.MetricAgg
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", Some(10.0), Some(1.0), "a"),
      (1L, "2024-01-01 11:00:00", Some(20.0), Some(3.0), "a"),
      (1L, "2024-01-01 12:00:00", None, Some(5.0), "a"),      // null source drops BOTH sums
      (1L, "2024-01-01 13:00:00", Some(30.0), None, "a"),     // null weight drops BOTH sums
      (1L, "2024-01-01 14:00:00", Some(100.0), Some(2.0), "b"))
      .toDF("e", "ts_s", "x", "w", "kind")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val got = Aggregation.compile(Aggregation.AggregationDef("day", Seq(
        MetricAgg("x", "wavg", "wx", None, Some("w")),
        MetricAgg("x", "wavg", "wx_a", Some("kind = 'a'"), Some("w")))))(
        rows, col("e"), col("ts")).head()
    // all rows: (10·1 + 20·3 + 100·2) / (1 + 3 + 2); kind=a: 70/4
    assert(got.getAs[Double]("wx") === 270.0 / 6.0)
    assert(got.getAs[Double]("wx_a") === 17.5)
    // wavg without a weight refuses loudly
    intercept[IllegalArgumentException] {
      Aggregation.compile(Aggregation.AggregationDef("day",
        Seq(MetricAgg("x", "wavg", "bad"))))(rows, col("e"), col("ts")).head()
    }
    // cascade levels bit-match the direct definition (Σxw / Σw
    // partials re-aggregate exactly), composing with a row filter
    val metrics = Seq(
      MetricAgg("value", "count", "n_all"),
      MetricAgg("value", "wavg", "wv", None, Some("event_id")),
      MetricAgg("value", "wavg", "wv_err", Some("event_type = 'error'"),
        Some("event_id")))
    val casc = Aggregation.cascade(metrics, Seq("hour", "day"))(
      ev, col("user_id"), col("ts"))
    for (g <- Seq("hour", "day")) {
      val level = casc.filter(col("granularity") === g).drop("granularity")
      val direct = Aggregation.compile(Aggregation.AggregationDef(g, metrics))(
        ev, col("user_id"), col("ts"))
      assert(level.exceptAll(direct).isEmpty && direct.exceptAll(level).isEmpty,
        s"wavg cascade level $g diverges from the direct definition")
    }
  }

  test("entityRollup metric-set overload matches the legacy cnt/sum and direct min/max/avg") {
    import graft.SparkSpec.spark.implicits._
    import graft.operators.Aggregation.MetricAgg
    val rel = Seq((1L, "a"), (2L, "a"), (3L, "b"))
      .toDF("child", "parent_grp")
    val legacy = TrendStore.entityRollup(ev, col("user_id"), col("value"),
      rel, "child", "parent_grp")
    val full = TrendStore.entityRollup(ev, col("user_id"),
      rel, "child", "parent_grp",
      Seq(MetricAgg("value", "count", "cnt"), MetricAgg("value", "sum", "sum_value"),
        MetricAgg("value", "avg", "avg_value"), MetricAgg("value", "min", "min_value"),
        MetricAgg("value", "max", "max_value")))
    val a = legacy.select("parent", "cnt", "sum_value")
    val b = full.select("parent", "cnt", "sum_value")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(full.filter(col("min_value") > col("max_value")).isEmpty)
    assert(full.filter(abs(col("avg_value") * col("cnt") - col("sum_value")) > 1e-6).isEmpty)
    intercept[IllegalArgumentException](
      TrendStore.entityRollup(ev, col("user_id"), rel, "child", "parent_grp", Seq.empty))
  }

  test("temporal entityRollup sends each bucket to the parent valid AT that bucket") {
    import graft.SparkSpec.spark.implicits._
    // entity 1 migrates a -> b at Jan-10; entity 2 stays a; entity 3
    // has an uncovered bucket (before its interval opens)
    val rolled = Seq(
      (1L, "2024-01-05 00:00:00", 10.0),
      (1L, "2024-01-10 00:00:00", 20.0), // cutover bucket: [from, to) → b
      (1L, "2024-01-15 00:00:00", 30.0),
      (2L, "2024-01-05 00:00:00", 5.0),
      (3L, "2024-01-01 00:00:00", 99.0)  // interval opens Jan-02 → drops
    ).toDF("entity_id", "bucket", "sum_value")
      .withColumn("bucket", col("bucket").cast("timestamp"))
    val relDf = Seq(
      (1L, "a", "2024-01-01 00:00:00", "2024-01-10 00:00:00"),
      (1L, "b", "2024-01-10 00:00:00", "2024-12-31 00:00:00"),
      (2L, "a", "2024-01-01 00:00:00", "2024-12-31 00:00:00"),
      (3L, "c", "2024-01-02 00:00:00", "2024-12-31 00:00:00")
    ).toDF("child", "parent", "vfrom", "vto")
      .withColumn("vfrom", col("vfrom").cast("timestamp"))
      .withColumn("vto", col("vto").cast("timestamp"))
    val got = TrendStore.entityRollupTemporal(rolled, relDf,
        "child", "parent", "vfrom", "vto", col("sum_value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === Set(("a", 2L, 15.0), ("b", 2L, 50.0)))
    // metrics overload: same vocabulary as the bucketed path, incl.
    // exact percentiles — a {10, 5} cell interpolates p50 = 7.5
    import graft.operators.Aggregation.MetricAgg
    val m = TrendStore.entityRollupTemporal(rolled, relDf,
        "child", "parent", "vfrom", "vto",
        Seq(MetricAgg("sum_value", "count", "cnt"),
          MetricAgg("sum_value", "sum", "sum_value"),
          MetricAgg("sum_value", "p50_exact", "p50")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(m === Set(("a", 2L, 15.0, 7.5), ("b", 2L, 50.0, 25.0)))
    intercept[IllegalArgumentException](TrendStore.entityRollupTemporal(
      rolled, relDf, "child", "parent", "vfrom", "vto", Seq.empty[MetricAgg]))
  }

  test("temporal rollup audit measures exactly what the rollup drops") {
    import graft.SparkSpec.spark.implicits._
    val rolled = Seq(
      (1L, "2024-01-05 00:00:00", 10.0),
      (1L, "2024-01-10 00:00:00", 20.0),
      (1L, "2024-01-15 00:00:00", 30.0),
      (2L, "2024-01-05 00:00:00", 5.0),
      (3L, "2024-01-01 00:00:00", 99.0), // before interval opens → drop
      (3L, "2024-01-03 00:00:00", 7.0)   // covered
    ).toDF("entity_id", "bucket", "sum_value")
      .withColumn("bucket", col("bucket").cast("timestamp"))
    val relDf = Seq(
      (1L, "a", "2024-01-01 00:00:00", "2024-01-10 00:00:00"),
      (1L, "b", "2024-01-10 00:00:00", "2024-12-31 00:00:00"),
      (2L, "a", "2024-01-01 00:00:00", "2024-12-31 00:00:00"),
      (3L, "c", "2024-01-02 00:00:00", "2024-12-31 00:00:00")
    ).toDF("child", "parent", "vfrom", "vto")
      .withColumn("vfrom", col("vfrom").cast("timestamp"))
      .withColumn("vto", col("vto").cast("timestamp"))
    val audit = TrendStore.entityRollupTemporalAudit(rolled, relDf,
        "child", "parent", "vfrom", "vto", col("sum_value"))
      .select(col("entity_id"), col("n_buckets"), col("n_uncovered"),
        col("uncovered_value"), col("uncovered_share"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    // only entity 3 loses anything: 1 of its 2 buckets, value 99
    assert(audit.toSeq === Seq((3L, 2L, 1L, 99.0, 0.5)))
    // conservation: covered mass + uncovered mass = total mass
    val total = rolled.agg(sum(col("sum_value"))).head.getDouble(0)
    val covered = TrendStore.entityRollupTemporal(rolled, relDf,
        "child", "parent", "vfrom", "vto", col("sum_value"))
      .agg(sum(col("sum_value"))).head.getDouble(0)
    assert(covered + 99.0 === total)
  }

  test("valueDistribution: fleet config shares at an as-of time") {
    import graft.SparkSpec.spark.implicits._
    val attrs = Seq(
      (1L, "2024-01-01 00:00:00", 1L, "A"),
      (1L, "2024-01-05 00:00:00", 2L, "B"), // e1 is B at the snapshot
      (2L, "2024-01-02 00:00:00", 3L, "X"),
      (3L, "2024-01-03 00:00:00", 4L, "X"),
      (3L, "2024-01-20 00:00:00", 5L, "Z")  // after the snapshot → invisible
    ).toDF("entity_id", "ts", "eid", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    val got = AttributeStore.valueDistribution(attrs, col("entity_id"), col("ts"),
        col("eid"), col("v"), lit("2024-01-10 00:00:00").cast("timestamp"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(got.toSeq === Seq(("B", 1L, 3L, 1.0 / 3), ("X", 2L, 3L, 2.0 / 3)))
  }

  test("timeline: per-entity change log with hold durations") {
    import graft.SparkSpec.spark.implicits._
    val attrs = Seq(
      (1L, "2024-01-01 00:00:00", 1L, "A"),
      (1L, "2024-01-02 00:00:00", 2L, "A"), // repeat → not a change
      (1L, "2024-01-04 00:00:00", 3L, "B"),
      (2L, "2024-01-01 00:00:00", 4L, "X"))
      .toDF("entity_id", "ts", "eid", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    val got = AttributeStore.timeline(attrs, col("entity_id"), col("ts"),
        col("eid"), col("v"))
      .select(col("entity_id"), col("prev_value"), col("new_value"),
        col("change_kind"), col("held_seconds"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)).orNull,
        r.getString(2), r.getString(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toSet
    assert(got === Set(
      (1L, null, "A", "initial", 3L * 86400), // held Jan-01 → Jan-04
      (1L, "A", "B", "change", -1L),          // still current
      (2L, null, "X", "initial", -1L)))

    // valueDwell rolls the same holds per value: A completed one
    // 3-day hold; B and X are open (current) — no completed holds,
    // so their mean is NULL, never a divide-by-zero artifact
    val dwell = AttributeStore.valueDwell(attrs, col("entity_id"), col("ts"),
        col("eid"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) -1.0 else r.getDouble(4))).toMap
    assert(dwell("A") === ((1L, 1L, 0L, 3.0 * 86400)))
    assert(dwell("B") === ((1L, 0L, 1L, -1.0)))
    assert(dwell("X") === ((1L, 0L, 1L, -1.0)))
  }

  // The full Minerva loop composed: attribute HISTORY is itself a
  // temporal relation (entity → state over [valid_from, valid_to)),
  // so trend buckets roll up to "the state the entity was in AT that
  // bucket" with no new operator — history feeds entityRollupTemporal
  // directly.
  test("attribute history drives the temporal rollup: buckets aggregate by state-at-the-time") {
    import graft.SparkSpec.spark.implicits._
    val attrs = Seq( // entity 1: free → paid at Jan-10
      (1L, "2024-01-01 00:00:00", 1L, "free"),
      (1L, "2024-01-10 00:00:00", 2L, "paid"))
      .toDF("entity_id", "ts", "eid", "plan")
      .withColumn("ts", col("ts").cast("timestamp"))
    val hist = AttributeStore.history(attrs, col("entity_id"), col("ts"), col("eid"))
      .withColumn("valid_to",
        coalesce(col("valid_to"), lit("9999-01-01 00:00:00").cast("timestamp")))
    val rolled = Seq(
      (1L, "2024-01-05 00:00:00", 10.0),
      (1L, "2024-01-20 00:00:00", 30.0))
      .toDF("entity_id", "bucket", "sum_value")
      .withColumn("bucket", col("bucket").cast("timestamp"))
    val got = TrendStore.entityRollupTemporal(rolled, hist,
        "entity_id", "plan", "valid_from", "valid_to", col("sum_value"))
      .collect().map(r => (r.getString(0), r.getDouble(2))).toSet
    assert(got === Set(("free", 10.0), ("paid", 30.0)))
  }

  test("gaps + observed = sum of per-entity active ranges") {
    val g = TrendStore.gaps(ev, col("user_id"), col("ts"), "hour").count()
    val obs = ev.select(col("user_id").as("u"), date_trunc("hour", col("ts")).as("b")).distinct()
    val nObs = obs.count()
    // inclusive per-entity range length in hours
    val rangeSum = obs.groupBy("u")
      .agg((((unix_timestamp(max(col("b"))) - unix_timestamp(min(col("b")))) / 3600) + 1).as("len"))
      .agg(sum("len")).head.getDouble(0).toLong
    assert(g + nObs === rangeSum)
  }

  test("as-of tolerance nulls stale matches; boundary is inclusive; no-tolerance unchanged") {
    import graft.SparkSpec.spark.implicits._
    val clicks = Seq((1L, "2024-01-01 10:00:00", 100L))
      .toDF("user_id", "ts", "c_id")
      .withColumn("ts", col("ts").cast("timestamp"))
    val purchases = Seq(
      (1L, "2024-01-01 10:30:00", 1L),  // 30 min stale → match
      (1L, "2024-01-01 11:00:00", 2L),  // exactly 1 h → inclusive match
      (1L, "2024-01-01 11:00:01", 3L),  // 1 h + 1 s → nulled
      (2L, "2024-01-01 10:10:00", 4L))  // no click at all → null
      .toDF("user_id", "ts", "p_id")
      .withColumn("ts", col("ts").cast("timestamp"))
    val got = AsOf.join(purchases, clicks, "user_id", "ts", "ts",
        carry = Seq("c_id"), toleranceSeconds = Some(3600L))
      .select(col("p_id"), col("asof_c_id"))
      .as[(Long, Option[Long])].collect().toSet
    assert(got === Set((1L, Some(100L)), (2L, Some(100L)), (3L, None), (4L, None)))
    // tolerance None keeps the unbounded semantics (row 3 matches)
    val unbounded = AsOf.join(purchases, clicks, "user_id", "ts", "ts", Seq("c_id"))
      .select(col("p_id"), col("asof_c_id"))
      .as[(Long, Option[Long])].collect().toSet
    assert(unbounded === Set((1L, Some(100L)), (2L, Some(100L)),
      (3L, Some(100L)), (4L, None)))
  }

  test("t35 WAU fan-out equals the brute-force trailing-7-day distinct") {
    import graft.SparkSpec.spark.implicits._
    val q = graft.SparkEntry.queries("t35_active_entities")
    // planted: entities 1, 2, 3 active on Jan 1 / 5 / 9 only →
    // WAU(Jan1)={1}, WAU(Jan5)={1,2}, WAU(Jan9)={2,3}
    val dir = java.nio.file.Files.createTempDirectory("graft_t35").toString
    val planted = Seq((1L, "2024-01-01 10:00:00"), (2L, "2024-01-05 10:00:00"),
      (3L, "2024-01-09 10:00:00"))
      .toDF("user_id", "ts")
      .select(monotonically_increasing_id().as("event_id"),
        col("ts").cast("timestamp").as("ts"), col("user_id"),
        lit("click").as("event_type"), lit(1.0).as("value"), lit("{}").as("props"))
    planted.write.parquet(s"$dir/events.parquet")
    val got = q(spark, dir).as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("2024-01-01", 1L, 1L), ("2024-01-05", 1L, 2L),
      ("2024-01-09", 1L, 2L)))
    // brute force on the real corpus: per observed day, filter + distinct
    val ev = TableCatalog(spark, sf).events
    val presence = ev.select(col("user_id").as("e"),
      date_trunc("day", col("ts")).as("d")).distinct().cache()
    val wauByDay = q(spark, sf).as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val days = presence.select(col("d")).distinct().orderBy(col("d"))
      .collect().map(_.getTimestamp(0))
    days.take(10).foreach { d =>
      val lo = new java.sql.Timestamp(d.getTime - 6L * 86400000L)
      val brute = presence.filter(col("d") >= lit(lo) && col("d") <= lit(d))
        .select("e").distinct().count()
      val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
      fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      val key = fmt.format(d)
      assert(wauByDay(key) === brute, s"WAU mismatch on $key")
    }
    presence.unpersist()
  }

  test("busyHour picks the peak hour-of-day; exact ties break to the earliest hour") {
    import graft.SparkSpec.spark.implicits._
    // entity 1: hour 17 averages 10.0 across two days, others lower.
    // entity 2: hours 3 and 9 both average exactly 5.0 → hour 3 wins.
    val rows = Seq(
      (1L, "2024-01-01 17:00:00", "8.0"), (1L, "2024-01-02 17:00:00", "12.0"),
      (1L, "2024-01-01 04:00:00", "9.0"),
      (2L, "2024-01-01 03:00:00", "4.0"), (2L, "2024-01-02 03:00:00", "6.0"),
      (2L, "2024-01-01 09:00:00", "5.0"))
    val hourly = rows.toDF("entity_id", "b", "v")
      .select(col("entity_id"), col("b").cast("timestamp").as("bucket"),
        col("v").cast("decimal(18,4)").as("sd"))
    val got = TrendStore.busyHour(hourly)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got === Set((1L, 17L, 2L, 10.0), (2L, 3L, 2L, 5.0)))
  }

  test("trailingWindow is gap-honest: range frame shrinks where a rows frame would not") {
    import graft.SparkSpec.spark.implicits._
    // hours 0,1,2 then a jump to hour 30: with a 3 h trailing window
    // the hour-30 row must cover ONLY itself — ROWS 2 PRECEDING
    // would wrongly drag hours 1-2 into it across the 27 h gap.
    val rows = Seq((1L, "2024-01-01 00:00:00", "1.5"), (1L, "2024-01-01 01:00:00", "2.5"),
      (1L, "2024-01-01 02:00:00", "4.0"), (1L, "2024-01-02 06:00:00", "8.0"))
    val daily = rows.toDF("entity_id", "b", "v")
      .select(col("entity_id"), col("b").cast("timestamp").as("bucket"),
        col("v").cast("decimal(18,4)").as("sd"))
    val got = TrendStore.trailingWindow(daily, widthSeconds = 3 * 3600L)
      .select(date_format(col("bucket"), "HH").cast("int"), col("win_sum"), col("win_buckets"))
      .as[(Int, Double, Long)].collect().toSet
    assert(got === Set((0, 1.5, 1L), (1, 4.0, 2L), (2, 8.0, 3L), (6, 8.0, 1L)))
    intercept[IllegalArgumentException](TrendStore.trailingWindow(daily, 0L))
  }

  test("snapshots ≡ one atTime per snapshot, in a single history pass") {
    import graft.SparkSpec.spark.implicits._
    val attrs = Seq(
      (1L, "2024-01-05 00:00:00", 1L, "v1"), // entity 1: three writes
      (1L, "2024-01-10 00:00:00", 2L, "v2"),
      (1L, "2024-01-20 00:00:00", 3L, "v3"),
      (2L, "2024-01-16 00:00:00", 4L, "w1"), // entity 2: born mid-series
      (3L, "2024-01-01 00:00:00", 5L, "old"), // entity 3: same-ts writes —
      (3L, "2024-01-01 00:00:00", 6L, "new")) // higher tie must win
      .toDF("entity_id", "ts", "eid", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    val snaps = Seq("2024-01-08 00:00:00", "2024-01-15 00:00:00", "2024-01-22 00:00:00")
    val got = AttributeStore.snapshots(attrs, col("entity_id"), col("ts"), col("eid"), snaps)
      .select(col("entity_id"), date_format(col("snapshot_ts"), "dd").cast("int"), col("v"))
      .as[(Long, Int, String)].collect().toSet
    assert(got === Set(
      (1L, 8, "v1"), (1L, 15, "v2"), (1L, 22, "v3"),
      (2L, 22, "w1"),
      (3L, 8, "new"), (3L, 15, "new"), (3L, 22, "new")))
    // per-snapshot agreement with the single-ts as-of path
    snaps.foreach { sn =>
      val bulk = AttributeStore.snapshots(attrs, col("entity_id"), col("ts"), col("eid"), Seq(sn))
        .select("entity_id", "v").as[(Long, String)].collect().toSet
      val one = AttributeStore.atTime(attrs, col("entity_id"), col("ts"), col("eid"),
          lit(sn).cast("timestamp"))
        .select("entity_id", "v").as[(Long, String)].collect().toSet
      assert(bulk === one, s"snapshot $sn")
    }
    intercept[IllegalArgumentException](
      AttributeStore.snapshots(attrs, col("entity_id"), col("ts"), col("eid"), Seq.empty))
  }

  test("topChangePoint finds a planted level shift at its left edge") {
    import graft.SparkSpec.spark.implicits._
    // entity 1: 10 days at level 2.0 then 10 days at level 12.0 —
    // the biggest split-window (w=3) shift ties between the last old
    // day (10) and the first new day (11); earliest-bucket tie-break
    // reports day 10 with shift exactly +10. entity 2: flat series →
    // every candidate shift is 0; earliest candidate day (4) wins.
    val rows = (1 to 20).map(d => (1L, f"2024-01-$d%02d 00:00:00",
        if (d <= 10) BigDecimal("2.0") else BigDecimal("12.0"))) ++
      (1 to 9).map(d => (2L, f"2024-02-$d%02d 00:00:00", BigDecimal("5.0")))
    val daily = rows.toDF("entity_id", "b", "v")
      .select(col("entity_id"), col("b").cast("timestamp").as("bucket"),
        col("v").cast("decimal(18,4)").as("sd"))
    val got = TrendStore.topChangePoint(daily, w = 3)
      .select(col("entity_id"), date_format(col("bucket"), "dd").cast("int"),
        col("mean_before"), col("mean_after"), col("shift"))
      .as[(Long, Int, Double, Double, Double)].collect().toSet
    assert(got === Set((1L, 10, 2.0, 12.0, 10.0), (2L, 4, 5.0, 5.0, 0.0)))
    // short series (< 2w+1 buckets) emit nothing
    val short = (1 to 6).map(d => (9L, f"2024-03-$d%02d 00:00:00", BigDecimal("1.0")))
      .toDF("entity_id", "b", "v")
      .select(col("entity_id"), col("b").cast("timestamp").as("bucket"),
        col("v").cast("decimal(18,4)").as("sd"))
    assert(TrendStore.topChangePoint(short, w = 3).isEmpty)
    intercept[IllegalArgumentException](TrendStore.changePoints(daily, w = 0))
  }

  test("outageWindows coalesces planted gap runs into exact intervals") {
    import graft.SparkSpec.spark.implicits._
    // entity 1: observed hours 0,1,5,7 → islands [2-4] (3 buckets), [6-6] (1).
    // entity 2: observed hours 0,3 → island [1-2] (2).
    // entity 3: fully dense 0-2 → no outage rows at all.
    val rows = Seq(
      (1L, "2024-01-01 00:10:00"), (1L, "2024-01-01 01:20:00"),
      (1L, "2024-01-01 05:00:00"), (1L, "2024-01-01 07:59:00"),
      (2L, "2024-01-01 00:00:00"), (2L, "2024-01-01 03:30:00"),
      (3L, "2024-01-01 00:05:00"), (3L, "2024-01-01 01:05:00"),
      (3L, "2024-01-01 02:05:00"))
      .toDF("u", "t").select(col("u"), col("t").cast("timestamp").as("t"))
    val got = TrendStore.outageWindows(rows, col("u"), col("t"), "hour")
      .select(col("entity_id"), date_format(col("outage_start"), "HH").cast("int"),
        date_format(col("outage_end"), "HH").cast("int"), col("n_buckets"))
      .as[(Long, Int, Int, Long)].collect().toSet
    assert(got === Set((1L, 2, 4, 3L), (1L, 6, 6, 1L), (2L, 1, 2, 2L)))
    // interval math ties out against the raw gaps listing on real data
    val nMissing = TrendStore.gaps(ev, col("user_id"), col("ts"), "hour").count()
    val viaIslands = TrendStore.outageWindows(ev, col("user_id"), col("ts"), "hour")
      .agg(sum("n_buckets")).head.getLong(0)
    assert(viaIslands === nMissing)
    intercept[IllegalArgumentException](
      TrendStore.outageWindows(ev, col("user_id"), col("ts"), "month"))
  }

  test("as-of join picks the latest prior right row") {
    // brute-force oracle on collected data
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts_ns").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts_ns", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = purchases.flatMap { case (pid, u, pts) =>
      val prior = clicks.filter(c => c._1 == u && c._2 <= pts)
      if (prior.isEmpty) None
      else Some(pid -> prior.maxBy(c => (c._2, c._3))._3)
    }.toMap

    val left = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val right = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("c_event_id"))
    val got = AsOf.join(left, right, "user_id", "ts", "ts", Seq("c_event_id"))
      .filter(col("asof_c_event_id").isNotNull)
      .select("event_id", "asof_c_event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("attribute current is one row per entity, the latest") {
    val cur = AttributeStore.current(ev, col("user_id"), col("ts"), col("event_id"))
    assert(cur.groupBy("user_id").count().filter(col("count") > 1).isEmpty)
    val maxTs = ev.groupBy("user_id").agg(max("ts_ns").as("m"))
    val joined = cur.join(maxTs, "user_id").filter(col("ts_ns") =!= col("m"))
    assert(joined.isEmpty)
  }

  test("attribute history intervals nest correctly") {
    val h = AttributeStore.history(ev, col("user_id"), col("ts"), col("event_id"))
    assert(h.filter(col("valid_to").isNotNull && col("valid_to") < col("valid_from")).isEmpty)
    // exactly one open interval per entity
    val open = h.filter(col("valid_to").isNull).groupBy("user_id").count()
    assert(open.filter(col("count") =!= 1).isEmpty)
  }

  test("attribute compact removes consecutive duplicates only") {
    val c = AttributeStore.compact(ev, col("user_id"), col("ts"), col("event_id"),
      col("event_type"))
    assert(c.count() <= ev.count())
    // re-compacting is a fixpoint
    val c2 = AttributeStore.compact(c, col("user_id"), col("ts"), col("event_id"),
      col("event_type"))
    assert(c2.count() === c.count())
  }

  test("linearTrend recovers a planted exact line and projects the next day") {
    // entity 1: sd = 2.5·x + 10 over 14 days (x = epoch days) — every
    // moment and the closed forms stay exact in doubles, so the fit
    // is EXACTLY the planted line; entity 2: too few days → dropped
    val days = (0 until 14).map(d => (1L, s"2024-01-${"%02d".format(d + 1)}"))
    val short = (0 until 3).map(d => (2L, s"2024-01-${"%02d".format(d + 1)}"))
    import graft.SparkSpec.spark.implicits._
    val daily = (days ++ short).toDF("entity_id", "day")
      .select(col("entity_id"), col("day").cast("timestamp").as("bucket"),
        (expr("datediff(day, date'1970-01-01')") * lit(2.5) + lit(10))
          .cast("decimal(18,4)").as("sd"))
    val fit = TrendStore.linearTrend(daily, minDays = 7).collect()
    assert(fit.length === 1 && fit.head.getLong(0) === 1L)
    assert(fit.head.getLong(1) === 14L)
    assert(fit.head.getDouble(2) === 2.5)
    assert(fit.head.getDouble(3) === 10.0)
    val xNext = java.time.LocalDate.of(2024, 1, 15).toEpochDay.toDouble
    assert(fit.head.getDouble(4) === 2.5 * xNext + 10.0)
  }

  test("capacityHorizon: planted growth gives exact doubling time; decline gives NULL") {
    import graft.SparkSpec.spark.implicits._
    // entity 1 grows at exactly 2.5/day; entity 2 declines at -1/day
    val days = (0 until 14).flatMap { d =>
      val date = s"2024-01-${"%02d".format(d + 1)}"
      Seq((1L, date, 2.5), (2L, date, -1.0))
    }
    val daily = days.toDF("entity_id", "day", "m")
      .select(col("entity_id"), col("day").cast("timestamp").as("bucket"),
        (expr("datediff(day, date'1970-01-01')") * col("m") + lit(100000))
          .cast("decimal(18,4)").as("sd"))
    val got = TrendStore.capacityHorizon(daily, factor = 2.0, minDays = 7)
      .select(col("entity_id"), col("slope"), col("forecast_next"),
        col("days_to_factor"))
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).sortBy(_._1)
    assert(got(0)._2 === 2.5)
    // doubling time = forecast / slope, both exact on the planted line
    val f1 = TrendStore.linearTrend(daily.filter(col("entity_id") === 1L), 7)
      .head.getDouble(4)
    assert(got(0)._3 === Some(f1 / 2.5))
    // the declining entity has no doubling time
    assert(got(1)._2 === -1.0 && got(1)._3 === None)
  }
}
