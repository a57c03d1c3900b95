package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import graft.operators.TrendStoreWriter

class CliSpec extends SparkSpec {

  import graft.SparkSpec.spark.implicits._

  test("harvest command runs a job end-to-end") {
    val src = Files.createTempDirectory("graft_cli_src").toString
    val base = Files.createTempDirectory("graft_cli").toString
    Files.writeString(Path.of(src, "a.csv"),
      "dn,timestamp,v\nCell=1,2024-01-01 10:00:00,5.0\nCell=2,2024-01-01 10:05:00,6.0\n")
    Cli.run(spark, Seq("harvest",
      "--source", src, "--format", "csv",
      "--dn-col", "dn", "--entity-component", "Cell",
      "--ts-col", "timestamp", "--ts-format", "yyyy-MM-dd HH:mm:ss",
      "--granularity", "15m",
      "--store", s"$base/store", "--state", s"$base/state",
      "--pattern", ".*\\.csv"))
    assert(TrendStoreWriter.read(spark, s"$base/store").count() === 2)
  }

  test("dump exports a store; harvest(dump(store)) reproduces it; date range prunes") {
    val src = Files.createTempDirectory("graft_dump_src").toString
    val base = Files.createTempDirectory("graft_dump").toString
    Files.writeString(Path.of(src, "a.csv"),
      "dn,timestamp,v\nCell=1,2024-01-01 10:00:00,5.0\nCell=2,2024-01-01 10:05:00,6.0\n" +
        "Cell=1,2024-01-02 11:00:00,7.5\n")
    Cli.run(spark, Seq("harvest",
      "--source", src, "--format", "csv",
      "--dn-col", "dn", "--entity-component", "Cell",
      "--ts-col", "timestamp", "--ts-format", "yyyy-MM-dd HH:mm:ss",
      "--granularity", "15m",
      "--store", s"$base/store", "--state", s"$base/state",
      "--pattern", ".*\\.csv"))
    // ROUND TRIP: dump → re-harvest ≡ original store. The dump keeps
    // entity_dn, so the re-harvest derives the SAME stable entity_id.
    Cli.run(spark, Seq("dump",
      "--store", s"$base/store", "--out", s"$base/dump",
      "--format", "csv", "--columns", "entity_dn,bucket,v"))
    // dump CSVs carry full microsecond precision (r14 — a
    // seconds-only format silently truncated sub-second stores), so
    // the re-harvest names the fractional format
    Cli.run(spark, Seq("harvest",
      "--source", s"$base/dump", "--format", "csv",
      "--dn-col", "entity_dn", "--entity-component", "Cell",
      "--ts-col", "bucket", "--ts-format", "yyyy-MM-dd HH:mm:ss.SSSSSS",
      "--granularity", "15m",
      "--store", s"$base/store2", "--state", s"$base/state2",
      "--pattern", ".*\\.csv"))
    val cols = Seq("entity_id", "bucket", "v")
    val a = TrendStoreWriter.read(spark, s"$base/store").select(cols.map(col): _*)
    val b = TrendStoreWriter.read(spark, s"$base/store2").select(cols.map(col): _*)
    assert(a.count() === 3)
    assert(b.exceptAll(a).isEmpty && a.exceptAll(b).isEmpty,
      "round trip diverged from the original store")
    // date range prunes partitions BEFORE the scan
    Cli.run(spark, Seq("dump",
      "--store", s"$base/store", "--out", s"$base/dump_day1",
      "--format", "jsonl", "--from", "2024-01-01", "--to", "2024-01-01"))
    assert(spark.read.json(s"$base/dump_day1").count() === 2)
    // a store without p_date refuses a date range instead of silently
    // dumping everything
    Seq((1L, "x")).toDF("id", "s").write.parquet(s"$base/flat")
    assertThrows[Exception] {
      Cli.run(spark, Seq("dump", "--store", s"$base/flat",
        "--out", s"$base/nope", "--from", "2024-01-01"))
    }
  }

  test("harvest --target attribute loads history and refreshes the current view") {
    val src = Files.createTempDirectory("graft_cli_attr_src").toString
    val base = Files.createTempDirectory("graft_cli_attr").toString
    Files.writeString(Path.of(src, "a.csv"),
      "dn,timestamp,status\nCell=1,2024-01-01 09:00:00,active\nCell=1,2024-01-02 09:00:00,standby\n")
    Cli.run(spark, Seq("harvest",
      "--source", src, "--format", "csv",
      "--dn-col", "dn", "--entity-component", "Cell",
      "--ts-col", "timestamp", "--ts-format", "yyyy-MM-dd HH:mm:ss",
      "--granularity", "raw",
      "--store", s"$base/hist", "--state", s"$base/state",
      "--target", "attribute", "--current", s"$base/current"))
    assert(spark.read.parquet(s"$base/hist").count() === 2)
    assert(spark.read.parquet(s"$base/current")
      .head.getAs[String]("status") === "standby")
  }

  test("materialize and aggregate commands produce stores") {
    val base = Files.createTempDirectory("graft_cli_mat").toString
    Seq((1L, "2024-01-01 10:05:00", 1.0), (1L, "2024-01-01 10:35:00", 2.0),
      (2L, "2024-01-02 09:00:00", 7.0))
      .toDF("entity_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.parquet(s"$base/src")
    Cli.run(spark, Seq("materialize",
      "--source", s"$base/src", "--entity", "entity_id", "--ts", "ts",
      "--value", "value", "--granularity", "hour",
      "--store", s"$base/store", "--state", s"$base/state"))
    assert(TrendStoreWriter.read(spark, s"$base/store").count() === 2)

    Cli.run(spark, Seq("aggregate",
      "--source", s"$base/src", "--entity", "entity_id", "--ts", "ts",
      "--granularity", "day",
      "--metric", "value:sum:sum_v", "--metric", "value:count:cnt",
      "--out", s"$base/agg"))
    val agg = spark.read.parquet(s"$base/agg")
    assert(agg.count() === 2)
    assert(agg.filter(col("entity_id") === 1L).head.getAs[Double]("sum_v") === 3.0)

    // wavg@weight in the fn slot parses into a weighted-mean metric
    // (self-weighted here: Σv²/Σv = (1+4)/3)
    Cli.run(spark, Seq("aggregate",
      "--source", s"$base/src", "--entity", "entity_id", "--ts", "ts",
      "--granularity", "day",
      "--metric", "value:wavg@value:wv",
      "--out", s"$base/agg_w"))
    assert(spark.read.parquet(s"$base/agg_w")
      .filter(col("entity_id") === 1L).head.getAs[Double]("wv") === 5.0 / 3.0)

    // repeated --granularity flags run the cascade; --derived formulas
    // project over the metric aliases at every cascade level
    Cli.run(spark, Seq("aggregate",
      "--source", s"$base/src", "--entity", "entity_id", "--ts", "ts",
      "--granularity", "hour", "--granularity", "day",
      "--metric", "value:sum:sum_v", "--metric", "value:count:cnt",
      "--derived", "avg_v:sum_v / cnt",
      "--out", s"$base/cascade"))
    val casc = spark.read.parquet(s"$base/cascade")
    // entity 1's two events share one hour -> 2 hourly buckets total
    assert(casc.filter(col("granularity") === "hour").count() === 2)
    assert(casc.filter(col("granularity") === "day").count() === 2)
    assert(casc.filter(col("granularity") === "day" && col("entity_id") === 1L)
      .head.getAs[Double]("sum_v") === 3.0)
    assert(casc.filter(col("granularity") === "day" && col("entity_id") === 1L)
      .head.getAs[Double]("avg_v") === 1.5)

    // --derived in flag form CHAINS (avg_pct references avg_v), and
    // the config-file form parses the optional "derived" array
    Cli.run(spark, Seq("aggregate",
      "--source", s"$base/src", "--entity", "entity_id", "--ts", "ts",
      "--granularity", "day",
      "--metric", "value:sum:sum_v", "--metric", "value:count:cnt",
      "--derived", "avg_v:sum_v / cnt", "--derived", "avg_pct:avg_v * 100",
      "--out", s"$base/agg_derived"))
    val ad = spark.read.parquet(s"$base/agg_derived")
    assert(ad.filter(col("entity_id") === 1L).head.getAs[Double]("avg_pct") === 150.0)

    val cfgPath = Files.createTempFile("graft_aggcfg", ".json")
    Files.writeString(cfgPath,
      s"""{"source": "$base/src", "entity": "entity_id", "ts": "ts",
         |"out": "$base/agg_cfg", "granularities": ["day"],
         |"metrics": [{"source": "value", "fn": "sum", "as": "sum_v"},
         |            {"source": "value", "fn": "count", "as": "cnt"}],
         |"derived": [{"as": "avg_v", "sql": "sum_v / cnt"}]}""".stripMargin)
    Cli.run(spark, Seq("aggregate", "--config", cfgPath.toString))
    assert(spark.read.parquet(s"$base/agg_cfg")
      .filter(col("entity_id") === 2L).head.getAs[Double]("avg_v") === 7.0)

    // a duplicate alias between metrics and derived fails loudly
    intercept[IllegalArgumentException] {
      operators.Aggregation.compile(operators.Aggregation.AggregationDef("day",
        Seq(operators.Aggregation.MetricAgg("value", "sum", "v")),
        Seq(operators.Aggregation.DerivedMetric("v", "v * 2"))))(
        spark.read.parquet(s"$base/src"), col("entity_id"), col("ts"))
    }

    intercept[IllegalArgumentException] {
      Cli.run(spark, Seq("nonsense"))
    }

    // sketch-percentile eps round-trips through BOTH declaration
    // forms: the flag form's @suffix (p95@0.02) and the config file's
    // "eps" field — and a cascade run with it emits sane estimates
    // (the rank-error contract itself is QuantileSketchSpec's job)
    Cli.run(spark, Seq("aggregate",
      "--source", s"$base/src", "--entity", "entity_id", "--ts", "ts",
      "--granularity", "hour", "--granularity", "day",
      "--metric", "value:count:cnt", "--metric", "value:p95@0.02:p95_v",
      "--out", s"$base/agg_eps"))
    val ae = spark.read.parquet(s"$base/agg_eps")
      .filter(col("granularity") === "day" && col("entity_id") === 1L).head
    // entity 1's two values are 1.0 and 2.0 — any GK p95 answer is one
    // of them; at 2 samples the sketch is exact: p95 → the max
    assert(ae.getAs[Double]("p95_v") === 2.0)
    val cfgEps = Files.createTempFile("graft_aggcfg_eps", ".json")
    Files.writeString(cfgEps,
      s"""{"source": "$base/src", "entity": "entity_id", "ts": "ts",
         |"out": "$base/agg_eps_cfg", "granularities": ["day"],
         |"metrics": [{"source": "value", "fn": "p95", "as": "p95_v",
         |             "eps": 0.02}]}""".stripMargin)
    val parsed = Config.parseAggregate(Files.readString(cfgEps))
    assert(parsed.metrics.head.eps === Some(0.02))
    Cli.run(spark, Seq("aggregate", "--config", cfgEps.toString))
    assert(spark.read.parquet(s"$base/agg_eps_cfg")
      .filter(col("entity_id") === 1L).head.getAs[Double]("p95_v") === 2.0)
    // an eps on a non-sketch fn, a malformed eps, and an out-of-range
    // eps all refuse loudly instead of silently ignoring the knob
    intercept[IllegalArgumentException] {
      Cli.run(spark, Seq("aggregate",
        "--source", s"$base/src", "--entity", "entity_id", "--ts", "ts",
        "--granularity", "day", "--metric", "value:p95@x:p", "--out", s"$base/bad1"))
    }
    intercept[IllegalArgumentException] {
      operators.Aggregation.compile(operators.Aggregation.AggregationDef("day",
        Seq(operators.Aggregation.MetricAgg("value", "sum", "v", None, None, Some(0.01)))))(
        spark.read.parquet(s"$base/src"), col("entity_id"), col("ts"))
    }
    intercept[IllegalArgumentException] {
      operators.Aggregation.compile(operators.Aggregation.AggregationDef("day",
        Seq(operators.Aggregation.MetricAgg("value", "p95", "p", None, None, Some(0.5)))))(
        spark.read.parquet(s"$base/src"), col("entity_id"), col("ts"))
    }
  }

  test("trigger and retain commands close the monitoring loop") {
    val base = Files.createTempDirectory("graft_cli_trig").toString
    Seq((1L, "2024-01-01 10:05:00", 9.0), (1L, "2024-01-01 10:35:00", 2.0),
      (2L, "2024-01-03 09:00:00", 1.0))
      .toDF("entity_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.parquet(s"$base/src")
    Cli.run(spark, Seq("trigger",
      "--source", s"$base/src", "--entity", "entity_id", "--ts", "ts",
      "--rule", "surge:hour:value:sum:>:8.0:major",
      "--rule", "quiet:day:value:max:<:2.0:minor",
      "--out", s"$base/notifications"))
    val fired = spark.read.parquet(s"$base/notifications")
    assert(fired.select("rule", "entity_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet ===
      Set(("surge", 1L), ("quiet", 2L)))

    // --maintenance windows flag covered firings muted=1, keep them
    // visible, and leave uncovered firings live
    Seq((1L, "2024-01-01 00:00:00", "2024-01-02 00:00:00"))
      .toDF("entity_id", "from_ts", "to_ts")
      .select(col("entity_id"), col("from_ts").cast("timestamp").as("from_ts"),
        col("to_ts").cast("timestamp").as("to_ts"))
      .write.parquet(s"$base/windows")
    Cli.run(spark, Seq("trigger",
      "--source", s"$base/src", "--entity", "entity_id", "--ts", "ts",
      "--rule", "surge:hour:value:sum:>:8.0:major",
      "--rule", "quiet:day:value:max:<:2.0:minor",
      "--maintenance", s"$base/windows",
      "--out", s"$base/muted"))
    val muted = spark.read.parquet(s"$base/muted").collect()
      .map(r => r.getAs[String]("rule") -> r.getAs[Long]("muted")).toMap
    assert(muted === Map("surge" -> 1L, "quiet" -> 0L))

    // notifications are a time-partitioned store → retention applies
    Cli.run(spark, Seq("retain",
      "--store", s"$base/notifications", "--keep-from", "2024-01-02"))
    assert(spark.read.parquet(s"$base/notifications")
      .select("rule").head.getString(0) === "quiet")

    // delete-timestamp surface: remove the surviving bucket's rows —
    // the emptied day partition disappears like retain's drop
    val kept = spark.read.parquet(s"$base/notifications")
      .select(date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss")).head.getString(0)
    Cli.run(spark, Seq("delete-ts",
      "--store", s"$base/notifications", "--bucket", kept))
    assert(graft.operators.StoreFs.list(spark, s"$base/notifications")
      .map(_.getName).forall(!_.startsWith("p_date=")))
  }

  test("store-info reports the merged schema and partition range") {
    import graft.operators.TrendStoreWriter
    val base = Files.createTempDirectory("graft_cli_info").toString
    val v1 = Seq((1L, "2024-01-01 10:00:00", 1.0))
      .toDF("entity_id", "bucket", "pw_in")
      .withColumn("bucket", col("bucket").cast("timestamp"))
    TrendStoreWriter.write(v1, s"$base/store")
    val v2 = Seq((1L, "2024-01-03 10:00:00", 2.0, 20.0))
      .toDF("entity_id", "bucket", "pw_in", "pw_out")
      .withColumn("bucket", col("bucket").cast("timestamp"))
    TrendStoreWriter.upsert(spark, s"$base/store", v2)

    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      Cli.run(spark, Seq("store-info", "--store", s"$base/store", "--counts", "true"))
    }
    val text = out.toString
    // merged schema includes the evolved metric; range spans both days
    assert(text.contains("pw_in:double") && text.contains("pw_out:double"))
    assert(text.contains("partitions: 2 [2024-01-01 .. 2024-01-03]"))
    assert(text.contains("rows: 2"))
  }

  test("audit reports grid coverage and the longest outage windows") {
    import graft.operators.TrendStoreWriter
    val base = Files.createTempDirectory("graft_cli_audit").toString
    // entity 1 observed hours 0,1,5 → one 3-bucket outage [02..04];
    // entity 2 dense hours 0,1 → no outage. observed=5, missing=3.
    val rows = Seq((1L, "2024-01-01 00:00:00", 1.0), (1L, "2024-01-01 01:00:00", 1.0),
      (1L, "2024-01-01 05:00:00", 1.0), (2L, "2024-01-01 00:00:00", 2.0),
      (2L, "2024-01-01 01:00:00", 2.0))
      .toDF("entity_id", "bucket", "v")
      .withColumn("bucket", col("bucket").cast("timestamp"))
    TrendStoreWriter.write(rows, s"$base/store")
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      Cli.run(spark, Seq("audit", "--store", s"$base/store"))
    }
    val text = out.toString
    assert(text.contains("entities: 2"))
    assert(text.contains("observed=5 missing=3 coverage=62.50%"), text)
    assert(text.contains("outage windows: 1"), text)
    assert(text.contains("entity=1 2024-01-01 02:00:00") &&
      text.contains("(3 buckets)"), text)
  }

  test("config files round-trip to identical output as the flag form") {
    val base = Files.createTempDirectory("graft_cli_cfg").toString
    Seq((1L, "2024-01-01 10:05:00", 9.0), (1L, "2024-01-01 10:35:00", 2.0),
      (2L, "2024-01-02 09:00:00", 7.0))
      .toDF("entity_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.parquet(s"$base/src")

    // aggregate: flag form vs config form must write identical stores
    Cli.run(spark, Seq("aggregate",
      "--source", s"$base/src", "--entity", "entity_id", "--ts", "ts",
      "--granularity", "hour", "--granularity", "day",
      "--metric", "value:sum:sum_v", "--metric", "value:count:cnt",
      "--out", s"$base/agg_flags"))
    val aggCfg = Path.of(base, "agg.json")
    Files.writeString(aggCfg,
      s"""{"source": "$base/src", "entity": "entity_id", "ts": "ts",
         | "out": "$base/agg_cfg", "granularities": ["hour", "day"],
         | "metrics": [{"source": "value", "fn": "sum", "as": "sum_v"},
         |             {"source": "value", "fn": "count", "as": "cnt"}]}""".stripMargin)
    Cli.run(spark, Seq("aggregate", "--config", aggCfg.toString))
    val a = spark.read.parquet(s"$base/agg_flags").drop("p_date")
    val b = spark.read.parquet(s"$base/agg_cfg").drop("p_date")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)

    // trigger: config rules can AND multiple thresholds (beyond the
    // flag form): fire on sum > 8 AND max < 10 per hour
    val trigCfg = Path.of(base, "trig.json")
    Files.writeString(trigCfg,
      s"""{"source": "$base/src", "entity": "entity_id", "ts": "ts",
         | "out": "$base/fired",
         | "rules": [{"name": "band", "granularity": "hour", "severity": "major",
         |   "thresholds": [{"metric": "value", "fn": "sum", "op": ">", "value": 8.0},
         |                  {"metric": "value", "fn": "max", "op": "<", "value": 10.0}]},
         |  {"name": "slo", "granularity": "hour", "severity": "minor",
         |   "thresholds": [{"metric": "value", "fn": "p50", "op": ">", "value": 6.0}]}]}""".stripMargin)
    Cli.run(spark, Seq("trigger", "--config", trigCfg.toString))
    // the percentile (SLO) fn flows through the config vocabulary:
    // entity 1's hour-10 p50 is 5.5 (stays quiet at > 6), entity 2's
    // single-sample p50 is 7.0 (fires)
    val fired = spark.read.parquet(s"$base/fired")
    assert(fired.select("rule", "entity_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet ===
      Set(("band", 1L), ("slo", 2L)))

    // the config form carries the maintenance path too: entity 2's
    // firing mutes, entity 1's stays live
    Seq((2L, "2024-01-01 00:00:00", "2024-01-05 00:00:00"))
      .toDF("entity_id", "from_ts", "to_ts")
      .select(col("entity_id"), col("from_ts").cast("timestamp").as("from_ts"),
        col("to_ts").cast("timestamp").as("to_ts"))
      .write.parquet(s"$base/trig_windows")
    val trigCfgM = Path.of(base, "trig_m.json")
    Files.writeString(trigCfgM,
      Files.readString(trigCfg)
        .replace(s""""out": "$base/fired"""",
          s""""out": "$base/fired_m", "maintenance": "$base/trig_windows""""))
    Cli.run(spark, Seq("trigger", "--config", trigCfgM.toString))
    assert(spark.read.parquet(s"$base/fired_m").collect()
      .map(r => r.getAs[Long]("entity_id") -> r.getAs[Long]("muted")).toMap ===
      Map(1L -> 0L, 2L -> 1L))

    // materialize-all: a two-step chain from one config file
    val matCfg = Path.of(base, "mat.json")
    Files.writeString(matCfg,
      s"""{"defs": [
         |  {"name": "hourly", "source": "$base/src", "store": "$base/hourly",
         |   "state": "$base/hourly_state", "granularity": "hour", "value": "value"},
         |  {"name": "daily", "source": "$base/hourly", "store": "$base/daily",
         |   "state": "$base/daily_state", "granularity": "day"}]}""".stripMargin)
    Cli.run(spark, Seq("materialize-all", "--config", matCfg.toString))
    assert(spark.read.parquet(s"$base/daily").count() === 2)

    // harvest: two jobs (trend + attribute) from one config file
    val hsrc = Files.createTempDirectory("graft_cli_cfg_hsrc").toString
    Files.writeString(Path.of(hsrc, "trend_a.csv"),
      "dn,timestamp,v\nCell=1,2024-01-01 10:00:00,5.0\n")
    Files.writeString(Path.of(hsrc, "attr_a.csv"),
      "dn,timestamp,status\nCell=1,2024-01-01 09:00:00,active\n")
    val harvCfg = Path.of(base, "harvest.json")
    Files.writeString(harvCfg,
      s"""{"jobs": [
         |  {"source": "$hsrc", "format": "csv", "dnCol": "dn",
         |   "entityComponent": "Cell", "tsCol": "timestamp",
         |   "tsFormat": "yyyy-MM-dd HH:mm:ss", "granularity": "15m",
         |   "store": "$base/htrend", "state": "$base/htrend_state",
         |   "pattern": "trend_.*\\\\.csv"},
         |  {"source": "$hsrc", "format": "csv", "dnCol": "dn",
         |   "entityComponent": "Cell", "tsCol": "timestamp",
         |   "tsFormat": "yyyy-MM-dd HH:mm:ss", "granularity": "raw",
         |   "store": "$base/hattr", "state": "$base/hattr_state",
         |   "pattern": "attr_.*\\\\.csv", "target": "attribute"}]}""".stripMargin)
    Cli.run(spark, Seq("harvest", "--config", harvCfg.toString))
    assert(spark.read.parquet(s"$base/htrend").count() === 1)
    assert(spark.read.parquet(s"$base/hattr").count() === 1)

    // malformed config → a readable error, not a stack of JSON guts
    val badCfg = Path.of(base, "bad.json")
    Files.writeString(badCfg, """{"granularities": []}""")
    val e = intercept[IllegalArgumentException] {
      Cli.run(spark, Seq("aggregate", "--config", badCfg.toString))
    }
    assert(e.getMessage.contains("config"))
  }

  test("index-build / index-search / compact-index / gapfill commands run end-to-end") {
    val base = Files.createTempDirectory("graft_cli_idx").toString
    val emb = graft.sources.TableCatalog(spark, sf).embeddings
    emb.write.mode("overwrite").parquet(s"$base/corpus")
    emb.filter(col("vec_id") < 5).write.mode("overwrite").parquet(s"$base/queries")
    Cli.run(spark, Seq("index-build",
      "--corpus", s"$base/corpus", "--index", s"$base/idx", "--kind", "ivfpq"))
    Cli.run(spark, Seq("index-search",
      "--queries", s"$base/queries", "--index", s"$base/idx",
      "--out", s"$base/top", "--kind", "ivfpq", "--k", "5"))
    val top = spark.read.parquet(s"$base/top")
    assert(top.groupBy("q_id").count().filter(col("count") =!= 5).isEmpty)
    // CLI search ≡ the library call on the same index
    val lib = graft.similarity.Similarity.ivfpqSearch(
      spark.read.parquet(s"$base/queries"), "vec_id", "embedding", s"$base/idx", k = 5)
    assert(top.exceptAll(lib).isEmpty && lib.exceptAll(top).isEmpty)

    // gapfill over a tiny store
    val rolled = graft.operators.TrendStore.rollup(
      graft.sources.TableCatalog(spark, sf).events,
      col("user_id"), col("ts"), col("value"), "hour")
    TrendStoreWriter.write(rolled, s"$base/trend")
    Cli.run(spark, Seq("gapfill", "--store", s"$base/trend",
      "--granularity", "hour", "--out", s"$base/filled", "--mode", "interpolate"))
    val filled = spark.read.parquet(s"$base/filled")
    assert(filled.count() >= rolled.count())
    assert(filled.columns.contains("filled"))

    // compact-index on a dedup index built through the CLI-adjacent path
    val docs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    graft.operators.Dedup.dedupIncremental(spark, docs, "doc_id", "text",
      s"$base/didx", s"$base/dout")
    Cli.run(spark, Seq("compact-index", "--index", s"$base/didx", "--files", "1"))
    assert(spark.read.parquet(s"$base/didx").count() === 2)

    // compact-index auto-detects the ANN layout (method=ann path) and
    // search results survive the rewrite unchanged (compare against
    // the PERSISTED pre-compact output — a lazy plan over the old
    // index files would re-read paths the swap deleted)
    Cli.run(spark, Seq("compact-index", "--index", s"$base/idx", "--files", "1"))
    val top2 = graft.similarity.Similarity.ivfpqSearch(
      spark.read.parquet(s"$base/queries"), "vec_id", "embedding", s"$base/idx", k = 5)
    assert(top2.exceptAll(top).isEmpty && top.exceptAll(top2).isEmpty)

    // index-delete tombstones through the CLI: a top hit vanishes
    // from the next search, a batch replay is a no-op
    val victim = top2.collect().filter(_.getLong(0) == 0L)
      .minBy(_.getInt(1)).getLong(2)
    Seq(victim).toDF("vec_id").write.mode("overwrite").parquet(s"$base/del_ids")
    Cli.run(spark, Seq("index-delete", "--index", s"$base/idx",
      "--ids", s"$base/del_ids", "--batch", "del1"))
    Cli.run(spark, Seq("index-delete", "--index", s"$base/idx",
      "--ids", s"$base/del_ids", "--batch", "del1")) // replay no-op
    val afterDel = graft.similarity.Similarity.ivfpqSearch(
      spark.read.parquet(s"$base/queries"), "vec_id", "embedding", s"$base/idx", k = 5)
    assert(afterDel.filter(col("n_id") === victim).isEmpty,
      "CLI-deleted id still returned")

    // metadata-filtered search through the CLI: --allowed restricts
    // every returned neighbor to the id set
    val allow = emb.filter(col("label") === 0).select("vec_id")
    allow.write.mode("overwrite").parquet(s"$base/allow")
    val allowSet = allow.collect().map(_.getLong(0)).toSet
    Cli.run(spark, Seq("index-search", "--queries", s"$base/queries",
      "--index", s"$base/idx", "--out", s"$base/ftop", "--kind", "ivfpq",
      "--k", "5", "--allowed", s"$base/allow"))
    val ftop = spark.read.parquet(s"$base/ftop").collect()
    assert(ftop.nonEmpty && ftop.forall(r => allowSet(r.getLong(2))),
      "CLI filtered search returned a disallowed neighbor")

    // index-info autodetects both layouts and reports size/params
    def info(p: String): String = {
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) {
        Cli.run(spark, Seq("index-info", "--index", p))
      }
      out.toString
    }
    val annInfo = info(s"$base/idx")
    assert(annInfo.contains("layout=ivfpq") && annInfo.contains("codebooks: m="))
    assert(annInfo.contains(s"rows: ${emb.count()}"))
    // --stats true appends the cell-balance health report
    val statsOut = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(statsOut)) {
      Cli.run(spark, Seq("index-info", "--index", s"$base/idx", "--stats", "true"))
    }
    assert(statsOut.toString.contains("health: layout=ivfpq") &&
      statsOut.toString.contains("imbalance="))
    val exactInfo = info(s"$base/didx")
    assert(exactInfo.contains("layout=exact") && exactInfo.contains("rows: 2"))

    // a torn near-index commit (bands appended, crash before sigs):
    // index-info reports the partial state instead of throwing
    Seq((1L, 0, 42L)).toDF("doc_id", "band", "band_hash")
      .write.parquet(s"$base/torn/bands")
    val tornInfo = info(s"$base/torn")
    assert(tornInfo.contains("layout=near") &&
      tornInfo.contains("rows: unknown (sigs missing"))
  }

  test("text-index CLI lifecycle: build, bm25/bool search, incremental add, compact, info") {
    val base = Files.createTempDirectory("graft_cli_text").toString
    Seq((1L, "spark vector stream"), (2L, "spark pad pad"), (3L, "vector pad"))
      .toDF("doc_id", "text").write.parquet(s"$base/docs")
    Cli.run(spark, Seq("index-build", "--kind", "text",
      "--corpus", s"$base/docs", "--index", s"$base/idx", "--id", "doc_id"))

    Cli.run(spark, Seq("text-search", "--index", s"$base/idx",
      "--tokens", "spark,vector,stream", "--out", s"$base/ranked"))
    val ranked = spark.read.parquet(s"$base/ranked")
    // CLI search ≡ the library call on the same index
    val lib = graft.operators.TextIndex.bm25(spark, s"$base/idx",
      Seq("spark", "vector", "stream"))
    assert(ranked.exceptAll(lib).isEmpty && lib.exceptAll(ranked).isEmpty)

    Cli.run(spark, Seq("text-search", "--index", s"$base/idx",
      "--tokens", "spark,vector", "--mode", "bool", "--min-match", "2",
      "--out", s"$base/bool"))
    assert(spark.read.parquet(s"$base/bool").select("doc_id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L))

    // incremental add through the CLI; replay is a no-op
    Seq((4L, "stream stream pad")).toDF("doc_id", "text")
      .write.parquet(s"$base/b1")
    Cli.run(spark, Seq("index-build", "--kind", "text", "--batch", "b1",
      "--corpus", s"$base/b1", "--index", s"$base/idx", "--id", "doc_id"))
    val (n, _) = graft.operators.TextIndex.stats(spark, s"$base/idx")
    assert(n === 4L)
    Cli.run(spark, Seq("index-build", "--kind", "text", "--batch", "b1",
      "--corpus", s"$base/b1", "--index", s"$base/idx", "--id", "doc_id"))
    assert(graft.operators.TextIndex.stats(spark, s"$base/idx")._1 === 4L)

    // compact-index auto-detects the text layout; queries unchanged
    val before = graft.operators.TextIndex.bm25(spark, s"$base/idx",
      Seq("spark", "stream")).collect().toSeq
    Cli.run(spark, Seq("compact-index", "--index", s"$base/idx"))
    assert(graft.operators.TextIndex.bm25(spark, s"$base/idx",
      Seq("spark", "stream")).collect().toSeq === before)

    Cli.run(spark, Seq("index-info", "--index", s"$base/idx"))

    // --stats true appends the posting-balance health report
    val statsOut = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(statsOut)) {
      Cli.run(spark, Seq("index-info", "--index", s"$base/idx", "--stats", "true"))
    }
    assert(statsOut.toString.contains("health: layout=text") &&
      statsOut.toString.contains("imbalance="))
  }

  test("compact --value with a comma list compacts on the full attribute set") {
    import graft.operators.AttributeStoreWriter
    val base = Files.createTempDirectory("graft_cli_compact").toString
    val hist = s"$base/history"
    AttributeStoreWriter.append(spark, hist, Seq(
        (1L, "2024-01-01 08:00:00", 1L, "free", "gold"),
        (1L, "2024-01-02 08:00:00", 2L, "free", "gold"),   // full repeat → drop
        (1L, "2024-01-03 08:00:00", 3L, "free", "silver")) // tier changed → keep
      .toDF("entity_id", "ts", "event_id", "status", "tier")
      .withColumn("ts", col("ts").cast("timestamp")))
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      Cli.run(spark, Seq("compact", "--history", hist, "--value", "status,tier"))
    }
    assert(out.toString.contains("dropped=1"))
    assert(AttributeStoreWriter.readHistory(spark, hist).count() === 2)
  }

  test("harvest-stream --once drains the directory; a rerun reprocesses nothing") {
    val src = Files.createTempDirectory("graft_cli_hs_src").toString
    val base = Files.createTempDirectory("graft_cli_hs").toString
    Files.writeString(Path.of(src, "a.csv"),
      "dn,timestamp,v\n\"Cell=1\",2024-01-01 10:00:00,1.0\n\"Cell=2\",2024-01-01 10:03:00,2.0\n")
    val args = Seq("harvest-stream",
      "--source", src, "--format", "csv",
      "--dn-col", "dn", "--entity-component", "Cell",
      "--ts-col", "timestamp", "--ts-format", "yyyy-MM-dd HH:mm:ss",
      "--granularity", "15m",
      "--store", s"$base/store", "--state", s"$base/state",
      "--checkpoint", s"$base/ckpt", "--once", "true")
    Cli.run(spark, args)
    assert(TrendStoreWriter.read(spark, s"$base/store").count() === 2)
    // second invocation with the same checkpoint: a new file lands,
    // the old one is NOT re-read (checkpointed file log)
    Files.writeString(Path.of(src, "b.csv"),
      "dn,timestamp,v\n\"Cell=1\",2024-01-02 11:30:00,4.0\n")
    Cli.run(spark, args)
    val store = TrendStoreWriter.read(spark, s"$base/store")
    assert(store.count() === 3)
    assert(store.agg(org.apache.spark.sql.functions.sum("v")).head.getDouble(0) === 7.0)
  }

  test("dedup-incremental command runs both index kinds end-to-end") {
    val base = Files.createTempDirectory("graft_cli_dinc").toString
    Seq((1L, "alpha text here"), (2L, "beta text here"), (3L, "alpha text here"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$base/b1")
    Cli.run(spark, Seq("dedup-incremental", "--docs", s"$base/b1",
      "--index", s"$base/eidx", "--out", s"$base/eout", "--method", "exact"))
    assert(spark.read.parquet(s"$base/eout").count() === 2)
    Cli.run(spark, Seq("dedup-incremental", "--docs", s"$base/b1",
      "--index", s"$base/nidx", "--out", s"$base/nout", "--method", "near"))
    // 3-shingle LSH at 0.7: doc 3 is an exact copy of doc 1 → drops
    assert(spark.read.parquet(s"$base/nout").count() === 2)
  }

  test("dedup and decontaminate commands run the curation jobs") {
    val base = Files.createTempDirectory("graft_cli_dedup").toString
    Seq((1L, "shared sentence. alpha beta gamma"),
      (2L, "shared sentence. delta epsilon zeta"),
      (3L, "unrelated words only here"))
      .toDF("doc_id", "text").write.parquet(s"$base/docs")
    Seq((100L, "alpha beta gamma")).toDF("doc_id", "text")
      .write.parquet(s"$base/bench")

    Cli.run(spark, Seq("dedup",
      "--docs", s"$base/docs", "--method", "paragraph", "--out", s"$base/paras"))
    val paras = spark.read.parquet(s"$base/paras")
    // doc 2's "shared sentence" loses to doc 1's instance
    assert(paras.filter(col("doc_id") === 2L).head.getAs[Long]("n_removed") === 1L)

    Cli.run(spark, Seq("decontaminate",
      "--docs", s"$base/docs", "--bench", s"$base/bench",
      "--out", s"$base/contam"))
    val contam = spark.read.parquet(s"$base/contam")
    // doc 1 contains the benchmark's only shingle
    assert(contam.filter(col("doc_id") === 1L).head.getAs[Long]("n_overlap") === 1L)

    intercept[IllegalArgumentException] {
      Cli.run(spark, Seq("dedup", "--docs", s"$base/docs",
        "--method", "bogus", "--out", s"$base/x"))
    }
  }

  test("span-scrub commands: one-shot dedup --method span + incremental with a batch tag") {
    val base = Files.createTempDirectory("graft_cli_span").toString
    Seq((1L, "p q r s x1 x2"), (2L, "p q r s y1 y2"))
      .toDF("doc_id", "text").write.parquet(s"$base/b1")
    // one-shot: cleaned corpus written, non-keeper loses the span
    Cli.run(spark, Seq("dedup", "--docs", s"$base/b1", "--method", "span",
      "--window", "4", "--stride", "2", "--out", s"$base/clean"))
    val clean = spark.read.parquet(s"$base/clean").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(clean === Map(1L -> "p q r s x1 x2", 2L -> "y1 y2"))
    // incremental: commit batch 1, then a later batch scrubs its spans
    Cli.run(spark, Seq("dedup-incremental", "--docs", s"$base/b1",
      "--method", "span", "--window", "4", "--stride", "2",
      "--index", s"$base/spanidx", "--batch", "b1", "--out", s"$base/out1"))
    Seq((3L, "p q r s z1 z2")).toDF("doc_id", "text").write.parquet(s"$base/b2")
    Cli.run(spark, Seq("dedup-incremental", "--docs", s"$base/b2",
      "--method", "span", "--window", "4", "--stride", "2",
      "--index", s"$base/spanidx", "--batch", "b2", "--out", s"$base/out2"))
    assert(spark.read.parquet(s"$base/out2").head.getString(1) === "z1 z2")
  }

  test("cluster command: store form re-clusters in place; data form z-orders") {
    val base = Files.createTempDirectory("graft_cli_cluster").toString
    val rolled = spark.range(0, 5000).select(
      ((col("id") * 31) % 40).as("entity_id"),
      expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0, CAST(id % 2 AS INT), 0, CAST(id % 60 AS INT), 0)").as("bucket"),
      (col("id") % 7).cast("double").as("value"))
    TrendStoreWriter.write(rolled, s"$base/store")
    val before = TrendStoreWriter.read(spark, s"$base/store")
      .agg(count(lit(1)), sum(col("entity_id")), sum(col("value"))).head()

    Cli.run(spark, Seq("cluster", "--store", s"$base/store", "--by", "entity_id"))
    val after = TrendStoreWriter.read(spark, s"$base/store")
    assert(after.agg(count(lit(1)), sum(col("entity_id")), sum(col("value"))).head() === before)
    // each day partition's single sorted file: entities ascend per file
    val perFile = after.groupBy(input_file_name().as("f"), col("p_date"))
      .agg(min(col("entity_id")).as("mn"), max(col("entity_id")).as("mx"))
      .collect()
    assert(perFile.nonEmpty && perFile.forall(_.get(1) != null))

    // generic form: z-order and round-trip
    Cli.run(spark, Seq("cluster", "--data", s"$base/store", "--by",
      "entity_id,value", "--out", s"$base/z", "--files", "4"))
    assert(spark.read.parquet(s"$base/z").count() === 5000)
  }

  test("explain command prints a formatted plan; unknown keys refuse loudly") {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      Cli.run(spark, Seq("explain", "--key", "q01_pricing_summary",
        "--sf-dir", sf))
    }
    val plan = out.toString
    assert(plan.contains("Physical Plan"))
    assert(plan.contains("PushedFilters"), s"expected scan detail in:\n$plan")
    intercept[IllegalArgumentException] {
      Cli.run(spark, Seq("explain", "--key", "nope", "--sf-dir", sf))
    }
  }

  test("cluster --store holds the single-writer lease; a stale tmp from a dead run is harmless") {
    val base = Files.createTempDirectory("graft_cli_cluster_lease").toString
    val rolled = spark.range(0, 200).select(
      (col("id") % 10).as("entity_id"),
      expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0, CAST(id AS INT), 0)").as("bucket"),
      col("id").cast("double").as("value"))
    TrendStoreWriter.write(rolled, s"$base/store")
    // a competing writer holds the lease → loud refusal, store untouched
    assert(graft.operators.StoreFs.acquireLease(spark, s"$base/store.lease", "other", 600000))
    intercept[graft.operators.Materialize.ConcurrentRunException] {
      Cli.run(spark, Seq("cluster", "--store", s"$base/store", "--by", "entity_id"))
    }
    graft.operators.StoreFs.releaseLease(spark, s"$base/store.lease")
    // a stale tmp dir from a run that died pre-swap is overwritten
    spark.range(0, 1).select(lit(99L).as("junk"))
      .write.parquet(s"$base/store.clustering/p_date=junk")
    Cli.run(spark, Seq("cluster", "--store", s"$base/store", "--by", "entity_id"))
    val after = TrendStoreWriter.read(spark, s"$base/store")
    assert(after.count() === 200)
    assert(after.agg(sum(col("value"))).head.getDouble(0) === (0 until 200).sum.toDouble)
  }

  test("shard command materializes the deterministic shuffle") {
    val base = Files.createTempDirectory("graft_cli_shard").toString
    (0L until 1000L).map(i => (i, s"d$i")).toDF("doc_id", "text")
      .write.parquet(s"$base/docs")
    Cli.run(spark, Seq("shard", "--docs", s"$base/docs",
      "--out", s"$base/shards", "--shards", "4"))
    val back = spark.read.parquet(s"$base/shards")
    assert(back.count() === 1000)
    assert(back.select("shard").distinct().count() === 4)
  }
}
