package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.TrendStoreParts

class TrendStorePartsSpec extends SparkSpec {

  import graft.SparkSpec.spark.implicits._

  private def wide() =
    Seq(
      (1L, "2024-01-01 10:00:00", 1.0, 10.0, 100.0),
      (2L, "2024-01-01 11:00:00", 2.0, 20.0, 200.0),
      (1L, "2024-01-02 10:00:00", 3.0, 30.0, 300.0))
      .toDF("entity_id", "bucket", "radio_a", "radio_b", "core_x")
      .withColumn("bucket", col("bucket").cast("timestamp"))

  test("wide store round-trips through column-group parts") {
    val base = Files.createTempDirectory("graft_parts").toString
    TrendStoreParts.write(wide(), base,
      Map("radio" -> Seq("radio_a", "radio_b"), "core" -> Seq("core_x")))
    val back = TrendStoreParts.read(spark, base, Seq("radio", "core"))
    assert(back.count() === 3)
    assert(back.columns.sorted ===
      Array("bucket", "core_x", "entity_id", "radio_a", "radio_b"))
    val r = back.filter(col("entity_id") === 2L).head
    assert(r.getAs[Double]("radio_b") === 20.0 && r.getAs[Double]("core_x") === 200.0)
    // date-range read prunes every part identically
    assert(TrendStoreParts.read(spark, base, Seq("radio", "core"),
      from = Some("2024-01-02")).count() === 1)
  }

  test("readWide ≡ join-chain read, with exactly one exchange") {
    val base = Files.createTempDirectory("graft_parts_wide").toString
    TrendStoreParts.write(wide(), base,
      Map("radio" -> Seq("radio_a", "radio_b"), "core" -> Seq("core_x")))
    // a key present in one part only (the outer-join gap case)
    val extra = Seq((9L, "2024-01-01 12:00:00", 7.0, 8.0))
      .toDF("entity_id", "bucket", "radio_a", "radio_b")
      .withColumn("bucket", col("bucket").cast("timestamp"))
    TrendStoreParts.upsertPart(spark, base, "radio", extra)

    val parts = Seq("radio", "core")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("entity_id"), col("bucket").cast("string"),
        col("radio_a"), col("radio_b"), col("core_x"))
      .collect().map(_.toSeq).toSet
    val viaJoin = canon(TrendStoreParts.read(spark, base, parts))
    val viaUnion = canon(TrendStoreParts.readWide(spark, base, parts))
    assert(viaUnion === viaJoin)
    assert(viaUnion.size === 4)

    // plan shape: the union+collapse pays ONE exchange regardless of
    // part count; the join chain pays one per part.
    val nEx = TrendStoreParts.readWide(spark, base, parts)
      .queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    assert(nEx === 1, s"expected a single exchange, saw $nEx")
    // range pruning still applies to every part
    assert(TrendStoreParts.readWide(spark, base, parts,
      from = Some("2024-01-02")).count() === 1)
  }

  // The integration VERDICT item 3 asked for: a PERSISTED multi-part
  // wide store feeds the wide-metric operators (gap fill, rates,
  // anomalies) directly — no per-metric melt between the store read
  // and the analytics.
  test("readWide feeds the wide gap-fill / rate / anomaly operators directly") {
    import graft.operators.TrendStore
    val base = Files.createTempDirectory("graft_parts_ops").toString
    // hourly series with a hole at 11:00 for radio_a only (radio_b
    // observed) and a full-row hole at 12:00
    val w = Seq(
      (1L, "2024-01-01 10:00:00", Some(10.0), Some(100.0), Some(1.0)),
      (1L, "2024-01-01 11:00:00", None,       Some(130.0), Some(2.0)),
      (1L, "2024-01-01 13:00:00", Some(40.0), Some(160.0), Some(3.0)))
      .toDF("entity_id", "bucket", "radio_a", "radio_b", "core_x")
      .withColumn("bucket", col("bucket").cast("timestamp"))
    TrendStoreParts.write(w, base,
      Map("radio" -> Seq("radio_a", "radio_b"), "core" -> Seq("core_x")))
    val store = TrendStoreParts.readWide(spark, base, Seq("radio", "core"))
    val filled = TrendStore.gapFill(store, "hour", Seq("radio_a", "radio_b", "core_x"))
      .orderBy(col("bucket")).collect()
    assert(filled.length === 4, "10..13 inclusive on the hourly grid")
    assert(filled.map(_.getAs[Boolean]("filled")).toSeq ===
      Seq(false, false, true, false))
    assert(filled(1).getAs[Double]("radio_a") === 10.0) // per-metric ffill
    assert(filled(2).getAs[Double]("radio_b") === 130.0)
    val rates = TrendStore.counterRate(store, Seq("radio_b"))
      .orderBy(col("bucket")).collect()
    assert(rates(1).getAs[Double]("radio_b_delta") === 30.0)
    assert(rates(1).getAs[Double]("radio_b_rate_per_s") === 30.0 / 3600.0)
    // anomaliesWide over the decimal-cast store runs end-to-end
    val dec = store.select(col("entity_id"), col("bucket"),
      col("radio_a").cast("decimal(18,4)").as("radio_a"),
      col("radio_b").cast("decimal(18,4)").as("radio_b"))
    val an = TrendStore.anomaliesWide(dec, Seq("radio_a", "radio_b"),
      minBuckets = 2, zMin = 0.1)
    assert(an.collect().forall(r => Set("radio_a", "radio_b")(r.getString(2))))
  }

  test("upserting one part leaves the others untouched; outer join fills gaps") {
    val base = Files.createTempDirectory("graft_parts_up").toString
    TrendStoreParts.write(wide(), base,
      Map("radio" -> Seq("radio_a", "radio_b"), "core" -> Seq("core_x")))
    // correction lands in the radio part only
    val fix = Seq((1L, "2024-01-01 10:00:00", 42.0, 10.0))
      .toDF("entity_id", "bucket", "radio_a", "radio_b")
      .withColumn("bucket", col("bucket").cast("timestamp"))
    TrendStoreParts.upsertPart(spark, base, "radio", fix)
    val back = TrendStoreParts.read(spark, base, Seq("radio", "core"))
    val r = back.filter(col("entity_id") === 1L &&
      col("bucket") === lit("2024-01-01 10:00:00").cast("timestamp")).head
    assert(r.getAs[Double]("radio_a") === 42.0)
    assert(r.getAs[Double]("core_x") === 100.0)
    // a key present in one part only still appears in the wide view
    val extra = Seq((9L, "2024-01-01 12:00:00", 7.0, 8.0))
      .toDF("entity_id", "bucket", "radio_a", "radio_b")
      .withColumn("bucket", col("bucket").cast("timestamp"))
    TrendStoreParts.upsertPart(spark, base, "radio", extra)
    val w = TrendStoreParts.read(spark, base, Seq("radio", "core"))
      .filter(col("entity_id") === 9L).head
    assert(w.getAs[Double]("radio_a") === 7.0)
    assert(w.isNullAt(w.fieldIndex("core_x")))
  }

  test("schema evolution flows through readWide: part gains a metric mid-history") {
    val base = Files.createTempDirectory("graft_parts_evolve").toString
    TrendStoreParts.write(wide(), base,
      Map("radio" -> Seq("radio_a", "radio_b"), "core" -> Seq("core_x")))
    // the radio part gains a metric on a new day
    val evolved = Seq((2L, "2024-01-03 10:00:00", 4.0, 40.0, 7.0))
      .toDF("entity_id", "bucket", "radio_a", "radio_b", "radio_c")
      .withColumn("bucket", col("bucket").cast("timestamp"))
    TrendStoreParts.upsertPart(spark, base, "radio", evolved)
    for (reader <- Seq(TrendStoreParts.read _, TrendStoreParts.readWide _)) {
      val w = reader(spark, base, Seq("radio", "core"),
        Seq("entity_id", "bucket"), None, None)
      assert(w.columns.contains("radio_c"))
      assert(w.count() === 4)
      val nw = w.filter(col("entity_id") === 2L && to_date(col("bucket")) === lit("2024-01-03")).head
      assert(nw.getAs[Double]("radio_c") === 7.0)
      val old = w.filter(col("entity_id") === 1L && to_date(col("bucket")) === lit("2024-01-01")).head
      assert(old.isNullAt(old.fieldIndex("radio_c")))
      assert(old.getAs[Double]("core_x") === 100.0)
    }
  }

  test("schema evolution: a metric added mid-history reads as NULL for old days") {
    import graft.operators.TrendStoreWriter
    val path = Files.createTempDirectory("graft_evolve").toString + "/store"
    val v1 = Seq((1L, "2024-01-01 10:00:00", 1.0), (2L, "2024-01-02 10:00:00", 2.0))
      .toDF("entity_id", "bucket", "pw_in")
      .withColumn("bucket", col("bucket").cast("timestamp"))
    TrendStoreWriter.write(v1, path)

    // the alter: a new metric appears in a later harvest, touching only day 3
    val v2 = Seq((1L, "2024-01-03 10:00:00", 3.0, 30.0))
      .toDF("entity_id", "bucket", "pw_in", "pw_out")
      .withColumn("bucket", col("bucket").cast("timestamp"))
    TrendStoreWriter.upsert(spark, path, v2)

    val back = TrendStoreWriter.read(spark, path)
    assert(back.columns.sorted === Array("bucket", "entity_id", "p_date", "pw_in", "pw_out"))
    // pre-evolution days surface the new metric as NULL
    val old = back.filter(col("entity_id") === 1L && to_date(col("bucket")) === lit("2024-01-01")).head
    assert(old.getAs[Double]("pw_in") === 1.0 && old.isNullAt(old.fieldIndex("pw_out")))
    val nw = back.filter(col("entity_id") === 1L && to_date(col("bucket")) === lit("2024-01-03")).head
    assert(nw.getAs[Double]("pw_out") === 30.0)

    // upsert INTO an evolved day with the old (narrower) schema:
    // replaced row keeps NULL for the metric the batch doesn't carry
    val narrow = Seq((1L, "2024-01-03 10:00:00", 9.0))
      .toDF("entity_id", "bucket", "pw_in")
      .withColumn("bucket", col("bucket").cast("timestamp"))
    TrendStoreWriter.upsert(spark, path, narrow)
    val re = TrendStoreWriter.read(spark, path)
      .filter(col("entity_id") === 1L && to_date(col("bucket")) === lit("2024-01-03")).head
    assert(re.getAs[Double]("pw_in") === 9.0 && re.isNullAt(re.fieldIndex("pw_out")))

    // and an upsert touching a PRE-evolution day keeps that day readable
    // alongside the evolved one (mixed on-disk schemas merge)
    val day1fix = Seq((2L, "2024-01-01 11:00:00", 5.0))
      .toDF("entity_id", "bucket", "pw_in")
      .withColumn("bucket", col("bucket").cast("timestamp"))
    TrendStoreWriter.upsert(spark, path, day1fix)
    // day1: (1L original + 2L fix), day2: 2L, day3: 1L — 4 rows
    val all = TrendStoreWriter.read(spark, path)
    assert(all.count() === 4)
    val fixed = all.filter(col("entity_id") === 2L && to_date(col("bucket")) === lit("2024-01-01")).head
    assert(fixed.getAs[Double]("pw_in") === 5.0 && fixed.isNullAt(fixed.fieldIndex("pw_out")))
  }
}
