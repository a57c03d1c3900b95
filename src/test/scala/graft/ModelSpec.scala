package graft

import java.nio.file.Files

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
import graft.operators.{Materialize, TrendStore, TrendStoreWriter}

/** Randomized model-based tests: drive the store machinery with
  * seeded random workloads and compare against a trivial in-memory
  * model — the class of interleavings hand-written cases miss. */
class ModelSpec extends SparkSpec {

  import graft.SparkSpec.spark.implicits._

  private def mk(rows: Seq[(Long, String, Double)]) =
    rows.toDF("entity_id", "bucket", "value")
      .withColumn("bucket", col("bucket").cast("timestamp"))

  test("row-level upsert converges to last-write-wins under random replay") {
    val rnd = new Random(13)
    val path = Files.createTempDirectory("graft_model_upsert").toString + "/store"
    val model = mutable.Map.empty[(Long, String), Double]
    val days = Seq("2024-01-01", "2024-01-02", "2024-01-03")
    for (_ <- 1 to 8) {
      val batch = (1 to rnd.nextInt(10) + 1).map { _ =>
        val key = (rnd.nextInt(3) + 1L,
          s"${days(rnd.nextInt(days.size))} ${"%02d".format(rnd.nextInt(24))}:00:00")
        key -> rnd.nextInt(1000).toDouble
      }.toMap // distinct keys within a batch (upsert's contract)
      batch.foreach { case (k, v) => model(k) = v }
      TrendStoreWriter.upsert(spark, path,
        mk(batch.toSeq.map { case ((e, ts), v) => (e, ts, v) }),
        keyCols = Seq("entity_id", "bucket"))
    }
    val got = TrendStoreWriter.read(spark, path)
      .select(col("entity_id"), date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss"),
        col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got === model.toMap)
  }

  test("incremental materialization equals full recompute under random late arrivals") {
    val rnd = new Random(29)
    val base = Files.createTempDirectory("graft_model_mat").toString
    val (statePath, storePath) = (s"$base/state", s"$base/store")
    val all = mutable.ArrayBuffer.empty[(Long, String, Double)]
    for (round <- 1 to 5) {
      // late data on purpose: any day, any hour, in any round — and
      // sometimes EARLIER in a day than rows already seen, the case a
      // max-timestamp watermark alone would miss
      val fresh = (1 to rnd.nextInt(8) + 2).map { _ =>
        (rnd.nextInt(3) + 1L,
          s"2024-01-0${rnd.nextInt(3) + 1} ${"%02d".format(rnd.nextInt(24))}:${"%02d".format(rnd.nextInt(60))}:00",
          rnd.nextInt(100).toDouble)
      }
      all ++= fresh
      val src = all.toSeq.toDF("entity_id", "ts", "value")
        .withColumn("ts", col("ts").cast("timestamp"))
      Materialize.run(src, col("entity_id"), col("ts"), col("value"),
        "hour", statePath, storePath)
      val got = TrendStoreWriter.read(spark, storePath).drop("p_date")
      val want = TrendStore.rollup(src, col("entity_id"), col("ts"), col("value"), "hour")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"divergence after round $round")
    }
  }

  test("upsert under random schema evolution converges to last-write-wins per column set") {
    val rnd = new Random(47)
    val path = Files.createTempDirectory("graft_model_evolve").toString + "/store"
    // model: key -> (metric name -> value); a batch REPLACES the whole
    // row, so metrics absent from the replacing batch become NULL
    val model = mutable.Map.empty[(Long, String), Map[String, Double]]
    val metricPool = Seq("m1", "m2", "m3", "m4")
    val days = Seq("2024-01-01", "2024-01-02", "2024-01-03")
    var live = 1 // metrics visible so far; grows over time (evolution)
    for (_ <- 1 to 10) {
      live = math.min(metricPool.size, live + (if (rnd.nextBoolean()) 1 else 0))
      // each batch carries a random non-empty subset of the live metrics
      val cols = metricPool.take(live).filter(_ => rnd.nextBoolean()) match {
        case Nil => Seq(metricPool.head)
        case s   => s
      }
      val batch = (1 to rnd.nextInt(8) + 1).map { _ =>
        val key = (rnd.nextInt(3) + 1L,
          s"${days(rnd.nextInt(days.size))} ${"%02d".format(rnd.nextInt(24))}:00:00")
        key -> cols.map(c => c -> rnd.nextInt(1000).toDouble).toMap
      }.toMap
      batch.foreach { case (k, v) => model(k) = v }
      val rows = batch.toSeq.map { case ((e, ts), v) =>
        Row.fromSeq(e +: ts +: cols.map(v))
      }
      val schema = StructType(
        StructField("entity_id", LongType) +: StructField("bucket", StringType) +:
          cols.map(c => StructField(c, DoubleType)))
      val df = spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 2), schema)
        .withColumn("bucket", col("bucket").cast("timestamp"))
      TrendStoreWriter.upsert(spark, path, df)
    }
    val back = TrendStoreWriter.read(spark, path)
    val metricCols = metricPool.filter(back.columns.contains)
    val got = back
      .select(col("entity_id") +: date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss").as("b") +:
        metricCols.map(col): _*)
      .collect().map { r =>
        val vals = metricCols.zipWithIndex.flatMap { case (c, i) =>
          if (r.isNullAt(2 + i)) None else Some(c -> r.getDouble(2 + i))
        }.toMap
        (r.getLong(0), r.getString(1)) -> vals
      }.toMap
    assert(got === model.toMap)
  }

  test("attribute history under random schema evolution converges; current view matches the model") {
    import graft.operators.AttributeStoreWriter
    val rnd = new Random(23)
    val hist = Files.createTempDirectory("graft_model_attr_ev").toString + "/history"
    val curPath = Files.createTempDirectory("graft_model_attr_ev_cur").toString + "/current"
    // model: (entity, ts, eid) -> full attribute row (absent attrs = NULL);
    // append upserts by that key, so a redelivery REPLACES the row
    val model = mutable.Map.empty[(Long, String, Long), Map[String, String]]
    val attrPool = Seq("status", "tier", "region")
    val days = Seq("2024-01-01", "2024-01-02", "2024-01-03")
    var live = 1 // attribute columns visible so far — grows (evolution)
    for (_ <- 1 to 8) {
      live = math.min(attrPool.size, live + (if (rnd.nextBoolean()) 1 else 0))
      val cols = attrPool.take(live).filter(_ => rnd.nextBoolean()) match {
        case Nil => Seq(attrPool.head)
        case s   => s
      }
      val batch = (1 to rnd.nextInt(6) + 1).map { _ =>
        val key = (rnd.nextInt(3) + 1L,
          s"${days(rnd.nextInt(days.size))} ${"%02d".format(rnd.nextInt(24))}:00:00",
          rnd.nextInt(4) + 1L)
        key -> cols.map(c => c -> s"v${rnd.nextInt(3)}").toMap
      }.toMap
      batch.foreach { case (k, v) => model(k) = v }
      val rows = batch.toSeq.map { case ((e, ts, eid), v) =>
        Row.fromSeq(e +: ts +: eid +: cols.map(v))
      }
      val schema = StructType(
        StructField("entity_id", LongType) +: StructField("ts", StringType) +:
          StructField("event_id", LongType) +: cols.map(c => StructField(c, StringType)))
      val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
        .withColumn("ts", col("ts").cast("timestamp"))
      AttributeStoreWriter.append(spark, hist, df)
    }
    // history read = union schema; every model row present with NULLs
    // for attributes its writing batch did not carry
    val back = AttributeStoreWriter.readHistory(spark, hist).drop("p_date")
    val attrCols = attrPool.filter(back.columns.contains)
    val got = back.select(Seq(col("entity_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("t"), col("event_id")) ++
        attrCols.map(col): _*)
      .collect().map { r =>
        val vals = attrCols.zipWithIndex.flatMap { case (c, i) =>
          if (r.isNullAt(3 + i)) None else Some(c -> r.getString(3 + i))
        }.toMap
        (r.getLong(0), r.getString(1), r.getLong(2)) -> vals
      }.toMap
    assert(got === model.toMap)
    // current view = the model's latest (ts, eid) row per entity
    val cur = AttributeStoreWriter.materializeCurrent(spark, hist, curPath)
    val wantCur = model.groupBy(_._1._1).map { case (e, rows) =>
      val ((_, _, _), v) = rows.maxBy { case ((_, ts, eid), _) => (ts, eid) }
      e -> v
    }
    val gotCur = cur.select(col("entity_id") +: attrCols.map(col): _*)
      .collect().map { r =>
        val vals = attrCols.zipWithIndex.flatMap { case (c, i) =>
          if (r.isNullAt(1 + i)) None else Some(c -> r.getString(1 + i))
        }.toMap
        r.getLong(0) -> vals
      }.toMap
    assert(gotCur === wantCur)
  }

  test("evolved attribute history round-trips compact/current/diff across the evolution boundary") {
    import graft.operators.{AttributeStore, AttributeStoreWriter}
    val hist = Files.createTempDirectory("graft_attr_ev_rt").toString + "/history"
    val curPath = Files.createTempDirectory("graft_attr_ev_rt_cur").toString + "/current"
    def mkAttrs(rows: Seq[(Long, String, Long, String)]) =
      rows.toDF("entity_id", "ts", "event_id", "status")
        .withColumn("ts", col("ts").cast("timestamp"))
    // pre-evolution: status only
    AttributeStoreWriter.append(spark, hist, mkAttrs(Seq(
      (1L, "2024-01-01 08:00:00", 1L, "free"),
      (2L, "2024-01-01 08:00:00", 1L, "paid"))))
    AttributeStoreWriter.append(spark, hist, mkAttrs(Seq(
      (1L, "2024-01-02 08:00:00", 2L, "free"),   // repeat
      (2L, "2024-01-02 08:00:00", 2L, "free")))) // change
    // evolution: the tier attribute appears mid-history
    AttributeStoreWriter.append(spark, hist, Seq(
        (1L, "2024-01-03 08:00:00", 3L, "free", "gold"),
        (2L, "2024-01-03 08:00:00", 3L, "free", "silver"))
      .toDF("entity_id", "ts", "event_id", "status", "tier")
      .withColumn("ts", col("ts").cast("timestamp")))

    // read: union schema, pre-evolution rows carry NULL tier
    val back = AttributeStoreWriter.readHistory(spark, hist)
    assert(back.count() === 6)
    assert(back.filter(col("ts") < "2024-01-03").filter(col("tier").isNotNull).isEmpty)

    // current view sees the evolved schema
    val cur = AttributeStoreWriter.materializeCurrent(spark, hist, curPath)
      .select("entity_id", "status", "tier")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(cur === Set((1L, "free", "gold"), (2L, "free", "silver")))

    // diff across the boundary: tier NULL → value is a CHANGE
    // (null-safe), for both entities
    val d = AttributeStore.diff(
        spark.read.option("mergeSchema", "true").parquet(hist),
        col("entity_id"), col("ts"), col("event_id"), col("tier"),
        lit("2024-01-01 23:59:59").cast("timestamp"),
        lit("2024-01-03 23:59:59").cast("timestamp"))
      .collect().map(r => (r.getAs[Long]("entity_id"), r.getAs[String]("change"))).toSet
    assert(d === Set((1L, "changed"), (2L, "changed")))

    // evolution-aware compaction: only entity 1's day-2 row repeats
    // the FULL (status, tier) set; entity 2's day-3 row survives even
    // though status repeats (its tier changed NULL → silver)
    val (dropped, daysRewritten) = AttributeStoreWriter.compactHistoryAll(
      spark, hist, Seq("status", "tier"))
    assert(dropped === 1L && daysRewritten.map(_.toString) === Seq("2024-01-02"))
    val after = AttributeStoreWriter.readHistory(spark, hist)
    assert(after.count() === 5)
    assert(after.filter(col("entity_id") === 1 && col("ts").cast("string")
      .startsWith("2024-01-02")).isEmpty)
    // compaction preserved the evolved column everywhere it existed
    assert(after.filter(col("tier").isNotNull).count() === 2)
    // and the current view is unchanged by compaction
    val cur2 = AttributeStoreWriter.materializeCurrent(spark, hist, curPath)
      .select("entity_id", "status", "tier")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(cur2 === cur)
  }
}
