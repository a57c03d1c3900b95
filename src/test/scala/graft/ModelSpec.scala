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
}
