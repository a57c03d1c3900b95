package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{TrendStore, TrendStoreWriter}
import graft.sources.Harvest

class HarvestSpec extends SparkSpec {

  test("dn parsing extracts components") {
    import graft.SparkSpec.spark.implicits._
    val df = Seq("Network=NL,Site=A01,Cell=25", "Cell=7", "Site=B")
      .toDF("dn")
      .select(Harvest.dnPart(col("dn"), "Cell").as("cell"),
        Harvest.dnPart(col("dn"), "Site").as("site"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows(0) === ("25", "A01"))
    assert(rows(1) === ("7", ""))
    assert(rows(2) === ("", "B"))
  }

  test("CSV harvest yields a canonical data package") {
    val dir = Files.createTempDirectory("graft_csv").toString
    Files.writeString(java.nio.file.Path.of(dir, "batch.csv"),
      """dn,timestamp,pw_in,pw_out
        |"Network=NL,Site=A,Cell=1",2024-01-01 10:00:00,5.5,1.25
        |"Network=NL,Site=A,Cell=2",2024-01-01 10:00:00,3.0,0.5
        |""".stripMargin)
    val pkg = Harvest.csv(spark, s"$dir/batch.csv", "dn", "Cell",
      "timestamp", "yyyy-MM-dd HH:mm:ss", "15m")
    assert(pkg.metricColumns.sorted === Seq("pw_in", "pw_out"))
    val rows = pkg.df.orderBy("entity_id").collect()
    assert(rows.length === 2)
    assert(rows(0).getString(0) === "1" && rows(0).getDouble(2) === 5.5)
  }

  test("trend store writer: partition upsert rewrites only dirty days") {
    import graft.SparkSpec.spark.implicits._
    val path = Files.createTempDirectory("graft_store").toString
    val day1 = Seq((1L, "2024-01-01 10:00:00", 5.0), (2L, "2024-01-01 11:00:00", 7.0))
    val day2 = Seq((1L, "2024-01-02 10:00:00", 9.0))
    def mk(rows: Seq[(Long, String, Double)]) =
      rows.toDF("entity_id", "bucket", "sum_value")
        .withColumn("bucket", col("bucket").cast("timestamp"))
    TrendStoreWriter.write(mk(day1 ++ day2), path)
    assert(TrendStoreWriter.read(spark, path).count() === 3)
    // upsert day2 with corrected data; day1 untouched
    TrendStoreWriter.write(mk(Seq((1L, "2024-01-02 10:00:00", 42.0))), path)
    val all = TrendStoreWriter.read(spark, path)
    assert(all.count() === 3)
    assert(all.filter(col("sum_value") === 42.0).count() === 1)
    // date-range read prunes
    assert(TrendStoreWriter.read(spark, path, from = Some("2024-01-02")).count() === 1)
  }

  test("harvest -> rollup -> store round trip") {
    val dir = Files.createTempDirectory("graft_rt").toString
    Files.writeString(java.nio.file.Path.of(dir, "b.csv"),
      """dn,timestamp,v
        |Cell=1,2024-01-01 10:05:00,1.0
        |Cell=1,2024-01-01 10:20:00,2.0
        |Cell=2,2024-01-01 10:10:00,5.0
        |""".stripMargin)
    val pkg = Harvest.csv(spark, s"$dir/b.csv", "dn", "Cell",
      "timestamp", "yyyy-MM-dd HH:mm:ss", "1h")
    val rolled = TrendStore.present(TrendStore.rollup(
      pkg.df, col("entity_id"), col("ts"), col("v"), "hour"))
    val store = Files.createTempDirectory("graft_rt_store").toString
    TrendStoreWriter.write(
      rolled.withColumn("bucket", col("bucket").cast("timestamp")), store)
    val back = TrendStoreWriter.read(spark, store)
    assert(back.count() === 2)
    assert(back.filter(col("entity_id") === "1").head.getAs[Double]("sum_value") === 3.0)
  }
}
