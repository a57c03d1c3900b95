package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{EntityRegistry, TrendStore, TrendStoreWriter}
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

  test("CSV harvest yields a canonical data package with stable entity ids") {
    val dir = Files.createTempDirectory("graft_csv").toString
    Files.writeString(java.nio.file.Path.of(dir, "batch.csv"),
      """dn,timestamp,pw_in,pw_out
        |"Network=NL,Site=A,Cell=1",2024-01-01 10:00:00,5.5,1.25
        |"Network=NL,Site=A,Cell=2",2024-01-01 10:00:00,3.0,0.5
        |""".stripMargin)
    val pkg = Harvest.csv(spark, s"$dir/batch.csv", "dn", "Cell",
      "timestamp", "yyyy-MM-dd HH:mm:ss", "15m")
    assert(pkg.metricColumns.sorted === Seq("pw_in", "pw_out"))
    val rows = pkg.df.orderBy("entity_name").collect()
    assert(rows.length === 2)
    val r0 = rows(0)
    assert(r0.getAs[String]("entity_name") === "1")
    assert(r0.getAs[String]("entity_dn") === "Network=NL,Site=A,Cell=1")
    assert(r0.getAs[Double]("pw_in") === 5.5)
    // re-harvest yields the identical stable id for the same dn
    val again = Harvest.csv(spark, s"$dir/batch.csv", "dn", "Cell",
      "timestamp", "yyyy-MM-dd HH:mm:ss", "15m")
    assert(again.df.orderBy("entity_name").collect().map(_.getAs[Long]("entity_id")).toSeq ===
      rows.map(_.getAs[Long]("entity_id")).toSeq)
  }

  test("XML harvest yields the same package as CSV for the same data") {
    val dir = Files.createTempDirectory("graft_xml").toString
    Files.writeString(java.nio.file.Path.of(dir, "batch.xml"),
      """<mvs>
        |  <mv><dn>Network=NL,Site=A,Cell=1</dn><timestamp>2024-01-01 10:00:00</timestamp><pw_in>5.5</pw_in></mv>
        |  <mv><dn>Network=NL,Site=A,Cell=2</dn><timestamp>2024-01-01 10:00:00</timestamp><pw_in>3.0</pw_in></mv>
        |</mvs>
        |""".stripMargin)
    val pkg = Harvest.xml(spark, s"$dir/batch.xml", "mv", "dn", "Cell",
      "timestamp", "yyyy-MM-dd HH:mm:ss", "15m")
    assert(pkg.metricColumns === Seq("pw_in"))
    val rows = pkg.df.orderBy("entity_name").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[String]("entity_name") === "1")
    assert(rows(0).getAs[Double]("pw_in") === 5.5)
    assert(rows(0).getAs[java.sql.Timestamp]("ts").toString.startsWith("2024-01-01 10:00"))
  }

  test("entity registry: idempotent registration, alias resolution") {
    import graft.SparkSpec.spark.implicits._
    val src = Seq(("Cell=1", "cell", "alpha"), ("Cell=2", "cell", "beta"),
      ("Cell=1", "cell", "alpha")).toDF("dn", "t", "a")
    val reg = EntityRegistry.register(src, col("dn"), col("t"), col("a"))
    assert(reg.count() === 2)
    val ids = reg.orderBy("dn").collect().map(_.getAs[Long]("entity_id"))
    assert(ids.distinct.length === 2)
    // registering again yields the same ids (no sequence state)
    val reg2 = EntityRegistry.register(src, col("dn"), col("t"), col("a"))
    assert(reg2.orderBy("dn").collect().map(_.getAs[Long]("entity_id")).toSeq === ids.toSeq)
    // resolve by dn or alias
    val names = Seq("Cell=1", "beta", "nope").toDF("name")
    val res = EntityRegistry.resolve(names, "name", reg).orderBy("name")
      .select(col("name"), col("entity_id")).collect()
    assert(res.length === 3)
    assert(res.map(r => (r.getString(0), Option(r.get(1)))).toMap ===
      Map("Cell=1" -> Some(ids(0)), "beta" -> Some(ids(1)), "nope" -> None))
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

  test("row-level upsert: idempotent replay, single-row correction") {
    import graft.SparkSpec.spark.implicits._
    val path = Files.createTempDirectory("graft_upsert").toString
    def mk(rows: Seq[(Long, String, Double)]) =
      rows.toDF("entity_id", "bucket", "sum_value")
        .withColumn("bucket", col("bucket").cast("timestamp"))
    val batch = Seq((1L, "2024-01-01 10:00:00", 5.0), (2L, "2024-01-01 11:00:00", 7.0),
      (1L, "2024-01-02 10:00:00", 9.0))
    TrendStoreWriter.upsert(spark, path, mk(batch))
    assert(TrendStoreWriter.read(spark, path).count() === 3)
    // replaying the same package is idempotent (Minerva upsert semantics)
    TrendStoreWriter.upsert(spark, path, mk(batch))
    assert(TrendStoreWriter.read(spark, path).count() === 3)
    // a correction replaces ONE row; the other row of that day survives
    TrendStoreWriter.upsert(spark, path, mk(Seq((1L, "2024-01-01 10:00:00", 50.0))))
    val day1 = TrendStoreWriter.read(spark, path, to = Some("2024-01-01"))
    assert(day1.count() === 2)
    assert(day1.filter(col("entity_id") === 1L).head.getAs[Double]("sum_value") === 50.0)
    assert(day1.filter(col("entity_id") === 2L).head.getAs[Double]("sum_value") === 7.0)
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
      pkg.df, col("entity_name"), col("ts"), col("v"), "hour"))
    val store = Files.createTempDirectory("graft_rt_store").toString
    TrendStoreWriter.write(
      rolled.withColumn("bucket", col("bucket").cast("timestamp")), store)
    val back = TrendStoreWriter.read(spark, store)
    assert(back.count() === 2)
    assert(back.filter(col("entity_id") === "1").head.getAs[Double]("sum_value") === 3.0)
  }
}
