package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import graft.operators.TrendStoreWriter
import graft.sources.HarvestJob

class HarvestJobSpec extends SparkSpec {

  private def writeCsv(dir: String, name: String, rows: Seq[String]): String = {
    val p = Path.of(dir, name)
    Files.writeString(p, ("dn,timestamp,v" +: rows).mkString("", "\n", "\n"))
    p.toString
  }

  test("job loads new files only, state survives across runs") {
    val src = Files.createTempDirectory("graft_job_src").toString
    val base = Files.createTempDirectory("graft_job").toString
    val job = HarvestJob.Job(
      sourceDir = src, format = "csv",
      dnCol = "dn", entityComponent = "Cell",
      tsCol = "timestamp", tsFormat = "yyyy-MM-dd HH:mm:ss",
      granularity = "15m",
      storePath = s"$base/store", statePath = s"$base/state",
      pattern = ".*\\.csv")

    writeCsv(src, "a.csv", Seq(
      "Cell=1,2024-01-01 10:00:00,1.0",
      "Cell=2,2024-01-01 10:00:00,2.0"))
    writeCsv(src, "b.csv", Seq(
      "Cell=1,2024-01-02 10:00:00,3.0"))
    writeCsv(src, "ignore.txt", Seq("Cell=9,2024-01-01 10:00:00,9.0"))

    val r1 = HarvestJob.run(spark, job)
    assert(r1.processed.map(f => f.substring(f.lastIndexOf('/') + 1)).sorted ===
      Seq("a.csv", "b.csv"))
    assert(TrendStoreWriter.read(spark, job.storePath).count() === 3)

    // no new files: nothing processed, nothing re-read
    val r2 = HarvestJob.run(spark, job)
    assert(r2.processed.isEmpty)
    assert(r2.skipped.size === 2)

    // one new file: ONLY it is processed; earlier rows survive
    writeCsv(src, "c.csv", Seq(
      "Cell=2,2024-01-03 10:00:00,4.0",
      "badrow,not-a-timestamp,5.0")) // quarantined, not fatal
    val r3 = HarvestJob.run(spark, job)
    assert(r3.processed.map(f => f.substring(f.lastIndexOf('/') + 1)) === Seq("c.csv"))
    val store = TrendStoreWriter.read(spark, job.storePath)
    assert(store.count() === 4)
    assert(store.agg(sum("v")).head.getDouble(0) === 10.0)

    // re-delivering a corrected file under a new name upserts the row
    writeCsv(src, "d.csv", Seq("Cell=1,2024-01-01 10:00:00,100.0"))
    HarvestJob.run(spark, job)
    val after = TrendStoreWriter.read(spark, job.storePath)
    assert(after.count() === 4)
    assert(after.agg(sum("v")).head.getDouble(0) === 109.0)
  }

  test("jsonlines plugin: same canonical package path as csv") {
    val src = Files.createTempDirectory("graft_job_jsonl").toString
    val base = Files.createTempDirectory("graft_job_jsonl_store").toString
    Files.writeString(Path.of(src, "b1.jsonl"),
      """{"dn": "Cell=7", "timestamp": "2024-02-01 09:00:00", "v": 2.5}
        |{"dn": "Cell=8", "timestamp": "2024-02-01 09:15:00", "v": 4.5}
        |""".stripMargin)
    val job = HarvestJob.Job(
      sourceDir = src, format = "jsonlines",
      dnCol = "dn", entityComponent = "Cell",
      tsCol = "timestamp", tsFormat = "yyyy-MM-dd HH:mm:ss",
      granularity = "15m",
      storePath = s"$base/store", statePath = s"$base/state",
      pattern = ".*\\.jsonl")
    val r = HarvestJob.run(spark, job)
    assert(r.processed.size === 1)
    val store = TrendStoreWriter.read(spark, job.storePath)
    assert(store.count() === 2)
    assert(store.filter(col("entity_name") === "8").head.getAs[Double]("v") === 4.5)
  }
}
