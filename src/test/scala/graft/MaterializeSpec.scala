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

  test("dirty set is empty when state matches the modified log") {
    val src = mk(Seq((1L, "2024-01-01 10:00:00", 1.0)))
    val log = Materialize.modifiedLogByDay(src, col("ts"))
    val state = log.select(col("day"), col("last_modified").as("watermark"), col("n_rows"))
    assert(Materialize.dirtySet(log, state).isEmpty)
  }
}
