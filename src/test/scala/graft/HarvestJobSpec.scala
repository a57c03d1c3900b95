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

  test("gzipped vendor CSVs harvest transparently (the wire format files actually arrive in)") {
    val src = Files.createTempDirectory("graft_gz_src").toString
    val base = Files.createTempDirectory("graft_gz").toString
    val gz = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(Path.of(src, "a.csv.gz").toFile))
    gz.write(("dn,timestamp,v\nCell=1,2024-01-01 10:00:00,5.0\n" +
      "Cell=2,2024-01-01 10:05:00,6.0\n").getBytes("UTF-8"))
    gz.close()
    val job = HarvestJob.Job(
      sourceDir = src, format = "csv",
      dnCol = "dn", entityComponent = "Cell",
      tsCol = "timestamp", tsFormat = "yyyy-MM-dd HH:mm:ss",
      granularity = "15m",
      storePath = s"$base/store", statePath = s"$base/state",
      pattern = ".*\\.csv\\.gz")
    val r = HarvestJob.run(spark, job)
    assert(r.processed.size === 1)
    val rows = TrendStoreWriter.read(spark, s"$base/store")
    assert(rows.count() === 2)
    assert(rows.select("v").collect().map(_.getDouble(0)).sorted.toSeq === Seq(5.0, 6.0))
  }

  test("malformed rows quarantine to the reject store and never duplicate on re-run") {
    val src = Files.createTempDirectory("graft_rej_src").toString
    val base = Files.createTempDirectory("graft_rej").toString
    val job = HarvestJob.Job(
      sourceDir = src, format = "csv",
      dnCol = "dn", entityComponent = "Cell",
      tsCol = "timestamp", tsFormat = "yyyy-MM-dd HH:mm:ss",
      granularity = "15m",
      storePath = s"$base/store", statePath = s"$base/state",
      pattern = ".*\\.csv", rejectPath = Some(s"$base/rejects"))
    writeCsv(src, "a.csv", Seq(
      "Cell=1,2024-01-01 10:00:00,1.0",
      "Cell=2,not-a-timestamp,2.0",
      "Cell=3,2024-01-01 10:15:00,3.0"))
    HarvestJob.run(spark, job)
    // good rows load; the malformed one lands in the reject store
    // with its source file and reason, dn/metrics intact
    assert(TrendStoreWriter.read(spark, job.storePath).count() === 2)
    val rej = spark.read.parquet(s"$base/rejects").collect()
    assert(rej.length === 1)
    val r = rej.head
    assert(r.getAs[String]("entity_dn") === "Cell=2")
    assert(r.getAs[String]("_reject_reason") === "unparseable_ts")
    assert(r.getAs[String]("_source_file").endsWith("a.csv"))
    // re-run: file already processed → store AND rejects unchanged
    HarvestJob.run(spark, job)
    assert(spark.read.parquet(s"$base/rejects").count() === 1)
    assert(TrendStoreWriter.read(spark, job.storePath).count() === 2)
    // crash-window drill: the run died AFTER the reject write but
    // BEFORE the state commit. The re-run re-reads the same files —
    // the per-source-file partition overwrite rewrites the same
    // reject partition instead of appending a duplicate row.
    graft.operators.StoreFs.fs(spark, job.statePath)._1.delete(
      new org.apache.hadoop.fs.Path(job.statePath), true)
    HarvestJob.run(spark, job)
    assert(spark.read.parquet(s"$base/rejects").count() === 1,
      "a re-run of the crash window duplicated a reject")
    assert(TrendStoreWriter.read(spark, job.storePath).count() === 2)
    // a LATER file's rejects land alongside (distinct partitions
    // compose like appends)
    writeCsv(src, "b.csv", Seq(
      "Cell=4,also-not-a-timestamp,4.0",
      "Cell=5,2024-01-01 10:30:00,5.0"))
    HarvestJob.run(spark, job)
    val all = spark.read.parquet(s"$base/rejects").collect()
    assert(all.length === 2)
    assert(all.map(_.getAs[String]("entity_dn")).sorted.toSeq === Seq("Cell=2", "Cell=4"))
    // streaming twin: same reject contract (per-file partition
    // overwrite), idempotent across a checkpoint restart — the
    // directory now holds a.csv + b.csv (3 good rows, 2 bad)
    val sJob = job.copy(storePath = s"$base/s_store", statePath = s"$base/s_state",
      rejectPath = Some(s"$base/s_rejects"))
    val q1 = HarvestJob.stream(spark, sJob, s"$base/ckpt")
    try q1.processAllAvailable() finally q1.stop()
    assert(TrendStoreWriter.read(spark, sJob.storePath).count() === 3)
    assert(spark.read.parquet(s"$base/s_rejects").count() === 2)
    val q2 = HarvestJob.stream(spark, sJob, s"$base/ckpt")
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(s"$base/s_rejects").count() === 2,
      "checkpoint restart duplicated a reject")
  }

  test("a second harvester racing the same target is refused by the lease") {
    import graft.operators.{Materialize, StoreFs}
    val src = Files.createTempDirectory("graft_job_lease_src").toString
    val base = Files.createTempDirectory("graft_job_lease").toString
    val job = HarvestJob.Job(
      sourceDir = src, format = "csv",
      dnCol = "dn", entityComponent = "Cell",
      tsCol = "timestamp", tsFormat = "yyyy-MM-dd HH:mm:ss",
      granularity = "15m",
      storePath = s"$base/store", statePath = s"$base/state",
      pattern = ".*\\.csv")
    writeCsv(src, "a.csv", Seq("Cell=1,2024-01-01 10:00:00,1.0"))
    // another harvester "holds" the target
    assert(StoreFs.acquireLease(spark, job.statePath + ".lease", "other", 3600000))
    intercept[Materialize.ConcurrentRunException](HarvestJob.run(spark, job))
    assert(!StoreFs.exists(spark, job.statePath)) // refused run advanced nothing
    // released → the run proceeds and cleans up its own lease
    StoreFs.releaseLease(spark, job.statePath + ".lease")
    assert(HarvestJob.run(spark, job).processed.size === 1)
    assert(!StoreFs.exists(spark, job.statePath + ".lease"))
    assert(TrendStoreWriter.read(spark, job.storePath).count() === 1)
  }

  test("off-grid vendor timestamps land on the declared granularity grid") {
    val src = Files.createTempDirectory("graft_job_grid").toString
    val base = Files.createTempDirectory("graft_job_grid_store").toString
    val job = HarvestJob.Job(
      sourceDir = src, format = "csv",
      dnCol = "dn", entityComponent = "Cell",
      tsCol = "timestamp", tsFormat = "yyyy-MM-dd HH:mm:ss",
      granularity = "15m",
      storePath = s"$base/store", statePath = s"$base/state",
      pattern = ".*\\.csv")
    writeCsv(src, "a.csv", Seq(
      "Cell=1,2024-01-01 10:07:13,1.0",   // → 10:00
      "Cell=1,2024-01-01 10:14:59,2.0",   // → 10:00 (same key: upsert keeps last? both in one file → both rows share the bucket)
      "Cell=1,2024-01-01 10:22:01,4.0"))  // → 10:15
    HarvestJob.run(spark, job)
    val buckets = TrendStoreWriter.read(spark, job.storePath)
      .select(col("bucket").cast("string")).collect().map(_.getString(0)).sorted
    assert(buckets.forall(b => b.endsWith(":00") &&
      (b.contains("10:00") || b.contains("10:15"))), buckets.mkString(","))
    // native ts is preserved alongside the aligned bucket
    val ts = TrendStoreWriter.read(spark, job.storePath)
      .select(col("ts").cast("string")).collect().map(_.getString(0)).sorted
    assert(ts === Seq("2024-01-01 10:07:13", "2024-01-01 10:14:59", "2024-01-01 10:22:01"))
  }

  test("streaming harvest converges to the batch harvest result, no file read twice") {
    val src = Files.createTempDirectory("graft_sjob_src").toString
    val base = Files.createTempDirectory("graft_sjob").toString
    val job = HarvestJob.Job(
      sourceDir = src, format = "csv",
      dnCol = "dn", entityComponent = "Cell",
      tsCol = "timestamp", tsFormat = "yyyy-MM-dd HH:mm:ss",
      granularity = "15m",
      storePath = s"$base/store", statePath = s"$base/state")
    // schema sample needs at least one file before the stream starts
    writeCsv(src, "a.csv", Seq(
      "Cell=1,2024-01-01 10:00:00,1.0",
      "Cell=2,2024-01-01 10:03:00,2.0"))
    val q = HarvestJob.stream(spark, job, s"$base/ckpt")
    try {
      q.processAllAvailable()
      assert(TrendStoreWriter.read(spark, job.storePath).count() === 2)
      // second micro-batch: a new file, including a malformed row
      writeCsv(src, "b.csv", Seq(
        "Cell=1,2024-01-02 11:30:00,4.0",
        "badrow,not-a-timestamp,9.0"))
      q.processAllAvailable()
      // third call with NOTHING new: counts unchanged (each file once)
      q.processAllAvailable()
      val store = TrendStoreWriter.read(spark, job.storePath)
      assert(store.count() === 3)
      assert(store.agg(sum("v")).head.getDouble(0) === 7.0)
      // the continuous store equals a one-shot batch harvest of the
      // same directory into a fresh store
      val batchJob = job.copy(storePath = s"$base/store2", statePath = s"$base/state2")
      HarvestJob.run(spark, batchJob)
      val batchStore = TrendStoreWriter.read(spark, batchJob.storePath)
        .select("entity_id", "bucket", "v")
      val streamStore = store.select("entity_id", "bucket", "v")
      assert(streamStore.exceptAll(batchStore).isEmpty &&
        batchStore.exceptAll(streamStore).isEmpty)
    } finally q.stop()
  }

  test("harvest registers unseen entities in the directory on the fly") {
    val src = Files.createTempDirectory("graft_job_reg_src").toString
    val base = Files.createTempDirectory("graft_job_reg").toString
    val job = HarvestJob.Job(
      sourceDir = src, format = "csv",
      dnCol = "dn", entityComponent = "Cell",
      tsCol = "timestamp", tsFormat = "yyyy-MM-dd HH:mm:ss",
      granularity = "15m",
      storePath = s"$base/store", statePath = s"$base/state",
      registryPath = Some(s"$base/registry"))
    writeCsv(src, "a.csv", Seq(
      "Cell=1,2024-01-01 10:00:00,1.0",
      "Cell=2,2024-01-01 10:00:00,2.0"))
    HarvestJob.run(spark, job)
    val reg1 = spark.read.parquet(s"$base/registry")
    assert(reg1.count() === 2)
    assert(reg1.columns.sorted === Array("alias", "dn", "entity_id", "entity_type"))
    // next run: one known dn re-delivered, one new → exactly one append
    writeCsv(src, "b.csv", Seq(
      "Cell=2,2024-01-02 10:00:00,3.0",
      "Cell=3,2024-01-02 10:00:00,4.0"))
    HarvestJob.run(spark, job)
    val reg2 = spark.read.parquet(s"$base/registry")
    assert(reg2.count() === 3)
    // content-derived ids: the store's id for Cell=2 equals the
    // registry's (no coordination needed between the two writes)
    val regId = reg2.filter(col("dn") === "Cell=2").head.getAs[Long]("entity_id")
    val storeIds = TrendStoreWriter.read(spark, job.storePath)
      .filter(col("entity_dn") === "Cell=2")
      .select(col("entity_id")).distinct().collect().map(_.getLong(0)).toSeq
    assert(storeIds === Seq(regId))
  }

  test("streaming harvest restart resumes from the checkpoint, no re-read") {
    val src = Files.createTempDirectory("graft_sjob_rs_src").toString
    val base = Files.createTempDirectory("graft_sjob_rs").toString
    val job = HarvestJob.Job(
      sourceDir = src, format = "csv",
      dnCol = "dn", entityComponent = "Cell",
      tsCol = "timestamp", tsFormat = "yyyy-MM-dd HH:mm:ss",
      granularity = "15m",
      storePath = s"$base/store", statePath = s"$base/state")
    writeCsv(src, "a.csv", Seq("Cell=1,2024-01-01 10:00:00,1.0"))
    val q1 = HarvestJob.stream(spark, job, s"$base/ckpt")
    try { q1.processAllAvailable() } finally q1.stop()
    assert(TrendStoreWriter.read(spark, job.storePath).count() === 1)
    // restart with the SAME checkpoint: a.csv is in the file log and
    // must not be re-read; only the new file loads
    writeCsv(src, "b.csv", Seq("Cell=2,2024-01-01 10:30:00,2.0"))
    val q2 = HarvestJob.stream(spark, job, s"$base/ckpt")
    try {
      q2.processAllAvailable()
      val store = TrendStoreWriter.read(spark, job.storePath)
      assert(store.count() === 2)
      assert(store.agg(sum("v")).head.getDouble(0) === 3.0)
    } finally q2.stop()
  }

  test("one mixed directory loads trend, attribute and notification stores") {
    val src = Files.createTempDirectory("graft_job_mixed").toString
    val base = Files.createTempDirectory("graft_job_mixed_store").toString
    // trend files: numeric metric per (entity, ts)
    writeCsv(src, "trend_a.csv", Seq(
      "Cell=1,2024-01-01 10:03:00,1.5",
      "Cell=2,2024-01-01 10:07:00,2.5"))
    // attribute files: a STRING status value (must stay a string)
    Files.writeString(Path.of(src, "attr_a.csv"),
      "dn,timestamp,status\nCell=1,2024-01-01 09:00:00,active\nCell=1,2024-01-02 09:00:00,standby\n")
    // notification files: two notifications in the SAME second
    Files.writeString(Path.of(src, "notif_a.csv"),
      "dn,timestamp,kind\nCell=1,2024-01-01 12:00:00,link_down\nCell=1,2024-01-01 12:00:00,link_up\n")

    def job(prefix: String) = HarvestJob.Job(
      sourceDir = src, format = "csv",
      dnCol = "dn", entityComponent = "Cell",
      tsCol = "timestamp", tsFormat = "yyyy-MM-dd HH:mm:ss",
      granularity = if (prefix == "trend") "15m" else "raw",
      storePath = s"$base/$prefix", statePath = s"$base/${prefix}_state",
      pattern = s"${prefix}_.*\\.csv", target = prefix match {
        case "trend" => "trend"; case "attr" => "attribute"; case "notif" => "notification"
      },
      currentPath = if (prefix == "attr") Some(s"$base/attr_current") else None)

    Seq("trend", "attr", "notif").foreach(p => HarvestJob.run(spark, job(p)))

    assert(TrendStoreWriter.read(spark, s"$base/trend").count() === 2)
    // attribute history at native ts, value type preserved, current view fresh
    val hist = spark.read.parquet(s"$base/attr")
    assert(hist.count() === 2)
    assert(hist.schema("status").dataType.typeName === "string")
    val current = spark.read.parquet(s"$base/attr_current")
    assert(current.count() === 1)
    assert(current.head.getAs[String]("status") === "standby")
    // both same-second notifications kept (content-hash tie-break)
    assert(spark.read.parquet(s"$base/notif").count() === 2)

    // re-run all three: state says nothing new — counts unchanged
    Seq("trend", "attr", "notif").foreach { p =>
      assert(HarvestJob.run(spark, job(p)).processed.isEmpty)
    }
    assert(spark.read.parquet(s"$base/attr").count() === 2)
    assert(spark.read.parquet(s"$base/notif").count() === 2)

    // REDELIVERY under a new file name: identical content upserts onto
    // its own (entity, bucket, event_id) keys — no duplicates
    Files.writeString(Path.of(src, "notif_b.csv"),
      "dn,timestamp,kind\nCell=1,2024-01-01 12:00:00,link_down\nCell=1,2024-01-01 12:00:00,link_up\n")
    HarvestJob.run(spark, job("notif"))
    assert(spark.read.parquet(s"$base/notif").count() === 2)
  }

  test("streaming ATTRIBUTE harvest converges to the batch harvest, current view fresh") {
    val src = Files.createTempDirectory("graft_sjob_attr_src").toString
    val base = Files.createTempDirectory("graft_sjob_attr").toString
    Files.writeString(Path.of(src, "attr_a.csv"),
      "dn,timestamp,status\nCell=1,2024-01-01 09:00:00,active\nCell=1,2024-01-02 09:00:00,standby\n")
    val aJob = HarvestJob.Job(sourceDir = src, format = "csv", dnCol = "dn",
      entityComponent = "Cell", tsCol = "timestamp", tsFormat = "yyyy-MM-dd HH:mm:ss",
      granularity = "raw", storePath = s"$base/attr", statePath = s"$base/attr_state",
      target = "attribute", currentPath = Some(s"$base/attr_current"))
    val q = HarvestJob.stream(spark, aJob, s"$base/attr_ckpt")
    try {
      q.processAllAvailable()
      Files.writeString(Path.of(src, "attr_b.csv"),
        "dn,timestamp,status\nCell=1,2024-01-03 09:00:00,active\nCell=2,2024-01-01 08:00:00,active\n")
      q.processAllAvailable()
    } finally q.stop()
    val hist = spark.read.parquet(s"$base/attr")
    assert(hist.count() === 4)
    // parsed value types preserved: a status string stays a string
    assert(hist.schema("status").dataType.typeName === "string")
    // current view refreshed per micro-batch: Cell=1 → Jan-3 'active'
    val current = spark.read.parquet(s"$base/attr_current")
    assert(current.count() === 2)
    assert(current.filter(col("entity_dn") === "Cell=1").head
      .getAs[String]("status") === "active")
    // batch twin over the same files produces the identical history
    val bJob = aJob.copy(storePath = s"$base/attr_twin",
      statePath = s"$base/attr_twin_state", currentPath = None)
    HarvestJob.run(spark, bJob)
    val a = hist.select("entity_id", "ts", "status")
    val b = spark.read.parquet(s"$base/attr_twin").select("entity_id", "ts", "status")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "streamed attribute history diverges from the batch harvest")
  }

  test("streaming NOTIFICATION harvest lands redeliveries exactly once") {
    val src = Files.createTempDirectory("graft_sjob_notif_src").toString
    val base = Files.createTempDirectory("graft_sjob_notif").toString
    Files.writeString(Path.of(src, "notif_a.csv"),
      "dn,timestamp,kind\nCell=1,2024-01-01 12:00:00,link_down\nCell=1,2024-01-01 12:00:00,link_up\n")
    val nJob = HarvestJob.Job(sourceDir = src, format = "csv", dnCol = "dn",
      entityComponent = "Cell", tsCol = "timestamp", tsFormat = "yyyy-MM-dd HH:mm:ss",
      granularity = "raw", storePath = s"$base/notif", statePath = s"$base/notif_state",
      target = "notification")
    val q = HarvestJob.stream(spark, nJob, s"$base/notif_ckpt")
    try {
      q.processAllAvailable()
      // both same-second notifications kept (content-hash tie-break)
      assert(spark.read.parquet(s"$base/notif").count() === 2)
      // redelivery under a NEW file name: the file source reads it (new
      // file), but identical content upserts onto its own keys — no dups
      Files.writeString(Path.of(src, "notif_b.csv"),
        "dn,timestamp,kind\nCell=1,2024-01-01 12:00:00,link_down\nCell=1,2024-01-01 12:00:00,link_up\n")
      q.processAllAvailable()
      assert(spark.read.parquet(s"$base/notif").count() === 2)
    } finally q.stop()
  }

  test("two streams share one mixed directory via glob filters") {
    val src = Files.createTempDirectory("graft_sjob_glob_src").toString
    val base = Files.createTempDirectory("graft_sjob_glob").toString
    writeCsv(src, "trend_a.csv", Seq("Cell=1,2024-01-01 10:03:00,1.5"))
    Files.writeString(Path.of(src, "notif_a.csv"),
      "dn,timestamp,kind\nCell=1,2024-01-01 12:00:00,link_down\n")
    val tJob = HarvestJob.Job(sourceDir = src, format = "csv", dnCol = "dn",
      entityComponent = "Cell", tsCol = "timestamp", tsFormat = "yyyy-MM-dd HH:mm:ss",
      granularity = "15m", storePath = s"$base/trend", statePath = s"$base/trend_state")
    val nJob = tJob.copy(storePath = s"$base/notif", statePath = s"$base/notif_state",
      granularity = "raw", target = "notification")
    val tq = HarvestJob.stream(spark, tJob, s"$base/tckpt", glob = Some("trend_*.csv"))
    val nq = HarvestJob.stream(spark, nJob, s"$base/nckpt", glob = Some("notif_*.csv"))
    try {
      tq.processAllAvailable(); nq.processAllAvailable()
      // each stream saw ONLY its files: one row each, right shapes
      val trend = spark.read.parquet(s"$base/trend")
      assert(trend.count() === 1 && trend.columns.contains("v"))
      val notif = spark.read.parquet(s"$base/notif")
      assert(notif.count() === 1 && notif.columns.contains("kind"))
    } finally { tq.stop(); nq.stop() }
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

  test("parquet plugin: lake-native batch + streaming harvest, typed timestamps pass through") {
    import graft.SparkSpec.spark.implicits._
    val src = Files.createTempDirectory("graft_job_pq").toString
    val base = Files.createTempDirectory("graft_job_pq_store").toString
    // typed upstream drop: REAL timestamp + double columns (no strings)
    Seq(("Cell=1", "2024-03-01 08:02:00", 1.5), ("Cell=2", "2024-03-01 08:14:00", 2.5))
      .toDF("dn", "tsRaw", "v")
      .select(col("dn"), col("tsRaw").cast("timestamp").as("timestamp"), col("v"))
      .coalesce(1).write.parquet(s"$src/drop1")
    val job = HarvestJob.Job(
      sourceDir = s"$src/drop1", format = "parquet",
      dnCol = "dn", entityComponent = "Cell",
      tsCol = "timestamp", tsFormat = "ignored-for-typed-ts",
      granularity = "15m",
      storePath = s"$base/store", statePath = s"$base/state",
      pattern = ".*\\.parquet")
    val r = HarvestJob.run(spark, job)
    assert(r.processed.size === 1)
    val store = TrendStoreWriter.read(spark, job.storePath)
    assert(store.count() === 2)
    // typed ts passed through and aligned to the 15m grid
    assert(store.filter(col("entity_name") === "1")
      .head.getAs[java.sql.Timestamp]("bucket").toString === "2024-03-01 08:00:00.0")
    assert(store.filter(col("entity_name") === "2")
      .head.getAs[Double]("v") === 2.5)

    // streaming twin over a fresh directory
    val sdir = s"$src/streamdir"
    new java.io.File(sdir).mkdirs()
    Seq(("Cell=3", "2024-03-02 10:07:00", 7.0)).toDF("dn", "tsRaw", "v")
      .select(col("dn"), col("tsRaw").cast("timestamp").as("timestamp"), col("v"))
      .coalesce(1).write.mode("overwrite").parquet(s"$sdir/batch1")
    val sjob = job.copy(sourceDir = s"$sdir/batch1",
      storePath = s"$base/sstore", statePath = s"$base/sstate")
    val q = HarvestJob.stream(spark, sjob, s"$base/ckpt")
    try {
      q.processAllAvailable()
      val sstore = TrendStoreWriter.read(spark, sjob.storePath)
      assert(sstore.count() === 1)
      assert(sstore.head.getAs[Double]("v") === 7.0)
    } finally q.stop()
  }
}
