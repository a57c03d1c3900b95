package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.TableCatalog
import graft.streaming.{RateStream, Sessionize, StreamDedup, TrendStream}

class StreamingSpec extends SparkSpec {

  private def eventsOnDisk(): String = {
    val dir = Files.createTempDirectory("graft_stream").toString
    TableCatalog(spark, sf).events
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming windowed rollup matches the batch rollup") {
    val dir = eventsOnDisk()
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val rolled = TrendStream.windowedRollup(stream, "user_id", "ts", "value",
      "1 hour", "2 hours")
    val q = rolled.writeStream.outputMode("complete")
      .format("memory").queryName("t_rollup").start()
    try {
      q.processAllAvailable()
      val got = spark.table("t_rollup")
        .select(col("entity_id"), col("bucket"), col("cnt"))
      val want = TableCatalog(spark, sf).events
        .groupBy(col("user_id").as("entity_id"),
          date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("cnt"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    } finally q.stop()
  }

  test("continuous loading: streamed rollups upsert into a trend store and converge") {
    import graft.SparkSpec.spark.implicits._
    val srcDir = Files.createTempDirectory("graft_cl_src").toString
    val store = Files.createTempDirectory("graft_cl").toString + "/store"
    val ckpt = Files.createTempDirectory("graft_cl_ckpt").toString
    def batch(rows: Seq[(Long, String, Double)]) =
      rows.toDF("user_id", "ts", "value")
        .withColumn("ts", col("ts").cast("timestamp"))
    // first micro-batch: two entities, one hour
    batch(Seq((1L, "2024-01-01 10:05:00", 1.0), (2L, "2024-01-01 10:10:00", 2.0)))
      .write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val rolled = TrendStream.windowedRollup(stream, "user_id", "ts", "value",
      "1 hour", "24 hours")
    val q = TrendStream.toStore(rolled, store, ckpt)
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(store).count() === 2)
      // late row updates an existing bucket; a new row opens another
      batch(Seq((1L, "2024-01-01 10:45:00", 4.0), (1L, "2024-01-01 11:05:00", 8.0)))
        .write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      val got = spark.read.parquet(store)
        .select(col("entity_id"), col("bucket"), col("cnt"),
          col("sum_dec").cast("double").as("sum_value"))
      val want = graft.operators.TrendStore.rollup(
          spark.read.parquet(srcDir), col("user_id"), col("ts"), col("value"), "hour")
        .select(col("entity_id"), col("bucket"), col("cnt"),
          col("sum_dec").cast("double").as("sum_value"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    } finally q.stop()
  }

  test("streaming percentile rollup: sketch state merges across micro-batches; store converges") {
    import graft.SparkSpec.spark.implicits._
    val srcDir = Files.createTempDirectory("graft_pctl_src").toString
    val store = Files.createTempDirectory("graft_pctl").toString + "/store"
    val ckpt = Files.createTempDirectory("graft_pctl_ckpt").toString
    def write(rows: Seq[(Long, String, Double)]): Unit =
      rows.toDF("user_id", "ts", "value")
        .withColumn("ts", col("ts").cast("timestamp"))
        .write.mode("append").parquet(srcDir)
    // first micro-batch: one entity, hour 10, values 0..100 — small
    // enough that the GK sketch is exact (QuantileSketchSpec's
    // small-cell contract), so the p95 answer is pinned, not bounded
    write((0 to 100).map(i => (1L, f"2024-01-01 10:${i % 60}%02d:00", i.toDouble)))
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val rolled = TrendStream.pctlRollup(stream, "user_id", "ts", "value",
      "1 hour", "24 hours")
    val q = TrendStream.toStore(rolled, store, ckpt)
    try {
      q.processAllAvailable()
      val r1 = spark.read.parquet(store).head
      assert(r1.getAs[Long]("cnt") === 101L)
      val p95a = r1.getAs[Double]("p95")
      assert(p95a === 95.0 || p95a === 96.0, s"first-batch p95: $p95a")
      // a LATE second batch extends the SAME bucket (values 101..200):
      // the streaming state must MERGE the stored sketch with the new
      // partial — a restarted-per-batch sketch would answer ~95 again
      write((101 to 200).map(i => (1L, f"2024-01-01 10:${i % 60}%02d:30", i.toDouble)))
      q.processAllAvailable()
      val r2 = spark.read.parquet(store)
      assert(r2.count() === 1, "late data must update the bucket, not add a row")
      val row2 = r2.head
      assert(row2.getAs[Long]("cnt") === 201L)
      val p95b = row2.getAs[Double]("p95")
      assert(p95b >= 189.0 && p95b <= 191.0,
        s"merged p95 over 0..200 should be a rank-~191 neighbor, got $p95b")
      val p50b = row2.getAs[Double]("p50")
      assert(p50b >= 99.0 && p50b <= 101.0, s"merged p50: $p50b")
      // the emitted row carries the serialized sketch so a coarser
      // cascade level can keep merging without re-scanning raw rows
      val sk = row2.getAs[Array[Byte]]("q_sketch")
      assert(sk != null && sk.nonEmpty)
      val viaSketch = spark.read.parquet(store)
        .select(graft.functions.QuantileSketch
          .gkQuantile(col("q_sketch"), 0.95).as("p"))
        .head.getDouble(0)
      assert(viaSketch === p95b, "stored sketch must reproduce the emitted p95")
      // replay drill: an idle pass changes nothing (upsert idempotent)
      q.processAllAvailable()
      assert(spark.read.parquet(store).count() === 1)
      assert(spark.read.parquet(store).head.getAs[Double]("p95") === p95b)
    } finally q.stop()
  }

  test("pctlRollup names per-mille quantiles distinctly from percents (p045, not p45)") {
    // pNN is the batch PctFn PERCENT namespace (p45 = 0.45). A
    // sub-percent quantile must never mint a bare 2-digit name a
    // downstream cascade would parse back as the wrong p (ADVICE
    // r14): 0.045 → p045 (3-digit = per-mille), so 0.45 and 0.045
    // can coexist in one rollup.
    val stream = spark.readStream.format("rate").load()
      .selectExpr("CAST(1 AS BIGINT) AS user_id", "timestamp AS ts",
        "CAST(value AS DOUBLE) AS value")
    val cols = TrendStream.pctlRollup(stream, "user_id", "ts", "value",
      "1 hour", "1 hour", ps = Seq(0.5, 0.45, 0.045, 0.125))
      .schema.fieldNames.toSeq
    assert(cols.contains("p50") && cols.contains("p45") &&
      cols.contains("p045") && cols.contains("p125"),
      s"expected p50/p45/p045/p125 among $cols")
    assert(cols.count(_ == "p45") === 1, "0.045 must not alias 0.45's name")
    // quantiles that truly collapse to one name still refuse loudly
    val ex = intercept[IllegalArgumentException] {
      TrendStream.pctlRollup(stream, "user_id", "ts", "value",
        "1 hour", "1 hour", ps = Seq(0.45, 0.4504))
    }
    assert(ex.getMessage.contains("collide"))
  }

  test("stateful sessionization: batch twin agrees on closed sessions") {
    import graft.SparkSpec.spark.implicits._
    val evs = TableCatalog(spark, sf).events
      .select(col("user_id"), col("ts"), col("value")).as[Sessionize.Ev]
    val gapMs = 3 * 3600 * 1000L
    val batch = Sessionize.sessionsBatch(evs, gapMs)
    // invariants: sessions don't overlap per user, counts conserve rows
    assert(batch.toDF().agg(sum("n_events")).head.getLong(0) === evs.count())
    val overlapping = batch.toDF().as("a").join(batch.toDF().as("b"),
      col("a.user_id") === col("b.user_id") &&
        col("a.session_start") < col("b.session_start") &&
        col("b.session_start") <= col("a.session_end"))
    assert(overlapping.isEmpty)
  }

  test("presence monitor fires once per silence, re-arms on resume") {
    import graft.streaming.PresenceStream
    val src = Files.createTempDirectory("graft_presence_src").toString
    import graft.SparkSpec.spark.implicits._
    def push(rows: Seq[(Long, String)]): Unit =
      rows.toDF("entity", "ts").withColumn("ts", col("ts").cast("timestamp"))
        .write.mode("append").parquet(src)
    // batch 1: entities 1 and 2 report at 10:00; entity 1 again at 11:00
    push(Seq((1L, "2024-01-01 10:00:00"), (2L, "2024-01-01 10:00:00"),
      (1L, "2024-01-01 11:00:00")))
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema).parquet(src)
    val absences = PresenceStream.absences(spark, stream, "entity", "ts",
      horizonSeconds = 2 * 3600, lateness = "1 second")
    val q = absences.writeStream.outputMode("append")
      .format("memory").queryName("g_presence").start()
    try {
      q.processAllAvailable()
      assert(spark.table("g_presence").isEmpty) // watermark still at 11:00
      // batch 2: entity 1 reports at 13:30 → watermark passes 12:00,
      // entity 2's 10:00 + 2h horizon expires; entity 1 stays alive
      push(Seq((1L, "2024-01-01 13:30:00")))
      q.processAllAvailable()
      val fired = spark.table("g_presence")
        .select(col("entity_id"), col("last_seen").cast("string"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(fired === Set((2L, "2024-01-01 10:00:00")))
      // entity 2 resumes, then goes silent again → a SECOND absence
      push(Seq((2L, "2024-01-01 14:00:00")))
      q.processAllAvailable()
      push(Seq((1L, "2024-01-01 17:00:00")))
      q.processAllAvailable()
      val fired2 = spark.table("g_presence")
        .select(col("entity_id"), col("last_seen").cast("string"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(fired2 === Set(
        (2L, "2024-01-01 10:00:00"), (2L, "2024-01-01 14:00:00")))
    } finally q.stop()
  }

  test("streaming dedup keeps first occurrence within the watermark horizon") {
    import graft.SparkSpec.spark.implicits._
    val srcDir = Files.createTempDirectory("graft_sd_src").toString
    def batch(rows: Seq[(Long, String, String)]) =
      rows.toDF("doc_id", "ts", "text")
        .withColumn("ts", col("ts").cast("timestamp"))
    batch(Seq(
      (1L, "2024-01-01 10:00:00", "alpha"),
      (2L, "2024-01-01 10:05:00", "beta"),
      (3L, "2024-01-01 10:10:00", "alpha") // dup inside horizon
    )).write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val deduped = StreamDedup.firstSeen(stream, "ts", "text", "2 hours")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("t_dedup").start()
    try {
      q.processAllAvailable()
      // second micro-batch: another dup inside the horizon + a new doc
      batch(Seq(
        (4L, "2024-01-01 10:20:00", "beta"),
        (5L, "2024-01-01 10:25:00", "gamma")
      )).write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      val got = spark.table("t_dedup").select("doc_id")
        .as[Long].collect().toSet
      // One survivor per content key. WITHIN a micro-batch the
      // surviving row of a key is whichever task processed first
      // (arrival order — docs 1/3 both carry "alpha" in batch 1, and
      // either may win); ACROSS batches the state is authoritative, so
      // batch-2's "beta" re-delivery (doc 4) deterministically loses
      // to the stored doc 2, and "gamma" (doc 5) is new.
      assert(got.size === 3)
      assert(got.contains(2L) && got.contains(5L) && !got.contains(4L))
      assert(got.contains(1L) ^ got.contains(3L))
    } finally q.stop()
  }

  test("streaming near-dedup ≡ batch incremental loop; recovery replays lose nothing") {
    import graft.SparkSpec.spark.implicits._
    val root = Files.createTempDirectory("graft_nsd").toString
    val (srcDir, idx, outDir, ckpt) =
      (s"$root/src", s"$root/index", s"$root/out", s"$root/ckpt")
    val batchIdx = s"$root/batch_index" // the batch twin's index
    def doc(words: Int, seed: Int): String = {
      val r = new scala.util.Random(seed)
      (0 until words).map(_ => s"w${r.nextInt(500)}").mkString(" ")
    }
    val origA = doc(80, 1); val origB = doc(80, 2)
    def perturb(s: String): String = {
      val t = s.split(" "); t(10) = "CHANGED"; t(45) = "ALSO"; t.mkString(" ")
    }
    // batch 0: two distinct docs + a within-batch near-copy of A;
    // batch 1: a near-copy of an INDEXED doc, an exact re-delivery,
    // and a genuinely new doc — the QualitySpec batch scenario, fed
    // through the stream one micro-batch at a time.
    val b0 = Seq((1L, origA), (2L, origB), (3L, perturb(origA)))
    val b1 = Seq((10L, perturb(origB)), (11L, origA), (12L, doc(80, 9)))
    b0.toDF("doc_id", "text").write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val q = graft.streaming.NearStreamDedup.toStore(
      stream, "doc_id", "text", idx, outDir, ckpt)
    try {
      q.processAllAvailable()
      b1.toDF("doc_id", "text").write.mode("append").parquet(srcDir)
      q.processAllAvailable()
    } finally q.stop()
    // Termination barrier: the manual processBatch drills below share
    // the index/out dirs with the query's foreachBatch writer — make
    // sure no streaming thread is still in flight before touching them
    // (this test once flaked under full-suite contention; if it flakes
    // again WITH this barrier, the stop ordering is exonerated).
    q.awaitTermination()
    assert(!q.isActive, "near-dedup stream still active after stop()")
    assert(spark.streams.active.isEmpty,
      s"leftover active streams: ${spark.streams.active.map(_.name).mkString(",")}")
    val streamed = spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSet
    // batch twin over the same slicing
    Seq(b0, b1).zipWithIndex.foreach { case (b, i) =>
      val staged = graft.operators.Dedup.nearDedupIncrementalStaged(
        spark, b.toDF("doc_id", "text"), "doc_id", "text", batchIdx)
      staged.survivors.write.mode("overwrite").parquet(s"$root/bt$i")
      staged.commit()
    }
    val batched = (0 to 1).flatMap(i =>
      spark.read.parquet(s"$root/bt$i").select("doc_id").as[Long].collect()).toSet
    assert(streamed === batched, s"stream $streamed != batch $batched")
    assert(streamed === Set(1L, 2L, 12L))
    // committed replay (checkpoint recovery redelivers batch 1):
    // the done marker short-circuits — output and index unchanged
    val sigsBefore = spark.read.parquet(s"$idx/sigs").count()
    graft.streaming.NearStreamDedup.processBatch(
      b1.toDF("doc_id", "text"), 1L, "doc_id", "text", idx, outDir)
    assert(spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSet === streamed)
    assert(spark.read.parquet(s"$idx/sigs").count() === sigsBefore)
    // crash WINDOW drill: intent written, commit torn (delete done →
    // replay must take the append-only path: survivors preserved,
    // NEVER re-probed — a re-probe would self-drop everything)
    val (fs, donePath) = graft.operators.StoreFs.fs(spark, s"$idx/_batches/done-1")
    assert(fs.delete(donePath, true))
    graft.streaming.NearStreamDedup.processBatch(
      b1.toDF("doc_id", "text"), 1L, "doc_id", "text", idx, outDir)
    assert(spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSet === streamed,
      "crash-window replay lost or resurrected survivors")
    // duplicate postings from the re-append are harmless: a near-copy
    // of an accepted doc still drops against the healed index
    graft.streaming.NearStreamDedup.processBatch(
      Seq((20L, perturb(origA)), (21L, doc(80, 77))).toDF("doc_id", "text"),
      2L, "doc_id", "text", idx, outDir)
    assert(spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSet ===
      streamed + 21L, "post-recovery batch dedup broke")
  }

  test("streaming ANN adds: streamed vectors become searchable; committed replays are no-ops") {
    import graft.SparkSpec.spark.implicits._
    val root = Files.createTempDirectory("graft_annstream").toString
    val (srcDir, idx, ckpt) = (s"$root/src", s"$root/index", s"$root/ckpt")
    val emb = graft.sources.TableCatalog(spark, sf).embeddings
    // index built WITHOUT vectors 0..19; the stream feeds them in
    // two micro-batches (10 each)
    graft.similarity.Similarity.ivfpqBuild(
      emb.filter(col("vec_id") >= 20), "vec_id", "embedding", idx, residual = true)
    emb.filter(col("vec_id") < 10).write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val q = graft.streaming.AnnAddStream.toIndex(stream, "vec_id", "embedding", idx, ckpt)
    try {
      q.processAllAvailable()
      emb.filter(col("vec_id") >= 10 && col("vec_id") < 20)
        .write.mode("append").parquet(srcDir)
      q.processAllAvailable()
    } finally q.stop()
    // perturbed copies of the STREAMED vectors are found by search
    val qp = emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), x => x + lit(0.05f) * sin(x * 13.7f)).as("embedding"))
    val ann = graft.similarity.Similarity.ivfpqSearch(qp, "vec_id", "embedding", idx, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (0 until 20).count(i => ann.contains((i + 100000L, i.toLong))) / 20.0
    assert(recall >= 0.9, s"streamed-vector recall $recall")
    // committed replay (checkpoint recovery): the add marker makes it
    // a no-op — codes table unchanged
    val codesBefore = spark.read.parquet(s"$idx/codes").count()
    assert(!graft.streaming.AnnAddStream.processBatch(
      emb.filter(col("vec_id") < 10), 0L, "vec_id", "embedding", idx))
    assert(spark.read.parquet(s"$idx/codes").count() === codesBefore)
    // crash-window replay (marker missing, rows already appended):
    // re-appends, and search STILL returns each neighbor once
    val (fs, marker) = graft.operators.StoreFs.fs(spark, s"$idx/_adds/stream-0")
    assert(fs.delete(marker, true))
    assert(graft.streaming.AnnAddStream.processBatch(
      emb.filter(col("vec_id") < 10), 0L, "vec_id", "embedding", idx))
    val dup = graft.similarity.Similarity.ivfpqSearch(
        emb.filter(col("vec_id") === 25), "vec_id", "embedding", idx, k = 10)
      .groupBy("q_id", "n_id").count().filter(col("count") > 1)
    assert(dup.isEmpty, "duplicate appends must never occupy multiple ranks")
  }

  test("streaming text-index adds: streamed docs become retrievable; committed replays are no-ops") {
    import graft.SparkSpec.spark.implicits._
    val root = Files.createTempDirectory("graft_tistream").toString
    val (srcDir, idx, ckpt) = (s"$root/src", s"$root/index", s"$root/ckpt")
    // index built from the base corpus; the stream feeds two more
    // micro-batches of docs
    graft.operators.TextIndex.build(
      Seq((1L, "spark pad"), (2L, "vector pad pad")).toDF("doc_id", "text"),
      "doc_id", "text", idx)
    Seq((3L, "spark vector stream")).toDF("doc_id", "text")
      .write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val q = graft.streaming.TextIndexAddStream.toIndex(stream, "doc_id", "text", idx, ckpt)
    try {
      q.processAllAvailable()
      Seq((4L, "stream stream pad")).toDF("doc_id", "text")
        .write.mode("append").parquet(srcDir)
      q.processAllAvailable()
    } finally q.stop()

    // streamed docs rank: one-shot build over the union must agree
    val oneShot = s"$root/oneshot"
    graft.operators.TextIndex.build(
      Seq((1L, "spark pad"), (2L, "vector pad pad"),
        (3L, "spark vector stream"), (4L, "stream stream pad"))
        .toDF("doc_id", "text"), "doc_id", "text", oneShot)
    def ranked(p: String) = graft.operators.TextIndex
      .bm25(spark, p, Seq("spark", "vector", "stream"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(ranked(idx) === ranked(oneShot), "streamed index ≠ one-shot build")
    assert(graft.operators.TextIndex.stats(spark, idx)._1 === 4L)

    // committed replay (checkpoint recovery): marker → no-op
    val postBefore = spark.read.parquet(s"$idx/postings").count()
    graft.streaming.TextIndexAddStream.processBatch(
      Seq((3L, "spark vector stream")).toDF("doc_id", "text"),
      0L, "doc_id", "text", idx)
    assert(spark.read.parquet(s"$idx/postings").count() === postBefore)

    // crash-window replay: marker deleted, rows already appended —
    // re-appends, and scores are STILL identical (readers dedup)
    val (fs, marker) = graft.operators.StoreFs.fs(spark, s"$idx/batches/stream-0")
    assert(fs.delete(marker, false))
    graft.streaming.TextIndexAddStream.processBatch(
      Seq((3L, "spark vector stream")).toDF("doc_id", "text"),
      0L, "doc_id", "text", idx)
    assert(ranked(idx) === ranked(oneShot), "torn-replay duplicates changed a score")
  }

  test("streaming counter rates converge to the batch derivation") {
    import graft.SparkSpec.spark.implicits._
    val srcDir = Files.createTempDirectory("graft_rs_src").toString
    def chunk(rows: Seq[(Long, String, Double)]) =
      rows.toDF("entity_id", "bucket", "sum_value")
        .withColumn("bucket", col("bucket").cast("timestamp"))
    // micro-batch 1: entity 1's first two closed hourly buckets
    chunk(Seq((1L, "2024-01-01 10:00:00", 10.0),
      (1L, "2024-01-01 11:00:00", 46.0))).write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir).as[RateStream.Bucket]
    val q = RateStream.rates(spark, stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("t_rates").start()
    try {
      q.processAllAvailable()
      // micro-batch 2: a later bucket + a new entity + a REPLAY of 10:00
      chunk(Seq((1L, "2024-01-01 13:00:00", 50.0),
        (2L, "2024-01-01 10:00:00", 7.0),
        (1L, "2024-01-01 10:00:00", 10.0))).write.mode("append").parquet(srcDir)
      q.processAllAvailable()

      val got = spark.table("t_rates")
        .select(col("entity_id"), col("bucket"), col("sum_value"),
          col("delta"), col("rate_per_s"))
      // batch twin over the distinct closed buckets
      val batchIn = spark.read.parquet(srcDir).distinct()
      val want = graft.operators.TrendStore.counterRate(batchIn)
        .select(col("entity_id"), col("bucket"), col("sum_value"),
          col("delta"), col("rate_per_s"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
      // the replayed bucket emitted nothing: one row per distinct bucket
      assert(got.count() === batchIn.count())
      assert(got.filter(col("entity_id") === 1L && col("delta") === 36.0)
        .head.getAs[Double]("rate_per_s") === 0.01)
    } finally q.stop()
  }

  test("streaming sessionization emits closed sessions") {
    import graft.SparkSpec.spark.implicits._
    val dir = eventsOnDisk()
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
      .select(col("user_id"), col("ts"), col("value")).as[Sessionize.Ev]
    val gapMs = 3 * 3600 * 1000L
    val sessions = Sessionize.sessions(spark, stream, gapMs)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("t_sessions").start()
    try {
      q.processAllAvailable()
      val got = spark.table("t_sessions")
      assert(got.count() > 0)
      assert(got.filter(col("session_end") < col("session_start")).isEmpty)
    } finally q.stop()
  }
}
