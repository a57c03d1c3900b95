package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the heap-aware shuffle-parallelism posture: a memory-starved
  * JVM must start its shuffles wider WITHOUT a manual knob (the round-15
  * memory board's d45 boundary), and a comfortable heap must leave the
  * machine-sized default untouched (the fixed-256 sf0.1 objection). */
class EngineSpec extends AnyFunSuite {

  private val GB = 1L << 30

  test("comfortable heap (24g/32thr = 768MB/task) keeps the base") {
    assert(Engine.initialShufflePartitions(32, 32, 24 * GB) === 32)
  }

  test("test-shaped session (8g/4thr = 2GB/task) keeps the base") {
    assert(Engine.initialShufflePartitions(4, 32, 8 * GB) === 32)
  }

  test("stress cell (4g/32thr = 128MB/task) derives the measured 256 escape") {
    assert(Engine.initialShufflePartitions(32, 32, 4 * GB) === 256)
    // JVM maxMemory() under -Xmx4g reports slightly under 4 GiB; the
    // power-of-two rounding must absorb that, not overshoot to 512
    assert(Engine.initialShufflePartitions(32, 32, (3.8 * GB).toLong) === 256)
  }

  test("intermediate starvation scales monotonically, capped") {
    assert(Engine.initialShufflePartitions(32, 32, 8 * GB) === 128)
    assert(Engine.initialShufflePartitions(32, 32, 12 * GB) === 64)
    // pathological floor: never beyond base << 5 (or 1024)
    assert(Engine.initialShufflePartitions(32, 32, 1 * GB) === 1024)
    assert(Engine.initialShufflePartitions(32, 32, GB / 2) === 1024)
  }

  test("derivation never shrinks below the configured base") {
    for (heap <- Seq(GB, 4 * GB, 16 * GB, 64 * GB); thr <- Seq(1, 4, 32))
      assert(Engine.initialShufflePartitions(thr, 32, heap) >= 32)
  }

  test("reader batch rows: Spark default on comfortable heaps, 512 under starvation") {
    // the zipf-giant scan posture (r17): 4g/32thr children died in the
    // vectorized reader's contiguous reserve at the 4096-row default
    assert(Engine.readerBatchRows(32, 24 * GB) === 4096)
    assert(Engine.readerBatchRows(4, 8 * GB) === 4096)
    assert(Engine.readerBatchRows(32, 4 * GB) === 512)
    assert(Engine.readerBatchRows(32, 8 * GB) === 512)
    assert(Engine.readerBatchRows(32, 16 * GB) === 4096)
  }

  test("scan concurrency floor: core count on comfortable heaps, threads/4 under starvation") {
    assert(Engine.scanMinPartitions(32, 24 * GB) === 32)
    assert(Engine.scanMinPartitions(4, 8 * GB) === 4)
    assert(Engine.scanMinPartitions(32, 4 * GB) === 8)
    assert(Engine.scanMinPartitions(2, GB / 2) === 1)
  }

  test("scan split ceiling rises 4x with the concurrency floor (minPartitionNum alone is a no-op past small tables)") {
    // ADVICE r17: splits size at min(maxPartitionBytes, ...), so the
    // threads/4 floor only bites below (threads/4)*128MB unless the
    // ceiling rises with it — the two knobs flip on the SAME branch
    assert(Engine.scanMaxPartitionBytes(32, 24 * GB) === (128L << 20))
    assert(Engine.scanMaxPartitionBytes(4, 8 * GB) === (128L << 20))
    assert(Engine.scanMaxPartitionBytes(32, 4 * GB) === (512L << 20))
    assert(Engine.scanMaxPartitionBytes(32, 8 * GB) === (512L << 20))
    assert(Engine.scanMaxPartitionBytes(32, 16 * GB) === (128L << 20))
  }

  test("reliable loop-checkpoint escape hatch wires through (r19, VERDICT r18 #8)") {
    val spark = SparkSpec.spark
    import org.apache.spark.sql.functions.lit
    def rootRdd(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed
        .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD].rdd
    val df = spark.range(8).toDF("u").withColumn("v", lit(1L))
    // default posture: LOCAL checkpoint — block-backed, no file
    val local = Engine.loopCheckpoint(df)
    assert(local.count() === 8)
    assert(rootRdd(local).getCheckpointFile.isEmpty)
    org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpointed(local)
    // opted in: RELIABLE checkpoint under the configured dir, and the
    // loops' release discipline still accepts the root
    val dir = java.nio.file.Files.createTempDirectory("graft_ck").toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set("spark.graft.reliableLoopCheckpoints", "true")
    try {
      val rel = Engine.loopCheckpoint(df)
      assert(rel.count() === 8)
      val rdd = rootRdd(rel)
      assert(rdd.isCheckpointed && rdd.getCheckpointFile.isDefined)
      assert(rdd.getCheckpointFile.get.startsWith("file:" ) ||
        rdd.getCheckpointFile.get.contains(dir.stripPrefix("file:")))
      org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpointed(rel)
    } finally spark.conf.unset("spark.graft.reliableLoopCheckpoints")
  }
}
