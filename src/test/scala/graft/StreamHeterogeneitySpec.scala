package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{NearStreamDedup, TextIndexAddStream}

/** Streaming-under-heterogeneity drill (VERDICT r16 item #4): the
  * zipf stress corpus found four giant-document blowups in BATCH
  * plans; the streaming ingestion paths share those same expressions
  * (nearSketch's streaming shingles, TextIndex's streaming
  * tokenizer), so the fixes must carry over — this spec PROVES it by
  * feeding micro-batches that each contain one multi-megabyte
  * repeated-text giant (the ScaleData --zipf planted-giant shape)
  * through NearStreamDedup and TextIndexAddStream.
  *
  * Asserted per path:
  *  1. the giant batch COMPLETES and its results are exactly right
  *     (the giant survives once, its re-sent copy drops; its doclen
  *     is the exact token count) — a quadratic/array-materializing
  *     per-row path would wall or OOM here long before wrongness;
  *  2. STATE RECOVERY, asserted STRUCTURALLY (ADVICE r17: the
  *     original ×4+2s wall-clock band was a flake on a shared machine
  *     whose ambient same-binary swings are documented at ×2.8 — GC
  *     or page-cache pressure right after the giant batch could trip
  *     it with no regression): after ingesting multi-MB giants, the
  *     INDEX state stays sketch-sized — orders of magnitude below one
  *     giant's text — so no per-batch cost can inherit anything
  *     giant-sized. Batch wall times are still printed (info-only).
  *  3. state is O(markers) filesystem metadata both sides (asserted
  *     structurally: marker files exist, nothing else grows).
  */
class StreamHeterogeneitySpec extends SparkSpec {

  /** Total bytes of regular files under a directory tree. */
  private def treeBytes(path: String): Long = {
    val root = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(root)) return 0L
    var n = 0L
    val it = java.nio.file.Files.walk(root)
    try it.forEach { p =>
      if (java.nio.file.Files.isRegularFile(p)) n += java.nio.file.Files.size(p)
    } finally it.close()
    n
  }

  // ~6 MB giant: one ~300-char line repeated 20k times, the ScaleData
  // GiantMult shape (distinct shingle/token sets stay tiny — that is
  // exactly what makes the honest streaming cost bounded)
  private def giantText: String = {
    val line = (1 to 30).map(i => s"gtok$i").mkString(" ")
    Seq.fill(20000)(line).mkString(" ")
  }

  private def normalDoc(i: Int): String =
    (1 to 40).map(j => s"w${i}x$j").mkString(" ")

  test("NearStreamDedup absorbs a zipf giant per batch: correct drops, sketch-sized state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_near_giant").toString
    val (idx, outp, ckpt) = (s"$dir/idx", s"$dir/out", s"$dir/ckpt")

    val mem = MemoryStream[(Long, String)]
    val q = NearStreamDedup.toStore(mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", idx, outp, ckpt)
    val giant = giantText
    val batchMs = scala.collection.mutable.ArrayBuffer[Long]()
    def feed(rows: Seq[(Long, String)]): Unit = {
      val t0 = System.nanoTime()
      mem.addData(rows)
      q.processAllAvailable()
      batchMs += (System.nanoTime() - t0) / 1000000L
    }
    try {
      // batch 0-1: normal docs (the pre-giant envelope)
      feed((0 until 50).map(i => (i.toLong, normalDoc(i))))
      feed((50 until 100).map(i => (i.toLong, normalDoc(i))))
      // batch 2: one giant among normals
      feed(Seq((1000L, giant)) ++ (100 until 130).map(i => (i.toLong, normalDoc(i))))
      // batch 3: the giant RE-SENT under a new id (must near-drop
      // against the indexed giant) + normals
      feed(Seq((2000L, giant)) ++ (130 until 160).map(i => (i.toLong, normalDoc(i))))
      // batch 4: normals again (the recovery point)
      feed((160 until 210).map(i => (i.toLong, normalDoc(i))))
    } finally q.stop()

    val survivors = s.read.parquet(outp).select("doc_id").as[Long].collect().toSet
    assert(survivors.contains(1000L), "the giant's first instance must survive")
    assert(!survivors.contains(2000L),
      "the re-sent giant must drop against the indexed giant's signature")
    assert((0 until 210).forall(i => survivors.contains(i.toLong)),
      "distinct normal docs must all survive")
    // structural recovery: after TWO ~6 MB giants flowed through, the
    // index (bands + signatures + markers) must stay sketch-sized —
    // far below a single giant's text. A path that let the giant leak
    // into per-doc state would jump past this by the giant's size.
    val giantBytes = giant.getBytes("UTF-8").length.toLong
    val idxBytes = treeBytes(idx)
    assert(idxBytes < giantBytes / 2,
      s"index state $idxBytes B is not sketch-sized vs one giant " +
        s"($giantBytes B): giant-sized payload leaked into state")
    // state is marker files only
    assert(new java.io.File(s"$idx/_batches").listFiles().nonEmpty)
    info(s"batch ms (info-only): ${batchMs.mkString(", ")}; " +
      s"index bytes: $idxBytes vs giant $giantBytes")
  }

  test("TextIndexAddStream absorbs a zipf giant per batch: exact doclen, postings-sized state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_tidx_giant").toString
    val idx = s"$dir/idx"
    // seed index (TextIndexAddStream requires an existing build)
    graft.operators.TextIndex.build(
      (0 until 20).map(i => (i.toLong, normalDoc(i))).toDF("doc_id", "text"),
      "doc_id", "text", idx)

    val mem = MemoryStream[(Long, String)]
    val q = TextIndexAddStream.toIndex(mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", idx, s"$dir/ckpt")
    val giant = giantText
    val batchMs = scala.collection.mutable.ArrayBuffer[Long]()
    def feed(rows: Seq[(Long, String)]): Unit = {
      val t0 = System.nanoTime()
      mem.addData(rows)
      q.processAllAvailable()
      batchMs += (System.nanoTime() - t0) / 1000000L
    }
    try {
      feed((100 until 130).map(i => (i.toLong, normalDoc(i))))
      feed(Seq((5000L, giant)) ++ (130 until 150).map(i => (i.toLong, normalDoc(i))))
      feed((150 until 180).map(i => (i.toLong, normalDoc(i))))
    } finally q.stop()

    // exact doclen for the giant: 30 tokens × 20000 repeats
    val dl = s.read.parquet(s"$idx/doclen")
      .filter(col("doc_id") === 5000L).groupBy("doc_id")
      .agg(max("dl").as("dl")).head().getLong(1)
    assert(dl === 600000L, s"giant doclen $dl != exact 600000")
    // the giant is retrievable and scored against the grown corpus
    val hits = graft.operators.TextIndex.bm25(s, idx, Seq("gtok1", "gtok7"))
    assert(hits.filter(col("doc_id") === 5000L).count() === 1,
      "giant must be retrievable through the streamed index")
    // structural recovery: the text index holds postings (token,
    // doc_id, tf) + doclens — the ~6 MB / 600k-token giant must
    // contribute exactly its 30 DISTINCT tokens as postings rows and
    // one doclen row, never anything text-sized. (Row counts, not
    // tree bytes: postings accumulate many small parquet files per
    // streamed batch — compaction's job — so raw bytes measure file
    // overhead, not payload.)
    val giantPostings = s.read.parquet(s"$idx/postings")
      .filter(col("doc_id") === 5000L)
    assert(giantPostings.count() === 30L,
      "giant must contribute exactly its 30 distinct tokens as postings")
    val giantDoclen = s.read.parquet(s"$idx/doclen")
      .filter(col("doc_id") === 5000L).count()
    assert(giantDoclen === 1L, "giant must contribute exactly one doclen row")
    info(s"batch ms (info-only): ${batchMs.mkString(", ")}; " +
      s"index bytes (info-only): ${treeBytes(idx)}")
  }
}
