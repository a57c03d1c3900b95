package graft

import org.apache.spark.sql.functions._
import graft.functions.HammingDistance.hamming
import graft.functions.TextFunctions
import graft.operators.Dedup
import graft.sources.TableCatalog

class DedupSpec extends SparkSpec {

  private lazy val docs = TableCatalog(spark, sf).documents.cache()

  test("exact dedup groups partition the corpus") {
    val g = Dedup.exact(docs, "doc_id", "text")
    assert(g.agg(sum("n_docs")).head.getLong(0) === docs.count())
  }

  test("minhash LSH finds all high-similarity pairs and verifies exactly") {
    val exact = Dedup.shingleJaccard(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val lsh = Dedup.minhashLsh(docs, "doc_id", "text", 3, 64, 16, 0.7)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // soundness: every LSH pair is a true pair with identical exact jaccard
    lsh.foreach { case (pair, jac) =>
      assert(exact.contains(pair) && math.abs(exact(pair) - jac) < 1e-12) }
    // completeness: pairs at >= 0.9 are found w.p. ~1 (16 bands x 4 rows)
    exact.filter(_._2 >= 0.9).keys.foreach(p => assert(lsh.contains(p)))
  }

  test("simhash pairs are true near-duplicates (precision)") {
    val exact = Dedup.shingleJaccard(docs, "doc_id", "text", 3, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simhashPairs(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    sim.foreach(p => assert(exact.contains(p), s"simhash false positive: $p"))
  }

  test("simhash recall on planted near-duplicates") {
    import graft.SparkSpec.spark.implicits._
    // 20 planted pairs: a 200-token doc and a copy with one token
    // APPENDED (one extra shingle of ~200 → the 60-bit fingerprint
    // moves by a few bits at most), so the hamming ≤ 3 band join —
    // its exact pigeonhole regime — must surface the pair.
    val rnd = new scala.util.Random(7)
    val vocab = Vector.tabulate(500)(i => s"w$i")
    val docs = (0 until 20).flatMap { i =>
      val toks = Vector.fill(200)(vocab(rnd.nextInt(vocab.size)))
      val mutated = toks :+ ("MUT" + i)
      Seq((i * 2L, toks.mkString(" ")), (i * 2L + 1, mutated.mkString(" ")))
    }.toDF("doc_id", "text")
    val found = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 20).map(i => (i * 2L, i * 2L + 1)).toSet
    val recall = (planted & found).size.toDouble / planted.size
    assert(recall >= 0.8, s"simhash recall $recall on planted near-dups")
  }

  test("native sketch expressions are bit-identical to the HOF reference") {
    val base = docs.limit(100)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("__toks"))
      .withColumn("__sh", TextFunctions.shinglesOf("__toks", 3))
      .filter(size(col("__sh")) > 0)
      .withColumn("__h", TextFunctions.shingleHashes(col("__sh")))
    val mh = base.select(
      graft.functions.MinHashSigExpr.minhash(col("__h"), 64).as("native"),
      TextFunctions.minhashSignature(col("__h"), 64).as("hof"))
    assert(mh.filter(col("native") =!= col("hof")).isEmpty)
    val sh = base.select(
      graft.functions.SimHashExpr.simhash(
        transform(col("__sh"), s => xxhash64(s))).as("native"),
      TextFunctions.simhashExpr("__sh").as("hof"))
    assert(sh.filter(col("native") =!= col("hof")).isEmpty)
  }

  test("hamming expression matches bit_count(xor)") {
    val df = spark.range(1000).select(
      xxhash64(col("id")).as("a"), xxhash64(col("id") + 7).as("b"))
    val bad = df.select(hamming(col("a"), col("b")).as("h"),
        expr("CAST(bit_count(a ^ b) AS BIGINT)").as("e"))
      .filter(col("h") =!= col("e"))
    assert(bad.isEmpty)
    assert(df.select(hamming(col("a"), col("a"))).distinct().head.getLong(0) === 0L)
  }

  test("fingerprint collapses near-duplicate prefix docs") {
    val fp = Dedup.fingerprint(docs, "doc_id", "text", 3)
    assert(fp.agg(sum("n_docs")).head.getLong(0) === docs.count())
    // at least one cluster of size > 1 exists in this corpus
    assert(fp.filter(col("n_docs") > 1).count() > 0)
  }

  test("winnowing: docs sharing a long substring share a fingerprint") {
    import graft.SparkSpec.spark.implicits._
    val shared = "a very distinctive shared passage of text here"
    val df = Seq(
      (1L, s"prefix one $shared suffix alpha"),
      (2L, s"totally different lead-in $shared and another tail"),
      (3L, "nothing in common with the others at all, separate text"))
      .toDF("doc_id", "text")
      .withColumn("__hs", graft.functions.TextFunctions.gramHashes("text", 8))
      .withColumn("fps", array_distinct(graft.functions.TextFunctions.winnowMins("__hs", 4)))
    val fps = df.select("doc_id", "fps").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    // guaranteed by winnowing: a shared substring of length >= k+w-1
    // (11 chars here, shared passage is 46) yields a shared fingerprint
    assert((fps(1L) & fps(2L)).nonEmpty)
    // and fingerprint density is ~2/(w+1), not the full gram set
    assert(fps(1L).size < 40)
  }

  test("shingles are distinct, ordered n-grams") {
    import graft.SparkSpec.spark.implicits._
    val df = Seq("a b c d", "x y", "").toDF("text")
      .select(TextFunctions.tokens(col("text")).as("t"))
      .select(TextFunctions.shinglesOf("t", 3).as("sh"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0) === Seq("a b c", "b c d"))
    assert(rows(1) === Seq.empty)
  }

  test("spanScrub removes every non-first instance of a cross-doc span, token-exactly") {
    import graft.SparkSpec.spark.implicits._
    // window=4, stride=2 for a readable case. The shared 4-token span
    // "p q r s" appears in docs 1 (keeper: lowest doc), 2 and 3.
    val docs = Seq(
      (1L, "p q r s a1 a2 a3 a4"),            // keeper — untouched
      (2L, "b1 b2 p q r s b3 b4"),            // loses the span only
      (3L, "p q r s"),                        // the whole doc is the span
      (4L, "solo c1 c2"),                     // < window tokens — untouched
      (5L, "d1 d2 d3 d4 d5 d6")               // no dup spans — untouched
    ).toDF("doc_id", "text")
    val out = Dedup.spanScrub(docs, "doc_id", "text", window = 4, stride = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === (("p q r s a1 a2 a3 a4", 8L, 0L)))
    assert(out(4L) === (("solo c1 c2", 3L, 0L)))
    assert(out(5L) === (("d1 d2 d3 d4 d5 d6", 6L, 0L)))
    // doc 2: windows start at 1,3,5; "p q r s" sits at 3 → tokens 3-6 drop
    assert(out(2L) === (("b1 b2 b3 b4", 8L, 4L)))
    // doc 3: its only window duplicates doc 1's → everything drops
    assert(out(3L) === (("", 4L, 4L)))

    // keeper choice is positional, not insertion-order: same corpus
    // with ids permuted keeps the NEW lowest doc intact
    val permuted = docs.withColumn("doc_id",
      when(col("doc_id") === 1, 9L).otherwise(col("doc_id")))
    val out2 = Dedup.spanScrub(permuted, "doc_id", "text", window = 4, stride = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out2(2L) === "b1 b2 p q r s b3 b4") // doc 2 is now the keeper
    assert(out2(9L) === "a1 a2 a3 a4")         // old keeper loses the span
    assert(out2(3L) === "")
  }

  test("spanScrubIncremental: cross-batch scrub with batch-tag exactly-once replay") {
    import graft.SparkSpec.spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("graft_spanidx").toString + "/idx"
    def scrub(docs: org.apache.spark.sql.DataFrame, batch: String) =
      Dedup.spanScrubIncremental(spark, docs, "doc_id", "text", idx, batch,
        window = 4, stride = 2)
    def texts(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    // batch 1 against an empty index ≡ one-shot spanScrub
    val b1 = Seq((1L, "p q r s x1 x2"), (2L, "p q r s y1 y2")).toDF("doc_id", "text")
    val r1 = scrub(b1, "b1")
    val got1 = texts(r1.survivors)
    assert(got1 === texts(Dedup.spanScrub(b1, "doc_id", "text", 4, 2)))
    assert(got1 === Map(1L -> "p q r s x1 x2", 2L -> "y1 y2"))
    r1.commit()

    // batch 2: an indexed span scrubs with NO keeper (the corpus holds
    // the original); a batch-internal dup keeps its batch keeper
    val b2 = Seq(
      (3L, "p q r s z1 z2"),          // "p q r s" indexed → drops
      (4L, "m1 m2 m3 m4 m5 m6"),      // batch keeper of "m1 m2 m3 m4"
      (5L, "m1 m2 m3 m4 n5 n6")       // batch dup → loses it
    ).toDF("doc_id", "text")
    val r2 = scrub(b2, "b2")
    val got2 = texts(r2.survivors)
    assert(got2 === Map(3L -> "z1 z2", 4L -> "m1 m2 m3 m4 m5 m6", 5L -> "n5 n6"))
    r2.commit()
    val idxRows = spark.read.parquet(idx).count()

    // committed replay of batch 2: the probe excludes its own tag, so
    // the output is bit-identical (NOT emptied against its own spans)
    // and the re-commit is a no-op
    val r2b = scrub(b2, "b2")
    assert(texts(r2b.survivors) === got2)
    r2b.commit()
    assert(spark.read.parquet(idx).count() === idxRows)

    // batch 3 sees batch 2's committed cleaned spans
    val b3 = Seq((6L, "m1 m2 m3 m4 q7 q8")).toDF("doc_id", "text")
    assert(texts(scrub(b3, "b3").survivors) === Map(6L -> "q7 q8"))
  }
}
