package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.HammingDistance.hamming

/** Deduplication operators over a document corpus — the exact and
  * near-dup family a 100 TB training-data pipeline needs.
  *
  * Scale shapes:
  *  - exact: one hash-groupBy (single shuffle on the content hash).
  *  - shingleJaccard: exact n-gram Jaccard via an inverted-index
  *    self-join on shingles — correct but O(Σ df²); the reference
  *    answer for tests and small corpora.
  *  - minhashLsh: the 100 TB path — constant-size signatures, band
  *    bucket join generates candidates, exact Jaccard verifies them.
  *    Join volume is bounded by band-bucket sizes, not corpus².
  *  - simhashPairs: constant-size fingerprints, pigeonhole band join,
  *    fused native hamming filter.
  */
object Dedup {

  /** Exact dedup groups by content hash: (hash, n_docs, min_doc_id). */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("min_doc_id"))

  /** Distinct (id, shingle) pairs. */
  private def shingleSets(docs: DataFrame, idCol: String, textCol: String, k: Int) =
    docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), explode(shinglesOf("__toks", k)).as("s"))

  /** Exact n-gram Jaccard pairs at or above `threshold`. */
  def shingleJaccard(docs: DataFrame, idCol: String, textCol: String,
                     k: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = shingleSets(docs, idCol, textCol, k).cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n", "na"), "a_id")
      .join(sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n", "nb"), "b_id")
      .withColumn("jac", col("c") / (col("na") + col("nb") - col("c")))
      .filter(col("jac") >= threshold)
      .select(col("a_id"), col("b_id"), col("jac"))
  }

  /** MinHash + LSH near-dup pairs: signature → band keys → bucket
    * join → exact-Jaccard verification of the candidates only. */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
                 k: Int = 3, numPerm: Int = 64, bands: Int = 16,
                 threshold: Double = 0.7): DataFrame = {
    val withSh = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__toks"))
      .withColumn("__sh", shinglesOf("__toks", k))
      .filter(size(col("__sh")) > 0)
      .withColumn("__h", shingleHashes(col("__sh")))
      .cache() // shared by the signature path and the exact-verify path
    val sigs = withSh.withColumn("__sig",
      graft.functions.MinHashSigExpr.minhash(col("__h"), numPerm))
    val bandKeys = sigs.select(col("doc_id"),
      explode(lshBands(col("__sig"), bands, numPerm / bands)).as("band"))
    val candidates = bandKeys.as("a").join(bandKeys.as("b"),
        col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    // verify candidates with exact Jaccard on the shingle sets
    val sh = withSh.select(col("doc_id"), explode(col("__sh")).as("s"))
    val sizes = withSh.select(col("doc_id"), size(col("__sh")).as("n"))
    val shA = sh.toDF("a_id", "sa")
    val shB = sh.toDF("bb_id", "sb")
    val inter = candidates
      .join(shA, "a_id")
      .join(shB, col("b_id") === col("bb_id") && col("sa") === col("sb"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("c"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n", "na"), "a_id")
      .join(sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n", "nb"), "b_id")
      .withColumn("jac", col("c") / (col("na") + col("nb") - col("c")))
      .filter(col("jac") >= threshold)
      .select(col("a_id"), col("b_id"), col("jac"))
  }

  /** SimHash near-dup pairs: shingle-based fingerprints (shingles are
    * discriminative even over a small vocabulary; raw tokens are not),
    * pigeonhole 16-bit band join, native fused hamming filter. A pair
    * within `maxHamming` ≤ 3 is guaranteed to share one of the 4
    * bands; larger thresholds trade recall for join volume. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val fps = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__toks"))
      .withColumn("__sh", shinglesOf("__toks", 3))
      .filter(size(col("__sh")) > 0)
      .withColumn("fp", graft.functions.SimHashExpr.simhash(
        transform(col("__sh"), s => xxhash64(s))))
      .select(col("doc_id"), col("fp"))
    val bandKeys = fps.select(col("doc_id"), col("fp"),
      explode(simhashBandsExpr("fp")).as("band"))
    bandKeys.as("a").join(bandKeys.as("b"),
        col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        hamming(col("a.fp"), col("b.fp")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** One-permutation document fingerprint: min(md5(shingle)) — the
    * SQL-expressible MinHash special case (collision prob = Jaccard),
    * grouped into dedup clusters. */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame =
    docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__toks"))
      .withColumn("__sh", shinglesOf("__toks", k))
      .filter(size(col("__sh")) > 0)
      .select(col("doc_id"),
        array_min(transform(col("__sh"), s => md5(s))).as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc_id"))
}
