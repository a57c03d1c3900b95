package graft

import org.apache.spark.sql.functions._

/** d34/d36's stored text index: the postings table is partitioned by
  * token, so boolean retrieval must read only the query tokens'
  * directories (static partition pruning — the same serve-path
  * discipline SimilaritySpec asserts for IVF cell scans). */
class TextIndexSpec extends SparkSpec {

  import graft.SparkSpec.spark.implicits._

  test("boolean retrieval prunes to the query tokens' partitions and ranks by coverage") {
    val docs = Seq(
      (1L, "spark stream vector"), // matches all 3
      (2L, "spark stream noise"),  // matches 2
      (3L, "vector only here"),    // matches 1 → filtered
      (4L, "nothing relevant"),    // matches 0
      (5L, "stream vector stuff")  // matches 2
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_textidx").toString + "/idx"
    docs.select(explode(split(col("text"), " ")).as("token"), col("doc_id"))
      .filter(col("token") =!= "").distinct()
      .write.partitionBy("token").parquet(dir)

    val q = spark.read.parquet(dir)
      .filter(col("token").isin("spark", "vector", "stream"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_matched"))
      .filter(col("n_matched") >= 2)
      .orderBy(col("n_matched").desc, col("doc_id"))

    assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 3L), (2L, 2L), (5L, 2L)))

    // the planted corpus has 9 distinct tokens → 9 directories; the
    // 3-token query must have touched exactly 3
    def scansOf(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
      val here = p match {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scansOf(a.inputPlan)
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scansOf(qs.plan)
        case _ => Seq.empty
      }
      here ++ p.children.flatMap(scansOf)
    }
    val scans = scansOf(q.queryExecution.executedPlan)
    assert(scans.nonEmpty, "no file scan in retrieval plan")
    scans.foreach { s =>
      assert(s.partitionFilters.nonEmpty, "postings scan has no partition filter")
      assert(s.selectedPartitions.partitionCount === 3,
        s"expected 3 pruned partitions, read ${s.selectedPartitions.partitionCount}")
    }
  }
}
