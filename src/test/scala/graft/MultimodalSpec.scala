package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.sources.TableCatalog

class MultimodalSpec extends SparkSpec {

  test("payload metadata matches the source text byte-for-byte") {
    val docs = Multimodal.withPayload(TableCatalog(spark, sf).documents, "text")
    val bad = docs.filter(octet_length(col("payload")) =!= length(col("text")))
    assert(bad.isEmpty) // ascii corpus: bytes == chars
  }

  test("batched feature extraction is deterministic and total") {
    val docs = Multimodal.withPayload(TableCatalog(spark, sf).documents, "text")
    val f1 = Multimodal.extractFeatures(spark, docs, "doc_id").collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(spark, docs.repartition(7), "doc_id")
      .collect().sortBy(_.doc_id)
    assert(f1.length === docs.count())
    assert(f1.toSeq === f2.toSeq) // independent of partitioning/batching
    assert(f1.forall(f => f.mean_byte >= 0 && f.mean_byte <= 255))
  }
}
