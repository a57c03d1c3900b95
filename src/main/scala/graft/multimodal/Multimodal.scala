package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with typed metadata, and run batched
  * decode / feature-extraction over them.
  *
  * The Spark-side shapes are real and tested — binary schema, batch
  * iteration, feature struct output. The codec itself is a clearly
  * marked STUB (`fakeDecode`): the real image/audio libraries are not
  * in this container, so it derives deterministic fake features from
  * the raw bytes. Swapping in a real decoder changes one function.
  */
object Multimodal {

  /** Extracted per-payload features. */
  case class PayloadFeatures(doc_id: Long, byte_len: Int, head_int: Long, mean_byte: Double)

  /** Attach a binary payload column (UTF-8 bytes of `textCol` — in a
    * real pipeline this is the stored media blob). */
  def withPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", col(textCol).cast("binary"))

  /** STUB decoder — stands in for image/audio decode + feature
    * extraction. Deterministic function of the bytes so tests and
    * oracles are stable. A real implementation would decode the codec
    * and emit embedding-sized vectors; the batching contract around
    * it would not change. */
  private def fakeDecode(batch: Array[(Long, Array[Byte])]): Iterator[PayloadFeatures] =
    batch.iterator.map { case (id, bytes) =>
      val head = bytes.take(8).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
      val mean = if (bytes.isEmpty) 0.0
        else bytes.foldLeft(0L)((acc, b) => acc + (b & 0xff)).toDouble / bytes.length
      PayloadFeatures(id, bytes.length, head, mean)
    }

  /** Batched feature extraction over a binary column: partitions are
    * consumed in `batchSize` groups, mirroring how a real decoder
    * amortizes model/codec setup per batch (the mapInPandas batch
    * shape, in Scala). Runs fully parallel per partition — no
    * driver-side collection. */
  def extractFeatures(spark: SparkSession, df: DataFrame, idCol: String,
                      batchSize: Int = 64): Dataset[PayloadFeatures] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(g => fakeDecode(g.toArray)))
  }
}
