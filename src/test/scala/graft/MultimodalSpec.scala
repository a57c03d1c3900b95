package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO
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
    // text bytes are not an image: every row falls back, flagged
    assert(f1.forall(!_.decoded))
  }

  private def png(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, rgb(x, y))
    val out = new ByteArrayOutputStream()
    ImageIO.write(im, "png", out)
    out.toByteArray
  }

  test("real image payloads decode to (width, height, mean_luma)") {
    import graft.SparkSpec.spark.implicits._
    val white = png(3, 2, (_, _) => 0xffffff)          // luma 255
    val black = png(4, 5, (_, _) => 0x000000)          // luma 0
    val grey  = png(2, 2, (_, _) => 0x808080)          // luma 128
    val mixed = png(2, 1, (x, _) => if (x == 0) 0xffffff else 0x000000) // luma 127.5
    val docs = Seq((1L, white), (2L, black), (3L, grey), (4L, mixed),
      (5L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val f = Multimodal.extractFeatures(spark, docs, "doc_id")
      .collect().map(p => p.doc_id -> p).toMap
    assert(f(1L).decoded && f(1L).width === 3 && f(1L).height === 2 && f(1L).mean_luma === 255.0)
    assert(f(2L).decoded && f(2L).width === 4 && f(2L).height === 5 && f(2L).mean_luma === 0.0)
    assert(f(3L).decoded && f(3L).mean_luma === 128.0)
    assert(f(4L).decoded && f(4L).mean_luma === 127.5)
    assert(!f(5L).decoded && f(5L).byte_len === 12)
  }
}
