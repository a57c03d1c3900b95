package graft

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import graft.operators.TrendStoreWriter
import scala.jdk.CollectionConverters._

/** Clustered trend-store writes, graded against the REAL parquet
  * footers: with `clusterBy("entity_id")` each day partition's row
  * groups carry narrow, mostly-disjoint entity min/max statistics
  * (what a stats-pruning reader skips on), while the unclustered
  * write leaves every row group spanning ~the full entity range
  * (nothing prunable). The parquet block size is shrunk so the test
  * day splits into many row groups the way a 100 TB day does. */
class ClusteredWriteSpec extends SparkSpec {

  /** (min, max) of the entity_id column per row group of every data
    * file under a day partition, straight from the footers. */
  private def entityRanges(dayDir: String): Seq[(Long, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(dayDir)
    val fs = dir.getFileSystem(conf)
    fs.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .flatMap { s =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(s.getPath, conf))
        try {
          val idx = r.getFileMetaData.getSchema.getFieldIndex("entity_id")
          r.getFooter.getBlocks.asScala.toSeq.map { b =>
            val st = b.getColumns.get(idx).getStatistics
            (st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
              st.genericGetMax.asInstanceOf[java.lang.Long].longValue())
          }
        } finally r.close()
      }
  }

  test("clusterBy(entity_id) makes row-group entity stats narrow and prunable; row set unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cluster").toString
    val conf = spark.sparkContext.hadoopConfiguration
    val savedBlock = conf.get("parquet.block.size")
    // a 2024-01-01 "day" of 200k rows over 1000 entities, arriving in
    // entity-interleaved order (the harvest order — worst case for
    // stats); small parquet blocks split it into many row groups
    conf.setInt("parquet.block.size", 256 * 1024)
    try {
      val rolled = spark.range(0, 200000).select(
        ((col("id") * 7919) % 1000).as("entity_id"),
        expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0, CAST(id / 4 AS INT))").as("bucket"),
        (col("id") % 97).cast("double").as("value"))

      TrendStoreWriter.write(rolled, s"$dir/clustered", clusterBy = Seq("entity_id"))
      TrendStoreWriter.write(rolled, s"$dir/plain")

      // identical content either way
      val a = TrendStoreWriter.read(spark, s"$dir/clustered")
        .agg(count(lit(1)), sum(col("entity_id")), sum(col("value"))).head()
      val b = TrendStoreWriter.read(spark, s"$dir/plain")
        .agg(count(lit(1)), sum(col("entity_id")), sum(col("value"))).head()
      assert(a === b)

      val clustered = entityRanges(s"$dir/clustered/p_date=2024-01-01")
      val plain = entityRanges(s"$dir/plain/p_date=2024-01-01")
      assert(clustered.size >= 4, s"expected several row groups, got ${clustered.size}")
      assert(plain.size >= 4, s"expected several row groups, got ${plain.size}")

      // unclustered: every row group spans ~the whole [0, 999] range
      assert(plain.forall { case (mn, mx) => mx - mn > 900 },
        s"plain write unexpectedly clustered: $plain")
      // clustered: the day carves into narrow slices — on average a
      // row group covers a small fraction of the entity range, so an
      // equality/range predicate skips most groups
      val avgWidth = clustered.map { case (mn, mx) => mx - mn }.sum.toDouble / clustered.size
      assert(avgWidth < 300, s"row-group entity ranges not narrow: $clustered")
      // and they actually prune: a 50-entity probe intersects a minority
      val hit = clustered.count { case (mn, mx) => mn <= 149 && mx >= 100 }
      assert(hit.toDouble / clustered.size < 0.5,
        s"50-entity probe hit $hit of ${clustered.size} row groups")
    } finally {
      if (savedBlock == null) conf.unset("parquet.block.size")
      else conf.set("parquet.block.size", savedBlock)
    }
  }
}
