package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Filesystem access for store/state management, through the Hadoop
  * `FileSystem` API so the same code runs on `file://` (tests),
  * HDFS, and S3A — a 100 TB deployment never stores state on a
  * driver-local disk, and `java.io.File` silently reports "absent"
  * there, which would re-materialize everything on every run.
  */
object StoreFs {

  def fs(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val (f, p) = fs(spark, path)
    f.exists(p)
  }

  /** `listStatus` names, or empty when the directory doesn't exist. */
  def list(spark: SparkSession, path: String): Seq[Path] = {
    val (f, p) = fs(spark, path)
    if (f.exists(p)) f.listStatus(p).toSeq.map(_.getPath) else Seq.empty
  }

  /** Replace `dest` with `src` (delete + rename), propagating a
    * failed rename instead of silently leaving stale state behind. */
  def replace(spark: SparkSession, src: String, dest: String): Unit = {
    val (f, d) = fs(spark, dest)
    if (f.exists(d) && !f.delete(d, true))
      throw new java.io.IOException(s"failed to delete $dest before swap")
    if (!f.rename(new Path(src), d))
      throw new java.io.IOException(s"failed to rename $src to $dest")
  }
}
