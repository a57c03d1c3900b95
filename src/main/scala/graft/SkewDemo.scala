package graft

import org.apache.spark.sql.{functions => F, SparkSession}

/** Skew-split engagement demo on REAL synthesized hot data (round 15).
  *
  * bench_skew.json shows no BOARD key exposes a skewed shuffle join at
  * sf3-hot — every plan collapses heat via partial-agg / distinct-first
  * / broadcast-model shapes before a join shuffles. This main is the
  * counterfactual: the join a user could write that does NOT collapse
  * heat first — orders ⋈ customer on the raw heated key with broadcast
  * disabled — so the hot o_custkey partition (~10% of 4.5 M orders ≈
  * 22 MB vs a ~7 MB median) is a genuinely skewed SMJ input. Run it
  * twice and stage_audit the event logs:
  *
  *   default thresholds  → the 256 MB skew floor does not trigger at
  *                         rehearsal bytes; the join stage shows ONE
  *                         fat task (max ≫ median);
  *   lowered thresholds  → AQE skew-split engages (task count above
  *                         the partition count, max ≈ median), same
  *                         row count — the identical mechanism a
  *                         100 TB run gets from the DEFAULT floors,
  *                         where the hot partition is GBs.
  *
  * SkewSpec asserts the same engagement plan-wise (`skew=true`) on
  * planted micro data; this main produces the task-level evidence on
  * the synthesized corpus. Usage:
  *   graft.SkewDemo <hotSfDir> [--split]
  * (--split lowers the AQE skew thresholds; event logging comes from
  * the caller's -Dspark.eventLog.* flags.)
  */
object SkewDemo {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.SkewDemo <hotSfDir> [--split]")
    val dir = args(0)
    val split = args.contains("--split")
    val b = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the demo is about the SHUFFLE join path — a broadcast would
      // absorb the skew trivially (that is the d39-style defense the
      // board keys use on purpose; here we disable it to expose the
      // mechanism the fallback relies on)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    if (split) {
      // sized to the MEASURED sf3-hot shuffle: the hot o_custkey
      // partition reads 6.05 MB compressed vs a 1.7 MB median (event
      // log, stage-level shuffle-read bytes) — production keeps the
      // 256 MB default and sees the identical rule fire when the hot
      // partition is GBs; the rule is data-size-relative (SkewSpec's
      // point, demonstrated here on the synthesized corpus)
      b.config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2MB")
      b.config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
      b.config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val c = spark.read.parquet(s"$dir/customer.parquet")
    val joined = o.join(c, o("o_custkey") === c("c_custkey"))
      .agg(F.count(F.lit(1)).as("n"), F.sum(F.col("o_totalprice")).as("s"))
    joined.collect().foreach(r => println(s"[skew-demo] rows=${r.get(0)} sum=${r.get(1)}"))
    val plan = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val skewed = plan.linesIterator.count(_.contains("skewed"))
    println(s"[skew-demo] split=$split skewed-read nodes in final plan: $skewed")
    if (sys.env.contains("SKEW_DEMO_PLAN")) System.err.println(plan)
    spark.stop()
  }
}
