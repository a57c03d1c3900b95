package graft

/** Dev tool: print the formatted physical plan of declared queries —
  * the audit loop for shuffle/broadcast/pushdown shapes (run after
  * changing an operator; the plan you want, not just the first one
  * that passes). */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("graft-explain", "4")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"==== $n")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
