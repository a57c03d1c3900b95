package graft

/** Smoke: every declared query runs at sf0.001 and yields a sane
  * result; query and oracle key sets line up (the driver contract). */
class QueriesSpec extends SparkSpec {

  test("oracle keys are a subset of query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // q05 (customers without orders) can legitimately be empty at tiny
  // scale; everything else must produce rows.
  private val mayBeEmpty = Set("q05_no_orders_anti", "d04_simhash")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }
}
