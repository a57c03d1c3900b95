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

  // Plan-hygiene allowlist: the ONLY keys whose plan carries a
  // product join, each intentional (probed empirically — every other
  // key, including the rest of the s-family, plans pure hash joins).
  // d09 is the declared all-pairs exact baseline (crossJoin in the
  // source, documented); s01/s06/s07/s10/s12 score a BROADCAST query
  // batch against candidates — a bounded BroadcastNestedLoopJoin
  // over the tiny query side, not a data×data product.
  // s16 inherits s01's broadcast-query product: its exact-truth side
  // IS a cosineTopK run; the recall join itself is a pure hash join.
  private val mayProduct = Set(
    "d09_embed_dup",
    "s01_cosine_topk", "s06_rrf_fusion",
    "s07_ann_pq", "s10_ann_pq_serve", "s12_ann_opq_serve",
    "s16_ann_recall", "s17_ann_tuning")

  // Keys whose whole point is a BOUNDED rank path (CollectMinK or a
  // struct-ordered min agg) instead of a per-group window sort — a
  // regression to row_number would silently reintroduce the
  // full-group sort on one reducer for skewed groups.
  private val mustBeWindowFree = Set(
    "e08_top_contributors", "d39_source_classifier", "d34_inverted_index")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
      // global plan hygiene: nothing may silently plan a cartesian /
      // nested-loop product — the O(n²) trap that kills a key at
      // 100 TB while passing every small-scale correctness check
      if (!mayProduct(name)) {
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct") &&
          !plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a product join:\n$plan")
      }
      if (mustBeWindowFree(name)) {
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("Window"),
          s"$name regressed to a window rank:\n$plan")
      }
    }
  }

  test("d49 sweep curve is monotone: raising the threshold never adds pairs or docs") {
    val rows = SparkEntry.queries("d49_dedup_sweep")(spark, sf)
      .orderBy(org.apache.spark.sql.functions.col("threshold"))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array((t1, p1, d1), (t2, p2, d2)) =>
        assert(p2 <= p1 && d2 <= d1,
          s"sweep not monotone: $t1 → ($p1, $d1) but $t2 → ($p2, $d2)")
      case _ =>
    }
  }
}
