package graft


/** SHUFFLE-BUDGET gate — the scale claim the SURVEY rows make in
  * prose ("one combine-friendly groupBy", "one entity-keyed shuffle
  * family"), machine-checked: each audited key's physical plan may
  * declare AT MOST its budgeted number of shuffle exchanges. Every
  * exchange is a full rewrite of the data over the network; at 100 TB
  * an accidental extra shuffle (a lost partitioning, a join that
  * stopped broadcasting, an orderBy sneaking above an agg) is the
  * difference between one pass and two. The plan-hygiene gate in
  * QueriesSpec catches O(n²) products; this catches O(n) passes
  * silently becoming O(2n).
  *
  * Counts are taken on the executed plan's INITIAL tree (before any
  * adaptive stage replaces an Exchange with a reused query stage), so
  * the budget is the plan's declared shape, independent of AQE's
  * runtime reuse decisions. Broadcast exchanges are deliberately NOT
  * counted — shipping a small dimension to every executor is the
  * cheap alternative the gate wants plans to prefer. Budgets are
  * exact current counts, not upper bounds with slack: a key that
  * learns to use FEWER shuffles should have its budget lowered (the
  * failure message says so).
  */
class ShuffleBudgetSpec extends SparkSpec with org.scalatest.BeforeAndAfterEach {

  // plan-shape gate: judge the real reader, not another suite's
  // leftover cached fragment (see PushdownSpec — cached stats can
  // also flip join strategies and shift the declared exchange count)
  override protected def beforeEach(): Unit = {
    spark.sharedState.cacheManager.clearCache()
    super.beforeEach()
  }

  // shuffle exchanges by physical node name: hash / range / single
  // partitioning (rebalance/repartition hints also print this way);
  // BroadcastExchange intentionally excluded
  private val shuffleNode =
    ("Exchange (hashpartitioning|rangepartitioning|SinglePartition|" +
      "RoundRobinPartitioning)").r

  private def shuffles(name: String): Int = {
    val plan = SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString
    shuffleNode.findAllIn(plan).size
  }

  // key -> declared shuffle budget (includes the presentation
  // orderBy's range exchange, so "one groupBy + sort" = 2; window
  // families repartition once per distinct partitioning)
  private val budgets: Map[String, Int] = Map(
    "q01_pricing_summary"        -> 2, // one agg + sort
    "q02_region_revenue"         -> 2, // dims broadcast; one agg + sort
    "t01_rollup_hour"            -> 2, // one (entity, bucket) agg + sort
    "t34_busy_hour"              -> 4, // profile agg, rank window, sort
    "t39_seasonality"            -> 4, // season agg + entity window family + sort
    "a09_attr_distribution"      -> 3, // as-of window, value agg (+share) , sort
    "a11_value_dwell"            -> 3, // timeline window family, value agg, sort
    "a12_attr_transitions"       -> 3, // timeline window family, edge agg, sort
    "d28_vocab_topk"             -> 2, // two-level distinct agg; TakeOrdered is shuffle-free
    "d29_doc_len_hist"           -> 2, // one O(buckets) partial agg + sort
    "d48_token_entropy"          -> 3, // (source, token) agg, source agg, sort
    "d52_zipf_fit"               -> 3, // token agg + rank window + source fold (sort rides it)
    "g01_agg_def"                -> 2, // one definition groupBy + sort
    "g06_agg_weighted"           -> 2, // wavg in the SAME single groupBy + sort
    "e05_entity_rollup_bucketed" -> 5, // relation compose + cell agg + sort
    "e10_contribution_share"     -> 4, // cell agg + parent window + sort
    "t15_counter_rate"           -> 3, // rollup agg + lag window + sort
    "n01_notifications"          -> 1, // rule rollup only — firings project in place
    "d01_dedup_exact"            -> 2  // one hash groupBy + sort
  )

  budgets.toSeq.sortBy(_._1).foreach { case (name, budget) =>
    test(s"$name stays within its shuffle budget ($budget)") {
      val n = shuffles(name)
      info(s"$name declares $n shuffle exchange(s)")
      assert(n <= budget,
        s"$name now declares $n shuffles (budget $budget) — a lost " +
          "partitioning or un-broadcast join added a full data pass")
      assert(n === budget,
        s"$name declares only $n shuffles (budget $budget) — tighten " +
          "the budget so the improvement can't silently regress")
    }
  }
}
