package graft

/** JOIN-STRATEGY gate — the "broadcast the small side" claims,
  * machine-checked: for keys whose SURVEY rows say a dimension or
  * relation table ships to the executors (never shuffles the fact),
  * the physical plan must contain at least one BroadcastHashJoin and
  * NO SortMergeJoin / ShuffledHashJoin. A dim join silently falling
  * back to sort-merge re-shuffles the FACT table on the join key —
  * two extra full-data exchanges the ShuffleBudgetSpec only catches
  * for its audited keys; this pins the strategy itself for the
  * broadcast-claiming family. (Statistics drift is the real-world
  * trigger: a dim that grows past the broadcast threshold, or a lost
  * size estimate after a schema change.)
  */
class JoinStrategySpec extends SparkSpec with org.scalatest.BeforeAndAfterEach {

  // plan-shape gate: judge the real reader, not another suite's
  // leftover cached fragment (see PushdownSpec)
  override protected def beforeEach(): Unit = {
    spark.sharedState.cacheManager.clearCache()
    super.beforeEach()
  }

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString

  // every key here claims "broadcast dim/relation ⋈ fact" in SURVEY
  private val mustBroadcastOnly = Seq(
    "q02_region_revenue",        // region/nation dims broadcast
    "t03_entity_rollup",         // customer segment dim broadcast
    "e05_entity_rollup_bucketed", // composed relation broadcast ⋈ orders
    "e07_entity_rollup_pct",     // same relation path, pct metrics
    "e08_top_contributors",      // broadcast relation + CollectMinK
    "e10_contribution_share",    // broadcast groups ⋈ orders
    "d20_rarity"                 // broadcast freq head ⋈ tokens
  )

  mustBroadcastOnly.foreach { name =>
    test(s"$name joins by broadcast only") {
      val p = plan(name)
      assert(p.contains("BroadcastHashJoin"),
        s"$name no longer broadcasts its dimension side:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
        s"$name fell back to a shuffled join — the fact table now " +
          s"re-shuffles on the join key:\n$p")
    }
  }
}
