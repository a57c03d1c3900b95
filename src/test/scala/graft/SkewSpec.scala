package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.TrendStore
import graft.queries.TextSim

/** Demonstrated skew resilience — the 100×-scale claims that were
  * previously asserted only in comments ("the Zipf head is AQE
  * skew-join territory", "the fact side never shuffles for the
  * hierarchy walk") exercised on PLANTED skew:
  *
  *  1. a Zipf-head corpus (one token carrying ~50% of all token rows)
  *     drives the d20 token-keyed freq join with broadcast disabled
  *     (at 100 TB the vocabulary does not broadcast) and LOWERED AQE
  *     skew thresholds — the spec asserts AQE's skew-join split
  *     actually engages (`skew=true` in the final adaptive plan) and
  *     that the split is a pure performance transform (results
  *     bit-identical to the unsplit broadcast run);
  *  2. the same corpus through the d28 vocab-profile shape asserts the
  *     NO-JOIN defence: a two-level distinct aggregation whose first
  *     shuffle keys on (token, doc_id) — the hot token spreads across
  *     partitions by doc_id, and map-side partials bound every later
  *     token-keyed row count by O(distinct docs), never O(occurrences);
  *  3. a hot-entity trend store (one entity with 100× the rows of its
  *     peers) through the t03/e05 entity rollup asserts the
  *     BROADCAST + PARTIAL-AGG defence: the only shuffle keys on the
  *     (parent, bucket) output, raw rows never shuffle on the skewed
  *     entity key, and map-side partial aggregation means the hot
  *     entity contributes O(map partitions) rows to that shuffle.
  *
  * Threshold scaling note: the AQE knobs lowered here
  * (skewedPartitionThresholdInBytes, advisoryPartitionSizeInBytes)
  * exist to make a ~1 MB test partition "skewed"; production keeps the
  * defaults (256 MB / 64 MB) and sees the identical split mechanism —
  * the rule is data-size-relative, which is the point of testing the
  * MECHANISM engages rather than a hard-coded partition count.
  */
class SkewSpec extends SparkSpec {

  /** Run `body` under temporary session confs, restoring after. */
  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Zipf-head corpus: every doc repeats the hot token 10×, plus 10
    * cold tokens from a ~5000-token tail — the hot token carries 50%
    * of all token rows, the d20/d28 worst case. */
  private def zipfDocs: DataFrame =
    spark.range(0, 4000).select(
      col("id").as("doc_id"),
      concat(
        lit(Seq.fill(10)("the").mkString("", " ", " ")),
        concat_ws(" ", (0 until 10).map(i =>
          concat(lit(s"t${i}_"), (col("id") % 500).cast("string"))): _*)
      ).as("text"))

  test("Zipf-head stored-LM join engages AQE skew-join splitting; split changes nothing but the plan") {
    val docs = zipfDocs.cache()
    val freqDir = java.nio.file.Files.createTempDirectory("graft_skew_freq").toString
    try {
      // the stored unigram LM: trained once, scored many times
      docs.select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cf"))
        .write.mode("overwrite").parquet(freqDir)
      val freq = spark.read.parquet(freqDir)
      // ground truth: default confs (freq side broadcasts — no skew path)
      val expected = TextSim.rarityScore(docs, freq).collect().toSet

      withConf(
        // at 100 TB the vocab side does not broadcast — force the
        // shuffle join the production plan would run
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
        // scale the skew rule to test-sized partitions (see scaladoc);
        // sizes are COMPRESSED shuffle bytes and the planted hot rows
        // compress well, so thresholds sit far below raw size
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB") {
        val skewed = TextSim.rarityScore(docs, freq)
        val got = skewed.collect().toSet
        val plan = skewed.queryExecution.executedPlan.toString
        assert(plan.contains("skew=true"),
          s"AQE skew-join split did not engage on the Zipf-head join:\n$plan")
        assert(got === expected,
          "skew-split join changed results — the split must be plan-only")

        // control: same confs with the splitter off — the skewed plan
        // is the ONLY difference, results still equal
        withConf("spark.sql.adaptive.skewJoin.enabled" -> "false") {
          val unsplit = TextSim.rarityScore(docs, freq)
          val got2 = unsplit.collect().toSet
          assert(!unsplit.queryExecution.executedPlan.toString.contains("skew=true"))
          assert(got2 === expected)
        }
      }
    } finally {
      docs.unpersist()
      ()
    }
  }

  test("Zipf-head separation: rarity(hotTokens=N) broadcasts the head — hot rows never shuffle; results identical") {
    val docs = zipfDocs.cache()
    try {
      val expected = TextSim.rarity(docs).collect().toSet
      withConf(
        // tail freq must not auto-broadcast, or the test proves nothing
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
        val split = TextSim.rarity(docs, hotTokens = 50)
        val got = split.collect().toSet
        assert(got === expected,
          "hot-token separation changed results — must be plan-only")
        val plan = split.queryExecution.executedPlan.toString
        // the head (and the anti-filter that removes it from the tail
        // side) broadcasts; only the de-skewed tail shuffle-joins
        assert(plan.contains("BroadcastHashJoin"),
          s"hot head must join via broadcast:\n$plan")
        assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
          s"cold tail keeps the shuffle join:\n$plan")
      }
    } finally docs.unpersist()
  }

  test("Zipf-head vocab profile (d28 shape) never joins: composite-key shuffle + partials absorb the hot token") {
    val docs = zipfDocs
    val profile = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(100)
    val rows = profile.collect()
    val plan = profile.queryExecution.executedPlan.toString
    // no join for skew to poison, no Expand blowup, no global sort;
    // map-side partials visible in the plan
    assert(!plan.contains("Join"), s"d28 shape must not join:\n$plan")
    assert(!plan.contains("Expand"), s"single-distinct must not Expand:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"top-k must not global-sort:\n$plan")
    assert(plan.contains("partial_count"), s"expected map-side partial agg:\n$plan")
    // the hot token is exactly counted through the two-level path
    assert(rows.head.getString(0) === "the" &&
      rows.head.getLong(1) === 40000L && rows.head.getLong(2) === 4000L)
  }

  test("hot-entity rollup: raw rows never shuffle on the skewed entity key") {
    // one entity with 100× the rows of each of its 100 peers
    val hot = spark.range(0, 100000).select(
      lit(1L).as("entity_id"),
      expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0, id % 86400)").as("ts"),
      (col("id") % 100).cast("double").as("value"))
    val cold = spark.range(0, 100000).select(
      (col("id") % 100 + 2L).as("entity_id"),
      expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0, id % 86400)").as("ts"),
      (col("id") % 50).cast("double").as("value"))
    val trend = hot.unionAll(cold)
    val relation = spark.range(1, 102).select(
      col("id").as("child"),
      when(col("id") <= 51, "segA").otherwise("segB").as("parent"))

    val rolled = TrendStore.entityRollupBucketed(trend, col("entity_id"),
      col("ts"), col("value"), "day", relation, "child", "parent")
    val rows = rolled.collect()
    val plan = rolled.queryExecution.executedPlan.toString

    // the hierarchy walk broadcasts; the fact side's one shuffle keys
    // on the OUTPUT (parent, bucket), never the skewed entity key
    assert(plan.contains("BroadcastHashJoin"), s"relation join must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"fact side must not shuffle for the join:\n$plan")
    assert(!plan.contains("hashpartitioning(entity_id"),
      s"raw rows shuffled on the skewed entity key:\n$plan")
    // map-side partials: the hot entity contributes O(map partitions)
    // rows to the one shuffle, not O(rows)
    assert(plan.contains("partial_count"), s"expected map-side partial agg:\n$plan")

    // exact totals through the skewed path
    val byParent = rows.map(r => r.getString(0) -> r.getLong(2)).groupBy(_._1)
      .view.mapValues(_.map(_._2).sum).toMap
    // segA: hot entity (100k rows) + cold entities 2..51 (50 × 1000);
    // segB: cold entities 52..101 (50 × 1000)
    assert(byParent("segA") === 100000L + 50000L)
    assert(byParent("segB") === 50000L)
  }
}
