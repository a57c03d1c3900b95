package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic subsampling for training-data pipelines.
  *
  * The downsampling step a data mix actually runs — "keep 25% of
  * web crawl, 50% of forums, all of books" — expressed WITHOUT an
  * RNG: the keep decision is `h(doc_id) < threshold` where h is the
  * md5-derived 16-bit hash the d14 dataset split uses and the
  * threshold is the stratum's rate as an INTEGER in the 2¹⁶ space.
  * Properties that matter at 100 TB:
  *   - reproducible: a pure function of the id — identical sample on
  *     any engine, partitioning, cluster size, or re-run, no seed
  *     plumbing, no sampling skew from task boundaries;
  *   - NESTED: the hash is each doc's permanent priority, so the 10%
  *     sample is a strict subset of the 50% sample — the scaling-law
  *     ladder (1% → 10% → 100%) comes free, no re-draws;
  *   - exact thresholds: integer comparison, no float boundary for
  *     engines to disagree on;
  *   - one codegen'd filter on the scan — no shuffle, no state.
  */
object Sampling {

  /** The 16-bit sampling hash (d14's construction): first 4 md5 hex
    * digits of the id as an integer in [0, 65536). */
  def sampleHash(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("long")

  /** A rate as its integer threshold in the 2¹⁶ hash space. */
  def threshold(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    math.round(rate * 65536.0)
  }

  /** Stratified subsample: keep each row iff its sampling hash is
    * below its stratum's threshold. Strata absent from `rates` use
    * `defaultRate`. */
  def stratified(docs: DataFrame, idCol: String, stratumCol: String,
                 rates: Map[String, Double],
                 defaultRate: Double = 1.0): DataFrame = {
    val thr = rates.toSeq.sortBy(_._1).foldLeft(lit(threshold(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(col(stratumCol) === stratum, lit(threshold(rate))).otherwise(acc)
    }
    docs.filter(sampleHash(col(idCol)) < thr)
  }

  /** DATA-DRIVEN stratified subsample: rates come from a computed
    * table (stratum, rate) instead of a config map — the shape a
    * mixture design produces (d32's temperature-flattened weights →
    * per-source keep rates). The rate column converts to an integer
    * threshold IN-PLAN (`floor(rate · 2¹⁶)` — floor, not round, so
    * there is no half-way convention for engines to disagree on) and
    * the rate table broadcasts onto the corpus scan: one map-side
    * hash-join + codegen'd filter, no shuffle of the corpus. Strata
    * absent from `rates` are dropped (inner join) — a mixture that
    * does not mention a source samples none of it. */
  def weighted(docs: DataFrame, idCol: String, stratumCol: String,
               rates: DataFrame, rateCol: String): DataFrame = {
    val thr = rates.select(col(stratumCol),
      floor(col(rateCol) * lit(65536.0)).cast("long").as("__thr"))
    docs.join(broadcast(thr), stratumCol)
      .filter(sampleHash(col(idCol)) < col("__thr"))
      .drop("__thr")
  }

  /** The 48-bit ORDER hash: first 12 md5 hex digits of the id — wide
    * enough that within-shard ordering is collision-free for any
    * realistic shard (P ≈ n²/2⁴⁹), same determinism as [[sampleHash]]. */
  def orderHash(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 12), 16, 10).cast("long")

  /** Deterministic corpus shuffle-and-shard — the training-order
    * step: every document gets a permanent pseudo-random 48-bit
    * priority, `shard = h mod n` spreads the corpus evenly, and
    * ordering by `h` within a shard IS the global shuffle restricted
    * to it. Pure function of the id: the same corpus shards
    * identically on any engine, partitioning or re-run (resumable
    * training data prep), and adding documents later never moves an
    * existing document's position relative to its shard-mates. */
  def shuffleShard(docs: DataFrame, idCol: String, shards: Int): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    docs.withColumn("__h", orderHash(col(idCol)))
      .withColumn("shard", pmod(col("__h"), lit(shards.toLong)))
  }

  /** Materialize the shuffle: one directory per shard, rows in
    * training order (ascending order hash, id tiebreak). ONE shuffle
    * of the corpus keyed on the shard — each shard is written by one
    * task, so a 100 TB corpus lands as n sequential-read files with
    * no further sorting needed at load time. */
  def shardWrite(docs: DataFrame, idCol: String, shards: Int,
                 path: String): Unit =
    shuffleShard(docs, idCol, shards)
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__h"), col(idCol))
      .drop("__h")
      .write.partitionBy("shard").mode("overwrite").parquet(path)
}
