package graft

import org.apache.spark.sql.functions._
import graft.SparkSpec.spark.implicits._
import graft.functions.QuantileSketch
import graft.operators.Aggregation
import graft.operators.Aggregation.MetricAgg

/** The mergeable GK percentile partial's contracts — the evidence
  * behind cascade's pNN vocabulary (rows-only keys cannot be
  * hash-oracled, so rank-error bounds are asserted here the way
  * t20's spec bounds GK vs exact):
  *  - single sketch: answers within eps·n ranks of exact;
  *  - MERGED sketches (union-of-hourly vs direct-daily — the cascade
  *    path): within the 2·eps·n GK merge bound;
  *  - small groups: GK is exact below its compression threshold, so
  *    typical (entity, hour) cells answer exactly;
  *  - empty/null inputs: NULL quantile, never a crash;
  *  - cascade wiring: pNN accepted, pNN_exact and count_distinct
  *    still refused.
  */
class QuantileSketchSpec extends SparkSpec {

  private val eps = QuantileSketch.DefaultEps

  // a deterministic permutation of 1..(p-1) for prime p: i ↦ g·i mod p
  // is a bijection on the nonzero residues — sketch inputs arrive
  // unsorted, as they would at scale
  private val P = 20011L // prime; permutation of 1..20010
  private def permuted: Seq[Long] =
    (1L until P).map(i => (i * 48271L) % P)

  test("single GK sketch answers within eps*n ranks of exact") {
    val vals = permuted
    assert(vals.distinct.size == vals.size && vals.min == 1L && vals.max == P - 1)
    val df = vals.toDF("v").repartition(8)
    val sk = df.agg(QuantileSketch.gkAgg(col("v")).as("q"))
    for (p <- Seq(0.5, 0.95, 0.99)) {
      val got = sk.select(QuantileSketch.gkQuantile(col("q"), p)).head.getDouble(0)
      // values ARE ranks (a permutation of 1..n), so value error = rank error
      val want = p * vals.size
      assert(math.abs(got - want) <= eps * vals.size + 1,
        s"p$p: got $got, want ~$want (eps*n = ${eps * vals.size})")
    }
  }

  test("merged hourly sketches stay within the 2*eps*n bound of the direct daily answer") {
    val vals = permuted
    // 24 'hours' striped over the value sequence — each hour holds a
    // spread sample, like real arrival order
    val df = vals.zipWithIndex.map { case (v, i) => (i % 24, v) }
      .toDF("hour", "v").repartition(8)
    val hourly = df.groupBy(col("hour"))
      .agg(QuantileSketch.gkAgg(col("v")).as("q"))
    val merged = hourly.agg(QuantileSketch.gkMerge(col("q")).as("q"))
    for (p <- Seq(0.5, 0.95)) {
      val got = merged.select(QuantileSketch.gkQuantile(col("q"), p)).head.getDouble(0)
      val want = p * vals.size
      assert(math.abs(got - want) <= 2 * eps * vals.size + 1,
        s"merged p$p: got $got, want ~$want (2*eps*n = ${2 * eps * vals.size})")
    }
  }

  test("GK is exact below its compression threshold — typical hourly cells answer exactly") {
    // 101 values 0..100: p95 interpolates to rank 95.0 ⇒ the sketch's
    // nearest-rank answer must be one of the two adjacent ranks; with
    // no compression ever triggered it lands on the exact GK target
    val df = (0 to 100).map(_.toLong).toDF("v").coalesce(1)
    val got = df.agg(QuantileSketch.gkAgg(col("v")).as("q"))
      .select(QuantileSketch.gkQuantile(col("q"), 0.95)).head.getDouble(0)
    assert(got === 95.0 || got === 96.0, s"small-cell p95: got $got")
  }

  test("declared eps flows through the sketch and the bounds scale with it") {
    val vals = permuted
    val df = vals.toDF("v").repartition(8)
    val coarse = 0.02
    // (a) the wire format records the DECLARED eps (header double) —
    // the knob actually reaches the summary, it isn't re-pinned
    val bytes = df.agg(QuantileSketch.gkAgg(col("v"), coarse).as("q"))
      .head.getAs[Array[Byte]](0)
    assert(java.nio.ByteBuffer.wrap(bytes).getDouble === coarse)
    // (b) a coarser eps buys a SMALLER sketch — the size/accuracy
    // trade a 100 TB cascade declares eps for in the first place
    val bytesFine = df.agg(QuantileSketch.gkAgg(col("v"),
      QuantileSketch.DefaultEps).as("q")).head.getAs[Array[Byte]](0)
    assert(bytes.length < bytesFine.length,
      s"eps $coarse sketch (${bytes.length} B) should be smaller than " +
        s"eps ${QuantileSketch.DefaultEps} (${bytesFine.length} B)")
    // (c) answers stay within the DECLARED (coarser) bound — the
    // 2·eps·n partition-merge form, since a distributed gkAgg always
    // merges per-partition partials (at eps 0.02 compression is real,
    // unlike the near-exact DefaultEps sketches above)
    val sk = df.agg(QuantileSketch.gkAgg(col("v"), coarse).as("q"))
    for (p <- Seq(0.5, 0.95)) {
      val got = sk.select(QuantileSketch.gkQuantile(col("q"), p)).head.getDouble(0)
      assert(math.abs(got - p * vals.size) <= 2 * coarse * vals.size + 1,
        s"p$p at eps $coarse: got $got, want ~${p * vals.size}")
    }
    // (d) MetricAgg.eps rides the cascade: merged day-level answers
    // stay within the declared eps's merge bound (2·eps·n)
    val rows = for {
      e <- 1 to 2; h <- 0 until 24; i <- 0 until 10
    } yield (e.toLong, f"2024-01-01 $h%02d:15:00",
      ((h * 10 + i) * 48271L % 241L).toDouble)
    val ev = rows.toDF("user_id", "ts_s", "value")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"), col("value"))
      .repartition(8)
    val day = Aggregation.cascade(
        Seq(MetricAgg("value", "p95", "p95_v", None, None, Some(coarse))),
        Seq("hour", "day"))(ev, col("user_id"), col("ts"))
      .filter(col("granularity") === "day")
    val exact = ev.groupBy(col("user_id").as("entity_id"),
        date_trunc("day", col("ts")).as("bucket"))
      .agg(expr("percentile(value, 0.95)").as("ex"))
    day.join(exact, Seq("entity_id", "bucket")).collect().foreach { r =>
      // 240 values ≈ dense in [0, 241): rank error ⇒ value error; the
      // 2·eps·240 ≈ 9.6-rank merge bound plus interpolation slack
      assert(math.abs(r.getAs[Double]("p95_v") - r.getAs[Double]("ex")) <=
        2 * coarse * 240 + 3,
        s"day p95 at eps $coarse diverged: ${r.getAs[Double]("p95_v")} " +
          s"vs exact ${r.getAs[Double]("ex")}")
    }
  }

  test("empty and all-null inputs yield NULL, never a crash") {
    val empty = Seq.empty[Long].toDF("v")
      .agg(QuantileSketch.gkAgg(col("v")).as("q"))
      .select(QuantileSketch.gkQuantile(col("q"), 0.5)).head
    assert(empty.isNullAt(0))
    val nulls = Seq[Option[Long]](None, None).toDF("v")
      .agg(QuantileSketch.gkAgg(col("v")).as("q"))
      .select(QuantileSketch.gkQuantile(col("q"), 0.5)).head
    assert(nulls.isNullAt(0))
  }

  test("cascade accepts pNN via sketch partials; day level matches exact within bound") {
    // 4 entities × 3 days × 24 hours × 10 values/hour, values keyed so
    // each (entity, day) has a known exact percentile population
    val rows = for {
      e <- 1 to 4; d <- 1 to 3; h <- 0 until 24; i <- 0 until 10
    } yield (e.toLong, f"2024-01-$d%02d $h%02d:15:00",
      ((h * 10 + i) * 48271L % 241L).toDouble)
    val ev = rows.toDF("user_id", "ts_s", "value")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"), col("value"))
      .repartition(8)
    val casc = Aggregation.cascade(
      Seq(MetricAgg("value", "count", "cnt"), MetricAgg("value", "p95", "p95_v")),
      Seq("hour", "day"))(ev, col("user_id"), col("ts"))
    val day = casc.filter(col("granularity") === "day")
    assert(day.count() === 4 * 3)
    // per (entity, day): 240 values — a merged-sketch answer must sit
    // within 2*eps*240 + 1 ranks of the exact nearest-rank value; at
    // these sizes that means the exact rank-228-or-229 value
    val exact = ev.groupBy(col("user_id").as("entity_id"),
        date_trunc("day", col("ts")).as("bucket"))
      .agg(expr("percentile(value, 0.95)").as("ex"))
    val joined = day.join(exact, Seq("entity_id", "bucket")).collect()
    assert(joined.length === 12)
    joined.foreach { r =>
      val got = r.getAs[Double]("p95_v")
      val ex = r.getAs[Double]("ex")
      // values are multiples of 1.0 in [0, 241); interpolated exact vs
      // nearest-rank sketch differ by at most a few adjacent values
      assert(math.abs(got - ex) <= 6.0,
        s"day p95 diverged: sketch $got vs exact $ex")
    }
    // the hour level rides the SAME plan (one raw scan) and carries
    // counts identical to g02's partial discipline
    val hour = casc.filter(col("granularity") === "hour")
    assert(hour.agg(sum("cnt")).head.getLong(0) === rows.size)
    // exact forms still refuse to cascade
    intercept[IllegalArgumentException] {
      Aggregation.cascade(Seq(MetricAgg("value", "p95_exact", "p")),
        Seq("hour", "day"))(ev, col("user_id"), col("ts"))
    }
    intercept[IllegalArgumentException] {
      Aggregation.cascade(Seq(MetricAgg("value", "count_distinct", "n")),
        Seq("hour", "day"))(ev, col("user_id"), col("ts"))
    }
  }

  test("count and pNN metrics on one source share a pair: one count partial, one sketch per distinct eps") {
    // a monitoring definition's usual mix — cnt + p50 + p95 (shared
    // eps) + p95@1e-2 on the SAME source. The pair key must not split
    // on eps (that would shuffle the count partial twice per level);
    // the two DISTINCT eps values must carry two sketch partials (one
    // buffer would degrade the tighter bound to the looser eps).
    val rows = for { e <- 1 to 2; h <- 0 until 24; i <- 0 until 10 }
      yield (e.toLong, f"2024-01-01 $h%02d:15:00", (h * 10 + i).toDouble)
    val ev = rows.toDF("user_id", "ts_s", "value")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"), col("value"))
    val casc = Aggregation.cascade(
      Seq(MetricAgg("value", "count", "cnt"),
        MetricAgg("value", "p50", "p50_v"),
        MetricAgg("value", "p95", "p95_v"),
        MetricAgg("value", "p95", "p95_loose", eps = Some(1e-2))),
      Seq("hour", "day"))(ev, col("user_id"), col("ts"))
    val plan = casc.queryExecution.optimizedPlan.toString
    assert(!plan.contains("__n_1"),
      "count partial duplicated — the pair key split on eps")
    assert(plan.contains("__q_0_0") && plan.contains("__q_0_1"),
      "two distinct eps values must carry two sketch partials")
    // and the mixed definition still answers: counts exact, both p95
    // forms close to the exact nearest-rank value at these sizes
    val day = casc.filter(col("granularity") === "day").collect()
    assert(day.length === 2)
    day.foreach { r =>
      assert(r.getAs[Long]("cnt") === 240L)
      assert(math.abs(r.getAs[Double]("p95_v") - 228.0) <= 6.0)
      assert(math.abs(r.getAs[Double]("p95_loose") - 228.0) <= 12.0)
    }
  }
}
