package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Fx

/** Declarative aggregation definitions: the reference compiles
  * aggregation definitions (the `minerva aggregation` CLI's YAML-ish
  * specs: source metrics × aggregation functions × target
  * granularity) into SQL. graft compiles the same shape into a
  * Catalyst plan.
  *
  * Sums/averages go through exact DECIMAL partials (Fx) so results
  * are deterministic under any partitioning — definition-compiled
  * plans are run by schedulers, and a re-run on a re-partitioned
  * cluster must produce bit-identical output.
  */
object Aggregation {

  /** One output metric: `fn(source)` aliased `as`. `where` optionally
    * FILTERS the rows this metric aggregates (a SQL boolean over the
    * source row — "count of errors only", "avg purchase value"): the
    * conditional-KPI form monitoring definitions declare constantly.
    * Filtered metrics compile to `fn(CASE WHEN where THEN source
    * END)` inside the SAME single groupBy — one shuffle regardless of
    * how many differently-filtered metrics a definition carries,
    * never one scan per filter. */
  /** `weight` names the weight column/expression for the `wavg` fn
    * (ignored by every other fn): wavg = Σ(source·weight) / Σ(weight)
    * over rows where BOTH are non-null (a weighted mean must drop a
    * row from numerator and denominator together, or a null source
    * silently drags the mean toward zero). */
  /** `eps` tunes the SKETCH percentile fns (pNN only): the GK
    * relative rank-error bound — answers land within eps·n ranks of
    * exact (2·eps·n after cross-level merges), and the sketch buffer
    * grows as O(1/eps · log(eps·n)). The default 1e-4 prices ~KBs per
    * (entity, bucket) cell; a 100 TB deployment whose dashboards only
    * need ~p95±0.1% can declare eps=1e-3 and carry sketches an order
    * of magnitude smaller through the cascade shuffle. CLI form:
    * `value:p95@0.001:p95_v`; config form: a "eps" field. */
  final case class MetricAgg(source: String, fn: String, as: String,
                             where: Option[String] = None,
                             weight: Option[String] = None,
                             eps: Option[Double] = None)

  /** A DERIVED metric: a SQL expression over the definition's metric
    * ALIASES (and any earlier derived alias), evaluated after the
    * aggregation — the ratio/formula-KPI form monitoring definitions
    * declare on top of their base aggregates ("error_rate =
    * n_errors / n_all", "revenue_per_event = sum_value / cnt").
    * Compiles to a pure post-agg projection: zero extra shuffles or
    * scans no matter how many formulas a definition stacks, and a
    * formula referencing an undeclared alias fails at plan analysis,
    * not silently. */
  final case class DerivedMetric(as: String, sql: String)

  /** A materializable aggregation: bucket by `granularity`, emit
    * `metrics`, then the post-agg `derived` formulas (in declaration
    * order, so later formulas may reference earlier ones). */
  final case class AggregationDef(granularity: String, metrics: Seq[MetricAgg],
                                  derived: Seq[DerivedMetric] = Nil)

  /** Fineness ranking of the calendar granularities `cascade`
    * accepts. week is NOT nestable into month/quarter/year (weeks
    * cross month boundaries), so it carries the same rank as day's
    * coarser siblings but is checked separately below. */
  private val fineness: Map[String, Int] = Map(
    "second" -> 0, "minute" -> 1, "hour" -> 2, "day" -> 3,
    "week" -> 4, "month" -> 4, "quarter" -> 5, "year" -> 6)

  /** Validate + order a cascade's granularity list finest→coarsest.
    * The CLI forwards repeated `--granularity` flags in USER order;
    * re-aggregating a coarse level into a finer one would silently
    * emit wrong buckets (date_trunc of an already-coarser bucket), so
    * the list is sorted by fineness here and unknown names,
    * duplicates, and the non-nesting week/month combination all
    * throw instead of producing wrong results. */
  private[graft] def orderedGranularities(gs: Seq[String]): Seq[String] = {
    val bad = gs.filterNot(fineness.contains)
    require(bad.isEmpty, s"unknown granularities: ${bad.mkString(", ")} " +
      s"(known: ${fineness.keys.toSeq.sorted.mkString(", ")})")
    require(gs.distinct.size == gs.size,
      s"duplicate granularities: ${gs.diff(gs.distinct).distinct.mkString(", ")}")
    require(!(gs.contains("week") && gs.exists(Set("month", "quarter", "year"))),
      "week buckets cross month boundaries and cannot cascade with " +
        "month/quarter/year; run week as its own cascade")
    gs.sortBy(fineness)
  }

  // shared with TrendStore's entity aggregation — the reference uses
  // the same metric-set vocabulary for time AND entity aggregation
  /** A weight on any fn but `wavg` would be silently ignored —
    * `avg@l_quantity` would emit the UNWEIGHTED mean labeled as if it
    * were weighted. Refused loudly, matching every other malformed
    * metric. */
  private def requireWeightSanity(m: MetricAgg): Unit = {
    require(m.weight.isEmpty || m.fn.toLowerCase == "wavg",
      s"metric ${m.as}: fn '${m.fn}' does not take a weight " +
        s"(${m.weight.get}) — only 'wavg' does")
    // eps on a non-sketch fn would be silently ignored — `sum@0.01`
    // or an eps on p95_exact (which is exact by definition) is a
    // config mistake, refused loudly like a stray weight
    require(m.eps.isEmpty || isPctFn(m.fn),
      s"metric ${m.as}: fn '${m.fn}' does not take an eps " +
        s"(${m.eps.get}) — only sketch percentiles (pNN) do")
    m.eps.foreach(e => require(e >= 1e-6 && e <= 0.1,
      s"metric ${m.as}: eps $e out of range [1e-6, 0.1] — the GK rank " +
        "bound is eps·n, so eps above 0.1 no longer orders percentiles, " +
        "and the sketch buffer is O(1/eps·log(eps·n)) PER GROUP, so eps " +
        "below 1e-6 is an executor-OOM foot-gun, not a tighter bound; " +
        "use pNN_exact if the estimate must be exact"))
  }

  /** Is `fn` a SKETCH percentile (p50/p95/p999 — the mergeable GK
    * form that takes an `eps`)? The `_exact` variants are not. */
  def isPctFn(fn: String): Boolean = fn.toLowerCase match {
    case PctFn(_) => true
    case _        => false
  }

  private[operators] def compileMetric(m: MetricAgg): Column = {
    requireWeightSanity(m)
    // the metric's row filter: source gated to NULL (every aggregate
    // skips NULLs) and counts over the gated marker — inside the one
    // shared groupBy, so a filter never costs a scan or a shuffle
    val g: Column => Column = c => m.where.fold(c)(w => when(expr(w), c))
    val n = m.where.fold(count(lit(1)))(w => count(when(expr(w), lit(1))))
    (m.fn.toLowerCase match {
    case "sum"   => Fx.dsum(g(col(m.source)))
    // avg = exact decimal sum / FILTERED row count (≡ Fx.davg when
    // unfiltered); an empty filtered group divides NULL/0 → NULL on
    // both engines
    case "avg"   => sum(Fx.dec(g(col(m.source)))).cast("double") / n
    case "max"   => max(g(col(m.source)))
    case "min"   => min(g(col(m.source)))
    // count(*) semantics (row count per bucket), matching the ANSI
    // oracle twins; metric sources in trend packages are non-nullable
    // so this also equals the per-metric sample count.
    case "count" => n
    // Sample stddev via DECIMAL-exact moments (Σv, Σv² never touch
    // float summation order — the t17 discipline), collapsed in a
    // FIXED-op-order double formula: sqrt((s2 − s1²/n) / (n−1)).
    // Engines' native stddev_samp implementations (Welford updates)
    // are order-dependent, so the oracle twin writes this exact
    // formula, not STDDEV_SAMP. n < 2 → NULL on both sides.
    case "stddev" =>
      val s1 = sum(Fx.dec(g(col(m.source)))).cast("double")
      val s2 = Fx.prodSumDouble(sum(Fx.dec(g(col(m.source))) * Fx.dec(g(col(m.source)))))
      when(n < 2, lit(null).cast("double"))
        .otherwise(sqrt((s2 - s1 * s1 / n) / (n - lit(1))))
    // pNN / pNNN percentiles (p50, p95, p999 → 0.5/0.95/0.999) via
    // the mergeable GK sketch — the monitoring percentiles a trend
    // aggregation definition declares. Sketch merges are partition-
    // order-dependent, so percentile metrics belong in rows-only /
    // spec-checked outputs, not hash-compared oracles (see t20).
    // accuracy ≈ 1/eps (percentile_approx's contract); the default
    // 10000 IS eps 1e-4, so an eps-less definition is bit-unchanged
    case PctFn(ds) =>
      percentile_approx(g(col(m.source)),
        lit(ds.toDouble / math.pow(10, ds.length)),
        lit(m.eps.fold(10000)(e => math.ceil(1.0 / e).toInt)))
    // pNN_exact / pNNN_exact — EXACT interpolated percentiles (the
    // t26 `percentile` typed aggregate: one group-bounded buffer per
    // (parent, bucket) cell, same single shuffle as every other
    // metric). Deterministic under any partitioning, so unlike the
    // sketch variant above these ARE hash-oracle-gradeable (DuckDB
    // quantile_cont twin); 4-dec rounding is exact for 2-dec money.
    // Use on entity/time cells whose group size is bounded (a month
    // of one region's orders); unbounded groups stay on the sketch.
    case ExactPctFn(ds) =>
      val srcSql = m.where.fold(s"`${m.source}`")(w =>
        s"CASE WHEN $w THEN `${m.source}` END")
      round(expr(s"percentile($srcSql, ${ds.toDouble / math.pow(10, ds.length)})"), 4)
    // EXACT distinct count ("distinct event types per user-day") —
    // plans through Spark's Expand + two-level agg, so the map-side
    // dedup bounds the shuffle by per-group CARDINALITY, not row
    // count. Use where group cardinality is bounded (types, codes);
    // unbounded cardinality (distinct visitors over a year) takes
    // approx_distinct below. NULLs (and filtered-out rows — the CASE
    // gate yields NULL) never count, matching ANSI COUNT(DISTINCT).
    case "count_distinct" => count_distinct(g(col(m.source)))
    // HLL-sketch distinct count — the unbounded-cardinality path
    // (t21's posture inside the definition vocabulary). Fixed-memory
    // registers with MAX-based merges: deterministic under ANY
    // partitioning (re-runs bit-identical), but not cross-engine
    // hash-matchable, so approx metrics belong in rows-only outputs.
    // Unlike count_distinct this fn also CASCADES (sketches merge
    // exactly across granularities — see cascade()).
    case "approx_distinct" => hll_sketch_estimate(hll_sketch_agg(g(col(m.source))))
    // WEIGHTED mean — Σ(source·weight)/Σ(weight), the
    // traffic-weighted KPI form ("avg price weighted by quantity",
    // "drop rate weighted by attempts"): a plain avg over per-entity
    // cells lets an idle entity count as much as a loaded one. Rows
    // where source OR weight is NULL drop from BOTH sums; exact
    // decimal products/sums (the stddev moment discipline) and ONE
    // IEEE division — deterministic and oracle-gradeable.
    // division guarded on the weight mass: an empty-or-zero-weight
    // group is NULL (undefined), never an ANSI divide-by-zero abort
    case "wavg" =>
      val (wx, ww) = wavgTerms(m)
      when(sum(ww) =!= 0,
        Fx.prodSumDouble(sum(wx * ww)) / sum(ww).cast("double"))
    case f       => throw new IllegalArgumentException(s"unknown aggregation fn: $f")
    }).as(m.as)
  }

  /** The gated decimal (source, weight) term pair for a wavg metric:
    * the row passes the metric's `where` AND both sides non-null. */
  private def wavgTerms(m: MetricAgg): (Column, Column) = {
    val w = m.weight.getOrElse(throw new IllegalArgumentException(
      s"metric ${m.as}: fn 'wavg' requires a weight column/expression"))
    val pass = m.where.map(expr).getOrElse(lit(true)) &&
      col(m.source).isNotNull && expr(w).isNotNull
    (Fx.dec(when(pass, col(m.source))), Fx.dec(when(pass, expr(w))))
  }

  private val PctFn = "^p(\\d{2,3})$".r
  private val ExactPctFn = "^p(\\d{2,3})_exact$".r

  /** Compile a definition against a trend source → one groupBy plan
    * (partial aggregation map-side; a single shuffle of partials). */
  def compile(defn: AggregationDef)(trend: DataFrame, entity: Column, ts: Column): DataFrame = {
    require(defn.metrics.nonEmpty,
      s"AggregationDef(granularity=${defn.granularity}) declares no metrics; " +
        "at least one MetricAgg is required")
    val aliases = defn.metrics.map(_.as) ++ defn.derived.map(_.as)
    require(aliases.distinct.size == aliases.size,
      s"duplicate metric aliases: ${aliases.diff(aliases.distinct).distinct.mkString(", ")}")
    val agged = trend.groupBy(entity.as("entity_id"),
        date_trunc(defn.granularity, ts).as("bucket"))
      .agg(compileMetric(defn.metrics.head), defn.metrics.tail.map(compileMetric): _*)
    // derived formulas fold in declaration order: each is a projection
    // over the already-named columns, so later formulas can reference
    // earlier ones and the whole chain collapses into one codegen'd
    // Project over the aggregate — no extra exchange
    defn.derived.foldLeft(agged)((df, d) => df.withColumn(d.as, expr(d.sql)))
  }

  /** Compile one metric set at a CASCADE of granularities (finest
    * first) — the reference's aggregation config materializes each
    * metric set at every configured granularity. The raw source is
    * scanned and shuffled ONCE, at the finest granularity, into
    * exact partials (decimal sum / counts / min / max); every
    * coarser granularity re-aggregates the previous level's partials
    * — inputs shrink by the bucket ratio at each step, so the
    * coarser shuffles are nearly free. Output is tagged with a
    * `granularity` column; avg = exact total sum / total row count
    * at every level (identical to davg on the raw rows).
    *
    * Cascade vocabulary: sum/avg/min/max/count/stddev (decimal-exact
    * moments re-aggregate) + approx_distinct (the HLL sketch IS the
    * partial; hll_union_agg merges are exact) + pNN percentiles (the
    * serialized GK quantile sketch is the partial — gk_sketch_agg at
    * the finest level, gk_sketch_merge at coarser ones, so a
    * monitoring cascade gets its hour→day→month p95 without
    * re-scanning raw rows; merged answers stay within the GK rank
    * bound, spec-asserted, but merge ORDER is partition-dependent, so
    * like approx_distinct the pNN levels are rows-only/spec-graded,
    * never hash-compared) — all with optional `where` filters, gated
    * once at the finest level. count_distinct and pNN_exact have no
    * mergeable partial and are refused. */
  def cascade(metrics: Seq[MetricAgg], granularitiesIn: Seq[String])(
      trend: DataFrame, entity: Column, ts: Column): DataFrame = {
    require(metrics.nonEmpty && granularitiesIn.nonEmpty)
    metrics.foreach(requireWeightSanity)
    val granularities = orderedGranularities(granularitiesIn)
    require(metrics.map(_.as).distinct.size == metrics.size,
      s"duplicate metric aliases: ${metrics.map(_.as).diff(metrics.map(_.as).distinct).distinct.mkString(", ")}")
    // exact distinct counts and EXACT percentiles have NO
    // re-aggregable partial — a cascade would have to re-scan raw
    // rows per level, which is exactly what cascade exists to avoid.
    // Refused loudly instead of silently recomputing (or worse,
    // summing counts). Sketch forms (approx_distinct, pNN) cascade.
    val noCascade = metrics.filter(m => m.fn.toLowerCase match {
      case "count_distinct" => true
      case ExactPctFn(_)    => true
      case _                => false
    })
    require(noCascade.isEmpty,
      "metrics with no re-aggregable partial cannot cascade: " +
        noCascade.map(m => s"${m.as} (${m.fn})").mkString(", ") +
        " — exact distinct counts and exact percentiles do not merge " +
        "across buckets; use approx_distinct / pNN (HLL and GK sketch " +
        "partials merge) or one single-granularity AggregationDef per level")
    // Partials are keyed per distinct (source, where) pair: a metric
    // filter applies ONCE, at the finest level, and the gated partials
    // re-aggregate exactly like unfiltered ones. Only the partial
    // kinds some metric on the pair needs are carried (a count-only
    // definition shuffles one long per pair). approx_distinct carries
    // the HLL sketch ITSELF as its partial — register merges are
    // exact (max-based), so union-of-hourly-sketches ≡
    // sketch-of-the-day, bit-identically, and the distinct count
    // cascades without ever re-touching raw rows.
    // pairs key by (source, where, weight) ONLY — a sum, a count and
    // a p95 on the same source share one pair and thus ONE __n count
    // partial. Sketch eps lives INSIDE the pair: each distinct
    // declared eps among the pair's pNN metrics carries its own GK
    // partial (__q_<pair>_<epsIdx>), because merging a p95@1e-2 and a
    // p95@1e-4 into one buffer would silently degrade the tighter
    // metric's bound to the looser eps.
    val pairs = metrics.map(m => (m.source, m.where, m.weight)).distinct
    def idx(m: MetricAgg): Int =
      pairs.indexOf((m.source, m.where, m.weight))
    def effEps(m: MetricAgg): Double =
      m.eps.getOrElse(graft.functions.QuantileSketch.DefaultEps)
    val fnsAt: Map[Int, Set[String]] = metrics.groupBy(idx)
      .map { case (i, ms) => i -> ms.map(_.fn.toLowerCase).toSet }
    val epsAt: Map[Int, Seq[Double]] = metrics.filter(m => isPctFn(m.fn))
      .groupBy(idx)
      .map { case (i, ms) => i -> ms.map(effEps).distinct.sorted }
      .withDefaultValue(Seq.empty)
    def qName(i: Int, e: Double): String = s"__q_${i}_${epsAt(i).indexOf(e)}"
    def needS(f: Set[String]) = f.exists(Set("sum", "avg", "stddev"))
    val partials: Seq[Column] = pairs.zipWithIndex.flatMap { case ((s, w, wt), i) =>
      val g: Column => Column = c => w.fold(c)(ww => when(expr(ww), c))
      val fns = fnsAt(i)
      Seq(w.fold(count(lit(1)))(ww => count(when(expr(ww), lit(1)))).as(s"__n_$i")) ++
        (if (needS(fns)) Seq(sum(Fx.dec(g(col(s)))).as(s"__s_$i")) else Nil) ++
        (if (fns("stddev"))
          Seq(sum(Fx.dec(g(col(s))) * Fx.dec(g(col(s)))).as(s"__s2_$i")) else Nil) ++
        (if (fns("max")) Seq(max(g(col(s))).as(s"__mx_$i")) else Nil) ++
        (if (fns("min")) Seq(min(g(col(s))).as(s"__mn_$i")) else Nil) ++
        (if (fns("approx_distinct"))
          Seq(hll_sketch_agg(g(col(s))).as(s"__h_$i")) else Nil) ++
        epsAt(i).map(e =>
          graft.functions.QuantileSketch.gkAgg(g(col(s)), e).as(qName(i, e))) ++
        // wavg's partials — Σ(x·w) and Σ(w) — are plain decimal sums,
        // so the weighted mean re-aggregates exactly across levels
        (if (fns("wavg")) {
          val (wx, ww) = wavgTerms(MetricAgg(s, "wavg", s"__wavg_$i", w, wt))
          Seq(sum(wx * ww).as(s"__sw_$i"), sum(ww).as(s"__w_$i"))
        } else Nil)
    }
    def present(df: DataFrame, g: String): DataFrame =
      df.select(lit(g).as("granularity") +: col("entity_id") +: col("bucket") +:
        metrics.map { m =>
          val i = idx(m)
          val n = col(s"__n_$i")
          (m.fn.toLowerCase match {
            case "sum"   => col(s"__s_$i").cast("double")
            case "avg"   => col(s"__s_$i").cast("double") / n
            case "max"   => col(s"__mx_$i")
            case "min"   => col(s"__mn_$i")
            case "count" => n
            // identical fixed-op-order formula to compileMetric's
            // stddev — a cascade level hash-matches the direct
            // definition at that granularity
            case "stddev" =>
              val s1 = col(s"__s_$i").cast("double")
              val s2 = Fx.prodSumDouble(col(s"__s2_$i"))
              when(n < 2, lit(null).cast("double"))
                .otherwise(sqrt((s2 - s1 * s1 / n) / (n - lit(1))))
            case "approx_distinct" => hll_sketch_estimate(col(s"__h_$i"))
            // the p-quantile read off the level's (merged) GK sketch
            // for THIS metric's declared eps
            case PctFn(ds) =>
              graft.functions.QuantileSketch.gkQuantile(
                col(qName(i, effEps(m))),
                ds.toDouble / math.pow(10, ds.length))
            // identical final division to compileMetric's wavg — a
            // cascade level hash-matches the direct definition
            case "wavg" =>
              when(col(s"__w_$i") =!= 0,
                Fx.prodSumDouble(col(s"__sw_$i")) / col(s"__w_$i").cast("double"))
            case f => throw new IllegalArgumentException(s"unknown aggregation fn: $f")
          }).as(m.as)
        }: _*)
    var cur = trend.groupBy(entity.as("entity_id"),
        date_trunc(granularities.head, ts).as("bucket"))
      .agg(partials.head, partials.tail: _*)
    var out = present(cur, granularities.head)
    for (g <- granularities.tail) {
      val reAggs: Seq[Column] = pairs.indices.flatMap { i =>
        val fns = fnsAt(i)
        Seq(sum(col(s"__n_$i")).as(s"__n_$i")) ++
          (if (needS(fns)) Seq(sum(col(s"__s_$i")).as(s"__s_$i")) else Nil) ++
          (if (fns("stddev")) Seq(sum(col(s"__s2_$i")).as(s"__s2_$i")) else Nil) ++
          (if (fns("max")) Seq(max(col(s"__mx_$i")).as(s"__mx_$i")) else Nil) ++
          (if (fns("min")) Seq(min(col(s"__mn_$i")).as(s"__mn_$i")) else Nil) ++
          (if (fns("approx_distinct"))
            Seq(hll_union_agg(col(s"__h_$i")).as(s"__h_$i")) else Nil) ++
          epsAt(i).map(e =>
            graft.functions.QuantileSketch.gkMerge(col(qName(i, e))).as(qName(i, e))) ++
          (if (fns("wavg"))
            Seq(sum(col(s"__sw_$i")).as(s"__sw_$i"),
              sum(col(s"__w_$i")).as(s"__w_$i")) else Nil)
      }
      cur = cur.groupBy(col("entity_id"), date_trunc(g, col("bucket")).as("bucket"))
        .agg(reAggs.head, reAggs.tail: _*)
      out = out.unionByName(present(cur, g))
    }
    out
  }
}
