package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Fx
import graft.sources.TableCatalog

/** Relational engine core q01–q10: the table-stakes query shapes
  * (agg, multi-join, semi/anti, windows, pivot) every Minerva query
  * ultimately lowers to.
  *
  * Oracle-parity rules (see SURVEY §5): decimal-exact double sums,
  * string timestamps, full deterministic ORDER BY, identical aliases.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  val defs: Seq[(String, Q)] = Seq(
    "q01_pricing_summary" -> { (s, dir) =>
      val li = TableCatalog(s, dir).lineitem
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Fx.dsum(col("l_quantity")).as("sum_qty"),
          Fx.dsum(col("l_extendedprice")).as("sum_base_price"),
          Fx.prodSumDouble(
            sum(Fx.dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - Fx.dec(col("l_discount")))))
            .as("sum_disc_price"),
          Fx.davg(col("l_quantity")).as("avg_qty"),
          Fx.davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    "q02_region_revenue" -> { (s, dir) =>
      val c = TableCatalog(s, dir)
      c.lineitem
        .join(c.orders, col("l_orderkey") === col("o_orderkey"))
        .join(c.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(c.supplier), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(c.nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(c.region), col("n_regionkey") === col("r_regionkey"))
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(Fx.prodSumDouble(
            sum(Fx.dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - Fx.dec(col("l_discount")))))
          .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    },

    "q03_top_unshipped" -> { (s, dir) =>
      val c = TableCatalog(s, dir)
      c.customer.filter(col("c_mktsegment") === "BUILDING")
        .join(c.orders, col("c_custkey") === col("o_custkey"))
        .join(c.lineitem, col("o_orderkey") === col("l_orderkey"))
        .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp") &&
          col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
        .groupBy(col("l_orderkey"), Fx.dateStr(col("o_orderdate")).as("o_orderdate"))
        .agg(Fx.prodSumDouble(
            sum(Fx.dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - Fx.dec(col("l_discount")))))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    "q04_exists_semi" -> { (s, dir) =>
      val c = TableCatalog(s, dir)
      c.orders
        .join(c.lineitem.filter(col("l_returnflag") === "R")
          .select(col("l_orderkey")), col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    },

    // Anti-join restricted to recent orders so the result is
    // non-vacuous on the test data (every customer has SOME order;
    // "no orders since 1997" isolates the inactive ones). The date
    // filter lands on the orders scan (pushed), the anti-join stays
    // one shuffle.
    "q05_no_orders_anti" -> { (s, dir) =>
      val c = TableCatalog(s, dir)
      c.customer
        .join(c.orders
            .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          Fx.dsum(col("c_acctbal")).as("sum_acctbal"))
        .orderBy(col("c_mktsegment"))
    },

    "q06_selective_filter" -> { (s, dir) =>
      TableCatalog(s, dir).lineitem
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(Fx.prodSumDouble(
            sum(Fx.dec(col("l_extendedprice")) * Fx.dec(col("l_discount"))))
          .as("revenue"),
          count(lit(1)).as("n_items"))
    },

    "q07_window_rank" -> { (s, dir) =>
      val o = TableCatalog(s, dir).orders
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      o.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    },

    "q08_running_sum" -> { (s, dir) =>
      val li = TableCatalog(s, dir).lineitem
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-02-01").cast("timestamp"))
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      li.select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(Fx.dec(col("l_extendedprice"))).over(w).cast("double").as("running_price"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    },

    "q09_union_distinct" -> { (s, dir) =>
      val c = TableCatalog(s, dir)
      val fromCust = c.customer.join(broadcast(c.nation),
        col("c_nationkey") === col("n_nationkey")).select(col("n_name"))
      val fromSupp = c.supplier.join(broadcast(c.nation),
        col("s_nationkey") === col("n_nationkey")).select(col("n_name"))
      fromCust.union(fromSupp).distinct().orderBy(col("n_name"))
    },

    "q10_event_pivot" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val types = Seq("click", "view", "purchase", "signup", "error")
      val aggs = types.map(t =>
        sum(when(col("event_type") === t, Fx.dec(col("value"))))
          .cast("double").as(s"${t}_sum")) :+ count(lit(1)).as("n_events")
      ev.groupBy(col("user_id"))
        .agg(aggs.head, aggs.tail: _*)
        .orderBy(col("user_id"))
    },

    // ROLLUP subtotals: per-(region, nation), per-region, and grand
    // total in one pass — Spark expands the grouping sets before the
    // single shuffle (partial agg still applies). Subtotal NULLs are
    // coalesced to 'ALL' so ordering and hashing are engine-neutral.
    "q11_rollup_sets" -> { (s, dir) =>
      val c = TableCatalog(s, dir)
      c.customer
        .join(broadcast(c.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(c.region), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          Fx.dsum(col("c_acctbal")).as("sum_acctbal"))
        .select(coalesce(col("r_name"), lit("ALL")).as("r_name"),
          coalesce(col("n_name"), lit("ALL")).as("n_name"),
          col("n_customers"), col("sum_acctbal"))
        .orderBy(col("r_name"), col("n_name"))
    },

    // INTERSECT / EXCEPT set algebra over two derived sets: nations
    // with BUILDING customers vs nations with high-balance suppliers.
    // Both set ops lower to aggregate/join shapes (one shuffle each on
    // the 25-row name sets — the big tables reduce first).
    "q12_intersect_except" -> { (s, dir) =>
      val c = TableCatalog(s, dir)
      val custNations = c.customer.filter(col("c_mktsegment") === "BUILDING")
        .join(broadcast(c.nation), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"))
      val suppNations = c.supplier.filter(col("s_acctbal") > 5000)
        .join(broadcast(c.nation), col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name"))
      custNations.intersect(suppNations).withColumn("src", lit("both"))
        .union(custNations.except(suppNations).withColumn("src", lit("cust_only")))
        .select(col("src"), col("n_name"))
        .orderBy(col("src"), col("n_name"))
    },

    // Correlated scalar subquery — orders above their customer's
    // average price. The correlation lowers to per-customer window
    // aggregates (one shuffle on the correlation key, no re-scan per
    // row). The comparison is cross-multiplied (price·n > Σprice) so
    // both engines compare exact decimals, never a divided float.
    "q13_scalar_subquery" -> { (s, dir) =>
      val o = TableCatalog(s, dir).orders
      val w = Window.partitionBy(col("o_custkey"))
      o.withColumn("__n", count(lit(1)).over(w))
        .withColumn("__sum", sum(Fx.dec(col("o_totalprice"))).over(w))
        .filter(Fx.dec(col("o_totalprice")) * col("__n") > col("__sum"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_above"),
          Fx.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_orderpriority"))
    },

    // CUBE grouping sets — all four (returnflag, linestatus) subtotal
    // combinations in ONE shuffle (Spark expands the grouping sets
    // before the exchange; no union of separate aggregates). The
    // group columns are coalesced to 'ALL' AFTER the agg so subtotal
    // rows are distinguishable in the hash-compare (the raw values
    // are never null in lineitem, so the sentinel is unambiguous).
    "q14_cube" -> { (s, dir) =>
      TableCatalog(s, dir).lineitem
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"),
          Fx.dsum(col("l_quantity")).as("sum_qty"),
          Fx.dsum(col("l_extendedprice")).as("sum_price"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("cnt"), col("sum_qty"), col("sum_price"))
        .orderBy(col("returnflag"), col("linestatus"))
    },

    // Exact interpolated percentiles per group (percentile_cont
    // semantics: index p·(n−1), linear interpolation — the same
    // definition DuckDB's quantile_cont uses). Rounded to 4 decimals:
    // with 2-decimal money values and 2-decimal interpolation
    // fractions the true result is an exact 4-decimal number, so both
    // engines round their (±ulp-identical) doubles to the same target
    // and never sit on a rounding boundary. Spark's percentile is a
    // single-pass typed aggregate — one shuffle on the group key.
    "q15_percentiles" -> { (s, dir) =>
      TableCatalog(s, dir).lineitem
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"),
          round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_extendedprice, 0.75)"), 4).as("p75"),
          round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95"))
        .orderBy(col("l_returnflag"))
    },

    // Multi-column exact DISTINCT aggregation. Catalyst lowers two
    // distinct sets over one grouping into an Expand (each input row
    // duplicated per distinct set) + two-level aggregate — the
    // correct distributed shape: partial distinct-dedup happens
    // map-side per set, so the shuffle carries (group, distinct-key)
    // pairs, never raw rows, and no count-distinct state concentrates
    // on the driver.
    "q16_count_distinct" -> { (s, dir) =>
      TableCatalog(s, dir).orders
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("n_customers"),
          countDistinct(date_trunc("month", col("o_orderdate"))).as("n_months"))
        .orderBy(col("o_orderpriority"))
    },

    // Interval range join WITHOUT an equi key — "all events within the
    // hour after each severe error". Spark would plan the naive
    // BETWEEN join as a nested loop (O(N·M)); RangeJoin.containsJoin
    // buckets both sides onto the grid and matches with ONE hash
    // equi-join + exact post-filter (see the operator note). DuckDB's
    // IEJoin computes the same pairs natively for the oracle.
    "q17_range_join" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val errors = ev
        .filter(col("event_type") === "error" &&
          get_json_object(col("props"), "$.k").cast("long") >= 90)
        .select(col("event_id").as("err_id"), col("ts").as("err_ts"),
          (col("ts") + expr("interval 1 hour")).as("err_end"))
      val pts = ev.select(col("event_id").as("pt_id"), col("ts").as("pt_ts"))
      graft.operators.RangeJoin.containsJoin(
          errors, col("err_ts"), col("err_end"), pts, col("pt_ts"), 3600L)
        .groupBy(col("err_id"))
        .agg(count(lit(1)).as("n_events"), min(col("pt_id")).as("first_id"))
        .orderBy(col("err_id"))
    },

    // Conversion funnel: signup → purchase within 7 days, reported
    // per signup day — the product-analytics question every event
    // store answers. Per-user first signup (one groupBy), purchases
    // joined on the USER equi-key with the window as a post-filter
    // (never a time-range-only join), earliest qualifying purchase
    // per user, then one O(days) rollup. Conversion rate is one
    // unrounded IEEE division of exact counts.
    "q18_funnel" -> { (s, dir) =>
      val ev = TableCatalog(s, dir).events
      val signups = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("s_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"))
      // the window lives IN the join condition: a user whose
      // purchases all fall outside it must survive as non-converted
      // (a post-filter would drop the row entirely)
      val conv = signups.join(purchases,
          signups("user_id") === purchases("user_id") &&
            purchases("p_ts") > signups("s_ts") &&
            purchases("p_ts") <= signups("s_ts") + expr("interval 7 day"),
          "left")
        .groupBy(signups("user_id"), col("s_ts"))
        .agg(min(col("p_ts")).as("first_purchase"))
      conv.groupBy(date_format(date_trunc("day", col("s_ts")), "yyyy-MM-dd").as("signup_day"))
        .agg(count(lit(1)).as("n_signups"),
          count(col("first_purchase")).as("n_converted"))
        .withColumn("conv_rate", col("n_converted") / col("n_signups"))
        .orderBy(col("signup_day"))
    },

    // Cohort retention matrix: users grouped by first-seen week, then
    // for each later week the fraction of that cohort still active —
    // q18's sibling product-analytics question. Plan: the (user, week)
    // distinct and the per-user cohort min are USER-keyed shuffles
    // (never on the hot week key — a popular week skews a week-keyed
    // shuffle, a user key does not); the cohort map is user-dim sized
    // and equi-joins back; the final rollup keys on O(weeks²) cells;
    // the cohort-size join is O(weeks) rows → broadcast. datediff
    // div 7 is exact integer arithmetic (week starts are 7-day
    // multiples apart); retention is one IEEE division of exact
    // counts (the q18/t15 discipline — bit-identical cross-engine).
    "q19_retention_cohorts" -> { (s, dir) =>
      val weeks = TableCatalog(s, dir).events
        .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
        .distinct()
      val cohort = weeks.groupBy(col("user_id")).agg(min(col("w")).as("cw"))
      val act = weeks.join(cohort, "user_id")
        .groupBy(col("cw"), expr("datediff(w, cw) div 7").cast("int").as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
      val sizes = act.filter(col("week_offset") === 0)
        .select(col("cw"), col("n_active").as("n_cohort"))
      act.join(broadcast(sizes), "cw")
        .select(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
          col("week_offset"), col("n_active"), col("n_cohort"),
          (col("n_active") / col("n_cohort")).as("retention"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },

    // Basket co-occurrence — the association-rules table stake: per
    // ordered event-type pair, how many (user, day) baskets contain
    // BOTH, each type's own basket count, and the lift. Plan: the
    // firing set collapses to DISTINCT (user, day, type) cells first
    // (one user-keyed shuffle), then a (user, day)-equi self-join
    // whose fan-out is bounded by types-per-basket (≤5 here), agg to
    // O(types²) keys; per-type totals broadcast. The basket total is
    // a 1-row driver agg embedded as a LITERAL (t30's span pattern —
    // no scalar cross join reaches the plan); lift = one IEEE
    // division of exact long products — bit-identical cross-engine.
    "q20_basket_pairs" -> { (s, dir) =>
      val cells = TableCatalog(s, dir).events
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"),
          col("event_type"))
        .distinct()
      val nBaskets = cells.select(col("user_id"), col("day")).distinct().count()
      val totals = cells.groupBy(col("event_type").as("t")).agg(count(lit(1)).as("n"))
      cells.as("a")
        .join(cells.as("b"),
          col("a.user_id") === col("b.user_id") && col("a.day") === col("b.day")
            && col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("t1"), col("b.event_type").as("t2"))
        .agg(count(lit(1)).as("n_cobaskets"))
        .join(broadcast(totals.select(col("t").as("t1"), col("n").as("n_t1"))), "t1")
        .join(broadcast(totals.select(col("t").as("t2"), col("n").as("n_t2"))), "t2")
        .select(col("t1"), col("t2"), col("n_cobaskets"), col("n_t1"), col("n_t2"),
          lit(nBaskets).as("n_baskets"),
          ((col("n_cobaskets") * lit(nBaskets)) / (col("n_t1") * col("n_t2")))
            .as("lift"))
        .orderBy(col("t1"), col("t2"))
    }
  )

  private val disc = "CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))"

  val oracles: Seq[(String, String)] = Seq(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
         |  CAST(CAST(sum($disc) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
         |  CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_region_revenue" ->
      s"""SELECT r_name, n_name, CAST(CAST(sum($disc) AS DECIMAL(38,4)) AS DOUBLE) AS revenue, count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q03_top_unshipped" ->
      s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
         |  CAST(CAST(sum($disc) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15'
         |GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q04_exists_semi" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders WHERE EXISTS (
        |  SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q05_no_orders_anti" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_acctbal
        |FROM customer WHERE NOT EXISTS (
        |  SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '1997-01-01')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q06_selective_filter" ->
      """SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,

    "q07_window_rank" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q08_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) OVER (
        |    PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_price
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-02-01'
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "q09_union_distinct" ->
      """SELECT n_name FROM (
        |  SELECT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  UNION
        |  SELECT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey)
        |ORDER BY n_name""".stripMargin,

    "q10_event_pivot" ->
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS click_sum,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS view_sum,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS purchase_sum,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS signup_sum,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS error_sum,
        |  count(*) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q11_rollup_sets" ->
      """SELECT coalesce(r_name, 'ALL') AS r_name, coalesce(n_name, 'ALL') AS n_name,
        |  count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY 1, 2""".stripMargin,

    "q12_intersect_except" ->
      """WITH cust AS (SELECT DISTINCT n_name FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey WHERE c_mktsegment = 'BUILDING'),
        |supp AS (SELECT DISTINCT n_name FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey WHERE s_acctbal > 5000)
        |SELECT 'both' AS src, n_name FROM (SELECT n_name FROM cust INTERSECT SELECT n_name FROM supp)
        |UNION ALL
        |SELECT 'cust_only' AS src, n_name FROM (SELECT n_name FROM cust EXCEPT SELECT n_name FROM supp)
        |ORDER BY src, n_name""".stripMargin,

    "q13_scalar_subquery" ->
      """SELECT o_orderpriority, count(*) AS n_above,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders o
        |WHERE CAST(o_totalprice AS DECIMAL(18,4)) *
        |    (SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
        |  > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,4))) FROM orders i WHERE i.o_custkey = o.o_custkey)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q14_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,

    "q15_percentiles" ->
      """SELECT l_returnflag, count(*) AS cnt,
        |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
        |  round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q16_count_distinct" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  count(DISTINCT o_custkey) AS n_customers,
        |  count(DISTINCT date_trunc('month', o_orderdate)) AS n_months
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q17_range_join" ->
      """WITH e AS (SELECT event_id AS err_id, ts AS err_ts, ts + INTERVAL 1 HOUR AS err_end
        |  FROM events WHERE event_type = 'error'
        |    AND CAST(regexp_replace(props, '[^0-9]', '', 'g') AS BIGINT) >= 90)
        |SELECT err_id, count(*) AS n_events, min(p.event_id) AS first_id
        |FROM e JOIN events p ON p.ts >= e.err_ts AND p.ts <= e.err_end
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q18_funnel" ->
      """WITH s AS (SELECT user_id, min(ts) AS s_ts FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |p AS (SELECT user_id, ts AS p_ts FROM events WHERE event_type = 'purchase'),
        |conv AS (SELECT s.user_id, s.s_ts, min(p.p_ts) AS first_purchase
        |  FROM s LEFT JOIN p ON s.user_id = p.user_id
        |    AND p.p_ts > s.s_ts AND p.p_ts <= s.s_ts + INTERVAL 7 DAY
        |  GROUP BY 1, 2)
        |SELECT strftime(date_trunc('day', s_ts), '%Y-%m-%d') AS signup_day,
        |  count(*) AS n_signups, count(first_purchase) AS n_converted,
        |  count(first_purchase) / count(*) AS conv_rate
        |FROM conv GROUP BY 1 ORDER BY 1""".stripMargin,

    "q19_retention_cohorts" ->
      """WITH weeks AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events),
        |cohort AS (SELECT user_id, min(w) AS cw FROM weeks GROUP BY 1),
        |act AS (SELECT cw, CAST(date_diff('day', cw, w) // 7 AS INT) AS week_offset,
        |    count(DISTINCT weeks.user_id) AS n_active
        |  FROM weeks JOIN cohort ON weeks.user_id = cohort.user_id
        |  GROUP BY 1, 2),
        |sizes AS (SELECT cw, n_active AS n_cohort FROM act WHERE week_offset = 0)
        |SELECT strftime(act.cw, '%Y-%m-%d') AS cohort_week, week_offset, n_active,
        |  n_cohort, n_active / n_cohort AS retention
        |FROM act JOIN sizes ON act.cw = sizes.cw
        |ORDER BY cohort_week, week_offset""".stripMargin,

    "q20_basket_pairs" ->
      """WITH cells AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day, event_type FROM events),
        |nb AS (SELECT count(*) AS n_baskets FROM (SELECT DISTINCT user_id, day FROM cells)),
        |tot AS (SELECT event_type AS t, count(*) AS n FROM cells GROUP BY 1),
        |pairs AS (SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS n_cobaskets
        |  FROM cells a JOIN cells b
        |    ON a.user_id = b.user_id AND a.day = b.day AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT t1, t2, n_cobaskets, ta.n AS n_t1, tb.n AS n_t2,
        |  nb.n_baskets,
        |  (n_cobaskets * nb.n_baskets) / (ta.n * tb.n) AS lift
        |FROM pairs
        |CROSS JOIN nb
        |JOIN tot ta ON ta.t = pairs.t1
        |JOIN tot tb ON tb.t = pairs.t2
        |ORDER BY t1, t2""".stripMargin
  )
}
