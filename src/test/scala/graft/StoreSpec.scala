package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{AttributeStoreWriter, EntityRegistry, Relations, TrendStore}

/** Store-machinery specs: local-time (DST-aware) granularities,
  * end-of-interval labeling, relation reversal, and the resolve
  * plan shape. */
class StoreSpec extends SparkSpec {

  import graft.SparkSpec.spark.implicits._

  private def trend(rows: Seq[(Long, String, Double)]) =
    rows.toDF("entity", "ts", "v").withColumn("ts", col("ts").cast("timestamp"))

  test("rollupLocal: spring-forward local day has 23 hours, buckets cut on local midnight") {
    // Europe/Amsterdam 2024-03-31: 02:00 CET jumps to 03:00 CEST, so
    // the local day spans UTC [2024-03-30 23:00, 2024-03-31 22:00).
    val rows = trend(Seq(
      (1L, "2024-03-30 22:59:59", 1.0), // local 03-30 23:59:59 CET
      (1L, "2024-03-30 23:00:00", 2.0), // local 03-31 00:00:00 CET
      (1L, "2024-03-31 21:59:59", 4.0), // local 03-31 23:59:59 CEST
      (1L, "2024-03-31 22:00:00", 8.0)  // local 04-01 00:00:00 CEST
    ))
    val got = TrendStore.present(TrendStore.rollupLocal(
        rows, col("entity"), col("ts"), col("v"), "day", "Europe/Amsterdam"))
      .collect().map(r => (r.getAs[String]("bucket"), r.getAs[Double]("sum_value"))).toMap
    assert(got === Map(
      "2024-03-30 00:00:00" -> 1.0,
      "2024-03-31 00:00:00" -> 6.0,
      "2024-04-01 00:00:00" -> 8.0))
    // A UTC rollup puts the 23:00Z row on 03-30 — the wrong local day.
    val utc = TrendStore.present(TrendStore.rollup(
        rows, col("entity"), col("ts"), col("v"), "day"))
      .collect().map(r => (r.getAs[String]("bucket"), r.getAs[Double]("sum_value"))).toMap
    assert(utc("2024-03-30 00:00:00") === 3.0)
  }

  test("rollupLocal: fall-back local day has 25 hours") {
    // Europe/Amsterdam 2024-10-27: 03:00 CEST falls back to 02:00 CET,
    // so the local day spans UTC [2024-10-26 22:00, 2024-10-27 23:00).
    val rows = trend(Seq(
      (1L, "2024-10-26 22:00:00", 1.0), // local 10-27 00:00:00 CEST
      (1L, "2024-10-27 22:59:59", 2.0), // local 10-27 23:59:59 CET
      (1L, "2024-10-27 23:00:00", 4.0)  // local 10-28 00:00:00 CET
    ))
    val got = TrendStore.present(TrendStore.rollupLocal(
        rows, col("entity"), col("ts"), col("v"), "day", "Europe/Amsterdam"))
      .collect().map(r => (r.getAs[String]("bucket"), r.getAs[Double]("sum_value"))).toMap
    assert(got === Map(
      "2024-10-27 00:00:00" -> 3.0,
      "2024-10-28 00:00:00" -> 4.0))
  }

  test("local week rollup + end labels stay correct across spring-forward") {
    // Europe/Amsterdam: the local week of Mon 2024-03-25 contains the
    // Mar 31 spring-forward (a 167-hour week, UTC span
    // [03-24 23:00Z, 03-31 22:00Z)). End-labels are local wall-clock
    // arithmetic, so +7d lands on the next local Monday midnight.
    val rows = trend(Seq(
      (1L, "2024-03-24 22:59:00", 1.0),  // local Sun 03-24 23:59 CET → week 03-18
      (1L, "2024-03-24 23:00:00", 2.0),  // local Mon 03-25 00:00 CET → week 03-25
      (1L, "2024-03-31 21:59:00", 4.0),  // local Sun 03-31 23:59 CEST → week 03-25
      (1L, "2024-03-31 22:00:00", 8.0))) // local Mon 04-01 00:00 CEST → week 04-01
    val ended = TrendStore.present(TrendStore.labelEnd(
        TrendStore.rollupLocal(rows, col("entity"), col("ts"), col("v"),
          "week", "Europe/Amsterdam"), "week"))
      .collect().map(r => (r.getAs[String]("bucket"), r.getAs[Double]("sum_value"))).toMap
    assert(ended === Map(
      "2024-03-25 00:00:00" -> 1.0,   // week starting 03-18, labeled by its end
      "2024-04-01 00:00:00" -> 6.0,   // the DST week
      "2024-04-08 00:00:00" -> 8.0))
    // Month twin: March (a 743-hour local month) end-labels to Apr 1.
    val monthEnded = TrendStore.present(TrendStore.labelEnd(
        TrendStore.rollupLocal(rows, col("entity"), col("ts"), col("v"),
          "month", "Europe/Amsterdam"), "month"))
      .collect().map(r => (r.getAs[String]("bucket"), r.getAs[Double]("sum_value"))).toMap
    assert(monthEnded === Map(
      "2024-04-01 00:00:00" -> 7.0,
      "2024-05-01 00:00:00" -> 8.0))
  }

  test("labelEnd shifts bucket labels to the interval end") {
    val rows = trend(Seq((1L, "2024-01-01 10:20:00", 1.0), (1L, "2024-01-01 10:40:00", 2.0)))
    val hourly = TrendStore.rollup(rows, col("entity"), col("ts"), col("v"), "hour")
    val ended = TrendStore.present(TrendStore.labelEnd(hourly, "hour")).collect()
    assert(ended.length === 1)
    assert(ended.head.getAs[String]("bucket") === "2024-01-01 11:00:00")
    val monthly = TrendStore.present(
      TrendStore.labelEnd(TrendStore.reRollup(hourly, "month"), "month")).collect()
    assert(monthly.head.getAs[String]("bucket") === "2024-02-01 00:00:00")
  }

  test("Relations.reverse swaps direction and marks the type") {
    val src = Seq(("Cell=1", "Site=A"), ("Cell=2", "Site=A")).toDF("c", "p")
    val rel = Relations.of(src, col("c"), col("p"), "cell->site")
    val rev = Relations.reverse(rel)
    val rows = rev.orderBy("parent_dn").collect()
      .map(r => (r.getAs[String]("child_dn"), r.getAs[String]("parent_dn"),
        r.getAs[String]("relation_type")))
    assert(rows.toSeq === Seq(
      ("Site=A", "Cell=1", "rev:cell->site"), ("Site=A", "Cell=2", "rev:cell->site")))
    // reversing twice restores the original pairs
    val twice = Relations.reverse(rev).select("child_dn", "parent_dn")
    assert(twice.exceptAll(rel.select("child_dn", "parent_dn")).isEmpty)
  }

  test("Relations.composeTemporal intersects both hops' validity; empty intersections drop") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // cell X: site A for Jan-01..15, site B after (hop-1 re-parent);
    // site A: region R1 until Jan-10 then R2 (hop-2 re-parent);
    // site B: region R2 always
    val hop1 = Seq(
      ("X", "A", "2024-01-01 00:00:00", "2024-01-15 00:00:00"),
      ("X", "B", "2024-01-15 00:00:00", "2024-02-01 00:00:00"))
      .toDF("child_dn", "parent_dn", "f", "t")
      .select(col("child_dn"), col("parent_dn"),
        col("f").cast("timestamp").as("from_ts"),
        col("t").cast("timestamp").as("to_ts"),
        lit("cell->site").as("relation_type"))
    val hop2 = Seq(
      ("A", "R1", "2024-01-01 00:00:00", "2024-01-10 00:00:00"),
      ("A", "R2", "2024-01-10 00:00:00", "2024-02-01 00:00:00"),
      ("B", "R2", "2024-01-01 00:00:00", "2024-02-01 00:00:00"))
      .toDF("child_dn", "parent_dn", "f", "t")
      .select(col("child_dn"), col("parent_dn"),
        col("f").cast("timestamp").as("from_ts"),
        col("t").cast("timestamp").as("to_ts"),
        lit("site->region").as("relation_type"))
    val got = Relations.composeTemporal(hop1, hop2)
      .orderBy("from_ts", "parent_dn").collect()
      .map(r => (r.getAs[String]("child_dn"), r.getAs[String]("parent_dn"),
        r.getAs[java.sql.Timestamp]("from_ts"), r.getAs[java.sql.Timestamp]("to_ts"),
        r.getAs[String]("relation_type")))
    // X: R1 for [01, 10), R2 for [10, 15) via A, R2 for [15, Feb) via
    // B — the A→R2 window [10, Feb) clips to X's stay at A, and the
    // B hop's [Jan, Feb) clips to X's arrival. No [15, 10) empties.
    assert(got.toSeq === Seq(
      ("X", "R1", ts("2024-01-01 00:00:00"), ts("2024-01-10 00:00:00"), "cell->site|site->region"),
      ("X", "R2", ts("2024-01-10 00:00:00"), ts("2024-01-15 00:00:00"), "cell->site|site->region"),
      ("X", "R2", ts("2024-01-15 00:00:00"), ts("2024-02-01 00:00:00"), "cell->site|site->region")))
    // validity never inverts (empty intersections dropped, not kept)
    assert(got.forall { case (_, _, f, t, _) => f.before(t) })
    // with identical full-span validity on both hops, the temporal
    // composition carries exactly the interval-blind compose's pairs
    val full = (df: org.apache.spark.sql.DataFrame) => df
      .withColumn("from_ts", lit("2024-01-01 00:00:00").cast("timestamp"))
      .withColumn("to_ts", lit("2024-02-01 00:00:00").cast("timestamp"))
    val blind = Relations.compose(hop1.drop("from_ts", "to_ts").distinct(),
      hop2.drop("from_ts", "to_ts").distinct())
      .select("child_dn", "parent_dn")
    val temporal = Relations.composeTemporal(full(hop1.drop("from_ts", "to_ts").distinct()),
      full(hop2.drop("from_ts", "to_ts").distinct()))
      .select("child_dn", "parent_dn").distinct()
    assert(temporal.exceptAll(blind).isEmpty && blind.exceptAll(temporal).isEmpty)
  }

  test("Relations.closure walks any depth in O(log d) rounds and survives cycles") {
    // a 21-node chain n0 → n1 → … → n20: closure = all ordered
    // ancestor pairs, 21·20/2 = 210 of them
    val chain = (0 until 20).map(i => (s"n$i", s"n${i + 1}")).toDF("c", "p")
    val rel = Relations.of(chain, col("c"), col("p"), "up")
    val closed = Relations.closure(rel, maxRounds = 7) // ⌈log2 20⌉ + slack
    assert(closed.count() === 210)
    assert(closed.filter(col("child_dn") === "n0" && col("parent_dn") === "n20").count() === 1)
    assert(closed.filter(col("child_dn") === col("parent_dn")).isEmpty)
    // a cycle converges to all cross pairs, never self pairs
    val cyc = Relations.of(Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("c", "p"),
      col("c"), col("p"), "loop")
    val closedCyc = Relations.closure(cyc)
    assert(closedCyc.count() === 6)
    assert(closedCyc.filter(col("child_dn") === col("parent_dn")).isEmpty)
  }

  test("Relations.cycles: healthy DAG empty; fringe chains trim away; disjoint SCCs sized right") {
    def cyclesOf(edges: Seq[(String, String)]) =
      Relations.cycles(Relations.of(edges.toDF("c", "p"), col("c"), col("p"), "t"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a healthy DAG (diamond + chain) reports NOTHING — and trims to
    // an empty core before any closure round runs
    assert(cyclesOf(Seq(("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),
      ("d", "e"))).isEmpty)
    // a long acyclic tail INTO a 3-cycle and OUT of it: the cascading
    // trim peels the tails, exactly the cycle's nodes remain (2 peers
    // each), tail nodes never appear
    val tailIn = (0 until 5).map(i => (s"in$i", s"in${i + 1}")) :+ ("in5", "x")
    val tailOut = Seq(("z", "out0"), ("out0", "out1"))
    val m = cyclesOf(tailIn ++ Seq(("x", "y"), ("y", "z"), ("z", "x")) ++ tailOut)
    assert(m === Map("x" -> 2L, "y" -> 2L, "z" -> 2L))
    // two DISJOINT cycles (sizes 2 and 3) report independent SCCs;
    // a self-loop edge is excluded by contract
    val m2 = cyclesOf(Seq(("p", "q"), ("q", "p"),
      ("u", "v"), ("v", "w"), ("w", "u"), ("solo", "solo")))
    assert(m2 === Map("p" -> 1L, "q" -> 1L, "u" -> 2L, "v" -> 2L, "w" -> 2L))
  }

  test("attribute store persistence: append history, materialize current") {
    val base = Files.createTempDirectory("graft_attr").toString
    def batch(rows: Seq[(Long, String, Long, String)]) =
      rows.toDF("entity_id", "ts", "event_id", "status")
        .withColumn("ts", col("ts").cast("timestamp"))
    AttributeStoreWriter.append(spark, s"$base/hist", batch(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "up"),
      (2L, "2024-01-01 11:00:00", 2L, "down"))))
    AttributeStoreWriter.append(spark, s"$base/hist", batch(Seq(
      (1L, "2024-01-02 09:00:00", 3L, "down"))))
    // re-delivery of an existing (entity, ts, event) row is idempotent
    AttributeStoreWriter.append(spark, s"$base/hist", batch(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "up"))))
    assert(AttributeStoreWriter.readHistory(spark, s"$base/hist").count() === 3)
    val cur = AttributeStoreWriter.materializeCurrent(
      spark, s"$base/hist", s"$base/current")
    assert(cur.count() === 2)
    val m = cur.collect().map(r => r.getAs[Long]("entity_id") -> r.getAs[String]("status")).toMap
    assert(m === Map(1L -> "down", 2L -> "down"))
    // re-materialization after another append picks up the new latest
    AttributeStoreWriter.append(spark, s"$base/hist", batch(Seq(
      (2L, "2024-01-03 08:00:00", 4L, "up"))))
    val cur2 = AttributeStoreWriter.materializeCurrent(
      spark, s"$base/hist", s"$base/current")
    assert(cur2.filter(col("entity_id") === 2L).head.getAs[String]("status") === "up")
  }

  test("resolve plans a broadcast HASH join, not a nested-loop join") {
    val src = Seq(("Cell=1", "cell", "alpha"), ("Cell=2", "cell", "beta"))
      .toDF("dn", "t", "a")
    val reg = EntityRegistry.register(src, col("dn"), col("t"), col("a"))
    val names = Seq("Cell=1", "beta", "nope").toDF("name")
    val res = EntityRegistry.resolve(names, "name", reg)
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // a name that is both some entity's dn and another's alias
    // resolves to BOTH (same as the OR-predicate semantics)
    val tricky = Seq(("X", "cell", "Cell=2"), ("Cell=2", "cell", "z"))
      .toDF("dn", "t", "a")
    val reg2 = EntityRegistry.register(tricky, col("dn"), col("t"), col("a"))
    val hits = EntityRegistry.resolve(Seq("Cell=2").toDF("name"), "name", reg2)
    assert(hits.count() === 2)
  }

  test("contributionShare apportions each parent cell to 100%") {
    val groups = Seq(("E=1", "C=a", "P=x"), ("E=2", "C=a", "P=x"),
      ("E=3", "C=b", "P=x"), ("E=4", "C=c", "P=y"))
      .toDF("entity_dn", "child", "parent")
    val fact = Seq(("E=1", "2024-01-05 00:00:00", "10.0"),
      ("E=2", "2024-01-20 00:00:00", "20.0"),  // C=a total 30
      ("E=3", "2024-01-09 00:00:00", "70.0"),  // C=b 70 → shares .3/.7
      ("E=4", "2024-02-01 00:00:00", "5.0"))   // P=y single child → 1.0
      .toDF("dn", "ts", "v")
      .select(col("dn"), col("ts").cast("timestamp").as("ts"),
        col("v").cast("double").as("v"))
    val got = TrendStore.contributionShare(fact, col("dn"), col("ts"),
        "month", groups, col("v"))
      .select(col("parent"), col("child"), col("child_value"), col("share"))
      .as[(String, String, Double, Double)].collect().toSet
    assert(got === Set(
      ("P=x", "C=a", 30.0, 30.0 / 100.0),
      ("P=x", "C=b", 70.0, 70.0 / 100.0),
      ("P=y", "C=c", 5.0, 1.0)))
    // on real data: every (parent, bucket) cell's shares sum to 1
    val c = graft.sources.TableCatalog(spark, sf)
    val g2 = c.customer.join(broadcast(c.nation), col("c_nationkey") === col("n_nationkey"))
      .select(concat(lit("Customer="), col("c_custkey")).as("entity_dn"),
        concat(lit("Nation="), col("n_nationkey")).as("child"),
        concat(lit("Region="), col("n_regionkey")).as("parent"))
    val sums = TrendStore.contributionShare(c.orders,
        concat(lit("Customer="), col("o_custkey")), col("o_orderdate"),
        "month", g2, col("o_totalprice"))
      .groupBy(col("parent"), col("bucket")).agg(sum(col("share")).as("t"))
      .select(abs(col("t") - lit(1.0)).as("err"))
      .agg(max(col("err"))).head.getDouble(0)
    assert(sums < 1e-9, s"share sums drift: $sums")
  }

  test("Relations.diff reports rehomed / added / removed children; re-ordering is not drift") {
    val before = Seq(
      ("Cell=1", "Site=A"), ("Cell=2", "Site=A"), ("Cell=3", "Site=B"),
      ("Cell=4", "Site=B"), ("Cell=4", "Site=C")) // multi-parent
      .toDF("child_dn", "parent_dn").withColumn("relation_type", lit("cell->site"))
    val after = Seq(
      ("Cell=1", "Site=A"),                        // unchanged → silent
      ("Cell=2", "Site=B"),                        // rehomed
      ("Cell=5", "Site=A"),                        // added
      ("Cell=4", "Site=C"), ("Cell=4", "Site=B"))  // same set, re-ordered
      .toDF("child_dn", "parent_dn").withColumn("relation_type", lit("cell->site"))
    val got = Relations.diff(before, after)
      .select(col("child_dn"), col("change"))
      .as[(String, String)].collect().toSet
    assert(got === Set(
      ("Cell=2", "rehomed"), ("Cell=3", "removed"), ("Cell=5", "added")))
  }

  test("Relations.fanout reports per-type edge counts and parent fan-out shape") {
    val rel = Seq(
      ("Cell=1", "Site=A"), ("Cell=2", "Site=A"), ("Cell=3", "Site=A"),
      ("Cell=4", "Site=B"),
      ("Cell=4", "Site=B")) // duplicate edge → counted once
      .toDF("child_dn", "parent_dn").withColumn("relation_type", lit("cell->site"))
      .unionByName(Seq(("Site=A", "Region=R"), ("Site=B", "Region=R"))
        .toDF("child_dn", "parent_dn").withColumn("relation_type", lit("site->region")))
    val got = Relations.fanout(rel)
      .select(col("relation_type"), col("n_links"), col("n_parents"),
        col("max_fanout"), col("avg_fanout"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).sortBy(_._1)
    assert(got.toSeq === Seq(
      ("cell->site", 4L, 2L, 3L, 2.0),
      ("site->region", 2L, 1L, 2L, 2.0)))
  }

  test("syncStatus classifies active / silent / unregistered dns") {
    val src = Seq(("Cell=1", "cell", "alpha"), ("Cell=2", "cell", "beta"))
      .toDF("dn", "t", "a")
    val reg = EntityRegistry.register(src, col("dn"), col("t"), col("a"))
    // Cell=2 emits twice, Cell=3 emits without being registered,
    // Cell=1 is registered but silent.
    val activity = Seq(
      ("Cell=2", "2024-01-01 10:00:00"), ("Cell=2", "2024-01-02 11:00:00"),
      ("Cell=3", "2024-01-03 12:00:00"))
      .toDF("adn", "at").select(col("adn"), col("at").cast("timestamp").as("at"))
    val got = EntityRegistry.syncStatus(reg, activity, col("adn"), col("at"))
      .select(col("dn"), col("status"), col("n_rows"),
        date_format(col("last_active"), "yyyy-MM-dd HH:mm:ss").as("la"))
      .as[(String, String, Long, Option[String])].collect().toSet
    assert(got === Set(
      ("Cell=1", "silent", 0L, None),
      ("Cell=2", "active", 2L, Some("2024-01-02 11:00:00")),
      ("Cell=3", "unregistered", 1L, Some("2024-01-03 12:00:00"))))
  }
}
