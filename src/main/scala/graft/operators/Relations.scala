package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relation stores: the reference's typed entity-hierarchy tables
  * (minerva/directory/relation — e.g. cell → site → region), as
  * first-class DataFrames `(child_dn, parent_dn, relation_type)`.
  *
  * Relations are registry-sized (≪ trend data), so every use in an
  * aggregation broadcasts; composition is a broadcast join of two
  * registry-sized tables.
  */
object Relations {

  /** Build a typed relation from any child table. */
  def of(src: DataFrame, childDn: Column, parentDn: Column, relType: String): DataFrame =
    src.select(childDn.as("child_dn"), parentDn.as("parent_dn"),
      lit(relType).as("relation_type")).distinct()

  /** Compose child→mid with mid→parent into child→grandparent —
    * Minerva materializes these transitive relations (cell→region)
    * rather than walking the hierarchy per query. */
  def compose(lower: DataFrame, upper: DataFrame): DataFrame =
    lower.alias("l")
      .join(broadcast(upper.alias("u")), col("l.parent_dn") === col("u.child_dn"))
      .select(col("l.child_dn").as("child_dn"), col("u.parent_dn").as("parent_dn"),
        concat(col("l.relation_type"), lit("|"), col("u.relation_type")).as("relation_type"))
      .distinct()

  /** Reverse view (parent → children). */
  def reverse(rel: DataFrame): DataFrame =
    rel.select(col("parent_dn").as("child_dn"), col("child_dn").as("parent_dn"),
      concat(lit("rev:"), col("relation_type")).as("relation_type"))

  /** TRANSITIVE CLOSURE of a relation — every (descendant, ancestor)
    * pair at any depth, the materialized walk a deep hierarchy needs
    * when [[compose]]'s fixed two-hop isn't enough (cell → site →
    * region → country → …). Path DOUBLING: each round composes the
    * closure-so-far with itself, so covered depth doubles per round
    * and a depth-d hierarchy closes in ⌈log₂ d⌉ rounds — the same
    * reason dupClusters runs large-star/small-star instead of
    * single-step propagation. Relations are registry-sized, so each
    * round is one broadcast join + distinct; the driver sees only a
    * converged-or-not count per round. Emits `relation_type` =
    * "closure". Cycles converge (the pair set is finite and
    * monotone); self-pairs are excluded. */
  def closure(rel: DataFrame, maxRounds: Int = 32): DataFrame = {
    var acc = rel.select(col("child_dn"), col("parent_dn"))
      .filter(col("child_dn") =!= col("parent_dn"))
      .distinct().localCheckpoint()
    var rounds = 0
    var grew = true
    while (grew) {
      require(rounds < maxRounds, s"closure failed to converge in $maxRounds rounds")
      val doubled = acc.alias("l")
        .join(broadcast(acc.alias("u")), col("l.parent_dn") === col("u.child_dn"))
        .select(col("l.child_dn").as("child_dn"), col("u.parent_dn").as("parent_dn"))
        .union(acc)
        .filter(col("child_dn") =!= col("parent_dn"))
        .distinct().localCheckpoint()
      grew = doubled.count() > acc.count()
      acc = doubled
      rounds += 1
    }
    acc.withColumn("relation_type", lit("closure"))
  }
}
