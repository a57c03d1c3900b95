package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with
  * `right.ts <= left.ts` within the same key — Minerva's "trend value
  * at an arbitrary timestamp" lookup, and the standard point-in-time
  * join for feature pipelines.
  *
  * Implementation: union both sides tagged, one window sorted by
  * `(ts, side)` per key, carry the last-seen right row forward with
  * `last(ignoreNulls)`. One shuffle on the key, no range join, no
  * cross product — this is the shape that survives 100 TB (a
  * sort-merge range join would; a cross join would not). Right rows
  * sort before left rows at equal ts, so ties are inclusive.
  */
object AsOf {

  /** @param left      probe side (keeps all rows)
    * @param right     reference side (latest row carried forward)
    * @param key       equi-join key column name present on both sides
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @param carry     right columns to carry; emitted as `asof_<name>`
    * @param toleranceSeconds  maximum staleness (pandas merge_asof's
    *   `tolerance`): a match older than `left.ts − tolerance` nulls
    *   out instead of carrying — a feature pipeline must not serve a
    *   week-old "latest" value as fresh. Inclusive at exactly the
    *   tolerance; None (default) keeps the unbounded lookup. Same
    *   plan either way: the right ts rides the existing carry window
    *   and the staleness check is a per-row codegen'd predicate.
    */
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String, carry: Seq[String],
           toleranceSeconds: Option[Long] = None): DataFrame = {
    val withTol = toleranceSeconds.isDefined
    val rightX = if (withTol) right.withColumn("__rts", col(rightTs)) else right
    val carryAll = if (withTol) carry :+ "__rts" else carry
    val lTagged = left.withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumns(carryAll.map(c =>
        s"__c_$c" -> lit(null).cast(rightX.schema(c).dataType)).toMap)
    val rTagged = rightX.select(
        (col(key) +: (col(rightTs).as("__ts") +: lit(0).as("__side") +:
          carryAll.map(c => col(c).as(s"__c_$c")))): _*)
      .withColumns(left.columns.filterNot(_ == key)
        .map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap)
      .select(lTagged.columns.map(col): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = lTagged.unionByName(rTagged)
      .withColumns(carryAll.map(c =>
        s"asof_$c" -> last(col(s"__c_$c"), ignoreNulls = true).over(w)).toMap)

    val base = carried.filter(col("__side") === 1)
      .drop("__ts" :: "__side" :: carryAll.map(c => s"__c_$c").toList: _*)
    toleranceSeconds match {
      case None => base
      case Some(tol) =>
        val fresh = col("asof___rts").isNotNull &&
          col("asof___rts") >= col(leftTs) - expr(s"interval $tol second")
        carry.foldLeft(base)((df, c) =>
          df.withColumn(s"asof_$c", when(fresh, col(s"asof_$c"))))
          .drop("asof___rts")
    }
  }
}
