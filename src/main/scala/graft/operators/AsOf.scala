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
    */
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String, carry: Seq[String]): DataFrame = {
    val lTagged = left.withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumns(carry.map(c =>
        s"__c_$c" -> lit(null).cast(right.schema(c).dataType)).toMap)
    val rTagged = right.select(
        (col(key) +: (col(rightTs).as("__ts") +: lit(0).as("__side") +:
          carry.map(c => col(c).as(s"__c_$c")))): _*)
      .withColumns(left.columns.filterNot(_ == key)
        .map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap)
      .select(lTagged.columns.map(col): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = lTagged.unionByName(rTagged)
      .withColumns(carry.map(c =>
        s"asof_$c" -> last(col(s"__c_$c"), ignoreNulls = true).over(w)).toMap)

    carried.filter(col("__side") === 1)
      .drop("__ts" :: "__side" :: carry.map(c => s"__c_$c").toList: _*)
  }
}
