package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Notification stores: the reference's irregular event records with
  * TYPED attributes (minerva/storage/notification) — not ad-hoc JSON
  * poking. A store declares its attribute schema once; payloads are
  * projected through it (`from_json`, codegen'd, one parse per row),
  * malformed payloads yield nulls instead of failing a 100 TB load.
  */
object NotificationStore {

  /** Project a JSON payload column through the store's declared
    * attribute schema: output = entity/ts cols + one typed column per
    * attribute. */
  def typed(events: DataFrame, payload: Column, attrSchema: StructType): DataFrame = {
    val parsed = events.withColumn("__attrs", from_json(payload, attrSchema))
    attrSchema.fieldNames.foldLeft(parsed) { (df, f) =>
      df.withColumn(f, col(s"__attrs.$f"))
    }.drop("__attrs")
  }

  /** Notification sets: group notifications into per-(entity, bucket)
    * sets — Minerva's notification-set tables link related
    * notifications; the Spark shape is a groupBy with collected ids. */
  def sets(notifications: DataFrame, entity: Column, ts: Column, idCol: Column,
           granularity: String): DataFrame =
    notifications.groupBy(entity.as("entity_id"),
        date_trunc(granularity, ts).as("bucket"))
      .agg(count(lit(1)).as("n_notifications"),
        sort_array(collect_list(idCol)).as("notification_ids"))
}
