package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Change-data maintenance — the two standard moves that keep a serving
 * table consistent with an event/change log at warehouse scale:
 *
 *  - `latestSnapshot` (CDC apply): collapse a change log to its
 *    latest-wins state per key, honoring delete markers — the
 *    materialize step of any log-to-table sync.
 *  - `scd2History` (slowly-changing dimension, type 2): turn the same
 *    log into interval-versioned history rows (valid_from / valid_to /
 *    is_current), the audit-join shape ("what was the value AS OF t" —
 *    the batch twin of `EventStreams.asOfJoin`).
 *
 * Both are ONE shuffle on the key plus per-key window work — partitions
 * are keys, so a 100 TB log with a sane key space parallelizes evenly;
 * per-key ordering is (ts, id), deterministic by construction, never by
 * arrival order.
 */
object ChangeData {

  /** Latest-wins state per key from a change log. Rows whose `deleteCol`
    * is true are tombstones: a key whose LATEST change is a delete leaves
    * the snapshot entirely (earlier deletes are ordinary history).
    * Output: (key, ts, value) of the surviving latest change per key. */
  def latestSnapshot(log: DataFrame, delete: Column,
                     keyCol: String = "user_id", tsCol: String = "ts",
                     idCol: String = "event_id",
                     valueCol: String = "value"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).desc, col(idCol).desc)
    log.select(col(keyCol), col(tsCol), col(idCol),
        col(valueCol).cast("double").as("value"), delete.as("__del"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && !col("__del"))
      .select(col(keyCol), col(tsCol), col("value"))
  }

  /** Type-2 slowly-changing-dimension history from a change log: one row
    * per change per key, valid from its own timestamp until the NEXT
    * change's timestamp (NULL = still current). `is_current` marks the
    * open row. Delete tombstones CLOSE the history (the delete row itself
    * carries no value row; the preceding row's validity ends at the
    * delete's ts) — so a key whose latest change is a delete has no
    * current row, matching `latestSnapshot`.
    * Output: (key, value, valid_from, valid_to, is_current). */
  def scd2History(log: DataFrame, delete: Column,
                  keyCol: String = "user_id", tsCol: String = "ts",
                  idCol: String = "event_id",
                  valueCol: String = "value"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).asc, col(idCol).asc)
    log.select(col(keyCol), col(tsCol), col(idCol),
        col(valueCol).cast("double").as("value"), delete.as("__del"))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .where(!col("__del")) // tombstones only close the prior row
      .select(col(keyCol), col("value"), col(tsCol).as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"))
  }
}
