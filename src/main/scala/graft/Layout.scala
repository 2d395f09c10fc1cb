package graft

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Physical table layout (SURVEY §4): the reference leans on Postgres
  * secondary indexes (`room, ts, username, flags, deleted` on `message`,
  * models/chat.py:8); the columnar equivalent is layout, not indexes:
  *
  *   - PARTITION by the hot equality key (`room`: bounded cardinality,
  *     every chat query filters on it) → partition pruning skips whole
  *     directories.
  *   - SORT within files by the hot range key (`ts`) → parquet row-group
  *     min/max statistics prune within files for time-range scans.
  *
  * At 100 TB this is the difference between "scan a room's day" reading
  * one file slice vs. the whole table.
  */
object Layout {
  /** Write a message-shaped table partitioned by room, ts-sorted files. */
  def writeMessages(msgs: DataFrame, path: String): Unit =
    msgs.repartition(col("room"))
      .sortWithinPartitions(col("room"), col("ts"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("room")
      .parquet(path)
}
