package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization of the events table (SURVEY.md §2.4): per-user
  * session ids under a gap rule. `ts` is µs-since-epoch BIGINT (see
  * Sources.table), so the gap comparison is exact integer math on both
  * engines.
  *
  * Plan shape: one shuffle on user_id (window partition), two window
  * passes fused into the same sort (lag + running sum). At 100 TB this
  * is the canonical sessionize — the shuffle is unavoidable (grouping by
  * user), everything else is pipelined.
  */
object Sessionize {

  val DefaultGapMicros: Long = 30L * 60 * 1000000 // 30 min

  def sessionize(events: DataFrame, gapMicros: Long = DefaultGapMicros): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val newSession =
      when(col("ts") - lag("ts", 1).over(byUser) > gapMicros, 1)
        .when(lag("ts", 1).over(byUser).isNull, 1)
        .otherwise(0)
    events
      .withColumn("is_new", newSession)
      .withColumn("session_seq",
        sum("is_new").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .select(
        col("event_id"), col("user_id"), col("ts"),
        col("session_seq").cast("bigint").as("session_seq"))
      .orderBy("user_id", "ts", "event_id")
  }
}
