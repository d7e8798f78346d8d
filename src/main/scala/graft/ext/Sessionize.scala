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

  /** Session-level rollup of [[sessionize]]: one row per session with
    * its event count and µs duration, then a one-row corpus summary
    * (session count, mean events/session at 4 dp, exact duration sum
    * and max). The engagement report built ON TOP of the sessionize
    * output — same single user-keyed shuffle, then two bounded
    * aggregates (sessions, then one row); durations stay exact integer
    * µs so every non-mean column is hash-exact.
    */
  def sessionStats(events: DataFrame, gapMicros: Long = DefaultGapMicros): DataFrame =
    sessionize(events, gapMicros)
      .groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_events"),
        (max("ts") - min("ts")).as("duration_us"))
      .agg(
        count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"),
        sum("n_events").as("n_events"),
        round(sum("n_events").cast("double") / count(lit(1)), 4)
          .as("avg_events_per_session"),
        sum("duration_us").as("total_duration_us"),
        max("duration_us").as("max_duration_us"))
      .orderBy("n_sessions")
}
