package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming face of the ingest drift monitor
  * ([[graft.ext.Analytics.dailyAnomaly]]): score each micro-batch's
  * per-(day, event_type) volume against REFERENCE statistics computed
  * offline from history — the deployment shape of an anomaly alarm
  * (the reference window is a batch artifact refreshed on a schedule;
  * the stream only scores against it, so the stream itself needs no
  * state store and works in append/update mode with any sink).
  *
  * The stats frame is broadcast-sized by construction (one row per
  * event type) and resolved at setup; scoring is a broadcast join +
  * narrow projection. The z formula re-derives mean/variance from the
  * SAME exact integer sums and expression order as the batch operator,
  * so a row scored online equals the batch score for identical counts
  * (spec-asserted).
  */
object StreamAnomaly {

  /** Reference statistics for [[scoreStream]]: per event type, the day
    * count and the exact Σn / Σn² of historical daily volumes.
    */
  def referenceStats(events: DataFrame): DataFrame =
    events
      .select(expr("ts DIV 86400000000").as("day_idx"), col("event_type"))
      .groupBy("day_idx", "event_type").agg(count(lit(1)).as("n"))
      .groupBy("event_type").agg(
        count(lit(1)).as("_days"),
        sum("n").as("_sum"),
        sum(col("n") * col("n")).as("_sumsq"))

  /** Score a (streaming or batch) events frame's per-(day, type)
    * volumes against `stats` (a batch frame from [[referenceStats]]).
    * Emits `day_idx, event_type, n, z_score`. In streaming mode the
    * groupBy is a per-micro-batch aggregate (complete/update mode) —
    * each batch's counts are scored independently, matching the
    * "volume of THIS window vs history" alarm semantics.
    */
  def scoreStream(stream: DataFrame, stats: DataFrame): DataFrame = {
    val mean = col("_sum").cast("double") / col("_days")
    val variance = col("_sumsq").cast("double") / col("_days") - mean * mean
    stream
      .select(expr("ts DIV 86400000000").as("day_idx"), col("event_type"))
      .groupBy("day_idx", "event_type").agg(count(lit(1)).as("n"))
      .join(broadcast(stats), Seq("event_type"))
      .select(col("day_idx"), col("event_type"), col("n"),
        when(variance > 0,
          round((col("n").cast("double") - mean) / sqrt(variance), 4))
          .otherwise(lit(0.0)).as("z_score"))
  }
}
