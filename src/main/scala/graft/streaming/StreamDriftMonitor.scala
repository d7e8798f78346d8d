package graft.streaming

import graft.ext.Similarity
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming face of the index-staleness report
  * ([[graft.ext.Similarity.ivfDrift]]'s online half): as vectors
  * arrive, maintain RUNNING per-cell cohesion of the batch-so-far and
  * score it against the frozen index's baseline — the alarm that fires
  * while drift is happening, instead of at the next offline report.
  *
  * Frozen artifacts (the bounded-model class): the centroid matrix
  * (assignment is the same portable literal-argmin the batch report
  * uses) and the baseline per-cell `(n, Σ sim·10⁶)` — k rows collected
  * once from the indexed set. State is Spark's own streaming
  * aggregation: `groupBy(centroid_id).agg(count, sum(micro))` in
  * Update mode keeps exact integer running totals per cell (state size
  * = k rows, bounded by the index, never the stream). Micro-unit sums
  * make the running mean EXACTLY the batch operator's
  * DECIMAL(10,6)-sum mean on the same rows (spec-pinned: after the
  * full corpus streams through, each cell's final update equals
  * [[Similarity.ivfDrift]]'s row).
  */
object StreamDriftMonitor {

  /** The frozen baseline: per cell, the indexed set's count and exact
    * micro-unit cohesion sum. k rows — bounded by the index.
    */
  def baseline(
      indexed: DataFrame,
      index: Similarity.IvfIndex): Map[Long, (Long, Long)] =
    assignedMicro(indexed, index)
      .groupBy("centroid_id")
      .agg(count(lit(1)).as("n"), sum("micro").as("s"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  /** Per-vector (centroid_id, micro = round(sim·10⁶)) under the frozen
    * index — the 6-dp portable sim is an exact integer in micro-units,
    * so running sums accumulate exactly (no float accumulation order).
    */
  private def assignedMicro(df: DataFrame, index: Similarity.IvfIndex): DataFrame =
    df.withColumn("_m", Similarity.nearestCentroidScoredPortable(index.centroids))
      .select(col("_m").getField("cid").as("centroid_id"),
        round(-col("_m").getField("d") * 1e6, 0).cast("long").as("micro"))

  /** Update-mode drift stream: one row per (cell touched this batch)
    * per micro-batch — `(centroid_id, n_new, mean_new, drift)` with the
    * running totals over EVERYTHING seen so far. `drift` = running mean
    * cohesion of arrivals minus the frozen baseline's mean, 4 dp (the
    * batch report's contract); cells absent from the baseline score
    * against mean 0 (they held no indexed vectors — any arrivals there
    * are by definition off the trained distribution).
    */
  def driftStream(
      stream: DataFrame,
      index: Similarity.IvfIndex,
      base: Map[Long, (Long, Long)]): DataFrame = {
    val baseMeanMap: Column =
      if (base.isEmpty) lit(null).cast("map<bigint,double>")
      else typedLit(base.map { case (cid, (n, s)) =>
        cid -> (if (n == 0) 0.0 else s.toDouble / 1e6 / n)
      })
    val meanNew = (col("_s").cast("double") / 1e6) / col("n_new")
    val baseMean = coalesce(element_at(baseMeanMap, col("centroid_id")), lit(0.0))
    assignedMicro(stream, index)
      .groupBy("centroid_id")
      .agg(count(lit(1)).as("n_new"), sum("micro").as("_s"))
      .select(col("centroid_id"), col("n_new"),
        round(meanNew, 6).as("mean_new"),
        round(meanNew - baseMean, 4).as("drift"))
  }
}
