package graft.streaming

import graft.ext.Similarity
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming face 14: PSEUDO-LABELING arriving vectors — the serving
  * half of the label-propagation family (`label_propagation_*` keys
  * pseudo-label the CORPUS offline; this face labels what arrives
  * next, against the frozen artifacts the offline build persisted):
  * each arriving vector takes the cosine-weighted majority label of
  * its `k` nearest LABELED corpus vectors among its `nProbe` probed
  * IVF cells, ties to the smallest label — Zhu & Ghahramani's vote
  * applied at serving time.
  *
  * One kernel with the batch family: candidate retrieval is
  * [[Similarity.knnJoinAssigned]] (the `similarity_knn_join` key and
  * [[StreamSimilarity.topKBatch]]'s kernel), and the winner is
  * [[Similarity.voteWinner]]'s single map-side-combinable aggregate
  * (the `label_propagation` argmax) over DECIMAL(16,6)-exact vote
  * sums — so the streamed pseudo-label can never drift from the
  * declared offline semantics.
  *
  * Scale: per micro-batch, the probed cell ids collect (bounded by
  * batch × nProbe), the candidate join is partition-pruned to the
  * probed cells, and both aggregates are keyed by probe — the same
  * micro-batch cost envelope as the retrieval face, plus one
  * vote aggregate.
  */
object StreamPseudoLabel {

  /** Pseudo-label one (micro-)batch of probes (`probe_id`,
    * `embedding`) against a frozen assigned corpus + centroid set:
    * one row per probe — `probe_id, pred_label, vote_w, n_votes`. A
    * probe whose `nProbe` probed cells hold NO labeled candidates
    * (possible with trained Lloyd centroids leaving empty cells) still
    * gets its row — `pred_label`/`vote_w` null, `n_votes` 0 — so a
    * serving pipeline sees the abstention instead of silently losing
    * the vector (r14 advice). Stateless per batch (the index and
    * corpus are the state), so replays and restarts are trivially
    * exact.
    */
  def labelBatch(
      probes: DataFrame,
      assigned: DataFrame,
      centroids: Seq[(Long, Seq[Float])],
      k: Int = 4,
      nProbe: Int = 4): DataFrame = {
    val knn = Similarity.knnJoinAssigned(probes, assigned, centroids, k, nProbe)
    val votes = knn
      .groupBy(col("probe_id").as("vec_id"), col("label").as("pred_label"))
      .agg(sum(col("cosine").cast("decimal(16,6)")).as("vote_w"),
        count(lit(1)).as("n_votes"))
    val winners = Similarity.voteWinner(votes)
      .select(col("vec_id").as("probe_id"), col("pred_label"),
        col("vote_w").cast("double").as("vote_w"), col("n_votes"))
    probes.select(col("probe_id"))
      .join(winners, Seq("probe_id"), "left")
      .select(col("probe_id"), col("pred_label"), col("vote_w"),
        coalesce(col("n_votes"), lit(0L)).as("n_votes"))
      .orderBy("probe_id")
  }

  /** Writer: every micro-batch of `probeStream` is pseudo-labeled with
    * [[labelBatch]] and handed to `sink`. Caller starts it (typically
    * with a checkpointLocation) and owns the query lifecycle.
    */
  def labelSink(
      probeStream: DataFrame,
      assigned: DataFrame,
      centroids: Seq[(Long, Seq[Float])],
      k: Int = 4,
      nProbe: Int = 4)(sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    probeStream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty) sink(labelBatch(batch, assigned, centroids, k, nProbe), id)
      ()
    }
}
