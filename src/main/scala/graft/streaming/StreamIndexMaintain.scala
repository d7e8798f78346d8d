package graft.streaming

import graft.ext.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Streaming face 13 — continuous IVF index maintenance: an arriving
  * vector stream folds into a [[Similarity.writeClustered]] layout via
  * [[Similarity.appendToClustered]], one micro-batch at a time, against
  * a FROZEN loaded index ([[Similarity.loadIndex]]) — the streaming
  * analogue of the incremental batch path, completing the index story:
  * build offline ([[Similarity.buildIvfIndex]] + writeClustered),
  * persist ([[Similarity.saveIndex]]), serve
  * ([[Similarity.ivfTopKClustered]], [[StreamSimilarity]]), monitor
  * ([[StreamDriftMonitor]] says when to retrain), and now MAINTAIN.
  *
  * Exactly-once effect from an at-least-once sink: `foreachBatch` can
  * re-deliver a micro-batch after a crash-restart, and
  * appendToClustered's touched-partition anti-join makes a re-delivered
  * batch a NO-OP — the sink needs no transaction log to avoid
  * duplicating the index (spec-pinned: a double-delivered batch leaves
  * the layout file-identical). Per-batch cost is bounded by the batch:
  * assignment is a narrow argmin over the batch, the anti-join scans
  * only touched partitions (partition-pruned), the append writes only
  * batch rows, and compaction rewrites only touched partitions past the
  * file threshold.
  *
  * The index stays FROZEN across batches by design: folding vectors
  * into cells of a fixed quantizer is exactly what serving expects
  * (probes rank the same centroids), and [[graft.ext.Similarity.ivfDrift]]
  * / [[StreamDriftMonitor]] decide when assignment quality has decayed
  * enough that a full offline retrain+rewrite is due instead.
  */
object StreamIndexMaintain {

  /** Writer that appends each micro-batch of `vectors` (`vec_id`,
    * `embedding`, `label`) into the clustered layout at `layoutPath`.
    * Caller starts it (typically with a checkpointLocation) and owns
    * the query lifecycle.
    */
  def maintain(
      vectors: DataFrame,
      index: Similarity.IvfIndex,
      layoutPath: String,
      maxFilesPerPartition: Int = 8,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[org.apache.spark.sql.Row] =
    vectors.writeStream
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          Similarity.appendToClustered(
            batch.sparkSession, layoutPath, batch, index, maxFilesPerPartition)
          ()
        }
      }

  /** Convenience: run one AvailableNow maintenance pass to completion. */
  def maintainOnce(
      spark: SparkSession,
      vectors: DataFrame,
      index: Similarity.IvfIndex,
      layoutPath: String,
      checkpointDir: String,
      maxFilesPerPartition: Int = 8): StreamingQuery = {
    val q = maintain(vectors, index, layoutPath, maxFilesPerPartition)
      .option("checkpointLocation", checkpointDir)
      .start()
    q.awaitTermination()
    q
  }
}
