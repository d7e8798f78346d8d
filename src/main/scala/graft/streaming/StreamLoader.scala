package graft.streaming

import graft.ops.Loader
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Streaming MERGE sink: continuous upsert of a changelog stream into a
  * catalog table — the streaming face of [[graft.ops.Loader.upsert]]
  * (the reference's MERGE semantics, gcp_function.py:67-113, driven by
  * micro-batches instead of batch jobs; the standard CDC-ingest shape).
  *
  * Spark's stateless sinks can't express MERGE, so the canonical form
  * is `foreachBatch`: each micro-batch is a staging frame, upserted with
  * the same plan as the batch loader (anti-join + union, staging
  * broadcast when small — which a micro-batch always is). Within a
  * micro-batch, duplicate keys keep the LAST row by `seqCol` (changelog
  * order), mirroring how a CDC consumer compacts before merging; the
  * batch uniqueness guard then rides the merge job as usual.
  *
  * At 100 TB the target would be a bucketed table ([[Loader
  * .writeTableBucketed]]) so each micro-batch merge shuffles only the
  * batch itself; the swap-rename here mirrors the batch loader's
  * distributed materialization (no Delta dependency).
  */
object StreamLoader {

  /** Compact a changelog frame: one row per key set, the row with the
    * greatest (`seqCol`, then arbitrary-but-deterministic payload) wins.
    */
  def compactLatest(batch: DataFrame, keys: Seq[String], seqCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).desc,
        struct(batch.columns.filterNot(keys.contains).map(col).toIndexedSeq: _*).desc)
    batch.withColumn("_sl_rn", row_number().over(w))
      .filter(col("_sl_rn") === 1).drop("_sl_rn")
  }

  /** Attach the merge sink to a streaming DataFrame: every micro-batch
    * is compacted by `seqCol` then MERGEd into `table` on `keys`.
    * The target must exist (create it with the first full load).
    */
  def mergeSink(
      stream: DataFrame,
      table: String,
      keys: Seq[String],
      seqCol: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime(0)): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val target = spark.table(table)
          val staging = compactLatest(batch, keys, seqCol)
            .select(target.columns.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
          val merged = Loader.upsert(target, staging, keys,
            broadcastStaging = Some(true)) // a micro-batch is always small
          // spill the merge to a checkpoint-scoped parquet dir, then
          // overwrite the target from it: the overwrite never reads the
          // table it writes, and (unlike a drop+rename dance) leaves no
          // stale file-index entries in the streaming clone session.
          // A transactional table format would replace this two-step at
          // production scale; the MERGE plan itself is format-agnostic.
          val tmp = s"$checkpointDir/merge-tmp"
          merged.write.mode("overwrite").parquet(tmp)
          spark.read.parquet(tmp).write.mode("overwrite").saveAsTable(table)
        }
        () // foreachBatch requires a Unit-typed closure
      }

  /** Convenience: start the merge sink. */
  def startMerge(
      stream: DataFrame,
      table: String,
      keys: Seq[String],
      seqCol: String,
      checkpointDir: String): StreamingQuery =
    mergeSink(stream, table, keys, seqCol, checkpointDir).start()
}
