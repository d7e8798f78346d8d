package graft.streaming

import graft.functions.Hashing
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection — the streaming face of
  * `Dedup.minHashPairs`/`minHashDedup` (batch LSH), with the SAME
  * banding (identical `Hashing.bandKey`), signature, and estimate.
  * A replayed table gives the same drop set as the batch operator
  * PROVIDED (a) docs arrive in doc_id order across micro-batches (the
  * replay setting; see [[StreamNearDup.survivors]]) and (b) no bucket
  * overflows `maxBucket` — batch excludes an oversized bucket entirely,
  * while an append-mode stream cannot retract tags it emitted before
  * the overflow was observable; on overflow this operator stops tagging
  * that bucket (a prefix of what batch would have excluded).
  *
  * Shape: per-doc MinHash signature (narrow map) → explode to one row
  * per LSH band → `flatMapGroupsWithState` keyed by (band, bucket): the
  * state is the bucket's seen docs (id + full signature, capped at
  * `maxBucket` like the batch skew guard). A new doc is tagged a
  * near-dup when any stored signature agrees on ≥ `threshold` of the K
  * minima. Docs inside a micro-batch are processed in doc_id order, so
  * replay order never changes who is "earlier".
  *
  * The tag stream is the operator output (append-mode, one row per
  * detecting band): survivors = input ∖ tagged doc_ids, a batch-side
  * anti-join (`survivors`) in the foreachBatch sink — Spark does not
  * allow a second stateful operator downstream of
  * flatMapGroupsWithState, and the final sink write is a foreachBatch
  * at scale anyway.
  *
  * State bound: per-bucket cap (`maxBucket`) plus an optional
  * processing-time idle timeout (the watermark analogue used by
  * [[StreamSessionize.sessionize]]): buckets idle longer than
  * `idleTimeout` are evicted, so a near-dup arriving within the horizon
  * is dropped and the store never grows beyond the live horizon.
  *
  * Overflow silence and RE-ARMING: an overflowed bucket admits
  * everything without tagging. With NO timeout configured that silence
  * is UNBOUNDED — the bucket never dedups again for the query's
  * lifetime (configure eviction in production). With idle/event-time
  * eviction, the overflowed state is REMOVED at timeout and the next
  * arrival starts a fresh, armed bucket — dedup re-arms after a quiet
  * period (spec-asserted in StreamNearDupSpec).
  */
case class StreamDoc(doc_id: Long, ts: Long, text: String)

case class NearDupTag(doc_id: Long, dup_of: Long, band: Int, est_jaccard: Double)

private[streaming] case class BandedDoc(
    band: Int, bkey: Long, doc_id: Long, ts: Long, sig: Seq[Long],
    event_time: java.sql.Timestamp)

private[streaming] case class BucketState(
    docIds: Seq[Long], sigs: Seq[Seq[Long]], maxTsMicros: Long,
    overflowed: Boolean)

object StreamNearDup {

  /** Near-dup detections (append stream): one tag per (doc, band) whose
    * bucket holds an earlier doc with signature agreement ≥ threshold.
    * `dup_of` is the smallest matching earlier doc_id in that bucket.
    */
  /** @param idleTimeout processing-time bucket eviction (simple horizon)
    * @param eventTimeHorizon event-time eviction: buckets whose newest
    *   doc is older than the watermark minus this horizon are removed —
    *   the streaming-dedup watermark semantics (`dedupStream` analogue):
    *   a near-dup arriving within the horizon is tagged; one arriving
    *   after eviction is admitted (the state-size/correctness trade).
    *   Requires `docs.ts` to be event time in µs. Mutually exclusive
    *   with `idleTimeout`.
    */
  def nearDupTags(
      docs: Dataset[StreamDoc],
      threshold: Double = 0.8,
      k: Int = Hashing.MinHashK,
      bands: Int = graft.ext.Dedup.Bands,
      maxBucket: Int = graft.ext.Dedup.MaxBucket,
      idleTimeout: Option[String] = None,
      eventTimeHorizon: Option[String] = None): Dataset[NearDupTag] = {
    import docs.sparkSession.implicits._
    require(bands >= 1 && k % bands == 0, s"bands ($bands) must divide K ($k)")
    require(idleTimeout.isEmpty || eventTimeHorizon.isEmpty,
      "choose one of idleTimeout (processing time) / eventTimeHorizon (event time)")
    val r = k / bands
    val horizonMs: Long = eventTimeHorizon
      .map(h => scala.concurrent.duration.Duration(h).toMillis).getOrElse(0L)
    val banded0 = docs.flatMap { d =>
      val sig = Hashing.minhashSig(d.text, k)
      (0 until bands).map(b =>
        BandedDoc(b, Hashing.bandKey(sig, b, r), d.doc_id, d.ts, sig.toSeq,
          new java.sql.Timestamp(d.ts / 1000)))
    }
    // in event-time mode the watermarked time column must survive into
    // the stateful operator — rebuild it at µs precision and watermark
    val banded = eventTimeHorizon match {
      case Some(horizon) => banded0
        .withColumn("event_time", timestamp_micros(col("ts")))
        .withWatermark("event_time", horizon)
        .as[BandedDoc]
      case None => banded0
    }
    val timeoutConf =
      if (eventTimeHorizon.isDefined) GroupStateTimeout.EventTimeTimeout()
      else idleTimeout
        .map(_ => GroupStateTimeout.ProcessingTimeTimeout())
        .getOrElse(GroupStateTimeout.NoTimeout())
    banded
      .groupByKey(bd => (bd.band, bd.bkey))
      .flatMapGroupsWithState[BucketState, NearDupTag](
        OutputMode.Append(), timeoutConf) {
        case (_, it, state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var s = state.getOption.getOrElse(
              BucketState(Nil, Nil, Long.MinValue, overflowed = false))
            var ids = s.docIds.toVector
            var sigs = s.sigs.toVector.map(_.toArray)
            var maxTs = s.maxTsMicros
            var over = s.overflowed
            val out = Vector.newBuilder[NearDupTag]
            // doc_id order inside the batch = replay-stable "earlier"
            it.toSeq.sortBy(_.doc_id).foreach { bd =>
              if (bd.ts > maxTs) maxTs = bd.ts
              if (over || ids.length >= maxBucket) {
                // batch parity: an oversized bucket emits NO pairs (the
                // batch guard excludes it entirely). Append mode cannot
                // retract tags already emitted, so from the overflow
                // point on the bucket goes silent and its state stops
                // growing — never tag against a truncated bucket.
                over = true
              } else {
                val sig = bd.sig.toArray
                var best = -1L
                var bestEst = 0.0
                var i = 0
                while (i < sigs.length) {
                  var agree = 0
                  var j = 0
                  while (j < k) { if (sigs(i)(j) == sig(j)) agree += 1; j += 1 }
                  val est = agree.toDouble / k
                  if (est >= threshold && (best == -1L || ids(i) < best)) {
                    best = ids(i); bestEst = est
                  }
                  i += 1
                }
                if (best != -1L)
                  out += NearDupTag(bd.doc_id, best, bd.band, bestEst)
                // store tagged docs too: batch pair-drop compares every
                // doc against ALL lower ids, losers included
                ids :+= bd.doc_id; sigs :+= sig
              }
            }
            s = BucketState(ids, sigs.map(_.toSeq), maxTs, over)
            state.update(s)
            idleTimeout.foreach(state.setTimeoutDuration)
            if (eventTimeHorizon.isDefined && maxTs != Long.MinValue)
              state.setTimeoutTimestamp(maxTs / 1000 + horizonMs)
            out.result().iterator
          }
      }
  }

  /** Batch-side combine for the foreachBatch sink: docs of this batch
    * minus every doc any band tagged. With arrival in doc_id order this
    * equals `Dedup.minHashDedup` on the replayed table.
    */
  def survivors(docs: DataFrame, tags: DataFrame): DataFrame =
    docs.join(tags.select(col("doc_id")).distinct(), Seq("doc_id"), "left_anti")
}
