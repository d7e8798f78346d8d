package graft.streaming

import graft.ext.{Corpus, TextStats}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming face of the corpus-curation pipeline: the STATELESS stages
  * — PII redaction, quality scoring + threshold, benchmark
  * decontamination — applied per micro-batch to a document stream.
  * Every transform is a narrow projection/filter, so the stream needs
  * no state store, no watermark, and works in append mode with any
  * sink; throughput is scan-bound exactly like the batch operators.
  *
  * Cross-row stages keep their dedicated faces: exact/near dedup is
  * [[StreamNearDup]] (stateful bucket store), content sampling and
  * per-source quotas are batch post-passes (they need corpus-global
  * ordering the streaming model deliberately doesn't provide).
  *
  * Decontamination contract matches batch [[Corpus.decontaminate]]: the
  * benchmark is broadcast-sized (an eval set, not a second corpus). Its
  * distinct word-n-gram hashes are resolved ONCE at stream setup and
  * shipped as a literal array — a per-row `arrays_overlap` against a
  * constant, rather than a join, because deriving per-doc gram hits
  * from the stream side would need a stateful self-aggregation.
  */
object StreamCurate {

  /** Curate a (streaming or batch) documents frame: emit
    * `doc_id, lang, clean_text, quality_score` for docs at or above
    * `minQuality` that share no word-`n`-gram with `benchmark`.
    * `benchmark` must be a batch frame (resolved at setup time).
    */
  def curateStream(
      stream: DataFrame,
      benchmark: DataFrame,
      minQuality: Double = 0.5,
      n: Int = 8): DataFrame = {
    // explicit contract instead of a silent plan-size cliff: the gram
    // set rides every micro-batch's plan as a literal. 2^20 longs = 8 MB
    // — ample for eval benchmarks; a corpus-sized "benchmark" belongs in
    // batch Corpus.decontaminate (semi-join), not a stream constant.
    // The guard itself must be cheap: LIMIT the collect to one past the
    // bound so an accidentally corpus-sized "benchmark" costs ~8 MB of
    // driver memory to reject, instead of OOMing the driver before the
    // size check can fire.
    val benchGrams: Array[Long] = benchmark
      .select(explode(
        graft.functions.GraftFunctions.ngramHashes(col("text"), n)).as("gram"))
      .distinct()
      .limit((1 << 20) + 1)
      .collect().map(_.getLong(0))
    require(benchGrams.length <= (1 << 20),
      s"benchmark has over ${1 << 20} distinct $n-grams — too large for " +
        "a streaming constant; decontaminate corpus-sized sets in batch " +
        "(Corpus.decontaminate) instead")
    val contaminated = arrays_overlap(
      graft.functions.GraftFunctions.ngramHashes(col("text"), n),
      typedLit(benchGrams.toSeq))
    // the SHARED redaction/quality Column expressions (no copies to
    // drift; the spec additionally asserts row-for-row batch agreement)
    val redacted = Corpus.redactPiiColumn(col("text"))
    stream
      .filter(!contaminated)
      .select(col("doc_id"), col("lang"), redacted.as("clean_text"),
        TextStats.qualityScoreColumn(col("text")).as("quality_score"))
      .filter(col("quality_score") >= minQuality)
  }
}
