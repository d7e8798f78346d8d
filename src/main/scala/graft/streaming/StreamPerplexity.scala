package graft.streaming

import graft.ext.Relevance
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming face of the CCNet pipeline's ONLINE half
  * ([[Relevance.perplexityBuckets]]'s serving shape): score each
  * arriving document under a FROZEN bigram model and classify it
  * against fixed per-language cutoffs exported from a batch bucketing
  * run. This is how CCNet actually deploys (Wenzek et al. 2019): the
  * LM and the tercile cuts are trained OFFLINE on a reference crawl;
  * each new page is scored and binned online, one row at a time.
  *
  * Contract vs the batch operator, stated precisely: the batch key
  * assigns buckets by PER-CORPUS RANK (tercile counts exact, ties
  * split by doc_id); a stream cannot rank against docs it has not
  * seen, so the face classifies by SCORE THRESHOLDS — head iff
  * logprob > headCut(lang), tail iff logprob < tailCut(lang), else
  * middle, with (headCut, tailCut) = (max, min) middle-bucket logprob
  * of the reference run ([[Relevance.perplexityCutoffs]]). On the
  * reference corpus itself this agrees with the batch assignment for
  * every document whose 4-dp score does not TIE a cutoff value
  * (boundary ties are rank-split in batch, threshold-binned here —
  * spec-pinned both ways); languages absent from the reference fall
  * back to `defaultCutoffs`. A NULL `lang` coalesces to the sentinel
  * language "" on BOTH sides — the batch operator ranks unlabeled
  * docs among themselves under that key, so a reference run that had
  * unlabeled docs exports "" cutoffs and the stream looks them up;
  * with no such reference entry, unlabeled docs bin by the defaults.
  *
  * Shape: completely STATELESS — the model rides into generated code
  * as reference objects (`functions.BigramScoreExpr`, the
  * [[Relevance.bigramApply]] expression) and the cutoff table is a
  * broadcast literal map, so the face is ONE narrow codegen'd
  * projection per row: no shuffle, no state store, unbounded
  * throughput scaling by partition count. The only driver-side data
  * is the model artifact and one (headCut, tailCut) pair per
  * reference language — both bounded by configuration, not corpus.
  */
object StreamPerplexity {

  /** Tagged stream: `(doc_id, lang, logprob, bucket)` per input doc —
    * append-mode-safe (stateless projection).
    */
  def classifyStream(
      stream: DataFrame,
      model: Relevance.BigramModelLocal,
      cutoffs: Map[String, (Double, Double)],
      defaultCutoffs: (Double, Double)): DataFrame = {
    require(cutoffs.forall { case (_, (h, t)) => h >= t },
      "each language's head cutoff must be >= its tail cutoff")
    require(defaultCutoffs._1 >= defaultCutoffs._2,
      "default head cutoff must be >= tail cutoff")
    val scored = graft.functions.GraftFunctions.bigramScore(
      col("text"), model.bigramLp, model.vocabCnt, model.alpha, model.total)
    val cutMap: Column =
      if (cutoffs.isEmpty) lit(null).cast("map<string,array<double>>")
      else typedLit(cutoffs.map { case (l, (h, t)) => l -> Seq(h, t) })
    val lp = coalesce(element_at(col("_s"), 4), lit(0.0))
    val headCut = coalesce(element_at(col("_c"), 1), lit(defaultCutoffs._1))
    val tailCut = coalesce(element_at(col("_c"), 2), lit(defaultCutoffs._2))
    stream
      .select(col("doc_id"),
        coalesce(col("lang"), lit("")).as("lang"), scored.as("_s"))
      .select(col("doc_id"), col("lang"), lp.as("logprob"),
        element_at(cutMap, col("lang")).as("_c"))
      .select(col("doc_id"), col("lang"), col("logprob"),
        when(col("logprob") > headCut, lit("head"))
          .when(col("logprob") < tailCut, lit("tail"))
          .otherwise(lit("middle")).as("bucket"))
  }
}
