package graft.streaming

import graft.ext.{Corpus, TextStats}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of [[Corpus.selectBudget]]: budget-tracked admission —
  * a document stream is admitted greedily (quality desc, doc_id asc,
  * the batch operator's exact order) until a GLOBAL token budget is
  * spent, with the spent counter persisted across micro-batches in a
  * one-row state store.
  *
  * Batch-equivalence contract, stated precisely: batch `selectBudget`
  * ranks the WHOLE corpus by quality before spending the budget; a
  * stream cannot see the future, so the face applies the same per-row
  * greedy rule ("admit iff tokens spent so far < budget") in the batch
  * order WITHIN each micro-batch, and carries `spent` forward. Hence
  * (a) one micro-batch containing the whole corpus reproduces the batch
  * output exactly (spec-pinned, set-equal including the boundary
  * stratum's partial take), and (b) a replay that arrives in global
  * (quality desc, doc_id asc) order across any micro-batch split also
  * reproduces it; an adversarial arrival order admits earlier-arriving
  * lower-quality docs — the inherent streaming trade, identical in kind
  * to [[StreamNearDup]]'s arrival-order keeper rule.
  *
  * Shape: scoring + token counting are the SHARED codegen'd column
  * expressions ([[TextStats.qualityScoreColumn]] /
  * [[TextStats.wsTokenCount]]), computed BEFORE the shuffle as narrow
  * per-row projections — the text never reaches the state store. The
  * admission fold is keyed by a single constant (one shared budget =
  * one sequential decision), so the stateful stage handles only one
  * micro-batch's (id, lang, source, score, tokens) tuples; state is a
  * single running long, never evicted (the budget's lifetime IS the
  * query's — restart with a fresh checkpoint to re-arm it). The
  * admission decision itself is inherently serial; the production
  * path at stream scale is [[StreamSelectBudget.selectStreamSharded]],
  * which splits the budget across hash strata and runs one sequential
  * fold per stratum in parallel.
  */
case class BudgetDoc(
    doc_id: Long, lang: String, source: String, text: String)

case class SelectedDoc(
    doc_id: Long, lang: String, source: String,
    quality_score: Double, n_tokens: Long)

case class SelectedShardDoc(
    doc_id: Long, lang: String, source: String,
    quality_score: Double, n_tokens: Long, shard: Int)

private[streaming] case class BudgetState(spent: Long)

object StreamSelectBudget {

  /** Admitted documents (append stream): each incoming doc is scored
    * and admitted iff the tokens spent before it are still strictly
    * under `budgetTokens` — the batch greedy-prefix rule — processing
    * each micro-batch in (quality desc, doc_id asc) order and carrying
    * the spent count across batches.
    */
  def selectStream(
      stream: DataFrame,
      budgetTokens: Long = Corpus.SelectBudgetTokens): Dataset[SelectedDoc] = {
    import stream.sparkSession.implicits._
    require(budgetTokens >= 0, s"budget must be >= 0: $budgetTokens")
    val scored = stream.select(
      col("doc_id"), col("lang"), col("source"),
      TextStats.qualityScoreColumn(col("text")).as("quality_score"),
      TextStats.wsTokenCount(col("text")).cast("bigint").as("n_tokens"))
      .as[SelectedDoc]
    scored
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[BudgetState, SelectedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, it, state: GroupState[BudgetState]) =>
          var spent = state.getOption.map(_.spent).getOrElse(0L)
          val out = Vector.newBuilder[SelectedDoc]
          // the batch operator's spend order: best score first, doc_id
          // breaking ties — identical to its boundary-stratum window
          it.toVector
            .sortBy(d => (-d.quality_score, d.doc_id))
            .foreach { d =>
              if (spent < budgetTokens) { out += d; spent += d.n_tokens }
            }
          state.update(BudgetState(spent))
          out.result().iterator
      }
  }

  /** The PRODUCTION budget face: [[selectStream]]'s one-key funnel
    * split across `shards` hash strata, each running the SAME
    * sequential admission fold against its own sub-budget under its
    * own state-store key — N parallel folds instead of one global
    * funnel, the remedy [[selectStream]]'s scaladoc documents, made
    * real. Stratum = `hash64(doc_id) mod shards`: content-addressed
    * (a replay lands every doc in the same stratum regardless of
    * arrival order), and an unbiased corpus sample per shard, so each
    * shard's quality profile converges to the global one as the
    * stream grows. Budget split: `budget/shards` each, the remainder
    * spread one token over the first `budget % shards` shards — the
    * sub-budgets sum EXACTLY to the global budget.
    *
    * Trade, stated precisely: with `shards = 1` this IS
    * [[selectStream]] (spec-pinned row-for-row); with N shards the
    * greedy order holds only WITHIN each stratum, so a quality-skewed
    * shard can admit a doc the global fold would reject (and vice
    * versa) — the standard budget-sharding trade. Per-shard overshoot
    * is bounded by one document (the admit-iff-under rule), identical
    * to the global face. State: `shards` rows, one running long each;
    * the stateful shuffle fans out to `shards` keys instead of 1.
    */
  def selectStreamSharded(
      stream: DataFrame,
      budgetTokens: Long = Corpus.SelectBudgetTokens,
      shards: Int = 8): Dataset[SelectedShardDoc] = {
    import stream.sparkSession.implicits._
    require(budgetTokens >= 0, s"budget must be >= 0: $budgetTokens")
    require(shards >= 1, s"need at least one shard: $shards")
    val base = budgetTokens / shards
    val rem = (budgetTokens % shards).toInt
    val scored = stream.select(
      col("doc_id"), col("lang"), col("source"),
      TextStats.qualityScoreColumn(col("text")).as("quality_score"),
      TextStats.wsTokenCount(col("text")).cast("bigint").as("n_tokens"),
      pmod(graft.functions.GraftFunctions.hash64(col("doc_id").cast("string")),
        lit(shards.toLong)).cast("int").as("shard"))
      .as[SelectedShardDoc]
    scored
      .groupByKey(_.shard)
      .flatMapGroupsWithState[BudgetState, SelectedShardDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (shard, it, state: GroupState[BudgetState]) =>
          val myBudget = base + (if (shard < rem) 1L else 0L)
          var spent = state.getOption.map(_.spent).getOrElse(0L)
          val out = Vector.newBuilder[SelectedShardDoc]
          it.toVector
            .sortBy(d => (-d.quality_score, d.doc_id))
            .foreach { d =>
              if (spent < myBudget) { out += d; spent += d.n_tokens }
            }
          state.update(BudgetState(spent))
          out.result().iterator
      }
  }
}
