package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge-table training AND application (Sennrich
  * et al. 2016, arXiv:1508.07909) — the tokenizer artifact a
  * training-data pipeline actually produces, one step past the seed
  * statistics the surface already carries (`token_freq` unigrams,
  * `bigram_freq` = the first merge's candidates), plus the encode pass
  * that makes every downstream token budget tokenizer-TRUE.
  *
  * Shape: ONE corpus pass (the lowercase letter-run tokenizer shared
  * with [[Relevance]]) aggregates to word-type counts — vocabulary-
  * bounded, Zipf-small relative to the corpus — truncated by a
  * DISTRIBUTED top-`maxWordTypes` (count desc, word asc — the
  * `unigramLogProb` top-V recipe) BEFORE the driver collect, so the
  * driver working set is constant-bounded by configuration, never by
  * corpus content (typo/concatenation long-tail types are exactly the
  * low-count rows the truncation sheds, and production BPE trainers
  * prune the same way). The m-round merge loop then runs DRIVER-SIDE
  * over ≤ `maxWordTypes` types only, exactly how production BPE
  * trainers work (the corpus is never re-scanned per merge; each round
  * is O(|types| · avg word length)).
  *
  * Determinism contract (mirrored exactly by the DuckDB oracle's
  * unrolled per-stage CTEs): pair counts include every adjacent
  * occurrence (overlapping — `zip(s, s.tail)`, the reference
  * algorithm's get_stats); the winning pair maximizes (count, then
  * lexicographically smallest left, then right — ASCII order, which
  * Java String and DuckDB's binary collation share); merges apply
  * greedily left-to-right, non-overlapping (a symbol formed this round
  * never immediately re-merges: `l + r == l` would need an empty `r`).
  * The type truncation shares the same total order (count desc, word
  * asc), so a binding bound is deterministic on both sides too.
  */
object Bpe {

  val DefaultMerges = 8
  val EndOfWord = "</w>"

  /** Driver-collect bound on the word-TYPE table (top-V by count desc,
    * word asc). 2²⁰ types × ~16 B ≈ tens of MB of driver heap at worst
    * — constant in corpus size. Deliberately far above the synthetic
    * fixtures' 31 types, so the declared keys are bit-stable whether or
    * not a deployment tightens it.
    */
  val DefaultMaxWordTypes = 1 << 20

  /** (word, count) per letter-run word type — the one corpus pass both
    * training entry points share.
    */
  private def wordTypeCounts(documents: DataFrame): DataFrame =
    documents
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Distributed top-V truncation + bounded collect of the type table.
    * The ONLY `.collect()` in the family; its size is `maxWordTypes`
    * by construction.
    */
  private def collectTypes(
      typeCounts: DataFrame, maxWordTypes: Int): Array[(String, Long)] =
    typeCounts
      .orderBy(col("cnt").desc, col("w"))
      .limit(maxWordTypes)
      .collect().map(r => (r.getString(0), r.getLong(1)))

  /** One learned merge: rank (1-based), pair, fused symbol, pair count
    * at selection time.
    */
  final case class Merge(rank: Int, l: String, r: String, merged: String, cnt: Long)

  /** The reference merge loop over a collected type table — pure
    * driver-side function of its input, shared by [[bpeVocab]] and
    * [[bpeEncode]]. Returns ≤ `merges` rounds (fewer iff the
    * vocabulary exhausts its pairs first).
    */
  private[ext] def mergeLoop(
      wordCounts: Array[(String, Long)], merges: Int): Seq[Merge] = {
    var vocab: Array[(Array[String], Long)] = wordCounts.map { case (w, c) =>
      (w.map(_.toString).toArray :+ EndOfWord, c)
    }
    val out = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= merges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- vocab; i <- 0 until syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val ((l, r), c) = pairCounts.minBy { case ((pl, pr), pc) => (-pc, pl, pr) }
        val merged = l + r
        out += Merge(rank, l, r, merged, c)
        vocab = vocab.map { case (syms, cnt) =>
          val b = Array.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              b += merged; i += 2
            } else { b += syms(i); i += 1 }
          }
          (b.result(), cnt)
        }
        rank += 1
      }
    }
    out.result()
  }

  /** Train and return the merge list (driver-side values) — the
    * artifact [[bpeEncode]] broadcasts into its plan and
    * [[saveMerges]] persists.
    */
  def trainMerges(
      documents: DataFrame,
      merges: Int = DefaultMerges,
      maxWordTypes: Int = DefaultMaxWordTypes): Seq[Merge] = {
    require(merges >= 1, s"need at least one merge: $merges")
    require(maxWordTypes >= 1, s"need a positive type bound: $maxWordTypes")
    mergeLoop(collectTypes(wordTypeCounts(documents), maxWordTypes), merges)
  }

  /** The learned merge table: `merge_rank, left, right, merged,
    * pair_count` for the first `merges` BPE merges over the corpus
    * (fewer rows iff the vocabulary exhausts its pairs first).
    */
  def bpeVocab(
      documents: DataFrame,
      merges: Int = DefaultMerges,
      maxWordTypes: Int = DefaultMaxWordTypes): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    trainMerges(documents, merges, maxWordTypes)
      .map(m => (m.rank.toLong, m.l, m.r, m.merged, m.cnt))
      .toDF("merge_rank", "left", "right", "merged", "pair_count")
      .orderBy("merge_rank")
  }

  /** Per-word-type BPE symbol count under a trained merge list — the
    * codegen'd [[graft.functions.BpeCountExpr]] (one JVM greedy loop
    * per word; a nested higher-order fold would re-reference its input
    * 3-4× per round and grow a ~4^m-node expression tree — the
    * codegen-cliff failure mode, paid at analysis time even on a tiny
    * type frame). The JVM loop is the same greedy left-to-right
    * non-overlapping apply as [[mergeLoop]]'s vocab update and the
    * oracle's chr(31) `list_reduce` fold, pinned by the hand-computed
    * encode specs and the oracle hash gate.
    */
  private def bpeCountCol(word: Column, ms: Seq[Merge]): Column =
    graft.functions.GraftFunctions.bpeCount(word, EndOfWord,
      ms.map(_.l).toArray, ms.map(_.r).toArray)

  /** Tokenizer-TRUE per-document token counts: train the merge table
    * ([[trainMerges]] — bounded collect), then encode every document
    * with it. Output: `doc_id, n_words, bpe_tokens` (letter-run word
    * count and total BPE symbol count including the per-word
    * [[EndOfWord]]); docs with no letter-run words count 0/0.
    *
    * Scale shape: ONE corpus explode aggregated to per-(doc, word)
    * counts (map-side combine collapses within-doc repeats before the
    * wire); the greedy merge apply runs once per word TYPE (a
    * vocabulary-bounded frame, not the corpus — the codegen'd
    * [[bpeCountCol]] kernel touches ≤ |types| rows), and the per-type
    * token width joins back to the per-doc counts by word. The corpus text
    * itself is never re-scanned per merge and never shuffled at char
    * width; at 100 TB the join's build side is the type table, which
    * AQE sizes (broadcast when the vocabulary allows, shuffle join
    * past it — correctness identical).
    */
  /** The exported TOKEN STREAM — what a trainer actually consumes: for
    * every document, the ordered BPE symbol sequence under the trained
    * merge table, one row per token: `doc_id, pos, token` (pos =
    * 0-based global token index within the doc). [[bpeEncode]] prices
    * documents in tokens; this materializes the tokens themselves —
    * the pipeline step between `pack_greedy`'s budgets and a real
    * training run's input files. Docs with no letter-run words emit no
    * rows.
    *
    * Scale shape: the greedy apply still runs once per word TYPE (the
    * codegen'd sequence kernel shares ONE `BpeApply.encode` body with
    * the count kernel — stream and counts can never disagree,
    * spec-pinned); per-OCCURRENCE rows carry only (doc_id, word-index)
    * until the type join, and the global position is a per-doc
    * row_number over (word index, symbol index) — doc-bounded
    * partitions, never corpus-bounded. The corpus text is read once.
    */
  def bpeTokens(
      documents: DataFrame,
      merges: Int = DefaultMerges,
      maxWordTypes: Int = DefaultMaxWordTypes): DataFrame = {
    // the trainMerges guards — the two faces must fail identically on
    // invalid input, not diverge (one throwing, one silently untrained)
    require(merges >= 1, s"need at least one merge: $merges")
    require(maxWordTypes >= 1, s"need a positive type bound: $maxWordTypes")
    // pinned: occurrences feed type counting (training), the distinct
    // type frame (encoding), and the order-preserving join back
    val occ = graft.core.CacheScope.persist(
      documents
        .select(col("doc_id"),
          posexplode(split(lower(col("text")), "[^a-z]+")).as(Seq("widx", "w")))
        .filter(length(col("w")) > 0))
    val ms = mergeLoop(
      collectTypes(occ.groupBy("w").agg(count(lit(1)).as("cnt")), maxWordTypes),
      merges)
    val typeSyms = occ.select("w").distinct()
      .withColumn("syms", graft.functions.GraftFunctions.bpeSyms(
        col("w"), EndOfWord, ms.map(_.l).toArray, ms.map(_.r).toArray))
    val wp = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      .orderBy("widx", "sidx")
    occ.join(typeSyms, Seq("w"))
      .select(col("doc_id"), col("widx"),
        posexplode(col("syms")).as(Seq("sidx", "token")))
      .withColumn("pos", row_number().over(wp).cast("bigint") - 1)
      .select("doc_id", "pos", "token")
      .orderBy("doc_id", "pos")
  }

  def bpeEncode(
      documents: DataFrame,
      merges: Int = DefaultMerges,
      maxWordTypes: Int = DefaultMaxWordTypes): DataFrame = {
    // pinned: the exploded per-(doc, word) counts feed type counting
    // (training), the type frame (encoding), AND the final join
    val pairs = pinnedDocWordCounts(documents)
    val ms = mergeLoop(
      collectTypes(pairs.groupBy("w").agg(sum("cnt").as("cnt")), maxWordTypes),
      merges)
    encodeWithMerges(documents, pairs, ms)
  }

  /** [[bpeEncode]] under a FROZEN merge table — the serving face of
    * the tokenizer artifact ([[bigramApply]]'s posture one shelf over):
    * no training pass, the corpus pays one text scan and the greedy
    * apply runs once per word TYPE under the given merges. With the
    * merges [[bpeEncode]] would have trained, output is identical
    * (spec-pinned) — train-once-apply-many made real for BPE.
    */
  def bpeEncodeFrozen(documents: DataFrame, ms: Seq[Merge]): DataFrame =
    encodeWithMerges(documents, pinnedDocWordCounts(documents), ms)

  /** Persist a trained merge table as a first-class parquet artifact
    * (the [[graft.ext.Similarity.saveIndex]] precedent): one file,
    * `merge_rank, left, right, merged, pair_count` — strings and
    * integers round-trip exactly, so a loaded table applies
    * bit-identically (spec-pinned).
    */
  def saveMerges(
      spark: org.apache.spark.sql.SparkSession,
      ms: Seq[Merge], path: String): Unit = {
    import spark.implicits._
    ms.map(m => (m.rank.toLong, m.l, m.r, m.merged, m.cnt))
      .toDF("merge_rank", "left", "right", "merged", "pair_count")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a persisted merge table ([[saveMerges]]) in rank order —
    * application order is the contract, so the sort is load-time.
    * The collect is the artifact (≤ merges rows), never data.
    */
  def loadMerges(
      spark: org.apache.spark.sql.SparkSession, path: String): Seq[Merge] =
    spark.read.parquet(path)
      .orderBy("merge_rank")
      .collect()
      .map(r => Merge(r.getLong(0).toInt, r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq

  /** The one corpus pass both encode faces share: pinned per-(doc,
    * word) counts — they feed the type frame, training (in
    * [[bpeEncode]]), and the final join.
    */
  private def pinnedDocWordCounts(documents: DataFrame): DataFrame =
    graft.core.CacheScope.persist(
      documents
        .select(col("doc_id"),
          explode(split(lower(col("text")), "[^a-z]+")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("doc_id", "w").agg(count(lit(1)).as("cnt")))

  /** Shared encode tail: apply `ms` once per word TYPE, join widths
    * back to the per-(doc, word) counts — ONE body for the trained and
    * frozen faces, so they can never disagree.
    */
  private def encodeWithMerges(
      documents: DataFrame, pairs: DataFrame, ms: Seq[Merge]): DataFrame = {
    // encode runs over ALL word types (the truncation bounds TRAINING
    // memory, not encode coverage — an out-of-top-V word still encodes
    // under the learned merges, exactly like production tokenizers)
    val encoded = pairs.select("w").distinct()
      .withColumn("toks",
        bpeCountCol(col("w"), ms))
    val perDoc = pairs.join(encoded, Seq("w"))
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_words"),
        sum(col("cnt") * col("toks")).as("bpe_tokens"))
    documents.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("bpe_tokens"), lit(0L)).as("bpe_tokens"))
      .orderBy("doc_id")
  }

  /** Per-language tokenizer evaluation under the trained merge table —
    * FERTILITY (BPE tokens per word) and characters per token, the two
    * numbers multilingual-tokenizer work reports per language (e.g.
    * Rust et al. 2021, arXiv:2012.15613 §3: fertility measures how
    * much a tokenizer fragments a language; a corpus whose tail
    * languages tokenize at 2-3× the fertility of English pays that
    * multiple in effective context and training cost). This is the
    * audit a trained [[bpeVocab]] table gets BEFORE budgets and packing
    * trust its token counts.
    *
    * Plan: the [[bpeEncode]] per-doc counts (one corpus pass + the
    * per-TYPE greedy fold) join the corpus's (doc_id, lang, n_chars)
    * projection and collapse to one row per language — BIGINT sums,
    * 4-dp ratios, zero-denominator languages report 0.0.
    */
  def tokenizerFertility(
      documents: DataFrame,
      merges: Int = DefaultMerges,
      maxWordTypes: Int = DefaultMaxWordTypes): DataFrame = {
    val enc = bpeEncode(documents, merges, maxWordTypes)
    documents.select(col("doc_id"), col("lang"), col("n_chars"))
      .join(enc, Seq("doc_id"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_words").as("n_words"),
        sum("bpe_tokens").as("bpe_tokens"),
        sum("n_chars").as("n_chars"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("bpe_tokens"),
        col("n_chars"),
        when(col("n_words") === 0L, lit(0.0))
          .otherwise(round(col("bpe_tokens").cast("double") / col("n_words"), 4))
          .as("fertility"),
        when(col("bpe_tokens") === 0L, lit(0.0))
          .otherwise(round(col("n_chars").cast("double") / col("bpe_tokens"), 4))
          .as("chars_per_token"))
      .orderBy("lang")
  }
}
