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
  /** The trainer: [[mergeLoopIndexed]] — the pair-postings structure
    * every production BPE trainer uses (Sennrich et al. 2016's
    * reference implementation's shape). [[mergeLoopScan]] below is the
    * direct-from-the-definition version, kept as the spec's reference:
    * the two are pinned bit-identical (same merges, same tie-breaks,
    * same counts), and the indexed one turns per-merge cost from
    * O(|types|·len) into O(occurrences of the merged pair) — the r15
    * production-vocab rung measured the scan loop at >29 min for
    * m=32k over 131k types (driver, one core); the index is what
    * makes that configuration trainable.
    */
  private[ext] def mergeLoop(
      wordCounts: Array[(String, Long)], merges: Int): Seq[Merge] =
    mergeLoopIndexed(wordCounts, merges)

  /** Greedy left-to-right non-overlapping application of ONE merge to
    * a symbol array — the single definition both trainer variants and
    * the vocab-update path share.
    */
  private def applyMergeOnce(
      syms: Array[String], l: String, r: String, merged: String): Array[String] = {
    val b = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        b += merged; i += 2
      } else { b += syms(i); i += 1 }
    }
    b.result()
  }

  /** Reference trainer, direct from the BPE definition: re-count every
    * adjacent pair over the whole table each round, take the max
    * (ties to the lexicographically smallest pair), rewrite every
    * type. O(m·|types|·len) — correct at any size, affordable only at
    * modest type counts; [[mergeLoopIndexed]] is spec-pinned equal.
    */
  private[ext] def mergeLoopScan(
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
          (applyMergeOnce(syms, l, r, merged), cnt)
        }
        rank += 1
      }
    }
    out.result()
  }

  /** Indexed trainer: exact pair counts maintained INCREMENTALLY with
    * a pair→postings index (which types contain the pair) and a
    * lazy-invalidation max-heap over (count, pair).
    *
    *  - Selection is identical to the scan loop: max count, ties to
    *    the smallest (left, right) — the heap orders by
    *    (-count, l, r) and every count CHANGE pushes a fresh entry,
    *    so the best valid entry at the top is always the global
    *    argmax; stale entries (count no longer current) pop and drop.
    *  - A merge rewrites ONLY the types in its pair's postings
    *    (validated — postings are add-only and may hold stale
    *    members); each rewritten type subtracts its old adjacent-pair
    *    counts and adds its new ones, the exact per-type delta, so
    *    counts equal the scan loop's full recount at every round.
    *  - Per-merge cost: O(occurrences of the merged pair · len +
    *    changed-pairs · log heap) — independent of |types| once the
    *    table is built.
    */
  private[ext] def mergeLoopIndexed(
      wordCounts: Array[(String, Long)], merges: Int): Seq[Merge] = {
    type Pair = (String, String)
    val vocab: Array[Array[String]] = wordCounts.map { case (w, _) =>
      w.map(_.toString).toArray :+ EndOfWord
    }
    val weight: Array[Long] = wordCounts.map(_._2)
    val counts = scala.collection.mutable.HashMap.empty[Pair, Long]
    val postings = scala.collection.mutable.HashMap.empty[Pair, scala.collection.mutable.BitSet]
    // delta a type's adjacent pairs into the global counts (sign ±1);
    // postings only ever grow (stale members are validated at use)
    def delta(ti: Int, sign: Long, touched: scala.collection.mutable.Set[Pair]): Unit = {
      val syms = vocab(ti); val c = weight(ti) * sign
      var i = 0
      while (i < syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        val n = counts.getOrElse(k, 0L) + c
        if (n == 0L) counts.remove(k) else counts.update(k, n)
        if (sign > 0) postings.getOrElseUpdate(k,
          new scala.collection.mutable.BitSet(vocab.length)) += ti
        touched += k
        i += 1
      }
    }
    val initTouched = scala.collection.mutable.Set.empty[Pair]
    var ti = 0
    while (ti < vocab.length) { delta(ti, 1L, initTouched); ti += 1 }
    // max count first, ties to the smallest (l, r): PriorityQueue pops
    // the LARGEST under its ordering, so order by (-(-cnt), …) reversed
    final case class Cand(cnt: Long, l: String, r: String)
    val best = Ordering.by[Cand, (Long, String, String)](c => (-c.cnt, c.l, c.r))
    val heap = scala.collection.mutable.PriorityQueue.empty[Cand](best.reverse)
    def push(k: Pair): Unit =
      counts.get(k).foreach(c => heap.enqueue(Cand(c, k._1, k._2)))
    counts.keysIterator.foreach(push)
    def hasAdjacent(syms: Array[String], l: String, r: String): Boolean = {
      var i = 0
      while (i < syms.length - 1) {
        if (syms(i) == l && syms(i + 1) == r) return true
        i += 1
      }
      false
    }
    val out = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= merges && !exhausted) {
      // pop to the best VALID entry (count still current)
      var picked: Option[Cand] = None
      while (picked.isEmpty && heap.nonEmpty) {
        val c = heap.dequeue()
        if (counts.get((c.l, c.r)).contains(c.cnt)) picked = Some(c)
      }
      picked match {
        case None =>
          // heap drained: by the push-on-change invariant this means no
          // pairs remain; a defensive re-push covers any missed state
          if (counts.isEmpty) exhausted = true
          else counts.keysIterator.foreach(push)
        case Some(c) =>
          val (l, r) = (c.l, c.r)
          val merged = l + r
          out += Merge(rank, l, r, merged, c.cnt)
          val members = postings.get((l, r)).map(_.toArray).getOrElse(Array.empty)
          val touched = scala.collection.mutable.Set.empty[Pair]
          var mi = 0
          while (mi < members.length) {
            val t = members(mi)
            if (hasAdjacent(vocab(t), l, r)) {
              delta(t, -1L, touched)
              vocab(t) = applyMergeOnce(vocab(t), l, r, merged)
              delta(t, 1L, touched)
            }
            mi += 1
          }
          touched.foreach(push)
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
